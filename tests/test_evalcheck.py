"""Evalcheck reduction tests: virtual oracle claims -> committed claims."""

import random

import pytest

from binius_tpu.constraint_system import oracle as om
from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import evalcheck, shift_ind, transparent
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(41)
LEVEL = 7


def eval_direct(level, data, n_vars, point):
    _, v = mle.evaluate(level, data, n_vars, LEVEL, tower.from_ints(LEVEL, list(point)))
    return tower.to_ints(LEVEL, v[None, :])[0]


def build_system(n=5, b=3, offset=3):
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 0, "a")
    s_id = oracles.add_shifted(a_id, offset, b, shift_ind.LOGICAL_LEFT, "a_shift")
    c_id = oracles.add_committed(n, 5, "c")
    lam = random.getrandbits(128)
    lc_id = oracles.add_linear_combination(n, [(s_id, lam), (c_id, 1)], 5, "lc")

    a_vals = [random.getrandbits(1) for _ in range(1 << n)]
    c_vals = [random.getrandbits(32) for _ in range(1 << n)]
    s_vals = shift_ind.apply_shift_ints(shift_ind.LOGICAL_LEFT, b, offset, a_vals)
    lc_vals = [5 ^ scalar.mul(LEVEL, lam, s) ^ c for s, c in zip(s_vals, c_vals)]
    witness = {
        a_id: (0, tower.from_ints(0, a_vals)),
        s_id: (0, tower.from_ints(0, s_vals)),
        c_id: (5, tower.from_ints(5, c_vals)),
        lc_id: (7, tower.from_ints(7, lc_vals)),
    }
    return oracles, witness, (a_id, s_id, c_id, lc_id)


def test_evalcheck_roundtrip():
    n = 5
    oracles, witness, (a_id, s_id, c_id, lc_id) = build_system(n)
    point = tuple(random.getrandbits(128) for _ in range(n))
    ev = eval_direct(*witness[lc_id], n, point)
    claims = [evalcheck.EvalcheckClaim(lc_id, point, ev)]
    pt = ProverTranscript()
    committed_p = evalcheck.prove(oracles, witness, claims, pt)
    proof = pt.finalize()
    vt = VerifierTranscript(proof)
    committed_v = evalcheck.verify(oracles, claims, vt)
    vt.finalize()
    assert [(c.oracle_id, c.point, c.eval) for c in committed_p] == \
           [(c.oracle_id, c.point, c.eval) for c in committed_v]
    # committed claims hold against the actual witness
    for c in committed_v:
        lvl, data = witness[c.oracle_id]
        assert eval_direct(lvl, data, oracles[c.oracle_id].n_vars, c.point) == c.eval
    # claims on both committed oracles exist
    assert {c.oracle_id for c in committed_v} == {a_id, c_id}


def _roundtrip(oracles, witness, claims):
    pt = ProverTranscript()
    committed_p = evalcheck.prove(oracles, witness, claims, pt)
    vt = VerifierTranscript(pt.finalize())
    committed_v = evalcheck.verify(oracles, claims, vt)
    vt.finalize()
    assert [(c.oracle_id, c.point, c.eval) for c in committed_p] == \
           [(c.oracle_id, c.point, c.eval) for c in committed_v]
    for c in committed_v:
        lvl, data = witness[c.oracle_id]
        assert eval_direct(lvl, data, oracles[c.oracle_id].n_vars, c.point) == c.eval
    return committed_v


def test_evalcheck_projected():
    """Projected claims rewrite the point onto the inner oracle
    (`evalcheck/verify.rs:200-216`)."""
    from binius_tpu.constraint_system import witness as cw

    n = 5
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    vals = tuple(random.getrandbits(128) for _ in range(2))
    p_id = oracles.add_projected(a_id, vals, start_index=1, name="a_proj")
    a_vals = [random.getrandbits(32) for _ in range(1 << n)]
    witness = {a_id: (5, tower.from_ints(5, a_vals))}
    plvl, pdata = cw.materialize(oracles, witness, p_id)
    point = tuple(random.getrandbits(128) for _ in range(n - 2))
    ev = eval_direct(plvl, pdata, n - 2, point)
    # projection semantics: inner at point[:1] ++ vals ++ point[1:]
    assert ev == eval_direct(5, witness[a_id][1], n, point[:1] + vals + point[1:])
    committed = _roundtrip(oracles, witness,
                           [evalcheck.EvalcheckClaim(p_id, point, ev)])
    assert {c.oracle_id for c in committed} == {a_id}


def test_evalcheck_zero_padded():
    from binius_tpu.constraint_system import witness as cw

    n = 3
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    z_id = oracles.add_zero_padded(a_id, 2, nonzero_index=2, start_index=1,
                                   name="a_pad")
    a_vals = [random.getrandbits(32) for _ in range(1 << n)]
    witness = {a_id: (5, tower.from_ints(5, a_vals))}
    zlvl, zdata = cw.materialize(oracles, witness, z_id)
    ints = tower.to_ints(zlvl, zdata)
    # layout: index = hi << 3 | block << 1 | lo; only block 2 is nonzero
    for hi in range(1 << (n - 1)):
        for blk in range(4):
            for lo in range(2):
                v = ints[(hi << 3) | (blk << 1) | lo]
                assert v == (a_vals[(hi << 1) | lo] if blk == 2 else 0)
    point = tuple(random.getrandbits(128) for _ in range(n + 2))
    ev = eval_direct(zlvl, zdata, n + 2, point)
    committed = _roundtrip(oracles, witness,
                           [evalcheck.EvalcheckClaim(z_id, point, ev)])
    assert {c.oracle_id for c in committed} == {a_id}


def test_evalcheck_packed():
    """Packed claims reduce via the tower-basis bivariate sumcheck
    (`evalcheck/subclaims.rs` packed_sumcheck_meta)."""
    from binius_tpu.constraint_system import witness as cw

    n, kappa = 6, 2
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 3, "a")
    p_id = oracles.add_packed(a_id, kappa, "a_packed")
    a_vals = [random.getrandbits(8) for _ in range(1 << n)]
    witness = {a_id: (3, tower.from_ints(3, a_vals))}
    plvl, pdata = cw.materialize(oracles, witness, p_id)
    assert plvl == 5
    point = tuple(random.getrandbits(128) for _ in range(n - kappa))
    ev = eval_direct(plvl, pdata, n - kappa, point)
    committed = _roundtrip(oracles, witness,
                           [evalcheck.EvalcheckClaim(p_id, point, ev)])
    assert {c.oracle_id for c in committed} == {a_id}


def test_evalcheck_packed_wrong_eval_rejected():
    n, kappa = 6, 2
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 3, "a")
    p_id = oracles.add_packed(a_id, kappa, "a_packed")
    a_vals = [random.getrandbits(8) for _ in range(1 << n)]
    witness = {a_id: (3, tower.from_ints(3, a_vals))}
    point = tuple(random.getrandbits(128) for _ in range(n - kappa))
    claims = [evalcheck.EvalcheckClaim(p_id, point, 12345)]
    pt = ProverTranscript()
    evalcheck.prove(oracles, witness, claims, pt)
    vt = VerifierTranscript(pt.finalize())
    # the lied claimed sum fails the sumcheck's final composite check
    with pytest.raises(ValueError):
        evalcheck.verify(oracles, claims, vt)


def test_evalcheck_dedup():
    n = 5
    oracles, witness, (a_id, s_id, c_id, lc_id) = build_system(n)
    point = tuple(random.getrandbits(128) for _ in range(n))
    ev_s = eval_direct(*witness[s_id], n, point)
    ev_c = eval_direct(*witness[c_id], n, point)
    claims = [
        evalcheck.EvalcheckClaim(s_id, point, ev_s),
        evalcheck.EvalcheckClaim(s_id, point, ev_s),  # duplicate
        evalcheck.EvalcheckClaim(c_id, point, ev_c),
    ]
    pt = ProverTranscript()
    evalcheck.prove(oracles, witness, claims, pt)
    vt = VerifierTranscript(pt.finalize())
    evalcheck.verify(oracles, claims, vt)
    vt.finalize()


def test_evalcheck_wrong_eval_rejected():
    n = 5
    oracles, witness, (a_id, s_id, c_id, lc_id) = build_system(n)
    point = tuple(random.getrandbits(128) for _ in range(n))
    ev = eval_direct(*witness[s_id], n, point) ^ 1
    claims = [evalcheck.EvalcheckClaim(s_id, point, ev)]
    pt = ProverTranscript()
    committed = evalcheck.prove(oracles, witness, claims, pt)
    vt = VerifierTranscript(pt.finalize())
    # Either the sumcheck reduction already rejects (honest prover, false
    # claim), or the reduced committed claim disagrees with the witness.
    try:
        committed_v = evalcheck.verify(oracles, claims, vt)
    except ValueError:
        return
    bad = 0
    for c in committed_v:
        lvl, data = witness[c.oracle_id]
        if eval_direct(lvl, data, oracles[c.oracle_id].n_vars, c.point) != c.eval:
            bad += 1
    assert bad > 0


def test_repeating_and_transparent():
    oracles = om.OracleSet()
    inner = oracles.add_committed(3, 5, "x")
    rep = oracles.add_repeating(inner, 2, "x_rep")
    tp = oracles.add_transparent(transparent.StepDown(5, 20), "mask")
    x_vals = [random.getrandbits(32) for _ in range(8)]
    witness = {inner: (5, tower.from_ints(5, x_vals)),
               rep: (5, tower.from_ints(5, x_vals * 4))}
    point = tuple(random.getrandbits(128) for _ in range(5))
    ev_rep = eval_direct(5, witness[rep][1], 5, point)
    sd = transparent.StepDown(5, 20)
    ev_tp = sd.evaluate_scalar(list(point))
    # check StepDown scalar eval against its MLE
    lvl, data = sd.mle()
    assert eval_direct(lvl, data, 5, point) == ev_tp
    claims = [evalcheck.EvalcheckClaim(rep, point, ev_rep),
              evalcheck.EvalcheckClaim(tp, point, ev_tp)]
    pt = ProverTranscript()
    committed = evalcheck.prove(oracles, witness, claims, pt)
    vt = VerifierTranscript(pt.finalize())
    committed_v = evalcheck.verify(oracles, claims, vt)
    vt.finalize()
    assert len(committed_v) == 1 and committed_v[0].oracle_id == inner
    assert committed_v[0].point == point[:3]
