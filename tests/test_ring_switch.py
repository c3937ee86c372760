"""Ring-switch tests: tensor algebra, eq-ind consistency, and the full
small-field commitment-opening slice (ring_switch -> PIOP -> FRI)."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import fri as fri_mod
from binius_tpu.protocols import piop, ring_switch
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(31)
LEVEL = 7


def mk_witness(level, n_vars):
    vals = [random.getrandbits(scalar.bits(level)) for _ in range(1 << n_vars)]
    return vals, (level, tower.from_ints(level, vals))


def eval_witness(level, data, n_vars, point):
    _, v = mle.evaluate(level, data, n_vars, LEVEL, tower.from_ints(LEVEL, point))
    return tower.to_ints(LEVEL, v[None, :])[0]


def test_tensor_transpose_involution():
    level = 5
    e = ring_switch.TensorAlgElem(level, [random.getrandbits(128) for _ in range(4)])
    t = e.transpose().transpose()
    assert t.elems == e.elems


def test_eq_ind_mle_matches_host_eval():
    level, n = 5, 3
    suffix = [random.getrandbits(128) for _ in range(n)]
    mix = random.getrandbits(128)
    row_coeffs = [random.getrandbits(128) for _ in range(4)]
    data, nv = ring_switch.ring_switch_eq_ind_mle(level, suffix, mix, row_coeffs)
    vals = tower.to_ints(LEVEL, data)
    for j in [0, 3, 7]:
        q = [(j >> i) & 1 for i in range(n)]
        want = ring_switch.ring_switch_eq_ind_eval(level, suffix, mix, row_coeffs, q)
        assert vals[j] == want
    # also at a random (non-vertex) point: MLE eval == host eval
    q = [random.getrandbits(128) for _ in range(n)]
    got = eval_witness(LEVEL, data, n, q)
    assert got == ring_switch.ring_switch_eq_ind_eval(level, suffix, mix, row_coeffs, q)


def test_ring_switch_reduction_completeness():
    """sum_v packed(v) * A(v) == row-batched eval, for a real witness."""
    level, n = 0, 8  # B1, 8 vars -> packed 1 var
    vals, wit = mk_witness(level, n)
    point = [random.getrandbits(128) for _ in range(n)]
    ev = eval_witness(level, wit[1], n, point)
    claim = ring_switch.RingSwitchEvalClaim(0, level, tuple(point), ev)
    pt = ProverTranscript()
    red = ring_switch.prove([claim], [wit], pt)
    vt = VerifierTranscript(pt.finalize())
    red_v = ring_switch.verify([claim], vt)
    vt.finalize()
    assert [c.sum for c in red.sumcheck_claims] == [c.sum for c in red_v.sumcheck_claims]
    # completeness: inner product of packed multilinear with the transparent
    packed, pn = piop.pack_multilinear(level, wit[1], n)
    a_data, an = red.transparent_mles[0]
    assert an == pn
    p_ints = tower.to_ints(LEVEL, packed)
    a_ints = tower.to_ints(LEVEL, a_data)
    acc = 0
    for x, y in zip(p_ints, a_ints):
        acc ^= scalar.mul(LEVEL, x, y)
    assert acc == red.sumcheck_claims[0].sum
    # verifier transparent eval fn agrees with prover MLE
    q = [random.getrandbits(128) for _ in range(an)]
    assert red_v.transparent_mles[0][1](q) == eval_witness(LEVEL, a_data, an, q)


def test_ring_switch_wrong_eval_rejected():
    level, n = 5, 5
    vals, wit = mk_witness(level, n)
    point = [random.getrandbits(128) for _ in range(n)]
    ev = eval_witness(level, wit[1], n, point) ^ 1
    claim = ring_switch.RingSwitchEvalClaim(0, level, tuple(point), ev)
    pt = ProverTranscript()
    ring_switch.prove([claim], [wit], pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        ring_switch.verify([claim], vt)


def test_full_commitment_opening_slice():
    """End-to-end: commit small-field multilinears, open evals via
    ring_switch + PIOP + FRI — the core of the FRI-Binius PCS."""
    # witnesses: B1/8vars (packed 1), B32/5vars (packed 3), B8/7vars (packed 3)
    w0_vals, w0 = mk_witness(0, 8)
    w1_vals, w1 = mk_witness(5, 5)
    w2_vals, w2 = mk_witness(3, 7)
    witnesses = [w0, w1, w2]
    commit_meta = piop.CommitMeta((0, 1, 0, 2))
    params = fri_mod.FRIParams(log_dim=3, log_inv_rate=1, log_batch_size=2,
                               fold_arities=(2, 2), n_test_queries=3)
    packed = []
    for lvl, data in witnesses:
        n = {0: 8, 5: 5, 3: 7}[lvl]
        packed.append(piop.pack_multilinear(lvl, data, n))
    packed_mles = [(d, nv) for d, nv in packed]

    points = [[random.getrandbits(128) for _ in range(n)] for n in (8, 5, 7)]
    evals = [eval_witness(lvl, data, n, p)
             for (lvl, data), n, p in zip(witnesses, (8, 5, 7), points)]
    claims = [ring_switch.RingSwitchEvalClaim(i, witnesses[i][0], tuple(points[i]), evals[i])
              for i in range(3)]

    # prove
    pt = ProverTranscript()
    cw, tree, _ = piop.commit(params, commit_meta, packed_mles)
    pt.message().write_bytes(tree.root)
    red = ring_switch.prove(claims, witnesses, pt)
    piop.prove(params, commit_meta, cw, tree, packed_mles, red.transparent_mles,
               red.sumcheck_claims, pt)
    proof = pt.finalize()

    # verify
    vt = VerifierTranscript(proof)
    com = vt.message().read_bytes(32)
    red_v = ring_switch.verify(claims, vt)
    piop.verify(params, commit_meta, com, red_v.transparent_mles,
                red_v.sumcheck_claims, vt)
    vt.finalize()

    # tampered proof fails somewhere
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    vt2 = VerifierTranscript(bytes(bad))
    with pytest.raises((ValueError, EOFError)):
        vt2.message().read_bytes(32)
        red_v2 = ring_switch.verify(claims, vt2)
        piop.verify(params, commit_meta, com, red_v2.transparent_mles,
                    red_v2.sumcheck_claims, vt2)
        vt2.finalize()
