"""Univariate-skip zerocheck: device Lagrange, NTT extrapolation property,
and the three-stage prove/verify roundtrip (counterpart of the reference's
`zerocheck.rs` test_zerocheck_end_to_end / `univariate.rs` tests)."""

import random

import numpy as np

from binius_tpu.fields import scalar, tower
from binius_tpu.math.arith import ArithExpr, CompositionPoly
from binius_tpu.math.univariate import EvaluationDomain, lagrange_evals_device
from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain
from binius_tpu.protocols.sumcheck import univariate_zerocheck as uzc
from binius_tpu.protocols.sumcheck.zerocheck import ZerocheckClaim
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

LEVEL = 7


def test_lagrange_evals_device_matches_host():
    random.seed(1)
    dom = EvaluationDomain.from_subspace(3, 6)
    z = random.getrandbits(128)
    want = dom.lagrange_evals(LEVEL, z)
    got = tower.to_ints(LEVEL, lagrange_evals_device(dom.points, z))
    assert got == want
    # z landing on a domain point must yield the unit vector
    got0 = tower.to_ints(LEVEL, lagrange_evals_device(dom.points, dom.points[2]))
    assert got0 == [1 if i == 2 else 0 for i in range(len(dom.points))]


def test_ntt_coset_extrapolation_property():
    """Forward NTT at coset c of the inverse transform equals Lagrange
    extrapolation of the original evals at the coset's domain points
    (the reference's ntt_extrapolate_correctness, `univariate.rs:714`)."""
    random.seed(2)
    k = 3
    dom_log = 5
    nd = NTTDomain.create(3, dom_log)
    ntt = AdditiveNTT(nd)
    pts = [nd.subspace.get(i) for i in range(1 << dom_log)]
    sub_dom = EvaluationDomain(3, tuple(pts[:1 << k]))
    vals = [random.randrange(256) for _ in range(1 << k)]
    data = tower.from_ints(3, vals)
    coeffs = ntt.inverse(data, 3, (0, k, 0), 0, dom_log - k)
    for coset in (1, 2, 3):
        ev = tower.to_ints(3, ntt.forward(coeffs, 3, (0, k, 0), coset, dom_log - k))
        for j in range(1 << k):
            want = sub_dom.extrapolate(3, vals, pts[(coset << k) | j])
            assert ev[j] == want, (coset, j)


def _mk_claim_and_mls(n_vars: int, rng):
    """One zerocheck claim out + a*b == 0 over B1 columns."""
    V = ArithExpr.var
    comp = CompositionPoly(V(0) + V(1) * V(2), 3)
    a = [rng.randrange(2) for _ in range(1 << n_vars)]
    b = [rng.randrange(2) for _ in range(1 << n_vars)]
    out = [x & y for x, y in zip(a, b)]
    mls = [(0, tower.from_ints(0, out)), (0, tower.from_ints(0, a)),
           (0, tower.from_ints(0, b))]
    return ZerocheckClaim(n_vars, 3, (comp,)), mls


def test_univariate_zerocheck_roundtrip():
    rng = random.Random(3)
    c1, m1 = _mk_claim_and_mls(4, rng)
    c2, m2 = _mk_claim_and_mls(6, rng)
    claims = [c1, c2]
    skip = uzc.compute_skip_rounds(claims)
    # reference cap (`verify.rs:271`): min(8 - log2_ceil(2), max n_vars) = 6;
    # the 4-var claim high-pads by 2 variables
    assert skip == 6
    pt = ProverTranscript()
    out = uzc.batch_prove(claims, [m1, m2], pt, skip)
    proof = pt.finalize()

    vt = VerifierTranscript(proof)
    vout = uzc.batch_verify(claims, vt, skip)
    vt.finalize()
    assert vout.skipped_challenges == out.skipped_challenges
    assert vout.unskipped_challenges == out.unskipped_challenges
    assert vout.multilinear_evals == out.multilinear_evals
    assert vout.eval_points == out.eval_points

    # the final eval claims must hold against the witness
    from binius_tpu.math import mle
    for mls, evals, point in zip([m1, m2], out.multilinear_evals, out.eval_points):
        for (lvl, data), ev in zip(mls, evals):
            n = len(point)
            _, v = mle.evaluate(lvl, data, n, LEVEL, tower.from_ints(LEVEL, point))
            assert tower.to_ints(LEVEL, v[None, :])[0] == ev


def test_univariate_zerocheck_rejects_nonzero():
    rng = random.Random(4)
    c1, m1 = _mk_claim_and_mls(5, rng)
    # corrupt one witness value
    vals = tower.to_ints(0, m1[0][1])
    vals[3] ^= 1
    m1[0] = (0, tower.from_ints(0, vals))
    skip = uzc.compute_skip_rounds([c1])
    pt = ProverTranscript()
    out = uzc.batch_prove([c1], [m1], pt, skip)
    proof = pt.finalize()
    vt = VerifierTranscript(proof)
    try:
        vout = uzc.batch_verify([c1], vt, skip)
        vt.finalize()
    except ValueError:
        return  # verifier caught it outright
    # otherwise the reduced eval claims must NOT validate against an honest
    # witness reconstruction: the round polynomial can't vanish on the cube
    from binius_tpu.math import mle
    ok = True
    for (lvl, data), ev in zip(m1, vout.multilinear_evals[0]):
        n = len(vout.eval_points[0])
        _, v = mle.evaluate(lvl, data, n, LEVEL,
                            tower.from_ints(LEVEL, vout.eval_points[0]))
        ok &= tower.to_ints(LEVEL, v[None, :])[0] == ev
    comp_val = 0
    evs = vout.multilinear_evals[0]
    comp_val = evs[0] ^ scalar.mul(LEVEL, evs[1], evs[2])
    # out + a*b does not vanish at the reduced point for a corrupted witness
    assert not (ok and comp_val == 0)


def test_grouped_stage2_transcript_byte_equality(monkeypatch):
    """Same-structure claims proven grouped (one device batch) must produce
    byte-identical proofs to per-claim provers (the keccak 24-round-group
    dispatch optimization; GroupedRegularSumcheckProver)."""
    rng = random.Random(7)
    claims, mls = [], []
    for _ in range(3):
        c, m = _mk_claim_and_mls(6, rng)
        claims.append(c)
        mls.append(m)
    # one different-structure claim on top (stays a single prover)
    V = ArithExpr.var
    comp = CompositionPoly(V(0) + V(1) * V(1), 2)
    a = [rng.randrange(2) for _ in range(1 << 6)]
    out = [x & x for x in a]
    claims.append(ZerocheckClaim(6, 2, (comp,)))
    mls.append([(0, tower.from_ints(0, out)), (0, tower.from_ints(0, a))])
    skip = uzc.compute_skip_rounds(claims)

    proofs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("BINIUS_BATCH_ROUND_KERNELS", flag)
        pt = ProverTranscript()
        uzc.batch_prove(claims, mls, pt, skip)
        proofs[flag] = pt.finalize()
    assert proofs["0"] == proofs["1"]

    vt = VerifierTranscript(proofs["1"])
    uzc.batch_verify(claims, vt, skip)
    vt.finalize()


def test_staggered_domain_extrapolation_byte_equality():
    """Mixed-degree systems: the lower-degree claim's round evals are computed
    on its OWN staggered domain (d_i * 2^skip) and OddInterpolate+NTT-extended
    to the global domain (`prove/univariate.rs:566-640`). The transcript bytes
    must equal direct evaluation on the global domain — same polynomial."""
    rng = random.Random(9)
    V = ArithExpr.var
    # degree-2 claim: out + a*b
    c1, m1 = _mk_claim_and_mls(5, rng)
    # degree-3 claim: out + a*b*c
    comp3 = CompositionPoly(V(0) + V(1) * V(2) * V(3), 4)
    a = [rng.randrange(2) for _ in range(1 << 5)]
    b = [rng.randrange(2) for _ in range(1 << 5)]
    c = [rng.randrange(2) for _ in range(1 << 5)]
    out = [x & y & z for x, y, z in zip(a, b, c)]
    c2 = ZerocheckClaim(5, 4, (comp3,))
    m2 = [(0, tower.from_ints(0, v)) for v in (out, a, b, c)]
    claims, mls = [c1, c2], [m1, m2]
    skip = uzc.compute_skip_rounds(claims)
    assert skip == 5  # deg 3 claim: 8 - 2 = 6, capped at n_vars 5

    pt = ProverTranscript()
    pout = uzc.batch_prove(claims, mls, pt, skip)
    proof = pt.finalize()

    # direct-evaluation oracle: force every claim onto the global domain by
    # evaluating claim 1 with max_d cosets (bypassing the staggered path)
    orig_cre, orig_ext = uzc._claim_round_evals, uzc._extrapolate_round_evals
    calls = []

    def spy(zc, ms, eq_pt, k, n_cosets, dom_log):
        calls.append(n_cosets)
        return orig_cre(zc, ms, eq_pt, k, 3, dom_log)  # always global (max_d=3)

    uzc._claim_round_evals = spy
    uzc._extrapolate_round_evals = lambda ev, *a: ev  # already global
    try:
        pt2 = ProverTranscript()
        uzc.batch_prove(claims, mls, pt2, skip)
        proof2 = pt2.finalize()
    finally:
        uzc._claim_round_evals = orig_cre
        uzc._extrapolate_round_evals = orig_ext
    assert proof == proof2
    # the normal path really did request the staggered (per-claim) arities
    assert calls == [2, 3]

    vt = VerifierTranscript(proof)
    vout = uzc.batch_verify(claims, vt, skip)
    vt.finalize()
    assert vout.multilinear_evals == pout.multilinear_evals
