"""Sumcheck and zerocheck prove->verify round-trip tests."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math.arith import ArithExpr, CompositionPoly, bivariate_product
from binius_tpu.protocols.sumcheck import prove as sc_prove
from binius_tpu.protocols.sumcheck import verify as sc_verify
from binius_tpu.protocols.sumcheck import zerocheck
from binius_tpu.protocols.sumcheck.common import CompositeSumClaim, SumcheckClaim
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(11)
LEVEL = 7


def rand_ml(level, n_vars):
    vals = [random.getrandbits(scalar.bits(level)) for _ in range(1 << n_vars)]
    return vals, (level, tower.from_ints(level, vals))


def direct_sum(comp, levels_vals):
    acc = 0
    n = len(levels_vals[0])
    for i in range(n):
        acc ^= comp.evaluate_scalar(LEVEL, [vals[i] for vals in levels_vals])
    return acc


@pytest.mark.parametrize("order_high", [False, True])
def test_single_claim_roundtrip(order_high):
    n = 4
    a_vals, a = rand_ml(5, n)
    b_vals, b = rand_ml(7, n)
    comp = bivariate_product()
    s = direct_sum(comp, [a_vals, b_vals])
    claim = SumcheckClaim(n, 2, (CompositeSumClaim(comp, s),))
    pt = ProverTranscript()
    prover = sc_prove.RegularSumcheckProver(claim, [a, b], order_high)
    out = sc_prove.batch_prove([prover], pt)
    proof = pt.finalize()

    vt = VerifierTranscript(proof)
    ver = sc_verify.batch_verify([claim], vt, order_high)
    vt.finalize()
    assert ver.challenges == out.challenges
    assert ver.multilinear_evals == out.multilinear_evals
    # reduced evals must equal actual multilinear evaluations at the point
    pt_claim = sc_verify.claim_point(n, n, ver.challenges, order_high)
    from binius_tpu.math import mle
    for (lvl, data), got in zip([a, b], ver.multilinear_evals[0]):
        _, v = mle.evaluate(lvl, data, n, LEVEL, tower.from_ints(LEVEL, pt_claim))
        assert tower.to_ints(LEVEL, v[None, :])[0] == got


def test_wrong_claim_rejected():
    n = 4
    a_vals, a = rand_ml(7, n)
    b_vals, b = rand_ml(7, n)
    comp = bivariate_product()
    s = direct_sum(comp, [a_vals, b_vals]) ^ 1  # wrong sum
    claim = SumcheckClaim(n, 2, (CompositeSumClaim(comp, s),))
    pt = ProverTranscript()
    sc_prove.batch_prove([sc_prove.RegularSumcheckProver(claim, [a, b], False)], pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        sc_verify.batch_verify([claim], vt, False)


def test_tampered_proof_rejected():
    n = 4
    a_vals, a = rand_ml(7, n)
    b_vals, b = rand_ml(7, n)
    comp = bivariate_product()
    s = direct_sum(comp, [a_vals, b_vals])
    claim = SumcheckClaim(n, 2, (CompositeSumClaim(comp, s),))
    pt = ProverTranscript()
    sc_prove.batch_prove([sc_prove.RegularSumcheckProver(claim, [a, b], False)], pt)
    proof = bytearray(pt.finalize())
    proof[5] ^= 1
    vt = VerifierTranscript(bytes(proof))
    with pytest.raises(ValueError):
        sc_verify.batch_verify([claim], vt, False)


def test_batch_mixed_sizes():
    order_high = False
    n1, n2 = 4, 2
    a_vals, a = rand_ml(7, n1)
    b_vals, b = rand_ml(7, n1)
    c_vals, c = rand_ml(5, n2)
    comp2 = bivariate_product()
    x = ArithExpr.var(0)
    comp1 = CompositionPoly(x * x * x, 1)  # cubic in one multilinear
    s1 = direct_sum(comp2, [a_vals, b_vals])
    s2 = 0
    for v in c_vals:
        s2 ^= scalar.pow(LEVEL, v, 3)
    claim1 = SumcheckClaim(n1, 2, (CompositeSumClaim(comp2, s1),))
    claim2 = SumcheckClaim(n2, 1, (CompositeSumClaim(comp1, s2),))
    pt = ProverTranscript()
    provers = [
        sc_prove.RegularSumcheckProver(claim1, [a, b], order_high),
        sc_prove.RegularSumcheckProver(claim2, [c], order_high),
    ]
    out = sc_prove.batch_prove(provers, pt)
    vt = VerifierTranscript(pt.finalize())
    ver = sc_verify.batch_verify([claim1, claim2], vt, order_high)
    vt.finalize()
    assert ver.multilinear_evals == out.multilinear_evals


def test_zerocheck_roundtrip():
    order_high = True
    # witness satisfying c = a * b pointwise
    n = 4
    a_vals, a = rand_ml(5, n)
    b_vals, b = rand_ml(5, n)
    c_vals = [scalar.mul(5, x, y) for x, y in zip(a_vals, b_vals)]
    c = (5, tower.from_ints(5, c_vals))
    comp = CompositionPoly(
        ArithExpr.var(0) * ArithExpr.var(1) + ArithExpr.var(2), 3)
    zc = zerocheck.ZerocheckClaim(n, 3, (comp,))
    pt = ProverTranscript()
    out = zerocheck.batch_prove([zc], [[a, b, c]], pt, order_high)
    vt = VerifierTranscript(pt.finalize())
    ver = zerocheck.batch_verify([zc], vt, order_high)
    vt.finalize()
    assert ver.multilinear_evals == out.multilinear_evals


def test_zerocheck_rejects_violation():
    n = 4
    a_vals, a = rand_ml(5, n)
    b_vals, b = rand_ml(5, n)
    c_vals = [scalar.mul(5, x, y) for x, y in zip(a_vals, b_vals)]
    c_vals[3] ^= 1  # violate one row
    c = (5, tower.from_ints(5, c_vals))
    comp = CompositionPoly(
        ArithExpr.var(0) * ArithExpr.var(1) + ArithExpr.var(2), 3)
    zc = zerocheck.ZerocheckClaim(n, 3, (comp,))
    pt = ProverTranscript()
    zerocheck.batch_prove([zc], [[a, b, c]], pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        zerocheck.batch_verify([zc], vt)
