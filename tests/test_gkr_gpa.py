"""Grand product argument tests."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import gkr_gpa
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(51)
LEVEL = 7


def mk(n):
    vals = [random.getrandbits(128) | 1 for _ in range(1 << n)]
    prod = 1
    for v in vals:
        prod = scalar.mul(LEVEL, prod, v)
    return vals, tower.from_ints(LEVEL, vals), prod


def test_witness_layers():
    vals, data, prod = mk(3)
    w = gkr_gpa.GrandProductWitness.compute(3, data)
    assert len(w.layers) == 4
    assert w.product == prod
    l2 = tower.to_ints(LEVEL, w.layers[2])
    assert l2[0] == scalar.mul(LEVEL, vals[0], vals[1])
    assert l2[3] == scalar.mul(LEVEL, vals[6], vals[7])


def test_batch_prove_verify():
    v1, d1, p1 = mk(3)
    v2, d2, p2 = mk(2)
    claims = [gkr_gpa.GrandProductClaim(3, p1), gkr_gpa.GrandProductClaim(2, p2)]
    wits = [gkr_gpa.GrandProductWitness.compute(3, d1),
            gkr_gpa.GrandProductWitness.compute(2, d2)]
    pt = ProverTranscript()
    out = gkr_gpa.batch_prove(claims, wits, pt)
    vt = VerifierTranscript(pt.finalize())
    ver = gkr_gpa.batch_verify(claims, vt)
    vt.finalize()
    assert out.evals == ver.evals
    assert out.eval_points == ver.eval_points
    # reduced claims hold against the actual multilinears
    for (point, ev), (n, data) in zip(zip(ver.eval_points, ver.evals),
                                      [(3, d1), (2, d2)]):
        _, v = mle.evaluate(LEVEL, data, n, LEVEL, tower.from_ints(LEVEL, point))
        assert tower.to_ints(LEVEL, v[None, :])[0] == ev


def test_wrong_product_rejected():
    v1, d1, p1 = mk(3)
    claims = [gkr_gpa.GrandProductClaim(3, p1 ^ 1)]
    wits = [gkr_gpa.GrandProductWitness.compute(3, d1)]
    pt = ProverTranscript()
    gkr_gpa.batch_prove(claims, wits, pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        gkr_gpa.batch_verify(claims, vt)
