"""Prodcheck (binary product-tree GKR, v3) tests — mirrors the reference's
`prodcheck/tests.rs` product-correctness check plus a prove/verify round trip
the reference defers to its sumcheck tests."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import prodcheck
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(23)
LEVEL = 7


def mk(n):
    vals = [random.getrandbits(128) | 1 for _ in range(1 << n)]
    prod = 1
    for v in vals:
        prod = scalar.mul(LEVEL, prod, v)
    return vals, tower.from_ints(LEVEL, vals), prod


def test_layers_product_matches_scalar():
    """`tests.rs:15-36` (product equals the scalar fold) + layer shape/content
    checks against the lo/hi-half pairing."""
    vals, data, prod = mk(4)
    layers = prodcheck.ProductCircuitLayers.compute(data, 4)
    assert layers.product == prod
    assert [l.shape[0] for l in layers.layers] == [2, 4, 8, 16]
    l3 = tower.to_ints(LEVEL, layers.layers[2])  # 8 elements, halves of input
    assert l3[0] == scalar.mul(LEVEL, vals[0], vals[8])
    assert l3[7] == scalar.mul(LEVEL, vals[7], vals[15])


def test_prove_verify_roundtrip():
    vals, data, prod = mk(4)
    layers = prodcheck.ProductCircuitLayers.compute(data, 4)
    claim = prodcheck.ProdcheckClaim(4, prod)
    pt = ProverTranscript()
    out = prodcheck.prove(claim, layers, pt)
    vt = VerifierTranscript(pt.finalize())
    ver = prodcheck.verify(claim, vt)
    vt.finalize()
    assert (out.eval_point, out.eval) == (ver.eval_point, ver.eval)
    _, v = mle.evaluate(LEVEL, data, 4, LEVEL, tower.from_ints(LEVEL, ver.eval_point))
    assert tower.to_ints(LEVEL, v[None, :])[0] == ver.eval


def test_wrong_product_rejected():
    _, data, prod = mk(3)
    layers = prodcheck.ProductCircuitLayers.compute(data, 3)
    pt = ProverTranscript()
    prodcheck.prove(prodcheck.ProdcheckClaim(3, prod), layers, pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        prodcheck.verify(prodcheck.ProdcheckClaim(3, prod ^ 1), vt)


def test_non_power_of_two_rejected():
    _, data, _ = mk(3)
    with pytest.raises(ValueError):
        prodcheck.ProductCircuitLayers.compute(data, 2)
