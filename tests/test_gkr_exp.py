"""GKR static exponentiation tests."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import gkr_exp
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(81)
LEVEL = 7


def mk_instance(n_vars, n_bits, base):
    bits = [[random.getrandbits(1) for _ in range(1 << n_vars)] for _ in range(n_bits)]
    bit_datas = [tower.from_ints(0, b) for b in bits]
    w = gkr_exp.StaticExpWitness.compute(n_vars, base, bit_datas)
    # check result == g^exponent pointwise
    res = tower.to_ints(LEVEL, w.result)
    for i in range(1 << n_vars):
        e = sum(bits[k][i] << k for k in range(n_bits))
        assert res[i] == scalar.pow(LEVEL, base, e)
    point = [random.getrandbits(128) for _ in range(n_vars)]
    _, v = mle.evaluate(LEVEL, w.result, n_vars, LEVEL, tower.from_ints(LEVEL, point))
    ev = tower.to_ints(LEVEL, v[None, :])[0]
    claim = gkr_exp.StaticExpClaim(n_vars, n_bits, base, tuple(point), ev)
    return claim, w, bits


def test_static_exp_roundtrip():
    g = 0x2D  # B8 generator embedded in B128
    c1, w1, bits1 = mk_instance(3, 2, g)
    c2, w2, bits2 = mk_instance(2, 2, scalar.GENERATORS[7])
    pt = ProverTranscript()
    out = gkr_exp.batch_prove([c1, c2], [w1, w2], pt)
    vt = VerifierTranscript(pt.finalize())
    ver = gkr_exp.batch_verify([c1, c2], vt)
    vt.finalize()
    assert out.bit_claims == ver.bit_claims
    # exported bit claims match the actual bit multilinears
    for claims, bits, n in ((ver.bit_claims[0], bits1, 3), (ver.bit_claims[1], bits2, 2)):
        for k, point, ev in claims:
            data = tower.from_ints(0, bits[k])
            _, v = mle.evaluate(0, data, n, LEVEL, tower.from_ints(LEVEL, list(point)))
            assert tower.to_ints(LEVEL, v[None, :])[0] == ev


def test_static_exp_wrong_eval_rejected():
    c, w, _ = mk_instance(2, 2, scalar.GENERATORS[7])
    bad = gkr_exp.StaticExpClaim(c.n_vars, c.n_bits, c.base, c.eval_point, c.eval ^ 1)
    pt = ProverTranscript()
    gkr_exp.batch_prove([bad], [w], pt)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        gkr_exp.batch_verify([bad], vt)
