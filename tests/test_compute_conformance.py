"""Compute-layer conformance suite (counterpart of the reference's
`compute_test_utils/src/layer.rs:22-909` generic backend tests).

The framework's compute vocabulary — field mul/inner-product, tensor
expansion, partial-eval folds, sumcheck round evals, FRI fold, RS encode —
is exercised against the `fields.scalar` Python-int ground truth through a
BACKEND table, so an alternative backend implementation (e.g. the Pallas
kernels, a future fused NTT) plugs into the same checks by adding a row.
Backends whose requirements aren't met in the current environment skip.
"""

import random

import jax
import pytest

from binius_tpu.fields import scalar, tower

random.seed(211)
LEVEL = 7


def _xla_mul(level, a, b):
    return tower.mul(level, a, b)


def _bitslice_mul(level, a, b):
    from binius_tpu.fields import bitslice
    return bitslice.mul(level, a, b)


def _pallas_mul(level, a, b):
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("Pallas backend needs a TPU")
    from binius_tpu.fields import bitslice_pallas
    return bitslice_pallas.mul(level, a, b)


MUL_BACKENDS = [("xla", _xla_mul, 64), ("bitslice", _bitslice_mul, 64),
                ("pallas", _pallas_mul, 32 * 1024)]


@pytest.mark.parametrize("name,mul_fn,n", MUL_BACKENDS,
                         ids=[b[0] for b in MUL_BACKENDS])
def test_mul_backend_conformance(name, mul_fn, n):
    xs = [random.getrandbits(128) for _ in range(n)]
    ys = [random.getrandbits(128) for _ in range(n)]
    a, b = tower.from_ints(LEVEL, xs), tower.from_ints(LEVEL, ys)
    got = tower.to_ints(LEVEL, mul_fn(LEVEL, a, b))
    stride = max(1, n // 64)
    for i in range(0, n, stride):
        assert got[i] == scalar.mul(LEVEL, xs[i], ys[i])


def test_tensor_expand_conformance():
    """tensor_expand == eq-ind expansion (`layer.rs` tensor_expand)."""
    from binius_tpu.math import mle

    pt = [random.getrandbits(128) for _ in range(4)]
    got = tower.to_ints(LEVEL, mle.eq_ind_partial_eval(
        LEVEL, tower.from_ints(LEVEL, pt)))
    for idx in range(16):
        want = 1
        for k in range(4):
            want = scalar.mul(LEVEL, want, pt[k] if (idx >> k) & 1 else pt[k] ^ 1)
        assert got[idx] == want


def test_fold_left_right_conformance():
    """fold_low/fold_high == reference fold_left/fold_right semantics."""
    from binius_tpu.math import fold

    n = 5
    vals = [random.getrandbits(128) for _ in range(1 << n)]
    r = random.getrandbits(128)
    data = tower.from_ints(LEVEL, vals)
    rr = tower.from_ints(LEVEL, [r])[0]
    _, lo = fold.fold_low(LEVEL, data, n, LEVEL, rr)
    _, hi = fold.fold_high(LEVEL, data, n, LEVEL, rr)
    lo_i, hi_i = tower.to_ints(LEVEL, lo), tower.to_ints(LEVEL, hi)
    half = 1 << (n - 1)
    for j in range(half):
        want_lo = vals[2 * j] ^ scalar.mul(LEVEL, vals[2 * j] ^ vals[2 * j + 1], r)
        want_hi = vals[j] ^ scalar.mul(LEVEL, vals[j] ^ vals[j + half], r)
        assert lo_i[j] == want_lo and hi_i[j] == want_hi


def test_inner_product_conformance():
    xs = [random.getrandbits(128) for _ in range(64)]
    ys = [random.getrandbits(128) for _ in range(64)]
    got = tower.to_ints(LEVEL, tower.inner_product(
        LEVEL, tower.from_ints(LEVEL, xs), tower.from_ints(LEVEL, ys),
        axis=0)[None])[0]
    want = 0
    for x, y in zip(xs, ys):
        want ^= scalar.mul(LEVEL, x, y)
    assert got == want


def test_fri_fold_conformance():
    """Device FRI fold == scalar chunk-fold oracle (`layer.rs` fri_fold)."""
    from binius_tpu.ntt.additive_ntt import NTTDomain
    from binius_tpu.protocols import fri

    log_len, log_batch = 5, 1
    dom = NTTDomain.create(5, log_len + 2)
    vals = [random.getrandbits(128) for _ in range(1 << (log_len + log_batch))]
    challenges = [random.getrandbits(128) for _ in range(log_batch + 2)]
    folded = fri.fold_interleaved(dom, tower.from_ints(LEVEL, vals),
                                  challenges, log_len, log_batch)
    got = tower.to_ints(LEVEL, folded)
    tensor = fri.eq_tensor_scalar_ordered(challenges[:log_batch])
    chunk = 1 << (len(challenges) - log_batch)
    for ci in range(len(got)):
        sub = vals[ci * chunk * (1 << log_batch):(ci + 1) * chunk * (1 << log_batch)]
        want = fri.fold_interleaved_chunk_scalar(
            dom, log_len, log_batch, ci, sub, tensor, challenges[log_batch:])
        assert got[ci] == want


def test_rs_encode_conformance():
    """Device NTT encode == scalar NTT mirror."""
    from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain

    log_y = 4
    dom = NTTDomain.create(5, log_y + 1)
    ntt = AdditiveNTT(dom)
    vals = [random.getrandbits(32) for _ in range(1 << log_y)]
    dev = tower.to_ints(5, ntt.forward(tower.from_ints(5, vals), 5, (0, log_y, 0)))
    host = ntt.forward_scalar(vals, 5, log_y)
    assert dev == host
