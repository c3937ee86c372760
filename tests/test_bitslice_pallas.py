"""Pallas fused bitslice kernel (TPU-only: Mosaic has no CPU backend and
interpret mode is impractical at the network's op count). The CPU suite
skips; the kernel is exercised on hardware by examples/bench_b128_mul.py
and was validated against the scalar oracle on a v5e."""

import random

import jax
import pytest

from binius_tpu.fields import bitslice, tower

random.seed(17)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel needs a TPU backend")
def test_pallas_mul_matches_bitslice():
    from binius_tpu.fields import bitslice_pallas

    n = 32 * 1024
    xs = [random.getrandbits(128) for _ in range(n)]
    ys = [random.getrandbits(128) for _ in range(n)]
    a = tower.from_ints(7, xs)
    b = tower.from_ints(7, ys)
    got = tower.to_ints(7, bitslice_pallas.mul(7, a, b))
    want = tower.to_ints(7, bitslice.mul(7, a, b))
    assert got == want
