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
@pytest.mark.parametrize("level", [5, 6, 7])
def test_pallas_mul_matches_bitslice(level):
    from binius_tpu.fields import bitslice_pallas

    n = 32 * 1024
    xs = [random.getrandbits(1 << level) for _ in range(n)]
    ys = [random.getrandbits(1 << level) for _ in range(n)]
    a = tower.from_ints(level, xs)
    b = tower.from_ints(level, ys)
    got = tower.to_ints(level, bitslice_pallas.mul(level, a, b))
    want = tower.to_ints(level, bitslice.mul(level, a, b))
    assert got == want


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel needs a TPU backend")
def test_tower_mul_dispatches_to_pallas():
    """tower.mul routes big equal-shape batches through the fused kernel
    (and agrees with the packed path it replaces)."""
    n = 1 << 15
    xs = [random.getrandbits(128) for _ in range(n)]
    ys = [random.getrandbits(128) for _ in range(n)]
    a = tower.from_ints(7, xs)
    b = tower.from_ints(7, ys)
    assert tower._pallas_mul_operands(7, a, b) is not None
    got = tower.to_ints(7, jax.jit(lambda x, y: tower.mul(7, x, y))(a, b))
    want = tower.to_ints(7, bitslice.mul(7, a, b))
    assert got == want
    # scalar-broadcast route (extrapolate_line shape)
    z = tower.from_ints(7, [xs[0]])[0]
    assert tower._pallas_mul_operands(7, a, z) is not None
    got_s = tower.to_ints(7, jax.jit(lambda x, y: tower.mul(7, x, y))(a, z))
    want_s = tower.to_ints(7, bitslice.mul(7, a, jax.numpy.broadcast_to(z, a.shape)))
    assert got_s == want_s


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel needs a TPU backend")
def test_pallas_transpose32_matches_xla():
    import numpy as np

    from binius_tpu.fields import bitslice_pallas

    rng = np.random.default_rng(23)
    m = rng.integers(0, 2**32, size=(4, 32, 800), dtype=np.uint32)
    import jax.numpy as jnp
    got = np.asarray(bitslice_pallas.transpose32(jnp.asarray(m)))
    want = np.asarray(bitslice._transpose32(jnp.asarray(m)))
    assert (got == want).all()
