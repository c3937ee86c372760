"""Bitsliced tower multiplication: the VPU speed-of-light path for big
element-wise field-op batches.

The TPU-native analog of the reference's byte-sliced underlier kernels
(`crates/field/src/arch/x86_64/byte_sliced/`, `packed_byte_sliced.rs`): store
bit ``b`` of 32 consecutive elements in one ``uint32`` word, so every gate of
the Karatsuba circuit processes 32 elements per lane-op. A full B128 multiply
is 3^7 = 2187 ANDs + ~14k XORs on ``[n_words]`` planes — ~500 lane-ops per
element, vs the packed path's per-element unpack/outer/pack glue. The layout
transform in/out is 5 masked-shift rounds per 32x32 bit block (Hacker's
Delight 7-3) and is negligible next to the network.

Semantics defined by :mod:`binius_tpu.fields.scalar`; tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tower

U32 = jnp.uint32

_MASKS = (np.uint32(0x0000FFFF), np.uint32(0x00FF00FF), np.uint32(0x0F0F0F0F),
          np.uint32(0x33333333), np.uint32(0x55555555))


def _transpose32(m):
    """Bit-transpose each 32x32 block: m [..., 32, W] uint32 -> t [..., 32, W]
    with t[..., b, w] bit j == m[..., j, w] bit b.

    The 32-word axis sits at position -2 (TPU sublanes) and a wide axis at -1
    (TPU lanes): every round's reshape then only regroups leading axes, which
    XLA treats as layout-trivial, and each round fuses into one elementwise
    pass. (The earlier formulation paired along a minor axis of 32, which
    quarter-filled the 128-wide lanes and forced a relayout per round —
    measured 60x off the HBM bound on v5e.)"""
    for mask, j in zip(_MASKS, (16, 8, 4, 2, 1)):
        r = m.reshape(*m.shape[:-2], -1, 2, j, m.shape[-1])
        lo, hi = r[..., 0, :, :], r[..., 1, :, :]
        t = (lo ^ (hi << j)) & ~jnp.asarray(mask)
        lo = lo ^ t
        hi = hi ^ (t >> j)
        m = jnp.stack([lo, hi], axis=-3).reshape(m.shape)
    return m


def to_bitsliced(level: int, a):
    """Canonical packed layout [N(, limbs)] -> bit planes [2^level, N/32].

    N must be a multiple of 32 (pad with zeros upstream)."""
    nb = 1 << level
    if not tower.has_limb_dim(level):
        a = a[..., None]
    n = a.shape[0]
    assert n % 32 == 0, n
    limbs = a.shape[-1]
    # [N, limbs] -> [limbs, 32, N/32] (one transpose pass), words on sublanes
    m = jnp.transpose(a.reshape(n // 32, 32, limbs), (2, 1, 0))
    t = _transpose32(m)  # [limbs, 32, N/32], row b = bit plane b
    return t.reshape(limbs * 32, n // 32)[:nb]


def from_bitsliced(level: int, planes):
    """Inverse of :func:`to_bitsliced`."""
    nb = 1 << level
    nw = planes.shape[1]
    limbs = max(1, nb // 32)
    if nb < 32:
        planes = jnp.concatenate(
            [planes, jnp.zeros((32 - nb, nw), dtype=U32)], axis=0)
    t = _transpose32(planes.reshape(limbs, 32, nw))  # [limbs, 32, N/32]
    out = jnp.transpose(t, (2, 1, 0)).reshape(nw * 32, limbs)
    if not tower.has_limb_dim(level):
        out = out[..., 0]
        if level < 5:
            out = out & np.uint32((1 << nb) - 1)
    return out


# ---------------------------------------------------------------------------
# The gate network. Elements are Python lists of bit planes (jnp [n_words]
# arrays); the recursion unrolls at trace time exactly like tower.mul's.
# ---------------------------------------------------------------------------

def _xor(a: list, b: list) -> list:
    return [x ^ y for x, y in zip(a, b)]


def _mul_alpha_bs(level: int, a: list) -> list:
    """Multiply by X_level (mirrors tower.mul_alpha:205-213)."""
    if level == 0:
        return a
    h = 1 << (level - 1)
    a0, a1 = a[:h], a[h:]
    return a1 + _xor(a0, _mul_alpha_bs(level - 1, a1))


def _mul_bs(level: int, a: list, b: list) -> list:
    """Karatsuba to the 1-bit base case (mirrors tower.mul / fastmul
    rebuild: z0^z2 low, z1 ^ alpha*z2 high)."""
    if level == 0:
        return [a[0] & b[0]]
    h = 1 << (level - 1)
    a0, a1 = a[:h], a[h:]
    b0, b1 = b[:h], b[h:]
    z0 = _mul_bs(level - 1, a0, b0)
    z2 = _mul_bs(level - 1, a1, b1)
    mid = _mul_bs(level - 1, _xor(a0, a1), _xor(b0, b1))
    z1 = _xor(mid, _xor(z0, z2))
    return _xor(z0, z2) + _xor(z1, _mul_alpha_bs(level - 1, z2))


def _square_bs(level: int, a: list) -> list:
    if level == 0:
        return a
    h = 1 << (level - 1)
    s0 = _square_bs(level - 1, a[:h])
    s1 = _square_bs(level - 1, a[h:])
    return _xor(s0, s1) + _mul_alpha_bs(level - 1, s1)


def mul_planes(level: int, a_planes, b_planes):
    """Bitsliced multiply on [2^level, n_words] plane arrays."""
    a = [a_planes[i] for i in range(1 << level)]
    b = [b_planes[i] for i in range(1 << level)]
    return jnp.stack(_mul_bs(level, a, b))


def square_planes(level: int, a_planes):
    a = [a_planes[i] for i in range(1 << level)]
    return jnp.stack(_square_bs(level, a))


@functools.partial(jax.jit, static_argnums=0)
def mul(level: int, a, b):
    """Element-wise tower multiply via the bitsliced network.

    Same semantics as tower.mul for 1-D batches whose size is a multiple
    of 32. Wins when the batch is large enough to fill the VPU (>= ~2^14);
    tower.mul's MXU path is better for small/irregular shapes.
    """
    a_bs = to_bitsliced(level, a)
    b_bs = to_bitsliced(level, b)
    return from_bitsliced(level, mul_planes(level, a_bs, b_bs))


@functools.partial(jax.jit, static_argnums=0)
def square(level: int, a):
    return from_bitsliced(level, square_planes(level, to_bitsliced(level, a)))
