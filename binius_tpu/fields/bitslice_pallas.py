"""Pallas-fused bitsliced B128 multiplication.

The jnp bitslice path (`bitslice.py`) is HBM-bound: XLA materializes a large
fraction of the ~14k intermediate bit-planes of the Karatsuba gate network in
HBM (~5.5 GB of plane traffic at 2^20 elements -> 250 Melem/s measured on
v5e, round 2b). This kernel keeps the ENTIRE network in VMEM (381.5 Melem/s
end-to-end with the in-kernel transposes): each grid step loads one
(8, 128)-word tile per input plane (256 VPU tiles in), runs the full
2187-AND / ~14k-XOR network on registers/VMEM, and writes 128 output tiles.

Back-of-envelope on v5e: 16k VPU ops x (8x128) lanes per block of 2^15
elements ~ 16k cycles -> ~2 elem/cycle ~ 1.8 Gelem/s compute ceiling, vs
the 17 Gelem/s HBM ceiling at 48 B/elem — compute-bound, ~11x over the
unfused path.

Counterpart of the reference's byte-sliced arch kernels
(`crates/field/src/arch/x86_64/byte_sliced/`), on the VPU instead of AVX512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import bitslice, tower

# One block = 16 sublanes x 128 lanes of uint32 words per plane = 2^11 words
# = 2^16 packed elements per grid step (measured best on v5e; SUB=8 was ~8%
# slower — per-op issue overhead).
SUB = 16
LANE = 128
BLOCK_WORDS = SUB * LANE


def _mul_kernel(nb: int, a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(nb)]
    b = [b_ref[i] for i in range(nb)]
    out = bitslice._mul_bs(nb.bit_length() - 1, a, b)
    for i in range(nb):
        o_ref[i] = out[i]


# ---------------------------------------------------------------------------
# In-kernel 32x32 bit transpose. The XLA formulation (bitslice._transpose32)
# materializes every masked-shift round in HBM (~5.3 ms at 2^20 elements,
# 60x off the HBM bound); here the five rounds run on one VMEM-resident
# (32, LANE_T) tile using sublane rolls, so the layout transform costs one
# HBM read + one write. Row pairing follows Hacker's Delight 7-3 exactly as
# bitslice._transpose32 (the correctness oracle in tests).
# ---------------------------------------------------------------------------

LANE_T = 512  # words per transpose grid step (4 lane-tiles wide)


def _transpose32_kernel(m_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu

    x = m_ref[0]  # (32, LANE_T)
    row = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0)
    for mask, j in zip(bitslice._MASKS, (16, 8, 4, 2, 1)):
        keep = jnp.uint32(~mask)
        up = pltpu.roll(x, 32 - j, axis=0)  # at a low row k: partner x[k + j]
        dn = pltpu.roll(x, j, axis=0)   # at a high row k: partner x[k - j]
        t_low = (x ^ (up << j)) & keep
        t_high = ((dn ^ (x << j)) & keep) >> j
        x = x ^ jnp.where((row & j) == 0, t_low, t_high)
    o_ref[0] = x


@jax.jit
def transpose32(m):
    """Bit-transpose each 32x32 block of m [G, 32, W] uint32 (same contract
    as bitslice._transpose32); W padded to LANE_T internally."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    groups, _, n_words = m.shape
    pad = -n_words % LANE_T
    if pad:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, pad)))
    spec = pl.BlockSpec((1, 32, LANE_T), lambda g, w: (g, 0, w),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _transpose32_kernel,
        out_shape=jax.ShapeDtypeStruct(m.shape, jnp.uint32),
        grid=(groups, m.shape[2] // LANE_T),
        in_specs=[spec],
        out_specs=spec,
    )(m)
    return out[:, :, :n_words]


@functools.partial(jax.jit, static_argnums=0)
def mul_planes(level: int, a_planes, b_planes):
    """Bitsliced multiply on [2^level, n_words] planes; n_words must be a
    multiple of 1024 (pad upstream). Semantics = bitslice.mul_planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = 1 << level
    n_words = a_planes.shape[1]
    pad = -n_words % BLOCK_WORDS  # zero words are absorbing for the network
    if pad:
        a_planes = jnp.pad(a_planes, ((0, 0), (0, pad)))
        b_planes = jnp.pad(b_planes, ((0, 0), (0, pad)))
    padded = n_words + pad
    n_blocks = padded // BLOCK_WORDS
    a3 = a_planes.reshape(nb, padded // LANE, LANE)
    b3 = b_planes.reshape(nb, padded // LANE, LANE)
    spec = pl.BlockSpec((nb, SUB, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mul_kernel, nb),
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(a3, b3)
    return out.reshape(nb, padded)[:, :n_words]


def to_bitsliced(level: int, a):
    """bitslice.to_bitsliced with the masked-shift rounds in the VMEM
    kernel; the single axis relayout stays in XLA."""
    nb = 1 << level
    if not tower.has_limb_dim(level):
        a = a[..., None]
    n = a.shape[0]
    assert n % 32 == 0, n
    limbs = a.shape[-1]
    m = jnp.transpose(a.reshape(n // 32, 32, limbs), (2, 1, 0))
    return transpose32(m).reshape(limbs * 32, n // 32)[:nb]


def from_bitsliced(level: int, planes):
    """Inverse of :func:`to_bitsliced` (the 32x32 bit transpose is an
    involution per block)."""
    nb = 1 << level
    nw = planes.shape[1]
    limbs = max(1, nb // 32)
    if nb < 32:
        planes = jnp.concatenate(
            [planes, jnp.zeros((32 - nb, nw), dtype=jnp.uint32)], axis=0)
    t = transpose32(planes.reshape(limbs, 32, nw))
    out = jnp.transpose(t, (2, 1, 0)).reshape(nw * 32, limbs)
    if not tower.has_limb_dim(level):
        out = out[..., 0]
        if level < 5:
            out = out & jnp.uint32((1 << nb) - 1)
    return out


@functools.partial(jax.jit, static_argnums=0)
def mul(level: int, a, b):
    """Element-wise tower multiply: bit-transposes and the gate network all
    run as VMEM Pallas kernels. Batch must be a multiple of 32 elements."""
    a_bs = to_bitsliced(level, a)
    b_bs = to_bitsliced(level, b)
    return from_bitsliced(level, mul_planes(level, a_bs, b_bs))
