"""Pallas-fused bitsliced B128 multiplication.

The jnp bitslice path (`bitslice.py`) is HBM-bound: XLA materializes a large
fraction of the ~14k intermediate bit-planes of the Karatsuba gate network in
HBM (~5.5 GB of plane traffic at 2^20 elements -> 161 Melem/s measured on
v5e). This kernel keeps the ENTIRE network in VMEM: each grid step loads one
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

from . import bitslice

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


@functools.partial(jax.jit, static_argnums=0)
def mul(level: int, a, b):
    """Element-wise tower multiply: bit-transpose in XLA, gate network in one
    fused Pallas kernel. Batch must be a multiple of 32 elements."""
    a_bs = bitslice.to_bitsliced(level, a)
    b_bs = bitslice.to_bitsliced(level, b)
    return bitslice.from_bitsliced(level, mul_planes(level, a_bs, b_bs))
