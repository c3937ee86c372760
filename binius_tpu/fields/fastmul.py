"""MXU-accelerated tower field multiplication (TPU fast path).

The portable base case in :mod:`tower` resolves B8 products through a 64KB
gather table — slow on TPU. This module replaces the base case with a
bit-matrix formulation that rides the MXU (the TPU-native analog of the
reference's GFNI strategy, `crates/field/src/arch/x86_64/gfni/`):

    out_bits[n, k] = parity( sum_{i,j} a_bits[n,i] * b_bits[n,j] * T[i,j,k] )

computed as an outer product (VPU) followed by an f32 matmul with the 64x8
multiplication tensor (exact: counts <= 64 < 2^24). The Karatsuba ladder of
:func:`tower.mul` stays in packed uint32 ops; all three base products of a
level-4 multiply are batched into one matmul for MXU utilization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import scalar, tower


@functools.lru_cache(maxsize=None)
def _b8_mult_tensor() -> np.ndarray:
    """T[(i*8+j), k] = bit k of (x^i * x^j) in B8, as float32 [64, 8]."""
    t = np.zeros((64, 8), dtype=np.float32)
    for i in range(8):
        for j in range(8):
            p = scalar.mul(3, 1 << i, 1 << j)
            for k in range(8):
                t[i * 8 + j, k] = (p >> k) & 1
    return t


def _unpack8(a):
    """uint32[...]: value < 256 -> float32 [..., 8] bits."""
    shifts = np.arange(8, dtype=np.uint32)
    return ((a[..., None] >> shifts) & np.uint32(1)).astype(jnp.float32)


def _pack8(bits_i32):
    """int32 [..., 8] (0/1) -> uint32 [...]."""
    shifts = np.arange(8, dtype=np.uint32)
    return tower.xor_reduce(bits_i32.astype(jnp.uint32) << shifts, axis=-1)


def mul_b8_batch(pairs):
    """Multiply a batch of B8 pairs: pairs (..., 2) uint32 -> (...) uint32.

    All pairs across the whole Karatsuba tree are flattened into ONE base-mul
    op: an MXU matmul on TPU, a single 64KB-table gather elsewhere (one
    gather HLO instead of 81 — XLA:CPU compile time of gather-heavy graphs
    dominated round-2 profiling).
    """
    if tower._b8_impl() != "mxu":
        idx = (pairs[..., 0] << 8) | pairs[..., 1]
        return jnp.take(jnp.asarray(tower._b8_mul_flat()), idx, axis=0).astype(jnp.uint32)
    a_bits = _unpack8(pairs[..., 0])                   # (..., 8)
    b_bits = _unpack8(pairs[..., 1])
    outer = (a_bits[..., :, None] * b_bits[..., None, :]).reshape(*pairs.shape[:-1], 64)
    m = jnp.asarray(_b8_mult_tensor())
    counts = jax.lax.dot_general(
        outer, m, dimension_numbers=(((outer.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return _pack8(counts.astype(jnp.int32) & 1)


def _collect_b8_products(level: int, a, b, out_pairs: list):
    """Walk the Karatsuba tree collecting all B8 operand pairs; returns a
    closure that consumes the product list (in the same order) and rebuilds
    the result with packed XOR glue."""
    if level <= 3:
        idx = len(out_pairs)
        out_pairs.append((a, b))
        return lambda prods: prods[idx]
    a0, a1 = tower._split(level, a)
    b0, b1 = tower._split(level, b)
    f0 = _collect_b8_products(level - 1, a0, b0, out_pairs)
    f2 = _collect_b8_products(level - 1, a1, b1, out_pairs)
    f1 = _collect_b8_products(level - 1, a0 ^ a1, b0 ^ b1, out_pairs)

    def rebuild(prods):
        z0 = f0(prods)
        z2 = f2(prods)
        z1 = f1(prods) ^ z0 ^ z2
        return tower._join(level, z0 ^ z2, z1 ^ tower.mul_alpha(level - 1, z2))

    return rebuild


def _mul_collect_core(level: int, a, b):
    pairs: list = []
    rebuild = _collect_b8_products(level, a, b, pairs)
    stacked = jnp.stack([jnp.stack(p, axis=-1) for p in pairs], axis=-2)  # (..., P, 2)
    prods = mul_b8_batch(stacked)                                         # (..., P)
    prod_list = [prods[..., i] for i in range(len(pairs))]
    return rebuild(prod_list)


#: Max base products per fused kernel. At level 7 a 2^20-element batch is
#: 81*2^20 ~ 2^26.3 pairs and XLA fuses the f32 outer/counts intermediates
#: away completely (measured HBM-bound on v5e); at 2^24 elements the fusion
#: splits and a counts f32[n, 81, 8] buffer (2.5KB/elem) materializes — OOM.
#: Batches above the budget run chunk-at-a-time under lax.map.
PAIR_BUDGET = 1 << 27


def mul_collect(level: int, a, b):
    """MXU-path tower multiplication; same semantics as tower.mul.

    Collects every B8 base product of the Karatsuba tree into one batched
    matmul; very large batches are chunked along the leading axis so the
    per-chunk intermediates stay in XLA's fully-fused regime. Not jitted —
    callers (tower.mul) wrap it.
    """
    if level <= 3:
        return mul_b8_batch(jnp.stack([a, b], axis=-1))
    a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
    b = jnp.broadcast_to(b, a.shape)
    batch_shape = a.shape[:-1] if tower.has_limb_dim(level) else a.shape
    total = int(np.prod(batch_shape)) if batch_shape else 1
    n_pairs = 3 ** (level - 3)
    if batch_shape and total * n_pairs > PAIR_BUDGET:
        lead = batch_shape[0]
        per_lead = (total // lead) * n_pairs
        chunk = 1 << max(0, max(1, PAIR_BUDGET // per_lead).bit_length() - 1)
        if chunk < lead and lead % chunk == 0:
            af = a.reshape(lead // chunk, chunk, *a.shape[1:])
            bf = b.reshape(lead // chunk, chunk, *b.shape[1:])
            out = jax.lax.map(
                lambda ab: _mul_collect_core(level, ab[0], ab[1]), (af, bf))
            return out.reshape(lead, *out.shape[2:])
    return _mul_collect_core(level, a, b)


mul_fast = functools.partial(jax.jit, static_argnums=0)(mul_collect)


def use_fast_mul() -> None:
    """Install the MXU path as the global tower.mul base case."""
    tower._mul_b8_orig = tower._mul_b8

    def fast_b8(a, b):
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        return mul_b8_batch(jnp.stack([a, b], axis=-1))

    tower._mul_b8 = fast_b8
