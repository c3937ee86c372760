"""JAX array operations for Fan-Paar binary tower fields (device layer).

Canonical device layout (TPU-first, replaces the reference's underlier /
packed-width zoo — `crates/field/src/packed.rs:35`, `arch/arch_optimal.rs`):

  * level 0..5 (B1..B32):  one element per ``uint32`` lane, value in the low
    ``2^level`` bits.
  * level 6 (B64):   trailing dim of 2 ``uint32`` limbs, little-endian.
  * level 7 (B128):  trailing dim of 4 ``uint32`` limbs, little-endian.

All functions take the tower ``level`` as a static Python int, so the Karatsuba
recursion fully unrolls at trace time into XLA-fusable bit ops plus small-table
gathers at the B8 base case.  Semantics are defined by
:mod:`binius_tpu.fields.scalar` and tested against it.

Reference behavior parity: `crates/field/src/binary_field_arithmetic.rs`
(tower multiplication), `crates/field/src/binary_field.rs` (encoding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import scalar

# Read once at import: the pallas-dispatch decision happens at TRACE time, so
# a cached jit trace would ignore later env changes anyway (set it before
# first use). "0" and "" count as enabled.
import os as _os

NO_PALLAS = _os.environ.get("BINIUS_NO_PALLAS", "") not in ("", "0")

U32 = jnp.uint32

LIMB_BITS = 32


def n_limbs(level: int) -> int:
    """uint32 limbs in the trailing dim (1 for level<=5, no trailing dim)."""
    return 1 if level <= 5 else 1 << (level - 5)


def has_limb_dim(level: int) -> bool:
    return level >= 6


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def elem_shape(level: int, shape: tuple[int, ...]) -> tuple[int, ...]:
    return (*shape, n_limbs(level)) if has_limb_dim(level) else shape


def zeros(level: int, shape: tuple[int, ...]):
    return jnp.zeros(elem_shape(level, shape), dtype=U32)


def _int_to_limbs(level: int, v: int) -> np.ndarray:
    k = n_limbs(level)
    return np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(k)], dtype=np.uint32)


def full(level: int, shape: tuple[int, ...], value: int):
    if has_limb_dim(level):
        limbs = _int_to_limbs(level, value)
        return jnp.broadcast_to(jnp.asarray(limbs), (*shape, n_limbs(level)))
    return jnp.full(shape, np.uint32(value), dtype=U32)


def from_numpy(level: int, arr: np.ndarray) -> jax.Array:
    """Vectorized numpy -> canonical device layout.

    Accepts uint32 (level<=5), uint64 (level<=6), or (..., n_limbs) uint32.
    """
    arr = np.asarray(arr)
    if level <= 5:
        return jnp.asarray(arr.astype(np.uint32))
    k = n_limbs(level)
    if arr.dtype == np.uint64 and level == 6:
        out = np.stack([(arr & 0xFFFFFFFF).astype(np.uint32), (arr >> 32).astype(np.uint32)], axis=-1)
        return jnp.asarray(out)
    assert arr.shape[-1] == k and arr.dtype == np.uint32, (arr.shape, arr.dtype)
    return jnp.asarray(arr)


def from_ints(level: int, values) -> jax.Array:
    """Python ints / iterables -> device array in canonical layout.

    Vectorized: per-element work is one u64 split at most (trace generation
    converts millions of values; the per-limb generator version dominated
    keccak trace-gen profiles)."""
    vals = values if isinstance(values, list) else list(values)
    if not has_limb_dim(level):
        return jnp.asarray(np.array(vals, dtype=np.uint32))
    k = n_limbs(level)
    if not vals:
        return jnp.zeros((0, k), dtype=U32)
    out = np.empty((len(vals), k), dtype=np.uint32)
    if level == 6:
        a = np.array(vals, dtype=np.uint64)
        out[:, 0] = a & np.uint64(0xFFFFFFFF)
        out[:, 1] = a >> np.uint64(32)
    else:  # level 7: one Python divmod per value, numpy for the rest
        M64 = (1 << 64) - 1
        lo = np.array([v & M64 for v in vals], dtype=np.uint64)
        hi = np.array([v >> 64 for v in vals], dtype=np.uint64)
        out[:, 0] = lo & np.uint64(0xFFFFFFFF)
        out[:, 1] = lo >> np.uint64(32)
        out[:, 2] = hi & np.uint64(0xFFFFFFFF)
        out[:, 3] = hi >> np.uint64(32)
    return jnp.asarray(out)


def to_ints(level: int, a) -> list[int]:
    arr = np.asarray(jax.device_get(a))
    if not has_limb_dim(level):
        return [int(x) for x in arr.reshape(-1)]
    flat = arr.reshape(-1, n_limbs(level)).astype(np.uint64)
    lo = flat[:, 0] | (flat[:, 1] << np.uint64(32))
    if n_limbs(level) == 2:
        return [int(x) for x in lo]
    hi = flat[:, 2] | (flat[:, 3] << np.uint64(32))
    return [int(l) | (int(h) << 64) for l, h in zip(lo, hi)]


def batch_shape(level: int, a) -> tuple[int, ...]:
    """Shape of the element batch (without the limb dim)."""
    return tuple(a.shape[:-1]) if has_limb_dim(level) else tuple(a.shape)


# ---------------------------------------------------------------------------
# Addition = XOR
# ---------------------------------------------------------------------------

def add(level: int, a, b):
    del level
    return jnp.bitwise_xor(a, b)


def xor_reduce(a, axis, spmd: bool = False):
    """XOR-reduction (field sum) along the given axis/axes.

    spmd=True lowers to a halving tree of elementwise XORs instead of a
    `lax.reduce` with a custom computation: GSPMD cannot partition custom
    reduction computations (UNIMPLEMENTED at compile time when the reduced
    axis is sharded over a mesh), but it partitions slices and elementwise
    ops natively. Kernels that may run on mesh-sharded operands thread this
    flag through as a static jit argument.
    """
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    axes = tuple(ax if ax >= 0 else a.ndim + ax for ax in axes)
    if not spmd:
        return jax.lax.reduce(a, np.uint32(0), jax.lax.bitwise_xor, axes)
    for ax in sorted(axes, reverse=True):
        a = _xor_reduce_tree(a, ax)
    return a


def _xor_reduce_tree(a, ax: int):
    n = a.shape[ax]
    if n == 0:
        return jnp.zeros(a.shape[:ax] + a.shape[ax + 1:], dtype=a.dtype)
    p = 1 << max(0, (n - 1).bit_length())
    if p != n:  # zero padding is the XOR identity
        pads = [(0, 0, 0)] * a.ndim
        pads[ax] = (0, p - n, 0)
        a = jax.lax.pad(a, np.zeros((), dtype=a.dtype)[()], pads)
    while p > 1:
        h = p // 2
        a = jnp.bitwise_xor(jax.lax.slice_in_dim(a, 0, h, axis=ax),
                            jax.lax.slice_in_dim(a, h, p, axis=ax))
        p = h
    return jax.lax.squeeze(a, (ax,))


def sum_elems(level: int, a, axis: int = 0):
    """Field sum of a batch of elements along a batch axis."""
    if has_limb_dim(level) and axis < 0:
        axis -= 1  # keep limb dim out of the reduction
    return xor_reduce(a, axis)


# ---------------------------------------------------------------------------
# Base-case tables (B8 and below): device-resident 64KB gather tables.
# TPU-native replacement for GFNI/table strategies
# (`crates/field/src/arch/strategies.rs`).
# ---------------------------------------------------------------------------

# NOTE: cache *numpy* arrays, never jnp arrays — a jnp array materialized
# inside a jit trace would cache a tracer and leak it into later traces.
@functools.lru_cache(maxsize=None)
def _b8_mul_flat():
    return scalar.b8_mul_table().reshape(-1)  # np.uint8[65536]


@functools.lru_cache(maxsize=None)
def _b8_square():
    return scalar.b8_square_table()


@functools.lru_cache(maxsize=None)
def _b8_invert():
    return scalar.b8_invert_table()


_B8_IMPL = None  # resolved lazily: 'mxu' on TPU backends, 'gather' elsewhere


def _b8_impl() -> str:
    global _B8_IMPL
    if _B8_IMPL is None:
        _B8_IMPL = "mxu" if jax.default_backend() in ("tpu", "axon") else "gather"
    return _B8_IMPL


def _mul_b8(a, b):
    """a, b: uint32 arrays holding values < 256."""
    if _b8_impl() == "mxu":
        from . import fastmul
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        return fastmul.mul_b8_batch(jnp.stack([a, b], axis=-1))
    idx = (a << 8) | b
    return jnp.take(_b8_mul_flat(), idx, axis=0).astype(U32)


# ---------------------------------------------------------------------------
# Split / join helpers for the Karatsuba recursion
# ---------------------------------------------------------------------------

def _split(level: int, a):
    """Element of T_level -> (lo, hi) in T_{level-1} layout."""
    if level <= 5:
        h = 1 << (level - 1)
        mask = np.uint32((1 << h) - 1)
        return a & mask, a >> h
    if level == 6:  # limbs (...,2) of B32
        return a[..., 0], a[..., 1]
    # level == 7: (...,4) -> two B64 (...,2)
    return a[..., 0:2], a[..., 2:4]


def _join(level: int, lo, hi):
    if level <= 5:
        h = 1 << (level - 1)
        return lo | (hi << h)
    if level == 6:
        return jnp.stack([lo, hi], axis=-1)
    return jnp.concatenate([lo, hi], axis=-1)


# ---------------------------------------------------------------------------
# Multiplication / square / inversion (Karatsuba over the tower)
# ---------------------------------------------------------------------------

def mul_alpha(level: int, a):
    """Multiply by X_level (level's adjoined variable)."""
    if level == 0:
        return a
    if level <= 3:
        # unrolls to the same recursion; keep in bit ops (cheap)
        pass
    a0, a1 = _split(level, a)
    return _join(level, a1, a0 ^ mul_alpha(level - 1, a1))


def _pallas_mul_operands(level: int, a, b):
    """Route big element-wise batches to the fused bitsliced Pallas kernel
    (bitslice_pallas.mul): 381 vs 31 Melem/s at B128/2^20 on v5e. Returns
    the (possibly scalar-broadcast) operand pair, or None to take the packed
    path. Gated to single-device TPU — pallas_call does not partition under
    GSPMD, and the CPU backend has no Mosaic. BINIUS_NO_PALLAS=1 disables
    (read once at import; see NO_PALLAS above)."""
    if level < 5 or NO_PALLAS:
        return None
    if jax.default_backend() not in ("tpu", "axon") or jax.device_count() != 1:
        return None
    want_nd = 2 if has_limb_dim(level) else 1
    elem_shape = (1 << (level - 5),) if has_limb_dim(level) else ()

    def batch_ok(x):
        return (getattr(x, "ndim", None) == want_nd
                and x.shape[0] % 32 == 0 and x.shape[0] >= (1 << 15)
                and (not has_limb_dim(level) or x.shape[1:] == elem_shape))

    sa, sb = getattr(a, "shape", None), getattr(b, "shape", None)
    if batch_ok(a) and sb == sa:
        return a, b
    # scalar x big-batch (the extrapolate_line hot path): broadcast the
    # scalar — one extra HBM pass, still far ahead of the packed path
    if batch_ok(a) and sb == elem_shape:
        return a, jnp.broadcast_to(b, sa)
    if batch_ok(b) and sa == elem_shape:
        return jnp.broadcast_to(a, sb), b
    return None


def mul(level: int, a, b):
    """Element-wise tower multiplication. Shapes must broadcast.

    All backends batch the Karatsuba tree's base products into one op
    (matmul on the MXU, a single table gather elsewhere) — see fastmul.
    Large TPU batches take the fused bitsliced VPU kernel.
    """
    if level <= 3:
        return _mul_b8(a, b)
    ops = _pallas_mul_operands(level, a, b)
    if ops is not None:
        from . import bitslice_pallas
        return bitslice_pallas.mul(level, *ops)
    from . import fastmul
    return fastmul.mul_collect(level, a, b)


def _scale_u32_lanes(sub_level: int, x, y):
    """x: uint32 lanes holding T_sub_level scalars; y: uint32 lanes whose
    byte/halfword fields are T_sub-or-higher coordinates. Broadcasts."""
    if sub_level == 5:
        return mul(5, x, y)
    if sub_level == 4:
        lo = y & np.uint32(0xFFFF)
        hi = y >> np.uint32(16)
        return mul(4, x, lo) | (mul(4, x, hi) << np.uint32(16))
    out = None
    for k in range(4):
        byte = (y >> np.uint32(8 * k)) & np.uint32(0xFF)
        p = _mul_b8(x, byte) << np.uint32(8 * k)
        out = p if out is None else out ^ p
    return out


def scale_subfield(sub_level: int, level: int, x, y):
    """y * embed(x) for T_sub_level scalars x: multiplication by a subfield
    scalar is coordinate-wise in ANY basis over that subfield, so this costs
    2^(level-sub_level) subfield products instead of the full Karatsuba tree
    (B8 scalar x B128: 16 base products vs 81). The analog of the
    reference's `mul_by_subfield_scalar` specializations."""
    if sub_level >= level:
        return mul(level, x, y)
    if sub_level == 0:
        xb = x[..., None] if has_limb_dim(level) and not has_limb_dim(0) else x
        return jnp.where(xb.astype(bool), jnp.broadcast_to(y, jnp.broadcast_shapes(xb.shape, y.shape)),
                         np.uint32(0))
    if level <= 5:
        return _scale_u32_lanes(sub_level, x, y)
    if sub_level <= 5:
        return _scale_u32_lanes(sub_level, x[..., None], y)
    # sub_level == 6, level == 7: two B64 coordinates
    lo = mul(6, x, y[..., 0:2])
    hi = mul(6, x, y[..., 2:4])
    return jnp.concatenate([lo, hi], axis=-1)


def square(level: int, a):
    if level <= 3:
        return jnp.take(_b8_square(), a, axis=0).astype(U32)
    a0, a1 = _split(level, a)
    s0 = square(level - 1, a0)
    s1 = square(level - 1, a1)
    return _join(level, s0 ^ s1, mul_alpha(level - 1, s1))


def is_zero(level: int, a):
    """Boolean mask of zero elements (batch shape)."""
    if has_limb_dim(level):
        return jnp.all(a == 0, axis=-1)
    return a == 0


def invert(level: int, a):
    """Element-wise inversion with the convention invert(0) = 0."""
    if level <= 3:
        return jnp.take(_b8_invert(), a, axis=0).astype(U32)
    a0, a1 = _split(level, a)
    hi_zero = is_zero(level - 1, a1)
    # General path (a1 != 0):
    d = square(level - 1, a0) ^ mul_alpha(level - 1, mul(level - 1, a0, a1)) ^ square(level - 1, a1)
    # If a1 == 0 use d = a0 so that dinv = a0^-1 and b0 = a0*... simplifies.
    d = _select(level - 1, hi_zero, a0, d)
    dinv = invert(level - 1, d)
    b0_general = mul(level - 1, a0 ^ mul_alpha(level - 1, a1), dinv)
    b1_general = mul(level - 1, a1, dinv)
    b0 = _select(level - 1, hi_zero, dinv, b0_general)
    b1 = _select(level - 1, hi_zero, jnp.zeros_like(b1_general), b1_general)
    return _join(level, b0, b1)


def _select(level: int, mask, x, y):
    """where(mask, x, y) with mask over batch shape (broadcast into limbs)."""
    if has_limb_dim(level):
        mask = mask[..., None]
    return jnp.where(mask, x, y)


def select(level: int, mask, x, y):
    return _select(level, mask, x, y)


def pow_int(level: int, a, e: int):
    """Raise every element to the fixed integer power e (unrolled)."""
    r = full(level, batch_shape(level, a), 1)
    base = a
    while e:
        if e & 1:
            r = mul(level, r, base)
        base = square(level, base)
        e >>= 1
    return r


# ---------------------------------------------------------------------------
# Embedding & basis decomposition (ExtensionField semantics,
# `crates/field/src/extension.rs`)
# ---------------------------------------------------------------------------

def embed(sub_level: int, level: int, a):
    """Embed T_sub_level elements into T_level (integer-identity)."""
    if sub_level == level:
        return a
    assert sub_level < level
    if level <= 5:
        return a  # same uint32 layout, value unchanged
    k = n_limbs(level)
    if sub_level <= 5:
        lo = a[..., None] if True else a
        pad = jnp.zeros((*a.shape, k - 1), dtype=U32)
        return jnp.concatenate([a[..., None], pad], axis=-1)
    # sub_level == 6, level == 7
    pad = jnp.zeros((*a.shape[:-1], k - n_limbs(sub_level)), dtype=U32)
    return jnp.concatenate([a, pad], axis=-1)


def split_to_subfield(level: int, sub_level: int, a):
    """Decompose T_level elements into 2^(level-sub_level) T_sub_level
    coefficients over the subfield basis. Returns batch shape + (n_coeffs,)."""
    if level == sub_level:
        return a[..., None] if not has_limb_dim(level) else a[..., None, :]
    n = 1 << (level - sub_level)
    sb = 1 << sub_level  # bits per coefficient
    if level <= 5:
        shifts = np.arange(n, dtype=np.uint32) * sb
        mask = np.uint32((1 << sb) - 1)
        return (a[..., None] >> shifts) & mask
    # level >= 6: limbs; coefficients are bit-slices of the limb vector.
    limbs = a  # (..., L)
    L = n_limbs(level)
    if sb >= 32:
        per = sb // 32  # limbs per coefficient
        out = limbs.reshape(*limbs.shape[:-1], n, per)
        if sub_level <= 5:
            out = out[..., 0]
        return out
    # sub-32-bit coefficients from each limb
    per_limb = 32 // sb
    shifts = np.arange(per_limb, dtype=np.uint32) * sb
    mask = np.uint32((1 << sb) - 1) if sb < 32 else np.uint32(0xFFFFFFFF)
    parts = (limbs[..., None] >> shifts) & mask  # (..., L, per_limb)
    return parts.reshape(*limbs.shape[:-1], L * per_limb)


def join_from_subfield(level: int, sub_level: int, coeffs):
    """Inverse of split_to_subfield: coeffs (..., n) -> T_level elements."""
    if level == sub_level:
        return coeffs[..., 0] if not has_limb_dim(level) else coeffs[..., 0, :]
    sb = 1 << sub_level
    if level <= 5:
        shifts = np.arange(coeffs.shape[-1], dtype=np.uint32) * sb
        return xor_reduce(coeffs << shifts, axis=-1)
    L = n_limbs(level)
    if sb >= 32:
        per = sb // 32
        if sub_level <= 5:  # sb == 32: coeff itself is one limb
            return coeffs
        return coeffs.reshape(*coeffs.shape[:-2], L)
    per_limb = 32 // sb
    n = coeffs.shape[-1]
    parts = coeffs.reshape(*coeffs.shape[:-1], L, per_limb)
    shifts = np.arange(per_limb, dtype=np.uint32) * sb
    return xor_reduce(parts << shifts, axis=-1)


# ---------------------------------------------------------------------------
# B1 packed-bit columns (32 bits / uint32 word) — witness storage layout.
# ---------------------------------------------------------------------------

def unpack_b1(packed):
    """uint32[N] with 32 bits each -> uint32[32*N] of 0/1 elements (LSB first)."""
    shifts = np.arange(32, dtype=np.uint32)
    out = (packed[..., None] >> shifts) & np.uint32(1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 32)


def pack_b1(bits_arr):
    """uint32[32*N] of 0/1 -> packed uint32[N] (LSB first)."""
    n = bits_arr.shape[-1] // 32
    parts = bits_arr.reshape(*bits_arr.shape[:-1], n, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return xor_reduce((parts & np.uint32(1)) << shifts, axis=-1)


# Pseudo-level marker for bit-packed B1 multilinears in witness dicts: data is
# uint32[N/32] words of 32 coefficients each (LSB first), so a column costs
# its information content instead of 32x (one uint32 lane per bit). Columns
# with fewer than 2^P1_MIN_VARS elements stay unpacked (level 0).
P1 = -1
P1_MIN_VARS = 7


def p1_n_elems(level: int, data) -> int:
    """Element count of a witness array, packed or not."""
    return data.shape[0] * 32 if level == P1 else data.shape[0]


def resolve_p1(level: int, data):
    """(P1, words) -> (0, unpacked 0/1 lanes); identity otherwise. The single
    chokepoint for consumers that need element-per-word layout."""
    if level == P1:
        return 0, unpack_b1(data)
    return level, data


def maybe_pack_b1(level: int, data):
    """Store-side dual of resolve_p1: bit-pack level-0 columns large enough
    to be worth it (and word-aligned); identity otherwise."""
    if level == 0 and data.ndim == 1 and data.shape[0] >= (1 << P1_MIN_VARS) \
            and data.shape[0] % 32 == 0:
        return P1, pack_b1(data)
    return level, data


# ---------------------------------------------------------------------------
# Inner products / linear maps
# ---------------------------------------------------------------------------

def inner_product(level: int, a, b, axis: int = -1, spmd: bool = False):
    """Field dot product along a batch axis: sum_i a_i * b_i."""
    p = mul(level, a, b)
    if has_limb_dim(level):
        ax = axis if axis >= 0 else axis - 1
        return xor_reduce(p, ax, spmd=spmd)
    return xor_reduce(p, axis, spmd=spmd)


def _jit_static0(fn):
    return functools.partial(jax.jit, static_argnums=0)(fn)


# Jit the hot ops (static tower level). Python-level recursion resolves
# through these module globals, so each tower level compiles exactly once per
# shape and lands in the persistent compilation cache.
mul = _jit_static0(mul)
square = _jit_static0(square)
invert = _jit_static0(invert)
mul_alpha = _jit_static0(mul_alpha)
inner_product = jax.jit(inner_product, static_argnums=(0, 3, 4),
                        static_argnames=("axis", "spmd"))


def apply_bitmatrix(level: int, cols, x):
    """Apply an F2 linear map (list of int column masks, one per input bit)
    to a batch of T_level elements. Used for basis isomorphisms
    (canonical<->AES<->POLYVAL, `crates/field/src/linear_transformation.rs`)."""
    nb = 1 << level
    cols_arr = np.stack([_int_to_limbs(level, c) for c in cols])  # (nb, L)
    cols_j = jnp.asarray(cols_arr)  # uint32 (nb, L)
    if level <= 5:
        cols_j = cols_j[:, 0]  # (nb,)
        bits_x = (x[..., None] >> np.arange(nb, dtype=np.uint32)) & np.uint32(1)
        return xor_reduce(jnp.where(bits_x.astype(bool), cols_j, np.uint32(0)), axis=-1)
    L = n_limbs(level)
    # bits of x: (..., nb)
    per_limb = 32
    shifts = np.arange(32, dtype=np.uint32)
    bits_x = ((x[..., None] >> shifts) & np.uint32(1)).reshape(*x.shape[:-1], nb)
    sel = jnp.where(bits_x[..., None].astype(bool), cols_j, np.uint32(0))  # (..., nb, L)
    return xor_reduce(sel, axis=-2)
