"""Multilinear extensions over the boolean hypercube (TPU layer).

Semantics mirror the reference's `crates/math/src/multilinear_extension.rs` and
`multilinear_query.rs`: an n-variate multilinear polynomial is stored as its
2^n hypercube evaluations, index bit i = variable i (variable 0 is the LSB).

All heavy ops are pure-array functions (jit-friendly); :class:`MLE` is a thin
metadata wrapper used by host orchestration code.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..fields import tower


def _mesh_align(data, aux, spmd: bool):
    """Kernel-operand alignment for mesh-sharded multilinears: if `data` is
    committed to >1 device, replicate `aux` (an eq expansion / coefficient
    vector) onto the same mesh and force the SPMD-safe reduction lowering.
    Centralized here so every evalcheck/ring-switch/zerocheck call site gets
    multi-chip support without threading placement logic around."""
    from ..parallel import mesh as mesh_mod
    if mesh_mod.is_mesh_sharded(data):
        m = mesh_mod.mesh_of(data)
        if m is not None:
            return mesh_mod.put_replicated(m, aux), True
    return aux, spmd


@dataclasses.dataclass(frozen=True)
class MLE:
    """Multilinear extension: 2^n_vars evaluations of a T_level polynomial."""

    data: object  # jax array in canonical layout for `level`
    level: int
    n_vars: int

    def __post_init__(self):
        expect = tower.elem_shape(self.level, (1 << self.n_vars,))
        assert tuple(self.data.shape) == expect, (self.data.shape, expect)


@functools.partial(jax.jit, static_argnums=0)
def eq_ind_partial_eval(level: int, point):
    """Tensor-product eq-indicator expansion of a query point.

    ``point`` is a T_level element array of shape (k,) (+ limbs); the result E
    has 2^k entries with E[j] = prod_i (j_i ? r_i : 1 + r_i).  Matches
    `MultilinearQuery::expand` / `tensor_prod_eq_ind`
    (`crates/math/src/tensor_prod_eq_ind.rs`).
    """
    k = tower.batch_shape(level, point)[0]
    e = tower.full(level, (1,), 1)
    one = tower.full(level, (), 1)
    for i in range(k):
        r = point[i]
        e0 = tower.mul(level, e, tower.add(level, one, r))
        e1 = tower.mul(level, e, r)
        e = jnp.concatenate([e0, e1], axis=0)
    return e


def _promote(level_a: int, a, level_b: int, b):
    """Embed the lower-level operand; returns (level, a, b)."""
    if level_a == level_b:
        return level_a, a, b
    if level_a < level_b:
        return level_b, tower.embed(level_a, level_b, a), b
    return level_a, a, tower.embed(level_b, level_a, b)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 5, 6))
def _partial_low_data(level: int, data, n_vars: int, q_level: int, q_expansion, k: int,
                      spmd: bool = False):
    out_level, d, e = _promote(level, data, q_level, q_expansion)
    d = d.reshape(tower.elem_shape(out_level, (1 << (n_vars - k), 1 << k)))
    return tower.inner_product(out_level, d, e, axis=1, spmd=spmd)


def evaluate_partial_low(level: int, data, n_vars: int, q_level: int, q_expansion, k: int,
                         spmd: bool = False):
    """Bind the k lowest variables to a query (given as its eq expansion).

    out[j] = sum_{i < 2^k} E[i] * data[(j << k) | i].
    Returns (out_level, out_data) with 2^(n_vars-k) entries.
    """
    q_expansion, spmd = _mesh_align(data, q_expansion, spmd)
    return max(level, q_level), _partial_low_data(level, data, n_vars, q_level,
                                                  q_expansion, k, spmd)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 5, 6))
def _partial_high_data(level: int, data, n_vars: int, q_level: int, q_expansion, k: int,
                       spmd: bool = False):
    out_level, d, e = _promote(level, data, q_level, q_expansion)
    d = d.reshape(tower.elem_shape(out_level, (1 << k, 1 << (n_vars - k))))
    if tower.has_limb_dim(out_level):
        e = e[:, None, :]
    else:
        e = e[:, None]
    return tower.inner_product(out_level, d, e, axis=0, spmd=spmd)


def evaluate_partial_high(level: int, data, n_vars: int, q_level: int, q_expansion, k: int,
                          spmd: bool = False):
    """Bind the k highest variables: out[i] = sum_j E[j] * data[(j << (n-k)) | i]."""
    q_expansion, spmd = _mesh_align(data, q_expansion, spmd)
    return max(level, q_level), _partial_high_data(level, data, n_vars, q_level,
                                                   q_expansion, k, spmd)


@functools.partial(jax.jit, static_argnums=(0, 2, 4, 5))
def _batched_partial_high_data(level: int, stack, n_vars: int, eq, keep: int,
                               spmd: bool = False):
    """Batched partial-high eval: stack holds k same-shaped multilinears.

    stack: (k, 2^n_vars [, limbs]) at `level`; eq: (2^(n_vars-keep), limbs)
    B128 expansion of the bound high variables. Returns (k, 2^keep, limbs)
    B128: out[m, i] = sum_j eq[j] * stack[m, (j << keep) | i].
    """
    k = stack.shape[0]
    kh = n_vars - keep
    d = stack.reshape(tower.elem_shape(level, (k, 1 << kh, 1 << keep)))
    e = eq[None, :, None, :]  # (1, 2^kh, 1, limbs)
    if level == 0:
        p = jnp.where(d[..., None].astype(bool), jnp.broadcast_to(e, (k, 1 << kh, 1 << keep, eq.shape[-1])), jnp.uint32(0))
    else:
        p = tower.scale_subfield(level, 7, d, e)
    return tower.xor_reduce(p, axis=1, spmd=spmd)


def _pad_stack_pow2(stack):
    """Pad the leading (multilinear-count) dim to a power of two so batched
    kernels compile once per bucket, not once per exact count."""
    k = stack.shape[0]
    k_pad = 1 << max(0, (k - 1).bit_length())
    if k_pad == k:
        return stack, k
    pad = [(0, k_pad - k)] + [(0, 0)] * (stack.ndim - 1)
    return jnp.pad(stack, pad), k


#: Max B128-equivalent elements materialized per projection dispatch
#: (k * 2^n_vars): the kernel broadcasts a (k, 2^kh, 2^keep, 4) product, so
#: one unchunked dispatch at u32_add-2^22 scale (k=2, 2^27 bits) compiled to
#: a 20 GB HBM program on a 15.75 GB chip. Chunking over the REDUCED high
#: axis is exact (the weighted sum splits); 2^24 elems = 256 MB per product.
_PROJ_CHUNK_ELEMS = 1 << 24


def batched_evaluate_partial_high(level: int, stack, n_vars: int, eq, keep: int,
                                  spmd: bool = False):
    """Bind the high n_vars-keep variables of k stacked multilinears to a
    B128 query given as its eq expansion; see `_batched_partial_high_data`.

    level may be `tower.P1` (bit-packed B1 words): the stack stays packed
    across HBM and unpacks inside the kernel (fused — only the words cross).

    Large operands are streamed in high-axis chunks with XOR accumulation
    (out[m, i] = sum_j eq[j] * stack[m, (j << keep) | i] splits over j)."""
    stack, k = _pad_stack_pow2(stack)
    eq, spmd = _mesh_align(stack, eq, spmd)
    k_pad = stack.shape[0]
    kh = n_vars - keep
    total = k_pad << n_vars
    if total > _PROJ_CHUNK_ELEMS and not spmd:
        chunk_kh = max(0, (_PROJ_CHUNK_ELEMS // max(k_pad << keep, 1))
                       .bit_length() - 1)
        # packed-B1 slices must cut at 32-bit word boundaries
        while level == tower.P1 and (1 << (chunk_kh + keep)) % 32 != 0:
            chunk_kh += 1
        if chunk_kh < kh:
            sub_n = chunk_kh + keep
            acc = None
            for j0 in range(0, 1 << kh, 1 << chunk_kh):
                if level == tower.P1:
                    sub = stack[:, (j0 << keep) // 32:
                                ((j0 + (1 << chunk_kh)) << keep) // 32]
                    part = _batched_partial_high_p1(
                        sub, sub_n, eq[j0:j0 + (1 << chunk_kh)], keep, spmd)
                else:
                    sl = (slice(None), slice(j0 << keep,
                                             (j0 + (1 << chunk_kh)) << keep))
                    part = _batched_partial_high_data(
                        level, stack[sl], sub_n,
                        eq[j0:j0 + (1 << chunk_kh)], keep, spmd)
                acc = part if acc is None else acc ^ part
            return 7, acc[:k]
    if level == tower.P1:
        return 7, _batched_partial_high_p1(stack, n_vars, eq, keep, spmd)[:k]
    return 7, _batched_partial_high_data(level, stack, n_vars, eq, keep, spmd)[:k]


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def _batched_partial_high_p1(words, n_vars: int, eq, keep: int,
                             spmd: bool = False):
    return _batched_partial_high_data.__wrapped__(
        0, tower.unpack_b1(words), n_vars, eq, keep, spmd)


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def _batched_partial_low_p1(words, n_vars: int, coeffs, bind: int,
                            spmd: bool = False):
    return _batched_partial_low_data.__wrapped__(
        0, tower.unpack_b1(words), n_vars, coeffs, bind, spmd)


@functools.partial(jax.jit, static_argnums=(0, 2, 4, 5))
def _batched_partial_low_data(level: int, stack, n_vars: int, coeffs, bind: int,
                              spmd: bool = False):
    """Batched partial-low eval with an arbitrary B128 coefficient vector.

    stack: (k, 2^n_vars [, limbs]) at `level`; coeffs: (2^bind, limbs) B128.
    Returns (k, 2^(n_vars-bind), limbs) B128:
    out[m, j] = sum_i coeffs[i] * stack[m, (j << bind) | i].
    """
    k = stack.shape[0]
    d = stack.reshape(tower.elem_shape(level, (k, 1 << (n_vars - bind), 1 << bind)))
    e = coeffs[None, None, :, :]  # (1, 1, 2^bind, limbs)
    if level == 0:
        p = jnp.where(d[..., None].astype(bool),
                      jnp.broadcast_to(e, (k, 1 << (n_vars - bind), 1 << bind,
                                           coeffs.shape[-1])), jnp.uint32(0))
    else:
        p = tower.scale_subfield(level, 7, d, e)
    return tower.xor_reduce(p, axis=2, spmd=spmd)


def batched_evaluate_partial_low(level: int, stack, n_vars: int, coeffs, bind: int,
                                 spmd: bool = False):
    """Bind the low `bind` variables of k stacked multilinears with a B128
    coefficient vector (eq expansion or Lagrange coefficients).

    level may be `tower.P1` (bit-packed B1 words; unpacked inside the jit).
    Large operands stream in chunks over the KEPT high axis (independent
    output rows, concatenated) so the broadcast product fits HBM."""
    stack, k = _pad_stack_pow2(stack)
    coeffs, spmd = _mesh_align(stack, coeffs, spmd)
    k_pad = stack.shape[0]
    kh = n_vars - bind
    total = k_pad << n_vars
    if total > _PROJ_CHUNK_ELEMS and not spmd:
        chunk_kh = max(0, (_PROJ_CHUNK_ELEMS // max(k_pad << bind, 1))
                       .bit_length() - 1)
        while level == tower.P1 and (1 << (chunk_kh + bind)) % 32 != 0:
            chunk_kh += 1
        if chunk_kh < kh:
            sub_n = chunk_kh + bind
            outs = []
            for j0 in range(0, 1 << kh, 1 << chunk_kh):
                if level == tower.P1:
                    sub = stack[:, (j0 << bind) // 32:
                                ((j0 + (1 << chunk_kh)) << bind) // 32]
                    outs.append(_batched_partial_low_p1(
                        sub, sub_n, coeffs, bind, spmd))
                else:
                    sl = (slice(None), slice(j0 << bind,
                                             (j0 + (1 << chunk_kh)) << bind))
                    outs.append(_batched_partial_low_data(
                        level, stack[sl], sub_n, coeffs, bind, spmd))
            return 7, jnp.concatenate(outs, axis=1)[:k]
    if level == tower.P1:
        return 7, _batched_partial_low_p1(stack, n_vars, coeffs, bind, spmd)[:k]
    return 7, _batched_partial_low_data(level, stack, n_vars, coeffs, bind, spmd)[:k]


def evaluate(level: int, data, n_vars: int, q_level: int, point):
    """Full evaluation at a point of shape (n_vars,)."""
    e = eq_ind_partial_eval(q_level, point)
    out_level, out = evaluate_partial_low(level, data, n_vars, q_level, e, n_vars)
    return out_level, out[0] if not tower.has_limb_dim(out_level) else out[0, :]


def eq_ind(level: int, x, y):
    """eq(x, y) = prod_i (x_i y_i + (1+x_i)(1+y_i)) for points of shape (k,)."""
    one = tower.full(level, (), 1)
    t = tower.add(
        level,
        tower.mul(level, x, y),
        tower.mul(level, tower.add(level, x, one), tower.add(level, y, one)),
    )
    k = tower.batch_shape(level, t)[0]
    out = tower.full(level, (), 1)
    for i in range(k):
        out = tower.mul(level, out, t[i])
    return out
