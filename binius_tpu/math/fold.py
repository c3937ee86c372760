"""Device fold kernels: bind one sumcheck variable to a challenge.

TPU equivalents of `crates/hal/src/sumcheck_folding.rs` and the fold family of
`crates/math/src/fold.rs`. Data stays in canonical layout; subfield data is
promoted to the challenge level (the reference's specialization ladder is
replaced by XLA fusion of the embed + select ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import tower


def _promote(level_a: int, a, level_b: int, b):
    if level_a == level_b:
        return level_a, a, b
    if level_a < level_b:
        return level_b, tower.embed(level_a, level_b, a), b
    return level_a, a, tower.embed(level_b, level_a, b)


def extrapolate_line(level: int, x0, x1, z):
    """x0 + (x1 + x0) * z, element-wise (z broadcasts)."""
    return tower.add(level, x0, tower.mul(level, tower.add(level, x0, x1), z))


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _fold_low_data(level: int, data, n_vars: int, r_level: int, r):
    out_level, d, rr = _promote(level, data, r_level, r)
    d = d.reshape(tower.elem_shape(out_level, (1 << (n_vars - 1), 2)))
    e0 = d[:, 0] if not tower.has_limb_dim(out_level) else d[:, 0, :]
    e1 = d[:, 1] if not tower.has_limb_dim(out_level) else d[:, 1, :]
    return extrapolate_line(out_level, e0, e1, rr)


def fold_low(level: int, data, n_vars: int, r_level: int, r):
    """Bind variable 0 (LSB): out[j] = d[2j] + r*(d[2j] + d[2j+1]).

    Returns (out_level, out_data) with 2^(n_vars-1) entries.
    """
    return max(level, r_level), _fold_low_data(level, data, n_vars, r_level, r)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _fold_high_data(level: int, data, n_vars: int, r_level: int, r):
    out_level, d, rr = _promote(level, data, r_level, r)
    half = 1 << (n_vars - 1)
    e0, e1 = d[:half], d[half:]
    return extrapolate_line(out_level, e0, e1, rr)


def fold_high(level: int, data, n_vars: int, r_level: int, r):
    """Bind variable n_vars-1 (MSB): out[i] = d[i] + r*(d[i] + d[i + half])."""
    return max(level, r_level), _fold_high_data(level, data, n_vars, r_level, r)


def zero_pad(level: int, data, n_vars: int, n_pad_vars: int, nonzero_index: int, front: bool):
    """Embed a 2^n block into a 2^(n+k) hypercube, zero elsewhere.

    `front=True` pads low variables (block at low-bits == nonzero_index is the
    data...); mirrors `zero_pad` in `crates/math/src/fold.rs:27`.
    """
    k = n_pad_vars
    if front:
        # new index = (old_index << k) | nonzero_index
        out = tower.zeros(level, (1 << n_vars, 1 << k))
        idx = nonzero_index
        if tower.has_limb_dim(level):
            out = out.at[:, idx, :].set(data)
        else:
            out = out.at[:, idx].set(data)
        return out.reshape(tower.elem_shape(level, (1 << (n_vars + k),)))
    # back: new index = (nonzero_index << n_vars) | old_index
    out = tower.zeros(level, (1 << k, 1 << n_vars))
    if tower.has_limb_dim(level):
        out = out.at[nonzero_index, :, :].set(data)
    else:
        out = out.at[nonzero_index, :].set(data)
    return out.reshape(tower.elem_shape(level, (1 << (n_vars + k),)))


def evals_01(level: int, data, n_vars: int, order_high: bool):
    """Split into (evals at X=0, evals at X=1) for the folding variable.

    order_high: bind MSB (HighToLow) — halves; else LSB (LowToHigh) — stride 2.
    """
    if order_high:
        half = 1 << (n_vars - 1)
        return data[:half], data[half:]
    d = data.reshape(tower.elem_shape(level, (1 << (n_vars - 1), 2)))
    if tower.has_limb_dim(level):
        return d[:, 0, :], d[:, 1, :]
    return d[:, 0], d[:, 1]


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 5, 6))
def _fold_middle_data(level: int, data, n_vars: int, q_level: int, q_expansion,
                      k: int, start: int):
    out_level, d, e = _promote(level, data, q_level, q_expansion)
    hi = n_vars - k - start
    d = d.reshape(tower.elem_shape(out_level, (1 << hi, 1 << k, 1 << start)))
    if tower.has_limb_dim(out_level):
        e = e[None, :, None, :]
    else:
        e = e[None, :, None]
    out = tower.inner_product(out_level, d, e, axis=1)
    return out.reshape(tower.elem_shape(out_level, (1 << (n_vars - k),)))


def fold_middle(level: int, data, n_vars: int, q_level: int, q_expansion,
                k: int, start: int):
    """Bind k variables starting at `start` to a query (given as its eq
    expansion): out[(j << start) | i] = sum_q E[q] * d[(j << (start+k)) |
    (q << start) | i] — `crates/math/src/fold.rs:189-240` fold_middle."""
    assert n_vars >= k + start
    return max(level, q_level), _fold_middle_data(level, data, n_vars, q_level,
                                                  q_expansion, k, start)
