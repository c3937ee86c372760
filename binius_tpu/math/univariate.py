"""Univariate evaluation domains, Lagrange interpolation, line extrapolation.

Host-side (Python-int) polynomial algebra mirroring
`crates/math/src/univariate.rs`; sizes here are tiny (sumcheck round polys of
degree <= ~8), so the host is the right place — device work stays batched.

All values are canonical-tower integers; domain points from a subfield embed
into the value field as the same integers (identity embedding), so arithmetic
is done at the *value* level throughout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import scalar, tower
from .binary_subspace import BinarySubspace


@dataclasses.dataclass(frozen=True)
class EvaluationDomain:
    """Finite evaluation domain: distinct points (ints) at tower `level`."""

    level: int
    points: tuple

    @staticmethod
    def from_subspace(level: int, size: int) -> "EvaluationDomain":
        """First `size` points of the canonical binary subspace enumeration
        (integers 0, 1, 2, ... — matches the default domain factory)."""
        dim = max(1, (size - 1).bit_length())
        sub = BinarySubspace.with_dim(level, dim)
        return EvaluationDomain(level, tuple(sub.get(i) for i in range(size)))

    @property
    def size(self) -> int:
        return len(self.points)

    def lagrange_evals(self, value_level: int, z: int) -> list[int]:
        """L_i(z) for all i, at the value level."""
        pts = self.points
        n = len(pts)
        out = []
        for i in range(n):
            num, den = 1, 1
            for j in range(n):
                if j == i:
                    continue
                num = scalar.mul(value_level, num, z ^ pts[j])
                den = scalar.mul(value_level, den, pts[i] ^ pts[j])
            out.append(scalar.mul(value_level, num, scalar.invert(value_level, den)))
        return out

    def extrapolate(self, value_level: int, values: list[int], z: int) -> int:
        """Evaluate the interpolating polynomial at z."""
        assert len(values) == self.size
        ls = self.lagrange_evals(value_level, z)
        acc = 0
        for v, l in zip(values, ls):
            acc ^= scalar.mul(value_level, v, l)
        return acc

    def interpolate(self, value_level: int, values: list[int]) -> list[int]:
        """Coefficients (low->high degree) of the interpolating polynomial."""
        n = self.size
        assert len(values) == n
        coeffs = [0] * n
        for i in range(n):
            # Lagrange basis poly for point i, in coefficient form
            basis = [1]
            den = 1
            for j in range(n):
                if j == i:
                    continue
                # basis *= (x + p_j)
                nxt = [0] * (len(basis) + 1)
                for d, c in enumerate(basis):
                    nxt[d] ^= scalar.mul(value_level, c, self.points[j])
                    nxt[d + 1] ^= c
                basis = nxt
                den = scalar.mul(value_level, den, self.points[i] ^ self.points[j])
            w = scalar.mul(value_level, values[i], scalar.invert(value_level, den))
            for d, c in enumerate(basis):
                coeffs[d] ^= scalar.mul(value_level, w, c)
        return coeffs


# ---------------------------------------------------------------------------
# Device Lagrange evaluation (barycentric): for the large univariate-skip
# domains (d * 2^skip points) the O(n^2) host loop above is too slow; weights
# are domain constants computed once on device, per-challenge evaluation is
# O(n) device work with two multiplicative scans.
# ---------------------------------------------------------------------------

def _tree_prod(level: int, a, axis: int):
    """Product-reduce B-level elements along `axis` via a log-depth tree."""
    n = a.shape[axis]
    a = jnp.moveaxis(a, axis, 0)
    while n > 1:
        if n % 2:
            a = jnp.concatenate([a, tower.full(level, (1, *a.shape[1:-1]), 1)], axis=0)
            n += 1
        a = tower.mul(level, a[0::2], a[1::2])
        n //= 2
    return a[0]


def _points_to_pairs(points: tuple) -> np.ndarray:
    m = np.empty((len(points), 2), dtype=np.uint64)
    for i, p in enumerate(points):
        m[i, 0] = p & 0xFFFFFFFFFFFFFFFF
        m[i, 1] = p >> 64
    return m


def _native_lib():
    from .. import native as native_mod

    return native_mod.get_lib()


def _p64(a: np.ndarray):
    import ctypes

    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


@functools.lru_cache(maxsize=None)
def _barycentric_weights_np(points: tuple) -> np.ndarray:
    """w_i = 1 / prod_{j != i} (x_i + x_j) as (n, 4) uint32 limbs (B128)."""
    n = len(points)
    lib = _native_lib()
    if lib is not None:
        # O(n^2) host muls in C: no device kernel, no compile cost.
        pts = np.ascontiguousarray(_points_to_pairs(points))
        out = np.empty((n, 2), dtype=np.uint64)
        lib.tower_barycentric_weights(_p64(pts), n, _p64(out))
        return out.view(np.uint32).reshape(n, 4)
    xs = tower.from_ints(7, list(points))
    diff = xs[:, None, :] ^ xs[None, :, :]
    eye = jnp.asarray(np.eye(n, dtype=bool))
    diff = jnp.where(eye[:, :, None], tower.full(7, (n, n), 1), diff)
    prod = _tree_prod(7, diff, axis=1)
    w = tower.invert(7, prod)
    return np.asarray(jax.device_get(w))


@jax.jit
def _lagrange_evals_jit(xs, w, z):
    """L_i(z) for all i: xs (n, 4) domain points, w (n, 4) barycentric
    weights, z (4,). Uses exclusive prefix/suffix products of (z + x_j), so
    z landing exactly on a domain point is handled without division."""
    t = z[None, :] ^ xs  # (n, 4)
    mulf = functools.partial(tower.mul, 7)
    pre = jax.lax.associative_scan(mulf, t, axis=0)
    suf = jax.lax.associative_scan(mulf, t, axis=0, reverse=True)
    one = tower.full(7, (1,), 1)
    pre_excl = jnp.concatenate([one, pre[:-1]], axis=0)
    suf_excl = jnp.concatenate([suf[1:], one], axis=0)
    return tower.mul(7, w, tower.mul(7, pre_excl, suf_excl))


def lagrange_evals_np(points: tuple, z: int) -> np.ndarray:
    """Host (n, 4) uint32 B128 array of Lagrange basis evals L_i(z)."""
    points = tuple(points)
    n = len(points)
    lib = _native_lib()
    w = _barycentric_weights_np(points)
    if lib is not None:
        pts = np.ascontiguousarray(_points_to_pairs(points))
        wp = np.ascontiguousarray(w.view(np.uint64).reshape(n, 2))
        scratch = np.empty((4 * n,), dtype=np.uint64)
        out = np.empty((n, 2), dtype=np.uint64)
        lib.tower_lagrange_evals(_p64(pts), _p64(wp), n,
                                 z & 0xFFFFFFFFFFFFFFFF, z >> 64,
                                 _p64(scratch), _p64(out))
        return out.view(np.uint32).reshape(n, 4)
    xs = tower.from_ints(7, list(points))
    zz = tower.from_ints(7, [z])[0]
    return np.asarray(jax.device_get(_lagrange_evals_jit(xs, jnp.asarray(w), zz)))


def lagrange_evals_device(points: tuple, z: int):
    """Device (n, 4) B128 array of Lagrange basis evals L_i(z) over `points`
    (canonical ints). Weights are cached per domain; the element math runs
    as native host code (O(n) muls — far below any compile cost)."""
    return jnp.asarray(lagrange_evals_np(tuple(points), z))


def evaluate_univariate(level: int, coeffs: list[int], z: int) -> int:
    """Horner evaluation, coeffs low->high."""
    acc = 0
    for c in reversed(coeffs):
        acc = scalar.mul(level, acc, z) ^ c
    return acc


def extrapolate_line_scalar(level: int, x0: int, x1: int, z: int) -> int:
    """x0 + (x1 - x0) * z (host)."""
    return x0 ^ scalar.mul(level, x0 ^ x1, z)
