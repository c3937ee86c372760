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

from ..fields import scalar
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


def evaluate_univariate(level: int, coeffs: list[int], z: int) -> int:
    """Horner evaluation, coeffs low->high."""
    acc = 0
    for c in reversed(coeffs):
        acc = scalar.mul(level, acc, z) ^ c
    return acc


def extrapolate_line_scalar(level: int, x0: int, x1: int, z: int) -> int:
    """x0 + (x1 - x0) * z (host)."""
    return x0 ^ scalar.mul(level, x0 ^ x1, z)
