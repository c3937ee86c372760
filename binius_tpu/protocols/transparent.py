"""Transparent (verifier-evaluable) polynomials.

Counterpart of `crates/core/src/transparent/`: each poly exposes host scalar
evaluation (verifier) and device MLE materialization (prover).
"""

from __future__ import annotations

import dataclasses

from ..fields import scalar, tower
from ..math import mle as mle_mod

LEVEL = 7


@dataclasses.dataclass(frozen=True)
class Constant:
    n_vars: int
    value: int
    level: int = 7

    def evaluate_scalar(self, point: list[int]) -> int:
        return self.value

    def mle(self):
        return self.level, tower.full(self.level, (1 << self.n_vars,), self.value)


@dataclasses.dataclass(frozen=True)
class EqIndTransparent:
    """eq(fixed_point, X) — `transparent/eq_ind.rs`."""

    point: tuple  # B128 ints
    level: int = 7

    @property
    def n_vars(self) -> int:
        return len(self.point)

    def evaluate_scalar(self, q: list[int]) -> int:
        acc = 1
        for a, b in zip(self.point, q):
            acc = scalar.mul(LEVEL, acc, scalar.mul(LEVEL, a, b) ^ scalar.mul(LEVEL, a ^ 1, b ^ 1))
        return acc

    def mle(self):
        return LEVEL, mle_mod.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(self.point)))


@dataclasses.dataclass(frozen=True)
class StepDown:
    """1 on hypercube indices < index, 0 after — padding mask
    (`transparent/step_down.rs`)."""

    n_vars: int
    index: int
    level: int = 0

    def evaluate_scalar(self, q: list[int]) -> int:
        # MLE of the indicator [i < index]: walk bits high->low.
        # f = sum over prefixes where a 0-bit of `index` is preceded by equal
        # high bits: standard product construction.
        acc = 0      # accumulated eval
        prefix = 1   # prod over processed high bits of eq(q_k, index_k)
        for k in reversed(range(self.n_vars)):
            bit = (self.index >> k) & 1
            if bit == 1:
                # indices with q_k = 0 here and high bits equal are all < index
                acc ^= scalar.mul(LEVEL, prefix, q[k] ^ 1)
                prefix = scalar.mul(LEVEL, prefix, q[k])
            else:
                prefix = scalar.mul(LEVEL, prefix, q[k] ^ 1)
        return acc

    def mle(self):
        n = 1 << self.n_vars
        vals = [1 if i < self.index else 0 for i in range(n)]
        return 0, tower.from_ints(0, vals)


@dataclasses.dataclass(frozen=True)
class StepUp:
    """0 on hypercube indices < index, 1 from index on."""

    n_vars: int
    index: int
    level: int = 0

    def evaluate_scalar(self, q: list[int]) -> int:
        down = StepDown(self.n_vars, self.index)
        return 1 ^ down.evaluate_scalar(q)

    def mle(self):
        n = 1 << self.n_vars
        vals = [0 if i < self.index else 1 for i in range(n)]
        return 0, tower.from_ints(0, vals)


@dataclasses.dataclass(frozen=True)
class MLEFromValues:
    """Multilinear with small public evaluation vector
    (`transparent/multilinear_extension.rs`)."""

    values: tuple  # 2^n_vars ints at `level`
    level: int

    @property
    def n_vars(self) -> int:
        return (len(self.values) - 1).bit_length()

    def evaluate_scalar(self, q: list[int]) -> int:
        cur = [int(v) for v in self.values]
        for r in q:
            cur = [cur[2 * i] ^ scalar.mul(LEVEL, cur[2 * i] ^ cur[2 * i + 1], r)
                   for i in range(len(cur) // 2)]
        return cur[0]

    def mle(self):
        return self.level, tower.from_ints(self.level, list(self.values))


@dataclasses.dataclass(frozen=True)
class Powers:
    """X -> prod_i base^(2^i * x_i): evals are base^0, base^1, ... base^(2^n-1)
    (`transparent/powers.rs`)."""

    n_vars: int
    base: int
    level: int = 7

    def evaluate_scalar(self, q: list[int]) -> int:
        acc = 1
        b = self.base
        for i in range(self.n_vars):
            term = 1 ^ scalar.mul(LEVEL, q[i], 1 ^ b)  # (1-x) + x*b^(2^i)
            acc = scalar.mul(LEVEL, acc, term)
            b = scalar.mul(LEVEL, b, b)
        return acc

    def mle(self):
        vals = []
        cur = 1
        for _ in range(1 << self.n_vars):
            vals.append(cur)
            cur = scalar.mul(LEVEL, cur, self.base)
        return LEVEL, tower.from_ints(LEVEL, vals)
