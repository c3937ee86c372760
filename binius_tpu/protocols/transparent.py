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
        if self.index >= (1 << self.n_vars):
            return 1  # full mask (arbitrary-spec table at a po2 size)
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
class StructuredArith:
    """MLE-structured column: values are a multilinear arithmetic expression
    of the hypercube index bits (var i = bit i of the index, LSB first).

    TPU-native form of the reference's `MultilinearPolyVariant::Structured`
    (`oracle/multilinear.rs:706`, `m3/src/builder/structured.rs`): because the
    expression is multilinear, its evaluation at an arbitrary point IS the MLE
    evaluation, so the verifier evaluates it succinctly while the prover
    materializes it with one device kernel over the index bits.
    """

    expr: object  # ArithExpr over n_vars index-bit variables, multilinear
    n_vars: int
    level: int = 7

    def __post_init__(self):
        assert _is_multilinear(self.expr), \
            "structured column expression must be multilinear in the index bits"

    def evaluate_scalar(self, q: list[int]) -> int:
        return self.expr.evaluate_scalar(LEVEL, list(q))

    def mle(self):
        import jax.numpy as jnp

        n = self.n_vars
        iota = jnp.arange(1 << n, dtype=jnp.uint32)
        bits = [tower.embed(0, LEVEL, (iota >> i) & 1) for i in range(n)]
        vals = self.expr.evaluate(LEVEL, bits)
        if self.level < LEVEL:
            coords = tower.split_to_subfield(LEVEL, self.level, vals)
            return self.level, coords[..., 0]
        return LEVEL, vals


def _is_multilinear(expr) -> bool:
    """Degree <= 1 in every individual variable (products of distinct vars
    are fine)."""
    from ..math.arith import ArithExpr

    def rec(e) -> dict:
        # returns max per-var degree map
        if e.op == "const":
            return {}
        if e.op == "var":
            return {e.value: 1}
        if e.op == "pow":
            inner = rec(e.args[0])
            return {k: v * e.value for k, v in inner.items()}
        l, r = rec(e.args[0]), rec(e.args[1])
        out = dict(l)
        if e.op == "add":
            for k, v in r.items():
                out[k] = max(out.get(k, 0), v)
        else:  # mul
            for k, v in r.items():
                out[k] = out.get(k, 0) + v
        return out

    try:
        degs = rec(expr)
    except AttributeError:
        return True
    return all(v <= 1 for v in degs.values())


def incrementing_expr(max_size_log: int):
    """sum_i X_i * beta_i: the Incrementing structured column
    (`builder/structured.rs:73-81`)."""
    from ..math.arith import ArithExpr

    e = None
    for i in range(max_size_log):
        term = ArithExpr.var(i) * ArithExpr.const(1 << i, 7)
        e = term if e is None else e + term
    return e


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


@dataclasses.dataclass(frozen=True)
class SelectRow:
    """1 at exactly one hypercube index, 0 elsewhere — boundary constraints
    (`transparent/select_row.rs:11-46`): the MLE is eq(bits(index), X)."""

    n_vars: int
    index: int
    level: int = 0

    def __post_init__(self):
        assert 0 <= self.index < (1 << self.n_vars)

    def evaluate_scalar(self, q: list[int]) -> int:
        acc = 1
        for k in range(self.n_vars):
            bit = (self.index >> k) & 1
            acc = scalar.mul(LEVEL, acc, q[k] if bit else q[k] ^ 1)
        return acc

    def mle(self):
        vals = [1 if i == self.index else 0 for i in range(1 << self.n_vars)]
        return 0, tower.from_ints(0, vals)


@dataclasses.dataclass(frozen=True)
class TowerBasis:
    """beta_v basis column of T_{iota+kappa} over T_iota
    (`transparent/tower_basis.rs`): value at hypercube index v is the basis
    element 1 << (v << iota) in the canonical packing."""

    kappa: int
    iota: int

    @property
    def n_vars(self) -> int:
        return self.kappa

    @property
    def level(self) -> int:
        return self.iota + self.kappa

    def evaluate_scalar(self, q: list[int]) -> int:
        acc = 0
        for v in range(1 << self.kappa):
            term = 1 << (v << self.iota)
            for k in range(self.kappa):
                bit = (v >> k) & 1
                term = scalar.mul(LEVEL, term, q[k] if bit else q[k] ^ 1)
            acc ^= term
        return acc

    def mle(self):
        vals = [1 << (v << self.iota) for v in range(1 << self.kappa)]
        return self.level, tower.from_ints(self.level, vals)


@dataclasses.dataclass(frozen=True)
class DisjointProduct:
    """Product of two transparents over disjoint variables: poly0 takes the
    LOW n0 variables, poly1 the high ones (`transparent/disjoint_product.rs`)."""

    poly0: object
    poly1: object

    @property
    def n_vars(self) -> int:
        return self.poly0.n_vars + self.poly1.n_vars

    @property
    def level(self) -> int:
        return max(self.poly0.level, self.poly1.level)

    def evaluate_scalar(self, q: list[int]) -> int:
        n0 = self.poly0.n_vars
        return scalar.mul(LEVEL, self.poly0.evaluate_scalar(q[:n0]),
                          self.poly1.evaluate_scalar(q[n0:]))

    def mle(self):
        l0, d0 = self.poly0.mle()
        l1, d1 = self.poly1.mle()
        lvl = max(l0, l1, 5)  # keep integer-exact lane ops simple: promote
        if l0 < lvl:
            d0 = tower.embed(l0, lvl, d0)
        if l1 < lvl:
            d1 = tower.embed(l1, lvl, d1)
        if tower.has_limb_dim(lvl):
            prod = tower.mul(lvl, d1[:, None, :], d0[None, :, :])
            return lvl, prod.reshape((1 << self.n_vars, tower.n_limbs(lvl)))
        prod = tower.mul(lvl, d1[:, None], d0[None, :])
        return lvl, prod.reshape((1 << self.n_vars,))
