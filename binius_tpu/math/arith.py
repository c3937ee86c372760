"""Arithmetic expressions / circuits for composition polynomials.

TPU-native replacement of the reference's `ArithExpr`/`ArithCircuit`
(`crates/math/src/arith_expr.rs:24,224`) and `CompositionPoly`
(`crates/math/src/composition_poly.rs:14`): instead of a step-indexed
interpreter, expressions are *compiled by XLA* — `evaluate` traces tower ops
over batched arrays and jit does CSE/fusion (XLA is the `compile_expr` of
`crates/compute/src/layer.rs:57`).
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields import scalar, tower


@dataclasses.dataclass(frozen=True)
class ArithExpr:
    """Expression tree node. op in {'const','var','add','mul','pow'}."""

    op: str
    args: tuple = ()
    value: int = 0      # const: field value; var: index; pow: exponent
    level: int = 0      # const: tower level of the constant

    # -- construction ------------------------------------------------------
    @staticmethod
    def const(value: int, level: int = 0) -> "ArithExpr":
        if level == 0 and value not in (0, 1):
            raise ValueError("level-0 constant must be 0/1")
        return ArithExpr("const", (), int(value), level)

    @staticmethod
    def var(index: int) -> "ArithExpr":
        return ArithExpr("var", (), index)

    zero = staticmethod(lambda: ArithExpr.const(0))
    one = staticmethod(lambda: ArithExpr.const(1))

    def __add__(self, other):
        other = _coerce(other)
        if self.op == "const" and self.value == 0:
            return other
        if other.op == "const" and other.value == 0:
            return self
        return ArithExpr("add", (self, other))

    __sub__ = __add__  # char 2: subtraction is addition
    __xor__ = __add__

    def __mul__(self, other):
        other = _coerce(other)
        if self.op == "const" and self.value == 1 and self.level == 0:
            return other
        if other.op == "const" and other.value == 1 and other.level == 0:
            return self
        return ArithExpr("mul", (self, other))

    def __pow__(self, e: int):
        return ArithExpr("pow", (self,), int(e))

    # -- analysis ----------------------------------------------------------
    def degree(self) -> int:
        # memoized per node (verifier hot path: the front-loaded round loop
        # re-queries composite degrees every round); frozen dataclass, so
        # the cache slot is installed via object.__setattr__
        d = self.__dict__.get("_degree")
        if d is not None:
            return d
        if self.op == "const":
            d = 0
        elif self.op == "var":
            d = 1
        elif self.op == "add":
            d = max(a.degree() for a in self.args)
        elif self.op == "mul":
            d = sum(a.degree() for a in self.args)
        elif self.op == "pow":
            d = self.args[0].degree() * self.value
        else:
            raise AssertionError(self.op)
        object.__setattr__(self, "_degree", d)
        return d

    def n_vars(self) -> int:
        if self.op == "var":
            return self.value + 1
        return max((a.n_vars() for a in self.args), default=0)

    def binary_tower_level(self) -> int:
        """Smallest tower level containing all constants."""
        if self.op == "const":
            lvl = self.level
            while lvl > 0 and self.value < (1 << (1 << (lvl - 1))):
                lvl -= 1
            return lvl
        return max((a.binary_tower_level() for a in self.args), default=0)

    def vars_used(self) -> set:
        if self.op == "var":
            return {self.value}
        out = set()
        for a in self.args:
            out |= a.vars_used()
        return out

    # -- evaluation --------------------------------------------------------
    def evaluate(self, level: int, inputs):
        """Evaluate over batched arrays at tower `level`.

        ``inputs``: sequence of arrays (canonical layout at `level`), indexed
        by var index. Constants of lower level are embedded.
        """
        cache: dict[int, object] = {}

        def rec(e: "ArithExpr"):
            key = id(e)
            if key in cache:
                return cache[key]
            if e.op == "const":
                r = tower.full(level, (), e.value)
            elif e.op == "var":
                r = inputs[e.value]
            elif e.op == "add":
                r = tower.add(level, rec(e.args[0]), rec(e.args[1]))
            elif e.op == "mul":
                r = tower.mul(level, rec(e.args[0]), rec(e.args[1]))
            elif e.op == "pow":
                r = tower.pow_int(level, rec(e.args[0]), e.value)
            else:
                raise AssertionError(e.op)
            cache[key] = r
            return r

        return rec(self)

    def evaluate_scalar(self, level: int, inputs: list) -> int:
        """Host evaluation on Python ints (verifier side)."""
        if self.op == "const":
            return self.value
        if self.op == "var":
            return inputs[self.value]
        if self.op == "add":
            return self.args[0].evaluate_scalar(level, inputs) ^ self.args[1].evaluate_scalar(level, inputs)
        if self.op == "mul":
            return scalar.mul(level, self.args[0].evaluate_scalar(level, inputs),
                              self.args[1].evaluate_scalar(level, inputs))
        if self.op == "pow":
            return scalar.pow(level, self.args[0].evaluate_scalar(level, inputs), self.value)
        raise AssertionError(self.op)

    # -- structure (hashable for dedup) -------------------------------------
    @functools.cached_property
    def key(self):
        if self.op in ("const", "var"):
            return (self.op, self.value, self.level)
        return (self.op, self.value, tuple(a.key for a in self.args))

    def remap_vars(self, mapping: dict) -> "ArithExpr":
        """Rebuild with variable indices remapped. Memoized per node so the
        OBJECT-SHARING topology of the tree is preserved: canonical circuit
        emission (`constraint_system/canonical.py:_expr_steps`) mirrors the
        reference's Arc-pointer dedup via object identity, and a naive
        per-path rebuild would silently un-share every reused subtree."""
        memo: dict = {}

        def go(e):
            out = memo.get(id(e))
            if out is not None:
                return out
            if e.op == "var":
                out = ArithExpr.var(mapping[e.value])
            elif e.op == "const":
                out = e
            else:
                out = ArithExpr(e.op, tuple(go(a) for a in e.args),
                                e.value, e.level)
            memo[id(e)] = out
            return out

        return go(self)

    def serialize_tokens(self) -> tuple:
        """Canonical token stream (for constraint-system digests)."""
        if self.op == "const":
            return ("c", self.level, self.value)
        if self.op == "var":
            return ("v", self.value)
        toks = (self.op, self.value)
        for a in self.args:
            toks = toks + a.serialize_tokens()
        return toks


def _coerce(x):
    if isinstance(x, ArithExpr):
        return x
    if isinstance(x, int):
        # int constants are level-7-encodable values; find min level
        lvl = 0
        while x >= (1 << (1 << lvl)):
            lvl += 1
        return ArithExpr.const(x, lvl)
    raise TypeError(type(x))


@dataclasses.dataclass(frozen=True)
class CompositionPoly:
    """A composition polynomial C(P_0, ..., P_{m-1}) applied row-wise.

    Mirrors `CompositionPoly` (`crates/math/src/composition_poly.rs:14`).
    """

    expr: ArithExpr
    n_vars: int  # number of input multilinears m

    def degree(self) -> int:
        return self.expr.degree()

    def evaluate_batch(self, level: int, rows):
        """rows: list of m arrays of equal batch shape -> array."""
        assert len(rows) >= self.n_vars
        return self.expr.evaluate(level, rows)

    def evaluate_scalar(self, level: int, vals: list) -> int:
        return self.expr.evaluate_scalar(level, vals)


def bivariate_product() -> CompositionPoly:
    return CompositionPoly(ArithExpr.var(0) * ArithExpr.var(1), 2)
