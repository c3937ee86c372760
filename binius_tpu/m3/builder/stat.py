"""Table statistics: proving-cost estimates per table.

Mirrors `crates/m3/src/builder/stat.rs`: committed vs virtual bits per row,
total flush count, and zero constraints grouped by (tower level, values per
row) with degree/eval-cost; `assert_zero_cost_approx` is the reference's
bits * degree * mult-cost heuristic (`stat.rs:126-144`).
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr


@dataclasses.dataclass
class EvalCost:
    """Op counts of one expression evaluation (`arith_expr.rs:1101-1146`)."""

    n_adds: int = 0
    n_muls: int = 0
    n_squares: int = 0

    def mult_cost_approx(self) -> int:
        return self.n_muls + -(-self.n_squares // 5)


def eval_cost(expr: ArithExpr) -> EvalCost:
    c = EvalCost()

    def walk(e: ArithExpr) -> None:
        if e.op == "add":
            c.n_adds += 1
        elif e.op == "mul":
            c.n_muls += 1
        elif e.op == "pow":
            # square-and-multiply: squarings = bit length - 1, muls = popcount - 1
            exp = e.value
            c.n_squares += max(0, exp.bit_length() - 1)
            c.n_muls += max(0, bin(exp).count("1") - 1)
        for a in e.args:
            walk(a)

    walk(expr)
    return c


@dataclasses.dataclass
class _Constraint:
    name: str
    degree: int
    cost: EvalCost


class TableStat:
    """Built by `TableBuilder.stat()` (`builder/table.rs:825-826`)."""

    def __init__(self, table):
        self.name = table.name
        self.bits_per_row_committed = 0
        self.bits_per_row_virtual = 0
        for cd in table.columns:
            bits = (1 << cd.col.level) << cd.col.log_values_per_row
            if cd.kind in ("committed", "static_exp", "dynamic_exp"):
                self.bits_per_row_committed += bits
            else:
                self.bits_per_row_virtual += bits
        self.total_flush_count = sum(f[3] for f in table.flushes)
        # {tower_level: {log_vpr: [_Constraint]}}
        self.constraints: dict = {}
        for name, vpr, expr, _cols, _steps in table.zero_constraints:
            self.constraints.setdefault(7, {}).setdefault(vpr, []).append(
                _Constraint(name, expr.degree(), eval_cost(expr)))

    def assert_zero_cost_approx(self) -> int:
        cost = 0
        for level, per_v in self.constraints.items():
            for v_log2, cons in per_v.items():
                for c in cons:
                    # sub-byte towers count as B8: univariate skip evaluates
                    # zerocheck constraints over B8 at minimum (stat.rs:133-137)
                    bits = max(1 << level, 8) << v_log2
                    cost += bits * c.degree * c.cost.mult_cost_approx()
        return cost

    def __str__(self) -> str:
        lines = [f"table '{self.name}':",
                 f"* bits per row: "
                 f"{self.bits_per_row_committed + self.bits_per_row_virtual}",
                 f"  committed: {self.bits_per_row_committed}",
                 f"  virtual: {self.bits_per_row_virtual}",
                 f"* total flush count: {self.total_flush_count}",
                 "* zero checks:"]
        for level in sorted(self.constraints):
            lines.append(f"  B{1 << level}:")
            for v_log2 in sorted(self.constraints[level]):
                lines.append(f"    values_per_row={1 << v_log2}:")
                for i, c in enumerate(self.constraints[level][v_log2]):
                    lines.append(
                        f"      {i + 1}. {c.name}: deg={c.degree},"
                        f"  #+={c.cost.n_adds}, #x={c.cost.n_muls},"
                        f" #^2={c.cost.n_squares}")
        lines.append(f"Total approximate assert_zero costs:"
                     f" {self.assert_zero_cost_approx()}")
        return "\n".join(lines)
