"""Barrel shifter gadget: variable u32 shift/rotate via log-stage muxes.

Counterpart of `crates/m3/src/gadgets/barrel_shifter.rs`: five mux stages,
stage k selecting between the previous value and the previous value shifted
by 2^k, controlled by bit k of the shift amount. Shift-amount bits are
committed as 32-values-per-row columns constrained to be constant within
each row (via circular-shift equality) and boolean.
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ...protocols import shift_ind
from ..builder.table import Col, TableBuilder

V = ArithExpr.var
LOG_U32 = 5

LOGICAL_LEFT = "logical_left"     # value << amount (bit z gets bit z-2^k)
LOGICAL_RIGHT = "logical_right"   # value >> amount
CIRCULAR_LEFT = "circular_left"   # rotate left


def _stage_shift(t: TableBuilder, name: str, col: Col, offset: int, kind: str) -> Col:
    """Column shift implementing the *integer* shift semantics on the
    bit-index layout (bit z of value at value-index z)."""
    # reference shift semantics make these direct: value << o IS
    # LogicalLeft(o) (out[z] = in[z-o]), value >> o IS LogicalRight(o),
    # rotate-left-by-o IS CircularLeft(o)
    if kind == LOGICAL_LEFT:
        return t.add_shifted(name, col, offset, LOG_U32, shift_ind.LOGICAL_LEFT)
    if kind == LOGICAL_RIGHT:
        return t.add_shifted(name, col, offset, LOG_U32, shift_ind.LOGICAL_RIGHT)
    if kind == CIRCULAR_LEFT:
        return t.add_shifted(name, col, offset, LOG_U32,
                             shift_ind.CIRCULAR_LEFT)
    raise ValueError(kind)


@dataclasses.dataclass
class BarrelShifter:
    input: Col
    shift_bits: list   # 5 committed bit columns (replicated across the row)
    stages: list       # committed stage outputs
    output: Col

    @staticmethod
    def build(t: TableBuilder, name: str, input_col: Col, kind: str = CIRCULAR_LEFT
              ) -> "BarrelShifter":
        shift_bits = []
        cur = input_col
        stages = []
        for k in range(5):
            b = t.add_committed(f"{name}.bit{k}", 0, LOG_U32)
            shift_bits.append(b)
            # boolean and row-constant: b*(1+b)=0 and b == rot(b, 1)
            t.assert_zero(f"{name}.bit{k}.bool", [b], V(0) * (ArithExpr.const(1) + V(0)))
            b_rot = t.add_shifted(f"{name}.bit{k}.rot", b, 1, LOG_U32,
                                  shift_ind.CIRCULAR_LEFT)
            t.assert_zero(f"{name}.bit{k}.const", [b, b_rot], V(0) + V(1))
            shifted = _stage_shift(t, f"{name}.s{k}.shift", cur, 1 << k, kind)
            out = t.add_committed(f"{name}.s{k}.out", 0, LOG_U32)
            # out = b ? shifted : cur
            t.assert_zero(f"{name}.s{k}.mux", [out, shift_bits[k], shifted, cur],
                          V(0) + V(1) * V(2) + (ArithExpr.const(1) + V(1)) * V(3))
            stages.append(out)
            cur = out
        return BarrelShifter(input_col, shift_bits, stages, cur)

    def populate(self, tw, in_rows: list, amount_rows: list, kind: str) -> list:
        out_rows = []
        M = 0xFFFFFFFF
        cur_rows = list(in_rows)
        for k in range(5):
            bit_rows = [((a >> k) & 1) * M for a in amount_rows]
            tw.set_packed_ints(self.shift_bits[k], bit_rows)
            nxt = []
            for v, a in zip(cur_rows, amount_rows):
                if (a >> k) & 1:
                    off = 1 << k
                    if kind == LOGICAL_LEFT:
                        v = (v << off) & M
                    elif kind == LOGICAL_RIGHT:
                        v = v >> off
                    else:
                        v = ((v << off) | (v >> (32 - off))) & M
                nxt.append(v)
            tw.set_packed_ints(self.stages[k], nxt)
            cur_rows = nxt
        return cur_rows
