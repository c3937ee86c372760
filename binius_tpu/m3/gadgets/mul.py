"""u32 multiplication gadget (schoolbook; counterpart of the schoolbook path
of `crates/m3/src/gadgets/mul.rs`).

zout = xin * yin mod 2^32 via 32 partial products summed with the ripple
adder chain:

  * multiplier bits y_i are committed as row-replicated columns, tied to
    yin by a one-hot fixed selector ((b_i + y) * onehot_i = 0) and forced
    row-constant via circular-shift equality;
  * partial product p_i = (x << i) & b_i is a committed column with the
    degree-2 constraint p + xshift * b = 0;
  * the 32 partials are added with 31 U32Add instances.
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ...protocols import shift_ind
from ..builder.table import Col, TableBuilder
from .arith import LOG_U32, U32Add

V = ArithExpr.var
M32 = 0xFFFFFFFF


@dataclasses.dataclass
class U32Mul:
    xin: Col
    yin: Col
    zout: Col
    bit_cols: list
    partial_cols: list
    adders: list

    @staticmethod
    def build(t: TableBuilder, name: str, xin: Col, yin: Col) -> "U32Mul":
        bit_cols, partial_cols, adders = [], [], []
        terms = []
        for i in range(32):
            b = t.add_committed(f"{name}.b{i}", 0, LOG_U32)
            bit_cols.append(b)
            onehot = t.add_fixed(f"{name}.oh{i}", 0,
                                 [1 if z == i else 0 for z in range(32)], LOG_U32)
            t.assert_zero(f"{name}.b{i}.tie", [b, yin, onehot],
                          (V(0) + V(1)) * V(2), group=f"{name}.bit{i}")
            b_rot = t.add_shifted(f"{name}.b{i}.rot", b, 1, LOG_U32,
                                  shift_ind.CIRCULAR_LEFT)
            t.assert_zero(f"{name}.b{i}.const", [b, b_rot], V(0) + V(1),
                          group=f"{name}.bit{i}")
            if i == 0:
                xs = xin
            else:
                xs = t.add_shifted(f"{name}.xs{i}", xin, i, LOG_U32,
                                   shift_ind.LOGICAL_RIGHT)
            p = t.add_committed(f"{name}.p{i}", 0, LOG_U32)
            t.assert_zero(f"{name}.p{i}.def", [p, xs, b], V(0) + V(1) * V(2),
                          group=f"{name}.bit{i}")
            partial_cols.append(p)
            terms.append(p)
        acc = terms[0]
        for i in range(1, 32):
            g = U32Add.build(t, f"{name}.acc{i}", acc, terms[i])
            adders.append(g)
            acc = g.zout
        return U32Mul(xin, yin, acc, bit_cols, partial_cols, adders)

    def populate(self, tw, x_rows: list, y_rows: list) -> list:
        n = len(x_rows)
        partial_vals = []
        for i in range(32):
            bits = [((y >> i) & 1) * M32 for y in y_rows]
            tw.set_packed_ints(self.bit_cols[i], bits)
            pv = [((x << i) & M32) if (y >> i) & 1 else 0
                  for x, y in zip(x_rows, y_rows)]
            tw.set_packed_ints(self.partial_cols[i], pv)
            partial_vals.append(pv)
        acc = partial_vals[0]
        for i, g in enumerate(self.adders):
            acc = g.populate(tw, acc, partial_vals[i + 1])
        return acc
