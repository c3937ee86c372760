"""Arithmetic gadgets: u32 addition / subtraction / bitwise operations.

Mirrors `crates/m3/src/gadgets/{add,sub}.rs` (ripple-carry over vertically
packed B1 columns) and the bitwise example circuits.
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ...protocols import shift_ind
from ..builder.table import Col, TableBuilder

V = ArithExpr.var
LOG_U32 = 5


@dataclasses.dataclass
class U32Add:
    """zout = xin + yin (mod 2^32), via carry columns.

    Constraints (over B1 bit columns, 32 values/row):
      cin = cout >> 1 within the row block (carry into bit i = carry out of i-1)
      (xin + cin)(yin + cin) + cin + cout = 0      [carry generation]
      xin + yin + cin + zout = 0                   [sum]
    """

    xin: Col
    yin: Col
    zout: Col
    cout: Col
    cin: Col

    @staticmethod
    def build(t: TableBuilder, name: str, xin: Col, yin: Col,
              group: str = None) -> "U32Add":
        group = name if group is None else group
        zout = t.add_committed(f"{name}.zout", 0, LOG_U32)
        cout = t.add_committed(f"{name}.cout", 0, LOG_U32)
        cin = t.add_shifted(f"{name}.cin", cout, 1, LOG_U32, shift_ind.LOGICAL_LEFT)
        x, y, ci, z, co = (V(i) for i in range(5))
        t.assert_zero(f"{name}.carry", [xin, yin, cin, zout, cout],
                      (x + ci) * (y + ci) + ci + co, group=group)
        t.assert_zero(f"{name}.sum", [xin, yin, cin, zout, cout], x + y + ci + z,
                      group=group)
        return U32Add(xin, yin, zout, cout, cin)

    def populate(self, tw, x_rows, y_rows) -> "np.ndarray":
        """Fill witness columns from per-row u32 inputs; returns z values.
        Vectorized: carry-in word = (x+y) ^ x ^ y, carry-out = carry-in >> 1
        with the bit-32 overflow landing at position 31."""
        import numpy as np
        x = (x_rows.astype(np.uint64) if isinstance(x_rows, np.ndarray)
             else np.array([int(v) for v in x_rows], dtype=np.uint64))
        y = (y_rows.astype(np.uint64) if isinstance(y_rows, np.ndarray)
             else np.array([int(v) for v in y_rows], dtype=np.uint64))
        full = x + y
        cin = full ^ x ^ y
        couts = ((cin >> np.uint64(1)) & np.uint64(0x7FFFFFFF)) \
            | ((full >> np.uint64(32)) << np.uint64(31))
        z = full & np.uint64(0xFFFFFFFF)
        tw.set_packed_ints(self.zout, z)
        tw.set_packed_ints(self.cout, couts)
        return z


@dataclasses.dataclass
class U32Sub:
    """zout = xin - yin (mod 2^32), via borrow columns."""

    xin: Col
    yin: Col
    zout: Col
    bout: Col
    bin_: Col

    @staticmethod
    def build(t: TableBuilder, name: str, xin: Col, yin: Col) -> "U32Sub":
        zout = t.add_committed(f"{name}.zout", 0, LOG_U32)
        bout = t.add_committed(f"{name}.bout", 0, LOG_U32)
        bin_ = t.add_shifted(f"{name}.bin", bout, 1, LOG_U32, shift_ind.LOGICAL_LEFT)
        x, y, bi, z, bo = (V(i) for i in range(5))
        # borrow: bo = (1+x+bi)(y+bi) + bi ; z = x + y + bi
        t.assert_zero(f"{name}.borrow", [xin, yin, bin_, zout, bout],
                      (x + bi + ArithExpr.const(1)) * (y + bi) + bi + bo)
        t.assert_zero(f"{name}.diff", [xin, yin, bin_, zout, bout], x + y + bi + z)
        return U32Sub(xin, yin, zout, bout, bin_)

    def populate(self, tw, x_rows, y_rows) -> "np.ndarray":
        """Vectorized borrow chain: borrow-in word = x ^ y ^ (x-y), borrow-out
        = borrow-in >> 1 with the overall borrow (x < y) at position 31."""
        import numpy as np
        x = (x_rows.astype(np.uint64) if isinstance(x_rows, np.ndarray)
             else np.array([int(v) for v in x_rows], dtype=np.uint64))
        y = (y_rows.astype(np.uint64) if isinstance(y_rows, np.ndarray)
             else np.array([int(v) for v in y_rows], dtype=np.uint64))
        z = (x - y) & np.uint64(0xFFFFFFFF)
        bin_ = x ^ y ^ z
        bouts = ((bin_ >> np.uint64(1)) & np.uint64(0x7FFFFFFF)) \
            | ((x < y).astype(np.uint64) << np.uint64(31))
        tw.set_packed_ints(self.zout, z)
        tw.set_packed_ints(self.bout, bouts)
        return z


def u32_bitwise_and(t: TableBuilder, name: str, xin: Col, yin: Col) -> Col:
    zout = t.add_committed(f"{name}.zout", 0, LOG_U32)
    x, y, z = V(0), V(1), V(2)
    t.assert_zero(f"{name}.and", [xin, yin, zout], x * y + z)
    return zout


def u32_bitwise_xor(t: TableBuilder, name: str, xin: Col, yin: Col) -> Col:
    zout = t.add_committed(f"{name}.zout", 0, LOG_U32)
    x, y, z = V(0), V(1), V(2)
    t.assert_zero(f"{name}.xor", [xin, yin, zout], x + y + z)
    return zout


def u32_bitwise_or(t: TableBuilder, name: str, xin: Col, yin: Col) -> Col:
    zout = t.add_committed(f"{name}.zout", 0, LOG_U32)
    x, y, z = V(0), V(1), V(2)
    t.assert_zero(f"{name}.or", [xin, yin, zout], x + y + x * y + z)
    return zout
