"""Unsigned u32 division gadget: p = q*div + rem with rem < q.

Counterpart of `crates/m3/src/gadgets/div.rs` (DivUU32): the 64-bit product
comes from the exp-based MulUU32, the defining identity is checked with a
64-bit ripple adder over individual bit columns, and rem < q is enforced by
a 64-bit subtraction whose sign bit must be set. q != 0 is a non-zero claim
(grand-product phase).

Unlike the vertically-packed u32 gadgets (`arith.py`, 32 values/row), these
operate on individual one-bit-per-row columns (the exp circuits need per-bit
oracles), so the carry chain links adjacent COLUMNS instead of a shifted
copy: cin_i is simply cout_{i-1}.
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ..builder.table import Col, TableBuilder
from .mul import MulUU32

V = ArithExpr.var


@dataclasses.dataclass
class WideAdd:
    """z = x + y over n individual bit columns (`gadgets/add.rs` WideAdd).

    Commits carry-out bits; z bits are committed too (the consumer usually
    constrains them against other columns). Constraints per bit i:
        cout_i + x_i*y_i + cin_i*(x_i + y_i) = 0
        z_i + x_i + y_i + cin_i = 0
    with cin_0 = 0 and cin_i = cout_{i-1}.
    """

    x_bits: list
    y_bits: list
    z_bits: list
    cout_bits: list

    @staticmethod
    def build(t: TableBuilder, name: str, x_bits: list, y_bits: list) -> "WideAdd":
        n = len(x_bits)
        assert len(y_bits) == n
        z_bits = [t.add_committed(f"{name}.z{i}", 0, 0) for i in range(n)]
        cout = [t.add_committed(f"{name}.c{i}", 0, 0) for i in range(n)]
        for i in range(n):
            if i == 0:
                t.assert_zero(f"{name}.carry0", [x_bits[0], y_bits[0], cout[0]],
                              V(0) * V(1) + V(2), group=f"{name}.bit")
                t.assert_zero(f"{name}.sum0", [x_bits[0], y_bits[0], z_bits[0]],
                              V(0) + V(1) + V(2), group=f"{name}.bit")
            else:
                cin = cout[i - 1]
                t.assert_zero(f"{name}.carry{i}",
                              [x_bits[i], y_bits[i], cin, cout[i]],
                              V(0) * V(1) + V(2) * (V(0) + V(1)) + V(3),
                              group=f"{name}.bitc")
                t.assert_zero(f"{name}.sum{i}",
                              [x_bits[i], y_bits[i], cin, z_bits[i]],
                              V(0) + V(1) + V(2) + V(3), group=f"{name}.bitc")
        return WideAdd(x_bits, y_bits, z_bits, cout)

    def populate(self, tw, x_rows: list, y_rows: list) -> list:
        """x_rows/y_rows: n-bit ints per row; fills z and carry bits."""
        n = len(self.x_bits)
        mask = (1 << n) - 1
        z_rows, c_rows = [], []
        for x, y in zip(x_rows, y_rows):
            z_rows.append((x + y) & mask)
            carries, cin = 0, 0
            for i in range(n):
                xi, yi = (x >> i) & 1, (y >> i) & 1
                cin = (xi & yi) | (cin & (xi ^ yi))
                carries |= cin << i
            c_rows.append(carries)
        for i in range(n):
            tw.set_column(self.z_bits[i], [(z >> i) & 1 for z in z_rows])
            tw.set_column(self.cout_bits[i], [(c >> i) & 1 for c in c_rows])
        return z_rows


@dataclasses.dataclass
class WideSub:
    """z = x - y over n individual bit columns (borrow chain analog)."""

    x_bits: list
    y_bits: list
    z_bits: list
    bout_bits: list

    @staticmethod
    def build(t: TableBuilder, name: str, x_bits: list, y_bits: list) -> "WideSub":
        n = len(x_bits)
        assert len(y_bits) == n
        z_bits = [t.add_committed(f"{name}.z{i}", 0, 0) for i in range(n)]
        bout = [t.add_committed(f"{name}.b{i}", 0, 0) for i in range(n)]
        one = ArithExpr.const(1)
        for i in range(n):
            if i == 0:
                # borrow0 = (1+x)*y ; z0 = x + y
                t.assert_zero(f"{name}.borrow0", [x_bits[0], y_bits[0], bout[0]],
                              (V(0) + one) * V(1) + V(2), group=f"{name}.bit")
                t.assert_zero(f"{name}.diff0", [x_bits[0], y_bits[0], z_bits[0]],
                              V(0) + V(1) + V(2), group=f"{name}.bit")
            else:
                bin_ = bout[i - 1]
                # borrow = (1+x+bin)(y+bin) + bin ; z = x + y + bin
                t.assert_zero(f"{name}.borrow{i}",
                              [x_bits[i], y_bits[i], bin_, bout[i]],
                              (V(0) + V(2) + one) * (V(1) + V(2)) + V(2) + V(3),
                              group=f"{name}.bitb")
                t.assert_zero(f"{name}.diff{i}",
                              [x_bits[i], y_bits[i], bin_, z_bits[i]],
                              V(0) + V(1) + V(2) + V(3), group=f"{name}.bitb")
        return WideSub(x_bits, y_bits, z_bits, bout)

    def populate(self, tw, x_rows: list, y_rows: list) -> list:
        n = len(self.x_bits)
        mask = (1 << n) - 1
        z_rows, b_rows = [], []
        for x, y in zip(x_rows, y_rows):
            z_rows.append((x - y) & mask)
            borrows, bin_ = 0, 0
            for i in range(n):
                xi, yi = (x >> i) & 1, (y >> i) & 1
                bin_ = ((1 ^ xi) & (yi | bin_)) | (xi & yi & bin_)
                borrows |= bin_ << i
            b_rows.append(borrows)
        for i in range(n):
            tw.set_column(self.z_bits[i], [(z >> i) & 1 for z in z_rows])
            tw.set_column(self.bout_bits[i], [(b >> i) & 1 for b in b_rows])
        return z_rows


@dataclasses.dataclass
class DivUU32:
    """p = q * out_div + out_rem, out_rem < q, q != 0 (`div.rs:22-129`)."""

    p_bits: list
    q_bits: list
    div_bits: list
    rem_bits: list
    mul: MulUU32
    sum: WideAdd
    cmp: WideSub
    q_in: Col

    @staticmethod
    def build(t: TableBuilder, name: str = "div") -> "DivUU32":
        zero = t.add_constant(f"{name}.zero", 0, 0)
        p_bits = [t.add_committed(f"{name}.p{i}", 0, 0) for i in range(32)]
        q_bits = [t.add_committed(f"{name}.q{i}", 0, 0) for i in range(32)]
        div_bits = [t.add_committed(f"{name}.d{i}", 0, 0) for i in range(32)]
        rem_bits = [t.add_committed(f"{name}.r{i}", 0, 0) for i in range(32)]

        mul = MulUU32.build(t, f"{name}.mul", x_bits=q_bits, y_bits=div_bits)
        t.assert_nonzero(mul.xin)  # q != 0 (`div.rs:61`)

        product64 = mul.out_low_bits + mul.out_high_bits
        rem64 = rem_bits + [zero] * 32
        q64 = q_bits + [zero] * 32

        # p == q*div + rem in 64 bits (`div.rs:72-89`)
        s = WideAdd.build(t, f"{name}.sum", product64, rem64)
        for i in range(64):
            want = p_bits[i] if i < 32 else zero
            t.assert_zero(f"{name}.division_satisfied[{i}]",
                          [s.z_bits[i], want], V(0) + V(1),
                          group=f"{name}.divsat")

        # rem < q: (rem - q) in 64 bits has its sign bit set (`div.rs:91-104`)
        cmp = WideSub.build(t, f"{name}.cmp", rem64, q64)
        t.assert_zero(f"{name}.less_than", [cmp.z_bits[63]],
                      V(0) + ArithExpr.const(1), group=f"{name}.lt")
        return DivUU32(p_bits, q_bits, div_bits, rem_bits, mul, s, cmp, mul.xin)

    def populate(self, tw, p_rows: list, q_rows: list) -> tuple:
        """Returns (div_rows, rem_rows); q must be non-zero everywhere."""
        div_rows = [p // q for p, q in zip(p_rows, q_rows)]
        rem_rows = [p % q for p, q in zip(p_rows, q_rows)]
        for i in range(32):
            tw.set_column(self.p_bits[i], [(v >> i) & 1 for v in p_rows])
            tw.set_column(self.q_bits[i], [(v >> i) & 1 for v in q_rows])
            tw.set_column(self.rem_bits[i], [(v >> i) & 1 for v in rem_rows])
        self.mul.populate(tw, q_rows, div_rows)
        prod = [q * d for q, d in zip(q_rows, div_rows)]
        self.sum.populate(tw, prod, rem_rows)
        self.cmp.populate(tw, rem_rows, q_rows)
        return div_rows, rem_rows
