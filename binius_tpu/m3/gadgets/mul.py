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
                                   shift_ind.LOGICAL_LEFT)
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

    def populate(self, tw, x_rows, y_rows) -> list:
        import numpy as np
        x = np.array([int(v) for v in x_rows], dtype=np.uint64)
        y = np.array([int(v) for v in y_rows], dtype=np.uint64)
        partial_vals = []
        for i in range(32):
            bit = (y >> np.uint64(i)) & np.uint64(1)
            tw.set_packed_ints(self.bit_cols[i], bit * np.uint64(M32))
            pv = ((x << np.uint64(i)) & np.uint64(M32)) * bit
            tw.set_packed_ints(self.partial_cols[i], pv)
            partial_vals.append(pv)
        acc = partial_vals[0]
        for i, g in enumerate(self.adders):
            acc = g.populate(tw, acc, partial_vals[i + 1])
        return [int(v) for v in acc]


def _pack_bits_expr(n: int):
    """sum_i var(i) * beta_i: packs n B1 basis bits into a tower element
    (the reference's `pack_fp`, `gadgets/util.rs`)."""
    e = None
    for i in range(n):
        term = V(i) * ArithExpr.const(1 << i, 7)
        e = term if e is None else e + term
    return e


@dataclasses.dataclass
class MulUU32:
    """Full 64-bit u32 multiplication via the GKR exponentiation phase
    (`crates/m3/src/gadgets/mul.rs:96-175`, MulUU32 = Mul<u32, 32>).

    Soundness argument (the reference's): with g a multiplicative generator
    of B64 (order 2^64 - 1) and x, y < 2^32,

        (g^x)^y = g^(out_low) * (g^(2^32))^(out_high)

    forces x*y = out_high*2^32 + out_low over the integers, up to a single
    possible wrap by ord(g) = 2^64 - 1 — which the parity constraint
    x_0 * y_0 = out_low_0 eliminates (2^64 - 1 is odd).

    Columns: 32 one-bit-per-row B1 columns per operand and per output half
    (the exp circuits consume individual bit oracles), plus B64 exp result
    columns that the PROVER fills during the exp phase — callers never
    populate them.
    """

    x_bits: list
    y_bits: list
    out_low_bits: list
    out_high_bits: list
    g_pow_x: Col
    g_pow_xy: Col
    g_pow_out_low: Col
    g_pow_out_high: Col
    xin: Col
    yin: Col
    out_low: Col
    out_high: Col

    @staticmethod
    def build(t: TableBuilder, name: str = "mul",
              x_bits: list = None, y_bits: list = None) -> "MulUU32":
        from ...fields import scalar

        if x_bits is None:
            x_bits = [t.add_committed(f"{name}.x{i}", 0, 0) for i in range(32)]
        if y_bits is None:
            y_bits = [t.add_committed(f"{name}.y{i}", 0, 0) for i in range(32)]
        g = scalar.GENERATORS[6]
        g_shift = scalar.pow(6, g, 1 << 32)

        g_pow_x = t.add_static_exp(f"{name}.g^x", x_bits, g, 6)
        g_pow_xy = t.add_dynamic_exp(f"{name}.(g^x)^y", y_bits, g_pow_x)

        out_low_bits = [t.add_committed(f"{name}.lo{i}", 0, 0) for i in range(32)]
        out_high_bits = [t.add_committed(f"{name}.hi{i}", 0, 0) for i in range(32)]

        g_pow_out_low = t.add_static_exp(f"{name}.g^lo", out_low_bits, g, 6)
        g_pow_out_high = t.add_static_exp(f"{name}.(g^2^32)^hi", out_high_bits,
                                          g_shift, 6)

        # `mul.rs:161`: bit-0 parity pins down the possible ord(g) wrap.
        t.assert_zero(f"{name}.order_non_wrapping",
                      [x_bits[0], y_bits[0], out_low_bits[0]],
                      V(0) * V(1) + V(2), group=f"{name}.parity")
        # `mul.rs:162`
        t.assert_zero(f"{name}.exponentiation_equality",
                      [g_pow_xy, g_pow_out_low, g_pow_out_high],
                      V(0) + V(1) * V(2), group=f"{name}.expeq")

        xin = t.add_computed(f"{name}.xin", _pack_bits_expr(32), x_bits)
        yin = t.add_computed(f"{name}.yin", _pack_bits_expr(32), y_bits)
        out_low = t.add_computed(f"{name}.out_low", _pack_bits_expr(32),
                                 out_low_bits)
        out_high = t.add_computed(f"{name}.out_high", _pack_bits_expr(32),
                                  out_high_bits)
        return MulUU32(x_bits, y_bits, out_low_bits, out_high_bits,
                       g_pow_x, g_pow_xy, g_pow_out_low, g_pow_out_high,
                       xin, yin, out_low, out_high)

    def populate(self, tw, x_rows, y_rows) -> tuple:
        """Fill the bit columns; returns (out_high_rows, out_low_rows).
        Exp result columns are computed by the prover (`exp.rs:231`)."""
        import numpy as np
        x = np.array([int(v) for v in x_rows], dtype=np.uint64)
        y = np.array([int(v) for v in y_rows], dtype=np.uint64)
        p = x * y  # exact: 32x32 -> 64 bits
        lo, hi = p & np.uint64(M32), p >> np.uint64(32)
        for i in range(32):
            sh = np.uint64(i)
            one = np.uint64(1)
            tw.set_column(self.x_bits[i], ((x >> sh) & one).astype(np.uint32))
            tw.set_column(self.y_bits[i], ((y >> sh) & one).astype(np.uint32))
            tw.set_column(self.out_low_bits[i],
                          ((lo >> sh) & one).astype(np.uint32))
            tw.set_column(self.out_high_bits[i],
                          ((hi >> sh) & one).astype(np.uint32))
        return [int(v) for v in hi], [int(v) for v in lo]
