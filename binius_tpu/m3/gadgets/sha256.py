"""SHA-256 compression gadget (counterpart of `crates/m3/src/gadgets/hash/sha256.rs`).

One compression per table row. All u32 words are B1 columns with 32 values
per row (bit z at value index z). Rotations/shifts are virtual shifted
columns; XOR combinations are computed (linear) columns; Ch/Maj are
committed columns with degree-2 constraints; additions reuse the ripple
U32Add gadget (committed sum + carry columns).
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ...protocols import shift_ind
from ..builder.table import Col, TableBuilder
from .arith import LOG_U32, U32Add

V = ArithExpr.var

K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]

M32 = 0xFFFFFFFF


def _rotr(t: TableBuilder, name: str, col: Col, n: int) -> Col:
    """ROTR n: out bit z = in bit (z+n)%32 -> CIRCULAR_LEFT(32-n), exactly
    the reference's lowering (`gadgets/hash/sha256.rs:582-584`)."""
    n %= 32
    if n == 0:
        return col
    return t.add_shifted(name, col, (32 - n) % 32, LOG_U32,
                         shift_ind.CIRCULAR_LEFT)


def _shr(t: TableBuilder, name: str, col: Col, n: int) -> Col:
    """SHR n: out bit z = in bit z+n -> LOGICAL_RIGHT(n) (reference
    shift semantics, `validate.rs:216-226`)."""
    return t.add_shifted(name, col, n, LOG_U32, shift_ind.LOGICAL_RIGHT)


def _xor3(t: TableBuilder, name: str, a: Col, b: Col, c: Col) -> Col:
    return t.add_computed(name, V(0) + V(1) + V(2), [a, b, c])


@dataclasses.dataclass
class Sha256:
    msg: list        # 16 committed message word Cols
    state_out: list  # 8 Cols (final a..h after adding the IV chain)
    adders: list
    ch_cols: list
    maj_cols: list
    w_cols: list     # 64 W columns (first 16 = msg)

    @staticmethod
    def build(t: TableBuilder, name: str, msg: list) -> "Sha256":
        adders, ch_cols, maj_cols = [], [], []

        def add(nm, x, y):
            g = U32Add.build(t, nm, x, y)
            adders.append(g)
            return g.zout

        # message schedule
        w = list(msg)
        for i in range(16, 64):
            s0 = _xor3(t, f"{name}.w{i}.s0",
                       _rotr(t, f"{name}.w{i}.s0a", w[i - 15], 7),
                       _rotr(t, f"{name}.w{i}.s0b", w[i - 15], 18),
                       _shr(t, f"{name}.w{i}.s0c", w[i - 15], 3))
            s1 = _xor3(t, f"{name}.w{i}.s1",
                       _rotr(t, f"{name}.w{i}.s1a", w[i - 2], 17),
                       _rotr(t, f"{name}.w{i}.s1b", w[i - 2], 19),
                       _shr(t, f"{name}.w{i}.s1c", w[i - 2], 10))
            x = add(f"{name}.w{i}.a1", w[i - 16], s0)
            y = add(f"{name}.w{i}.a2", x, w[i - 7])
            w.append(add(f"{name}.w{i}.a3", y, s1))

        # round function; initial working vars = IV constants (fixed columns)
        state = [t.add_fixed(f"{name}.iv{j}", 0,
                             [(IV[j] >> z) & 1 for z in range(32)], LOG_U32)
                 for j in range(8)]
        for r in range(64):
            a, b, c, d, e, f, g, h = state
            S1 = _xor3(t, f"{name}.r{r}.S1",
                       _rotr(t, f"{name}.r{r}.S1a", e, 6),
                       _rotr(t, f"{name}.r{r}.S1b", e, 11),
                       _rotr(t, f"{name}.r{r}.S1c", e, 25))
            ch = t.add_committed(f"{name}.r{r}.ch", 0, LOG_U32)
            t.assert_zero(f"{name}.r{r}.ch.def", [ch, e, f, g],
                          V(0) + V(1) * V(2) + (ArithExpr.const(1) + V(1)) * V(3),
                          group=f"{name}.chmaj")
            kc = t.add_fixed(f"{name}.r{r}.K", 0,
                             [(K[r] >> z) & 1 for z in range(32)], LOG_U32)
            t1a = add(f"{name}.r{r}.t1a", h, S1)
            t1b = add(f"{name}.r{r}.t1b", t1a, ch)
            t1c = add(f"{name}.r{r}.t1c", t1b, kc)
            t1 = add(f"{name}.r{r}.t1", t1c, w[r])
            S0 = _xor3(t, f"{name}.r{r}.S0",
                       _rotr(t, f"{name}.r{r}.S0a", a, 2),
                       _rotr(t, f"{name}.r{r}.S0b", a, 13),
                       _rotr(t, f"{name}.r{r}.S0c", a, 22))
            maj = t.add_committed(f"{name}.r{r}.maj", 0, LOG_U32)
            t.assert_zero(f"{name}.r{r}.maj.def", [maj, a, b, c],
                          V(0) + V(1) * V(2) + V(1) * V(3) + V(2) * V(3),
                          group=f"{name}.chmaj")
            t2 = add(f"{name}.r{r}.t2", S0, maj)
            e_new = add(f"{name}.r{r}.e", d, t1)
            a_new = add(f"{name}.r{r}.a", t1, t2)
            ch_cols.append(ch)
            maj_cols.append(maj)
            state = [a_new, a, b, c, e_new, e, f, g]
        # final digest words: state + IV
        out = []
        for j in range(8):
            iv_col = t.add_fixed(f"{name}.out_iv{j}", 0,
                                 [(IV[j] >> z) & 1 for z in range(32)], LOG_U32)
            out.append(add(f"{name}.out{j}", state[j], iv_col))
        return Sha256(list(msg), out, adders, ch_cols, maj_cols, w)

    def populate(self, tw, msg_rows: list) -> list:
        """msg_rows: per row, 16 u32 words. Returns per-row 8-word digests.

        Replays the circuit VECTORIZED over rows (numpy uint32 lanes): each
        adder sees one (x, y) array pair, ch/maj are word-level boolean
        algebra — the per-row Python replay was the trace-gen wall at
        benchmark sizes (same fix as keccak's populate)."""
        import numpy as np

        U = np.uint32

        def rotr(v, n):
            n %= 32
            if n == 0:
                return v
            return (v >> U(n)) | (v << U(32 - n))

        n_rows = len(msg_rows)
        adder_inputs = [None] * len(self.adders)
        ai = 0

        def add_val(x, y):
            nonlocal ai
            adder_inputs[ai] = (x, y)
            ai += 1
            return x + y  # uint32 wraps mod 2^32

        w = [np.array([int(row[i]) for row in msg_rows], dtype=U)
             for i in range(16)]
        for i in range(16, 64):
            s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> U(3))
            s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> U(10))
            x = add_val(w[i - 16], s0)
            y = add_val(x, w[i - 7])
            w.append(add_val(y, s1))
        state = [np.full(n_rows, U(v)) for v in IV]
        ch_vals, maj_vals = [], []
        a, b, c, d, e, f, g, h = state
        for r in range(64):
            S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            ch_vals.append(ch)
            t1a = add_val(h, S1)
            t1b = add_val(t1a, ch)
            t1c = add_val(t1b, np.full(n_rows, U(K[r])))
            t1 = add_val(t1c, w[r])
            S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            maj_vals.append(maj)
            t2 = add_val(S0, maj)
            e_new = add_val(d, t1)
            a_new = add_val(t1, t2)
            a, b, c, d, e, f, g, h = a_new, a, b, c, e_new, e, f, g
        digest_cols = []
        for j, s in enumerate([a, b, c, d, e, f, g, h]):
            digest_cols.append(add_val(s, np.full(n_rows, U(IV[j]))))
        assert ai == len(self.adders)
        for gadget, (xs, ys) in zip(self.adders, adder_inputs):
            gadget.populate(tw, xs.astype(np.uint64), ys.astype(np.uint64))
        for col, vals in zip(self.ch_cols, ch_vals):
            tw.set_packed_ints(col, vals.astype(np.uint64))
        for col, vals in zip(self.maj_cols, maj_vals):
            tw.set_packed_ints(col, vals.astype(np.uint64))
        return [[int(digest_cols[j][i]) for j in range(8)]
                for i in range(n_rows)]
