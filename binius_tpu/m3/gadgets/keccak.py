"""Keccak-f[1600] permutation gadget (counterpart of
`crates/m3/src/gadgets/hash/keccak/stacked.rs`: all 24 rounds stacked per row).

Layout: one permutation per table row; every lane is a B1 column with 64
values per row (z = value index). Per round:

  * theta: C[x] (5-lane XOR) and AfterTheta[x,y] = A + C[x-1] + rot(C[x+1],1)
    are linear -> computed/shifted virtual columns;
  * rho/pi: B[pi(x,y)] = rot(AfterTheta[x,y], r[x,y]) -> circular-shift
    virtual columns (rotation left by n == CIRCULAR_LEFT offset (64-n)%64);
  * chi+iota: the next state is committed with the constraint
    A' + B0 + (1 + B1)*B2 (+ RC pattern for lane (0,0)) = 0, one constraint
    per lane per round, grouped per round so all 24 rounds share one
    compiled zerocheck kernel shape.
"""

from __future__ import annotations

import dataclasses

from ...math.arith import ArithExpr
from ...protocols import shift_ind
from ..builder.table import Col, TableBuilder

LOG_LANE = 6  # 64 bits per lane
N_ROUNDS = 24

RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]  # RHO[x][y]

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]


def keccak_f(lanes: list[int]) -> list[int]:
    """Host reference permutation on 25 lane ints (x + 5*y indexing)."""
    a = list(lanes)
    M = (1 << 64) - 1

    def rot(v, n):
        n %= 64
        return ((v << n) | (v >> (64 - n))) & M

    for r in range(N_ROUNDS):
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ rot(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[x + 5 * y] ^ d[x] for y in range(5) for x in range(5)]
        a = [a[i] for i in range(25)]
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rot(a[x + 5 * y], RHO[x][y])
        a = [b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
             for y in range(5) for x in range(5)]
        a[0] ^= RC[r]
    return a


def _rot_col(t: TableBuilder, name: str, col: Col, n: int) -> Col:
    """Circular rotate-left by n within each 64-value lane block."""
    n %= 64
    if n == 0:
        return col
    return t.add_shifted(name, col, (64 - n) % 64, LOG_LANE, shift_ind.CIRCULAR_LEFT)


@dataclasses.dataclass
class KeccakF:
    state_in: list   # 25 committed Cols (x + 5*y)
    state_out: list  # 25 Cols of the final round
    rounds_out: list  # per round: 25 committed Cols

    @staticmethod
    def build(t: TableBuilder, name: str, state_in: list) -> "KeccakF":
        V = ArithExpr.var
        a = list(state_in)
        rounds_out = []
        for r in range(N_ROUNDS):
            # theta
            c_cols = []
            for x in range(5):
                cols = [a[x + 5 * y] for y in range(5)]
                expr = V(0) + V(1) + V(2) + V(3) + V(4)
                c_cols.append(t.add_computed(f"{name}.r{r}.C{x}", expr, cols))
            rot_c = [_rot_col(t, f"{name}.r{r}.rotC{x}", c_cols[x], 1) for x in range(5)]
            after_theta = []
            for y in range(5):
                for x in range(5):
                    cols = [a[x + 5 * y], c_cols[(x + 4) % 5], rot_c[(x + 1) % 5]]
                    expr = V(0) + V(1) + V(2)
                    after_theta.append(t.add_computed(f"{name}.r{r}.T{x}_{y}", expr, cols))
            # rho + pi
            b = [None] * 25
            for x in range(5):
                for y in range(5):
                    src = after_theta[x + 5 * y]
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = _rot_col(
                        t, f"{name}.r{r}.B{x}_{y}", src, RHO[x][y])
            # chi (+ iota on lane 0) into committed next state
            rc_pattern = [(RC[r] >> z) & 1 for z in range(64)]
            rc_col = t.add_fixed(f"{name}.r{r}.RC", 0, rc_pattern, LOG_LANE)
            nxt = []
            for y in range(5):
                for x in range(5):
                    out = t.add_committed(f"{name}.r{r}.A{x}_{y}", 0, LOG_LANE)
                    nxt.append(out)
                    b0 = b[x + 5 * y]
                    b1 = b[(x + 1) % 5 + 5 * y]
                    b2 = b[(x + 2) % 5 + 5 * y]
                    if x == 0 and y == 0:
                        cols = [out, b0, b1, b2, rc_col]
                        expr = (V(0) + V(1) + (ArithExpr.const(1) + V(2)) * V(3)
                                + V(4))
                    else:
                        cols = [out, b0, b1, b2]
                        expr = V(0) + V(1) + (ArithExpr.const(1) + V(2)) * V(3)
                    t.assert_zero(f"{name}.r{r}.chi{x}_{y}", cols, expr,
                                  group=f"{name}.r{r}")
            a = nxt
            rounds_out.append(nxt)
        return KeccakF(list(state_in), a, rounds_out)

    def populate(self, tw, input_lanes_rows: list) -> list:
        """Fill all committed columns from per-row input lane lists; returns
        per-row output lanes."""
        M = (1 << 64) - 1

        def rot(v, n):
            n %= 64
            return ((v << n) | (v >> (64 - n))) & M

        outs = []
        per_round_rows = [[] for _ in range(N_ROUNDS)]
        for lanes in input_lanes_rows:
            a = list(lanes)
            for r in range(N_ROUNDS):
                c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20]
                     for x in range(5)]
                d = [c[(x - 1) % 5] ^ rot(c[(x + 1) % 5], 1) for x in range(5)]
                at = [a[x + 5 * y] ^ d[x] for y in range(5) for x in range(5)]
                b = [0] * 25
                for x in range(5):
                    for y in range(5):
                        b[y + 5 * ((2 * x + 3 * y) % 5)] = rot(at[x + 5 * y], RHO[x][y])
                a = [b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
                     for y in range(5) for x in range(5)]
                a[0] ^= RC[r]
                per_round_rows[r].append(list(a))
            outs.append(a)
        for i, col in enumerate(self.state_in):
            tw.set_packed_ints(col, [row[i] for row in input_lanes_rows])
        for r in range(N_ROUNDS):
            for i, col in enumerate(self.rounds_out[r]):
                tw.set_packed_ints(col, [row[i] for row in per_round_rows[r]])
        return outs
