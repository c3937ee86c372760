"""Keccak-f[1600] permutation gadget (counterpart of
`crates/m3/src/gadgets/hash/keccak/stacked.rs`: all 24 rounds stacked per row).

Layout: one permutation per table row; every lane is a B1 column with 64
values per row (z = value index). Per round:

  * theta: C[x] (5-lane XOR) and AfterTheta[x,y] = A + C[x-1] + rot(C[x+1],1)
    are linear -> computed/shifted virtual columns;
  * rho/pi: B[pi(x,y)] = rot(AfterTheta[x,y], r[x,y]) -> circular-shift
    virtual columns (rotation left by n == CIRCULAR_LEFT offset n,
    reference shift semantics);
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
    return t.add_shifted(name, col, n, LOG_LANE, shift_ind.CIRCULAR_LEFT)


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
        per-row output lanes. Vectorized over rows with numpy uint64 lanes —
        the per-row Python permutation cost ~311 ms/permutation, a 42-minute
        host wall at the 2^13 benchmark size."""
        import numpy as np

        def rot(v, k):
            k %= 64
            if k == 0:
                return v
            return (v << np.uint64(k)) | (v >> np.uint64(64 - k))

        a = np.array([[int(x) for x in row] for row in input_lanes_rows],
                     dtype=np.uint64).T.copy()  # (25, n_rows)
        per_round = []
        for r in range(N_ROUNDS):
            c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20]
                 for x in range(5)]
            d = [c[(x - 1) % 5] ^ rot(c[(x + 1) % 5], 1) for x in range(5)]
            at = [a[x + 5 * y] ^ d[x] for y in range(5) for x in range(5)]
            b = [None] * 25
            for x in range(5):
                for y in range(5):
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = rot(at[x + 5 * y], RHO[x][y])
            a = np.stack([b[x + 5 * y]
                          ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
                          for y in range(5) for x in range(5)])
            a[0] ^= np.uint64(RC[r])
            per_round.append(a)
        inp = np.array([[int(x) for x in row] for row in input_lanes_rows],
                       dtype=np.uint64)
        for i, col in enumerate(self.state_in):
            tw.set_packed_ints(col, inp[:, i])
        for r in range(N_ROUNDS):
            for i, col in enumerate(self.rounds_out[r]):
                tw.set_packed_ints(col, per_round[r][i])
        return [[int(v) for v in row] for row in per_round[-1].T]


# ---------------------------------------------------------------------------
# Lookedup variant: chi through a bit-AND lookup channel
# ---------------------------------------------------------------------------

def bit_and_index(a: int, b: int) -> int:
    """Index of the (a, b) bit pair in the 4-row bit-AND table."""
    return a | (b << 1)


@dataclasses.dataclass
class KeccakFLookedup:
    """Keccak-f[1600] with chi enforced by LOOKUPS instead of multiplicative
    constraints (counterpart of `gadgets/hash/keccak/lookedup.rs`, adapted to
    this framework's layout).

    The reference batches 8 SIMD tracks per row and looks chi up in the
    2^16-row byte-AND table; here every lane stays a B1 column with 64
    values per row, so the natural granularity is the 4-row BIT-AND table
    (`indexed_lookup.rs` machinery with n_bits = 1) and each lane-round
    contributes ONE multi-value pull. Chi needs no zerocheck constraint at
    all: with out committed, the pulled merged value

        1 + B1 + 2*B2 + 4*(out + B0 [+ RC])

    lies in the table iff out + B0 [+ RC] = (1 + B1) & B2, which is exactly
    chi (+ iota). The whole permutation then has ZERO zero-constraints —
    theta/rho/pi are virtual columns and the nonlinearity lives in the
    channel's grand product.
    """

    state_in: list
    state_out: list
    rounds_out: list
    merged_cols: list  # 600 pulled columns, round-major

    @staticmethod
    def build(t: TableBuilder, name: str, state_in: list,
              lookup_channel: int) -> "KeccakFLookedup":
        V = ArithExpr.var
        C = lambda v: ArithExpr.const(v, 7)
        a = list(state_in)
        rounds_out = []
        merged_cols = []
        for r in range(N_ROUNDS):
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
                    after_theta.append(t.add_computed(f"{name}.r{r}.T{x}_{y}",
                                                      V(0) + V(1) + V(2), cols))
            b = [None] * 25
            for x in range(5):
                for y in range(5):
                    src = after_theta[x + 5 * y]
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = _rot_col(
                        t, f"{name}.r{r}.B{x}_{y}", src, RHO[x][y])
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
                        cols = [b1, b2, out, b0, rc_col]
                        expr = (C(1) + V(0) + C(2) * V(1)
                                + C(4) * (V(2) + V(3) + V(4)))
                    else:
                        cols = [b1, b2, out, b0]
                        expr = C(1) + V(0) + C(2) * V(1) + C(4) * (V(2) + V(3))
                    merged = t.add_computed(f"{name}.r{r}.m{x}_{y}", expr, cols)
                    merged_cols.append(merged)
                    t.pull(lookup_channel, [merged])
            a = nxt
            rounds_out.append(nxt)
        return KeccakFLookedup(list(state_in), a, rounds_out, merged_cols)

    def populate(self, tw, input_lanes_rows: list):
        """Fill committed columns; returns (per-row output lanes,
        bit-AND index counts[4] for the lookup table side). Vectorized over
        rows (numpy uint64); chi bit-pair counts come from popcounts."""
        import numpy as np

        def rot(v, k):
            k %= 64
            if k == 0:
                return v
            return (v << np.uint64(k)) | (v >> np.uint64(64 - k))

        def popsum(v) -> int:
            return int(np.bitwise_count(v).sum())

        a = np.array([[int(x) for x in row] for row in input_lanes_rows],
                     dtype=np.uint64).T.copy()  # (25, n_rows)
        counts = [0, 0, 0, 0]
        per_round = []
        for r in range(N_ROUNDS):
            c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20]
                 for x in range(5)]
            d = [c[(x - 1) % 5] ^ rot(c[(x + 1) % 5], 1) for x in range(5)]
            at = [a[x + 5 * y] ^ d[x] for y in range(5) for x in range(5)]
            b = [None] * 25
            for x in range(5):
                for y in range(5):
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = rot(at[x + 5 * y], RHO[x][y])
            for y in range(5):
                for x in range(5):
                    nb1 = ~b[(x + 1) % 5 + 5 * y]
                    b2 = b[(x + 2) % 5 + 5 * y]
                    n11 = popsum(nb1 & b2)
                    n10 = popsum(nb1 & ~b2)
                    n01 = popsum(~nb1 & b2)
                    n00 = 64 * b2.size - n11 - n10 - n01
                    counts[bit_and_index(1, 1)] += n11
                    counts[bit_and_index(1, 0)] += n10
                    counts[bit_and_index(0, 1)] += n01
                    counts[bit_and_index(0, 0)] += n00
            a = np.stack([b[x + 5 * y]
                          ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
                          for y in range(5) for x in range(5)])
            a[0] ^= np.uint64(RC[r])
            per_round.append(a)
        inp = np.array([[int(x) for x in row] for row in input_lanes_rows],
                       dtype=np.uint64)
        for i, col in enumerate(self.state_in):
            tw.set_packed_ints(col, inp[:, i])
        for r in range(N_ROUNDS):
            for i, col in enumerate(self.rounds_out[r]):
                tw.set_packed_ints(col, per_round[r][i])
        return [[int(v) for v in row] for row in per_round[-1].T], counts


@dataclasses.dataclass
class KeccakLookedupCS:
    """Two-table system: the keccak table plus the 4-row bit-AND lookup
    table (structured ordered entries, committed sorted copy, permutation
    channel, LookupProducer), mirroring `lookedup.rs`'s test harness."""

    m3: object
    keccak_table: object
    gadget: KeccakFLookedup
    state_in: list
    lookup: object

    lookup_table: object = None

    @staticmethod
    def build(m3, log_n_permutations: int,
              n_multiplicity_bits: int = None) -> "KeccakLookedupCS":
        from .indexed_lookup import BitAndLookup

        lookup_ch = m3.add_channel()
        perm_ch = m3.add_channel()
        t = m3.add_table("keccak_lookedup")
        state_in = [t.add_committed(f"in{i}", 0, LOG_LANE) for i in range(25)]
        gadget = KeccakFLookedup.build(t, "kf", state_in, lookup_ch)
        tl = m3.add_table("bitand_table")
        if n_multiplicity_bits is None:
            # counts sum to n_perms * 24 * 25 * 64 over the 4 indices
            n_multiplicity_bits = log_n_permutations + 16
        lookup = BitAndLookup.build(tl, lookup_ch, perm_ch,
                                    n_multiplicity_bits, n_bits=1)
        return KeccakLookedupCS(m3, t, gadget, state_in, lookup, tl)

    def table_sizes(self, n_permutations: int) -> list[int]:
        return [n_permutations, 4]

    def populate(self, wi, input_lanes_rows: list):
        outs, counts = self.gadget.populate(wi.table(self.keccak_table.table_id),
                                            input_lanes_rows)
        self.lookup.populate(wi.table(self.lookup_table.table_id),
                             [(i, counts[i]) for i in range(4)])
        return outs
