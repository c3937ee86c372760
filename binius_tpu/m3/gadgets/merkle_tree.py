"""Merkle-tree inclusion-proof arithmetisation over Grøstl-256 compression.

Counterpart of `crates/m3/src/gadgets/merkle_tree/{mod,trace}.rs`:

  * a `nodes` channel carries tuples (root_id, digest[8 x B32], depth, index);
  * three `NodesTable`s (pull left / right / both children) each verify one
    compression step — state_in = left||right, Grøstl P permutation, parent =
    trunc(P(x) ^ x) — push the parent tuple and pull the needed children;
  * depth bookkeeping child = parent + 1 goes through the `Incr` indexed
    lookup gadget;
  * a `RootTable` reconciles depth-0 nodes with the public roots channel;
  * opened leaves and roots enter as statement boundaries.

Digest tuples travel the channel as 8 packed B32 values: column i of the
state's right half, bytes in the canonical-tower representation (the same
packing `add_packed` produces over the gadget's B8 columns).

The compression here is exactly `hash/groestl.py compress_pairs`
(trunc_256(P(a||b) ^ (a||b))), so traces interoperate with
`binius_tpu/merkle/tree.py` trees.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...constraint_system.system import Boundary, PUSH
from ...hash.groestl import bytes_to_state, compress_pairs
from ...math.arith import ArithExpr
from ..builder.table import Col, TableBuilder
from .groestl import LOG_STATE_ROW, Permutation, _from_tower, _to_tower
from .indexed_lookup import Incr, IncrLookup

V = ArithExpr.var

LEFT = "left"
RIGHT = "right"
BOTH = "both"


def digest_to_channel_values(digest: bytes) -> list[int]:
    """32-byte digest -> 8 packed-B32 channel values (tower rep, column i =
    state row i of the right state half)."""
    assert len(digest) == 32
    out = []
    for i in range(8):
        acc = 0
        for j in range(4):
            acc |= _to_tower(digest[j * 8 + i]) << (8 * j)
        out.append(acc)
    return out


@dataclasses.dataclass(frozen=True)
class MerklePathEvent:
    """One compression step on an opened path (`trace.rs` MerklePathEvent)."""

    root_id: int
    parent_depth: int
    parent_index: int
    left: bytes    # 32-byte child digests (AES byte rep)
    right: bytes
    flush_left: bool
    flush_right: bool

    @property
    def variant(self) -> str:
        if self.flush_left and self.flush_right:
            return BOTH
        return LEFT if self.flush_left else RIGHT


class NodesTable:
    """One Merkle compression step per row (`mod.rs:218-407`)."""

    def __init__(self, m3, variant: str, nodes_channel: int, lookup_channel: int):
        self.variant = variant
        t = m3.add_table(f"merkle_nodes_{variant}")
        self.t = t
        self.root_id = t.add_committed("root_id", 5, 0)
        self.perm = Permutation.build(t, "perm", "P")
        state_in = self.perm.state_in
        state_out = self.perm.state_out

        self.left_cols = [t.add_committed(f"left{i}", 3, 2) for i in range(8)]
        self.right_cols = [t.add_committed(f"right{i}", 3, 2) for i in range(8)]
        self.parent_cols = [t.add_committed(f"parent{i}", 3, 2) for i in range(8)]

        left_packed = [t.add_packed(f"left_packed{i}", c)
                       for i, c in enumerate(self.left_cols)]
        right_packed = [t.add_packed(f"right_packed{i}", c)
                        for i, c in enumerate(self.right_cols)]
        parent_packed = [t.add_packed(f"parent_packed{i}", c)
                         for i, c in enumerate(self.parent_cols)]
        state_packed = [t.add_packed(f"state_packed{i}", c)
                        for i, c in enumerate(state_in)]

        # state_in = left || right, via packed equality (`mod.rs:284-291`)
        for i in range(8):
            t.assert_zero(f"state_split{i}",
                          [state_packed[i], left_packed[i], right_packed[i]],
                          V(0) + V(1) + V(2) * ArithExpr.const(1 << 32, 6),
                          group="state_split")

        # parent = P(x) columns 4..7 xor right (the Grøstl-256 output
        # transform trunc(P(x) ^ x); `mod.rs:318-329`)
        for i in range(8):
            sel = t.add_selected_block(f"pout{i}", state_out[i], 1, 2)
            t.assert_zero(f"parent_def{i}",
                          [self.parent_cols[i], sel, self.right_cols[i]],
                          V(0) + V(1) + V(2), group="parent_def")

        self.parent_depth = t.add_committed("parent_depth", 3, 0)
        one = t.add_constant("one", 0, 1)
        self.incr = Incr.build(t, "depth_incr", lookup_channel,
                               self.parent_depth, one)
        child_depth = self.incr.output

        # indices: left = 2 * parent, right = left + 1 (`mod.rs:334-345`)
        from ...protocols import shift_ind
        self.parent_index = t.add_committed("parent_index", 0, 5)
        left_index = t.add_shifted("left_index", self.parent_index, 1, 5,
                                   shift_ind.LOGICAL_LEFT)
        parent_index_packed = t.add_packed("parent_index_packed",
                                           self.parent_index)
        left_index_packed = t.add_packed("left_index_packed", left_index)
        right_index_packed = t.add_computed(
            "right_index_packed", V(0) + ArithExpr.const(1, 5),
            [left_index_packed])

        t.push(nodes_channel, [self.root_id, *parent_packed, self.parent_depth,
                               parent_index_packed])
        if variant in (LEFT, BOTH):
            t.pull(nodes_channel, [self.root_id, *left_packed, child_depth,
                                   left_index_packed])
        if variant in (RIGHT, BOTH):
            t.pull(nodes_channel, [self.root_id, *right_packed, child_depth,
                                   right_index_packed])

    def populate(self, tw, events: list) -> None:
        assert all(e.variant == self.variant for e in events)
        tw.set_column(self.root_id, [e.root_id for e in events])
        tw.set_column(self.parent_depth, [e.parent_depth for e in events])
        tw.set_packed_ints(self.parent_index, [e.parent_index for e in events])
        self.incr.populate(tw, [(e.parent_depth, 1) for e in events])

        states = [bytes_to_state(np.frombuffer(e.left + e.right, dtype=np.uint8))
                  for e in events]
        self.perm.populate(tw, states)

        for i in range(8):
            lv, rv, pv = [], [], []
            for e in events:
                st = bytes_to_state(np.frombuffer(e.left + e.right, dtype=np.uint8))
                parent = compress_pairs(
                    np.frombuffer(e.left + e.right, dtype=np.uint8)[None, :])[0]
                pst = bytes_to_state(np.concatenate([np.zeros(32, np.uint8),
                                                     parent]))
                for j in range(4):
                    lv.append(_to_tower(int(st[i][j])))
                    rv.append(_to_tower(int(st[i][4 + j])))
                    pv.append(_to_tower(int(pst[i][4 + j])))
            tw.set_column(self.left_cols[i], lv)
            tw.set_column(self.right_cols[i], rv)
            tw.set_column(self.parent_cols[i], pv)


class RootTable:
    """Reconcile depth-0 nodes with the public roots (`mod.rs:462-548`)."""

    def __init__(self, m3, nodes_channel: int, roots_channel: int):
        t = m3.add_table("merkle_roots")
        self.t = t
        self.root_id = t.add_committed("root_id", 5, 0)
        self.digest = [t.add_committed(f"d{i}", 5, 0) for i in range(8)]
        zero = t.add_constant("zero", 5, 0)
        t.pull(roots_channel, [self.root_id, *self.digest])
        t.pull(nodes_channel, [self.root_id, *self.digest, zero, zero])

    def populate(self, tw, roots: list) -> None:
        """roots: [(root_id, digest32bytes)]"""
        tw.set_column(self.root_id, [r for r, _ in roots])
        packs = [digest_to_channel_values(d) for _, d in roots]
        for i in range(8):
            tw.set_column(self.digest[i], [p[i] for p in packs])


class MerkleTreeCS:
    """The full Merkle inclusion-proof constraint system (`mod.rs:45-205`)."""

    def __init__(self, m3, n_multiplicity_bits: int = 8):
        self.nodes_channel = m3.add_channel()
        self.roots_channel = m3.add_channel()
        self.lookup_channel = m3.add_channel()
        self.perm_channel = m3.add_channel()
        incr_table = m3.add_table("incr_lookup")
        self.incr_lookup = IncrLookup.build(incr_table, self.lookup_channel,
                                            self.perm_channel,
                                            n_multiplicity_bits)
        self.tables = {
            v: NodesTable(m3, v, self.nodes_channel, self.lookup_channel)
            for v in (LEFT, RIGHT, BOTH)
        }
        self.root_table = RootTable(m3, self.nodes_channel, self.roots_channel)

    def table_sizes(self, trace: "MerkleTreeTrace") -> list[int]:
        ev = trace.events_by_variant()
        return [1 << 9, len(ev[LEFT]), len(ev[RIGHT]), len(ev[BOTH]),
                len(trace.roots)]

    def fill_tables(self, trace: "MerkleTreeTrace", wi) -> None:
        ev = trace.events_by_variant()
        # depth-increment lookup counts over REAL node rows only (padding
        # rows' pulls are masked by the step-down selector)
        counts = [0] * 512
        for v in (LEFT, RIGHT, BOTH):
            for e in ev[v]:
                counts[(1 << 8) | e.parent_depth] += 1
        self.incr_lookup.populate(wi.table(0), list(enumerate(counts)))
        dummy = MerklePathEvent(0, 0, 0, bytes(32), bytes(32), True, True)
        for k, v in enumerate((LEFT, RIGHT, BOTH)):
            tw = wi.table(1 + k)
            events = list(ev[v])
            # repeat-pad to capacity: cloned rows satisfy all row-wise
            # constraints (`witness.rs:577-589`)
            last = events[-1] if events else dataclasses.replace(
                dummy, flush_left=(v != RIGHT), flush_right=(v != LEFT))
            events += [last] * (tw.n_rows - len(events))
            self.tables[v].populate(tw, events)
        tw = wi.table(4)
        roots = list(trace.roots)
        roots += [roots[-1]] * (tw.n_rows - len(roots))
        self.root_table.populate(tw, roots)

    def make_boundaries(self, trace: "MerkleTreeTrace") -> list:
        out = []
        for root_id, depth, index, digest in trace.leaf_boundaries:
            out.append(Boundary(self.nodes_channel, PUSH,
                                (root_id, *digest_to_channel_values(digest),
                                 depth, index)))
        for root_id, digest in trace.roots:
            out.append(Boundary(self.roots_channel, PUSH,
                                (root_id, *digest_to_channel_values(digest))))
        return out


class MerkleTreeTrace:
    """Witness trace for a set of opened leaves (`trace.rs`)."""

    def __init__(self):
        self.events: list[MerklePathEvent] = []
        self.leaf_boundaries: list = []  # (root_id, depth, index, digest)
        self.roots: list = []            # (root_id, digest32)

    @staticmethod
    def generate(root_id: int, leaves: list[bytes], opened: list[int]) -> "MerkleTreeTrace":
        """leaves: 2^D 32-byte digests; opened: leaf indices to prove."""
        n = len(leaves)
        depth = (n - 1).bit_length()
        assert n == 1 << depth
        levels = [list(leaves)]
        while len(levels[-1]) > 1:
            prev = levels[-1]
            levels.append([
                bytes(compress_pairs(np.frombuffer(prev[2 * i] + prev[2 * i + 1],
                                                   dtype=np.uint8)[None, :])[0])
                for i in range(len(prev) // 2)])
        # levels[d] has nodes at depth (depth - d); root at levels[depth]
        needed = set()  # (depth, index) of pulled nodes
        for li in sorted(set(opened)):
            d, i = depth, li
            while d > 0:
                needed.add((d, i))
                d, i = d - 1, i >> 1
        trace = MerkleTreeTrace()
        parents = sorted({(d - 1, i >> 1) for d, i in needed})
        for (pd, pi) in parents:
            child_d = pd + 1
            lvl = levels[depth - child_d]
            left, right = lvl[2 * pi], lvl[2 * pi + 1]
            trace.events.append(MerklePathEvent(
                root_id, pd, pi, left, right,
                flush_left=(child_d, 2 * pi) in needed,
                flush_right=(child_d, 2 * pi + 1) in needed))
        for li in sorted(set(opened)):
            trace.leaf_boundaries.append((root_id, depth, li, leaves[li]))
        trace.roots.append((root_id, levels[depth][0]))
        return trace

    def events_by_variant(self) -> dict:
        out = {LEFT: [], RIGHT: [], BOTH: []}
        for e in self.events:
            out[e.variant].append(e)
        return out
