"""Reusable lookup-table gadgets over channels.

Counterpart of `crates/m3/src/gadgets/lookup.rs` (LookupProducer): the lookup
table pushes its value tuples with prover-chosen multiplicities, decomposed
into per-bit selector flushes of weight 2^i; consumers pull each value they
read. The bit-decomposition bounds multiplicities at 2^n_multiplicity_bits.
"""

from __future__ import annotations

import dataclasses

from ..builder.table import Col, TableBuilder


@dataclasses.dataclass
class LookupProducer:
    """`lookup.rs:16-47`: n_multiplicity_bits committed B1 selector columns;
    bit i selects a push of `value_cols` with multiplicity 2^i."""

    multiplicity_bits: list

    @staticmethod
    def build(t: TableBuilder, name: str, channel_id: int, value_cols: list,
              n_multiplicity_bits: int) -> "LookupProducer":
        bits = []
        for i in range(n_multiplicity_bits):
            b = t.add_committed(f"{name}.multiplicity_bits[{i}]", 0, 0)
            t.push(channel_id, value_cols, multiplicity=1 << i, selector=b)
            bits.append(b)
        return LookupProducer(bits)

    def populate(self, tw, counts: list) -> None:
        """counts[r] = how many times row r's value tuple is read
        (`lookup.rs populate`); must fit in the configured bits."""
        nb = len(self.multiplicity_bits)
        for c in counts:
            assert 0 <= c < (1 << nb), \
                f"count {c} exceeds maximum configured multiplicity 2^{nb}-1"
        for j, col in enumerate(self.multiplicity_bits):
            tw.set_column(col, [(int(c) >> j) & 1 for c in counts])
