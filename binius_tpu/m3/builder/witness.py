"""M3 witness index: host-side column buffers lowered to device witnesses.

Mirrors `crates/m3/src/builder/witness.rs` (WitnessIndex / TableWitness):
the user fills committed columns (with typed helpers for bit-packed
integers); virtual columns (shifted / computed / constant) are materialized
from the oracle definitions at lowering time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constraint_system import witness as core_witness
from ...fields import tower


class TableWitness:
    def __init__(self, table, log_rows: int, size: int = None):
        self.table = table
        self.log_rows = log_rows  # log2 of the power-of-two CAPACITY
        self.size = (1 << log_rows) if size is None else size
        self.columns: dict = {}  # col index -> list[int] of length capacity << vpr

    @property
    def n_rows(self) -> int:
        return 1 << self.log_rows

    def set_column(self, col, values) -> None:
        """Accepts `size` rows of values (zero-padded to capacity) or full
        capacity rows directly (gadget fillers repeat the last event into
        padding so row-wise constraints keep holding, `witness.rs:577-589`;
        the step-down mask keeps padded rows out of the channel balance).

        Values may be a Python list or a numpy array (typed bulk fill, the
        analog of `witness.rs` TableWitnessSegment's typed accessors); numpy
        columns lower without any per-int conversion."""
        vpr = col.log_values_per_row
        expect = self.size << vpr
        full = self.n_rows << vpr
        assert len(values) in (expect, full), (len(values), expect, full)
        pad = full - len(values)
        if isinstance(values, np.ndarray):
            if pad:
                values = np.pad(values, (0, pad))
            self.columns[col.index] = values
        else:
            self.columns[col.index] = [int(v) for v in values] + [0] * pad

    def set_packed_ints(self, col, row_values: list) -> None:
        """For a B1 column with 2^v values per row: one integer per row,
        bit i of the integer lands at value-index i (LSB first)."""
        assert col.level == 0
        v = col.log_values_per_row
        w = 1 << v
        if w <= 64:
            if isinstance(row_values, np.ndarray) and row_values.dtype == np.uint64:
                a = row_values
            else:
                a = np.array([int(x) for x in row_values], dtype=np.uint64)
            bits = (a[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)
            self.set_column(col, bits.reshape(-1).astype(np.uint32))
            return
        out = []
        for x in row_values:
            for i in range(w):
                out.append((int(x) >> i) & 1)
        self.set_column(col, out)

    def get_column(self, col) -> list:
        vals = self.columns[col.index]
        return [int(x) for x in vals] if isinstance(vals, np.ndarray) else vals

    def get_packed_ints(self, col) -> list:
        w = 1 << col.log_values_per_row
        vals = self.columns[col.index]
        out = []
        for r in range(self.n_rows):
            acc = 0
            for i in range(w):
                acc |= int(vals[r * w + i]) << i
            out.append(acc)
        return out


class WitnessIndex:
    def __init__(self, m3_system, table_log_rows: list):
        self.system = m3_system
        self.table_log_rows = list(table_log_rows)
        self.table_sizes = [1 << lr for lr in table_log_rows]
        self.tables = [TableWitness(t, lr)
                       for t, lr in zip(m3_system.tables, table_log_rows)]

    @classmethod
    def with_sizes(cls, m3_system, table_sizes: list) -> "WitnessIndex":
        """Arbitrary row counts; columns fill `size` rows and pad to the
        power-of-two capacity with zeros."""
        self = cls.__new__(cls)
        self.system = m3_system
        self.table_sizes = [int(s) for s in table_sizes]
        self.table_log_rows = [(s - 1).bit_length() for s in self.table_sizes]
        self.tables = [TableWitness(t, lr, s)
                       for t, lr, s in zip(m3_system.tables, self.table_log_rows,
                                           self.table_sizes)]
        return self

    def table(self, table_id: int) -> TableWitness:
        return self.tables[table_id]

    def to_core_witness(self, core_system, oracle_map) -> dict:
        """Device witness dict for the core prover: committed columns from
        the buffers, virtual columns materialized from oracle definitions."""
        witness: dict = {}
        for t, tw in zip(self.system.tables, self.tables):
            for cd in t.columns:
                if cd.kind != "committed":
                    continue
                oid = oracle_map[(t.table_id, cd.col.index)]
                vals = tw.columns.get(cd.col.index)
                assert vals is not None, f"column {cd.col.name} not filled"
                if isinstance(vals, np.ndarray):
                    if (cd.col.level == 0 and vals.shape[0] >= (1 << tower.P1_MIN_VARS)
                            and vals.shape[0] % 32 == 0):
                        # bit-pack B1 columns host-side: 32x less transfer and
                        # device residency (tower.P1 packed-word layout)
                        b = (vals.astype(np.uint32) & 1).reshape(-1, 32)
                        words = np.bitwise_or.reduce(
                            b << np.arange(32, dtype=np.uint32), axis=1)
                        witness[oid] = (tower.P1, jnp.asarray(words))
                    elif cd.col.level <= 5:
                        dev = tower.from_numpy(cd.col.level, vals.astype(np.uint32))
                        witness[oid] = (cd.col.level, dev)
                    else:
                        dev = tower.from_numpy(cd.col.level, vals.astype(np.uint64))
                        witness[oid] = (cd.col.level, dev)
                else:
                    witness[oid] = tower.maybe_pack_b1(
                        cd.col.level, tower.from_ints(cd.col.level, vals))
        # prover-computed exp result columns (`constraint_system/exp.py`)
        if core_system.exponents:
            from ...constraint_system import exp as exp_mod
            exp_mod.make_exp_witnesses(core_system, witness)
        # materialize every reachable virtual oracle used by constraints/flushes
        for key, oid in oracle_map.items():
            core_witness.materialize(core_system.oracles, witness, oid)
        return witness
