"""Selector flushes and lookups via channels.

The LookupProducer pattern (`crates/m3/src/gadgets/lookup.rs`): the lookup
table pushes each (index, value) entry with prover-chosen multiplicities,
bit-decomposed into per-bit selector flushes with multiplicity 2^k; lookup
users pull the tuples they read.
"""

import random

import pytest

from binius_tpu.constraint_system import oracle as om
from binius_tpu.constraint_system import prove as csp
from binius_tpu.constraint_system.system import (ConstraintSystem, Flush, PULL, PUSH,
                                                 validate_witness)
from binius_tpu.fields import tower
from binius_tpu.math.arith import ArithExpr

random.seed(151)
V = ArithExpr.var


def test_selector_flush_prove_verify():
    """Only selected rows of a push participate in the channel balance."""
    n = 3
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    sel_id = oracles.add_committed(n, 5, "sel")
    b_id = oracles.add_committed(n, 5, "b")  # pulls exactly the selected rows
    a_vals = [random.getrandbits(32) for _ in range(1 << n)]
    sel = [1, 0, 1, 1, 0, 0, 1, 0]
    selected = [v for v, s in zip(a_vals, sel) if s]
    # b pulls each selected value once; pad b with pushes of its own rows? --
    # instead give b a selector too, matching the count.
    b_vals = selected + [random.getrandbits(32) for _ in range((1 << n) - len(selected))]
    sel_b = [1] * len(selected) + [0] * ((1 << n) - len(selected))
    selb_id = oracles.add_committed(n, 5, "sel_b")
    system = ConstraintSystem(
        oracles, [],
        flushes=[Flush(0, PUSH, (a_id,), selector_ids=(sel_id,)),
                 Flush(0, PULL, (b_id,), selector_ids=(selb_id,))],
        n_channels=1)
    witness = {a_id: (5, tower.from_ints(5, a_vals)),
               sel_id: (5, tower.from_ints(5, sel)),
               b_id: (5, tower.from_ints(5, b_vals)),
               selb_id: (5, tower.from_ints(5, sel_b))}
    validate_witness(system, witness)
    proof = csp.prove(system, witness)
    csp.verify(system, proof)
    # deselect one pushed row -> imbalance
    bad_sel = list(sel)
    bad_sel[0] = 0
    witness[sel_id] = (5, tower.from_ints(5, bad_sel))
    with pytest.raises(ValueError):
        csp.prove(system, witness)


def test_lookup_via_multiplicity_flushes():
    """8-entry square table; 8 user reads with repeats; multiplicities
    bit-decomposed into two selector flushes (weights 1 and 2)."""
    n = 3
    oracles = om.OracleSet()
    # table columns (fixed public data, committed here for simplicity)
    idx_id = oracles.add_committed(n, 5, "t_idx")
    val_id = oracles.add_committed(n, 5, "t_val")
    # user read columns
    rid_id = oracles.add_committed(n, 5, "r_idx")
    rval_id = oracles.add_committed(n, 5, "r_val")
    # multiplicity bit selectors
    m0_id = oracles.add_committed(n, 5, "m0")
    m1_id = oracles.add_committed(n, 5, "m1")

    table_idx = list(range(8))
    table_val = [(i * i) & 0xFF for i in range(8)]
    reads = [random.randrange(8) for _ in range(8)]
    counts = [reads.count(i) for i in range(8)]
    assert all(c < 4 for c in counts), "test assumes multiplicities fit 2 bits"
    m0 = [c & 1 for c in counts]
    m1 = [(c >> 1) & 1 for c in counts]

    system = ConstraintSystem(
        oracles, [],
        flushes=[
            Flush(0, PUSH, (idx_id, val_id), multiplicity=1, selector_ids=(m0_id,)),
            Flush(0, PUSH, (idx_id, val_id), multiplicity=2, selector_ids=(m1_id,)),
            Flush(0, PULL, (rid_id, rval_id)),
        ],
        n_channels=1)
    witness = {
        idx_id: (5, tower.from_ints(5, table_idx)),
        val_id: (5, tower.from_ints(5, table_val)),
        rid_id: (5, tower.from_ints(5, reads)),
        rval_id: (5, tower.from_ints(5, [table_val[i] for i in reads])),
        m0_id: (5, tower.from_ints(5, m0)),
        m1_id: (5, tower.from_ints(5, m1)),
    }
    validate_witness(system, witness)
    proof = csp.prove(system, witness)
    csp.verify(system, proof)
    # a wrong read value breaks the lookup
    bad = [table_val[i] for i in reads]
    bad[3] ^= 1
    witness[rval_id] = (5, tower.from_ints(5, bad))
    with pytest.raises(ValueError):
        csp.prove(system, witness)
