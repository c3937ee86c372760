"""Structured columns, LookupProducer, and indexed lookup gadgets
(`builder/structured.rs`, `gadgets/lookup.rs`, `gadgets/indexed_lookup/`)."""

import random

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.indexed_lookup import (
    BitAnd, BitAndLookup, IncrLookup, IncrLooker, bitand_index_to_entry,
    incr_index_to_entry)

random.seed(161)


def test_structured_incrementing():
    """`structured.rs test_fill_incrementing`: structured == committed copy."""
    from binius_tpu.protocols.transparent import incrementing_expr

    log_rows = 5
    m3 = M3ConstraintSystem()
    t = m3.add_table("test")
    expected = t.add_committed("reference", 5, 0)
    structured = t.add_structured("incrementing", 5, incrementing_expr(32))
    from binius_tpu.math.arith import ArithExpr
    V = ArithExpr.var
    t.assert_zero("reference=structured", [expected, structured], V(0) + V(1))
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    wi.table(0).set_column(expected, list(range(1 << log_rows)))
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_structured_rejects_nonmultilinear():
    from binius_tpu.math.arith import ArithExpr
    from binius_tpu.protocols.transparent import StructuredArith

    sq = ArithExpr.var(0) * ArithExpr.var(0)
    with pytest.raises(AssertionError):
        StructuredArith(sq, 2, 7)


def _incr_system(n_mult_bits=4, log_lookers=3):
    m3 = M3ConstraintSystem()
    lookup_chan = m3.add_channel()
    perm_chan = m3.add_channel()
    t_lut = m3.add_table("incr_lookup")
    lut = IncrLookup.build(t_lut, lookup_chan, perm_chan, n_mult_bits)
    t_look = m3.add_table("lookers")
    looker = IncrLooker.build(t_look, "incr", lookup_chan)
    return m3, lut, looker, log_lookers


def test_incr_indexed_lookup():
    m3, lut, looker, log_lookers = _incr_system()
    core, omap = m3.compile([9, log_lookers])
    wi = WitnessIndex(m3, [9, log_lookers])

    events = [(random.getrandbits(8), random.getrandbits(1))
              for _ in range(1 << log_lookers)]
    outs = looker.populate(wi.table(1), events)
    assert outs == [(i + c) & 0xFF for i, c in events]

    counts = [0] * 512
    for i, c in events:
        counts[(c << 8) | i] += 1
    index_counts = sorted(enumerate(counts), key=lambda ic: -ic[1])
    lut.populate(wi.table(0), index_counts)

    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_incr_indexed_lookup_wrong_output_rejected():
    m3, lut, looker, log_lookers = _incr_system()
    core, omap = m3.compile([9, log_lookers])
    wi = WitnessIndex(m3, [9, log_lookers])
    events = [(7, 1) for _ in range(1 << log_lookers)]
    looker.populate(wi.table(1), events)
    # lie about one output
    vals = wi.table(1).get_column(looker.incr.output)
    vals[0] ^= 1
    wi.table(1).set_column(looker.incr.output, vals)
    counts = [0] * 512
    for i, c in events:
        counts[(c << 8) | i] += 1
    lut.populate(wi.table(0), list(enumerate(counts)))
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)


def test_bitand_indexed_lookup():
    n_bits = 4
    log_lookers = 3
    m3 = M3ConstraintSystem()
    lookup_chan = m3.add_channel()
    perm_chan = m3.add_channel()
    t_lut = m3.add_table("and_lookup")
    lut = BitAndLookup.build(t_lut, lookup_chan, perm_chan, 4, n_bits)
    t_look = m3.add_table("lookers")
    in_a = t_look.add_committed("a", 3, 0)
    in_b = t_look.add_committed("b", 3, 0)
    g = BitAnd.build(t_look, "and", lookup_chan, in_a, in_b, n_bits)

    core, omap = m3.compile([2 * n_bits, log_lookers])
    wi = WitnessIndex(m3, [2 * n_bits, log_lookers])
    events = [(random.getrandbits(n_bits), random.getrandbits(n_bits))
              for _ in range(1 << log_lookers)]
    wi.table(1).set_column(in_a, [a for a, _ in events])
    wi.table(1).set_column(in_b, [b for _, b in events])
    outs = g.populate(wi.table(1), events)
    assert outs == [a & b for a, b in events]

    counts = [0] * (1 << (2 * n_bits))
    for a, b in events:
        counts[(b << n_bits) | a] += 1
    lut.populate(wi.table(0), list(enumerate(counts)))
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_entry_encodings():
    assert incr_index_to_entry(0xFF | (1 << 8)) == (1 << 17) | (1 << 16) | 0xFF
    assert incr_index_to_entry(0x03) == (0x03 << 8) | 0x03
    assert incr_index_to_entry(0x103) == (1 << 16) | (0x04 << 8) | 0x03
    assert bitand_index_to_entry(0xF3 | (0x0F << 8)) == \
        0xF3 | (0x0F << 8) | (0x03 << 16)
