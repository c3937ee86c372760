"""M3 builder tests: table DSL -> core system -> full prove/verify."""

import random

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets import arith

random.seed(71)


def build_u32add_m3(log_rows=2):
    m3 = M3ConstraintSystem()
    t = m3.add_table("u32add")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    adder = arith.U32Add.build(t, "add", xin, yin)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(32) for _ in range(1 << log_rows)]
    ys = [random.getrandbits(32) for _ in range(1 << log_rows)]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    zs = adder.populate(tw, xs, ys)
    assert list(map(int, zs)) == [(x + y) & 0xFFFFFFFF for x, y in zip(xs, ys)]
    witness = wi.to_core_witness(core, omap)
    return core, witness


def test_m3_u32add_validate_and_prove():
    core, witness = build_u32add_m3()
    validate_system_witness(core, witness)


def test_m3_sub_and_bitwise():
    m3 = M3ConstraintSystem()
    t = m3.add_table("ops")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    sub = arith.U32Sub.build(t, "sub", xin, yin)
    and_out = arith.u32_bitwise_and(t, "and", xin, yin)
    xor_out = arith.u32_bitwise_xor(t, "xor", xin, yin)
    or_out = arith.u32_bitwise_or(t, "or", xin, yin)
    log_rows = 2
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(32) for _ in range(1 << log_rows)]
    ys = [random.getrandbits(32) for _ in range(1 << log_rows)]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    zs = sub.populate(tw, xs, ys)
    assert list(map(int, zs)) == [(x - y) & 0xFFFFFFFF for x, y in zip(xs, ys)]
    tw.set_packed_ints(and_out, [x & y for x, y in zip(xs, ys)])
    tw.set_packed_ints(xor_out, [x ^ y for x, y in zip(xs, ys)])
    tw.set_packed_ints(or_out, [x | y for x, y in zip(xs, ys)])
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_m3_bad_witness_detected():
    m3 = M3ConstraintSystem()
    t = m3.add_table("ops")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    and_out = arith.u32_bitwise_and(t, "and", xin, yin)
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    xs, ys = [3, 5], [6, 12]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    tw.set_packed_ints(and_out, [(x & y) ^ 2 for x, y in zip(xs, ys)])
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)


def test_reference_compile_emission_order():
    """Round-5 divergence 1(d) closure: the builder emits in the reference
    `compile()` order — per table, per partition ASCENDING values-per-row:
    Exp records, flushes, then ONE constraint set per partition whose
    oracle list is the USED partition columns in declaration order
    (`builder/constraint_system.rs` compile + translate_constraint_set)."""
    from binius_tpu.math.arith import ArithExpr

    V = ArithExpr.var
    m3 = M3ConstraintSystem()
    chan = m3.add_channel()
    t = m3.add_table("multi")
    # partition vpr=5 columns (declared interleaved with vpr=0 ones)
    a5 = t.add_committed("a5", 0, 5)
    s0 = t.add_committed("s0", 5, 0)
    b5 = t.add_committed("b5", 0, 5)
    u0 = t.add_committed("u0", 5, 0)
    c5 = t.add_committed("c5", 0, 5)
    # constraints in call order, deliberately listing cols out of
    # declaration order; only USED columns enter the set's oracle list
    t.assert_zero("k1", [c5, a5], V(0) * V(1))
    t.assert_zero("k0", [u0, s0], V(0) + V(1))
    t.assert_zero("k2", [b5, a5, c5], V(0) + V(1) * V(2))
    # flushes: vpr-0 flush called FIRST but the vpr-5 partition is... vpr 0
    # partition (log 0) sorts before vpr 5
    t.push(chan, [u0])
    t.pull(chan, [a5])
    core, omap = m3.compile([3])
    sym = core.symbolic

    # constraint sets: partition log-vpr ascending -> (table, 0) then (table, 5)
    assert [cs.log_values_per_row for cs in sym.constraint_sets] == [0, 5]
    cs0, cs5 = sym.constraint_sets
    # vpr-0 set: used columns s0, u0 in DECLARATION order (s0 before u0)
    assert cs0.oracle_ids == (omap[(0, s0.index)], omap[(0, u0.index)])
    assert [c.name for c in cs0.constraints] == ["k0"]
    # k0 was written over [u0, s0]: var0=u0 -> dense 1, var1=s0 -> dense 0
    assert cs0.constraints[0].circuit == (
        ("var", 1), ("var", 0), ("add", 0, 1))
    # vpr-5 set: used columns a5, b5, c5 in declaration order; constraints
    # in call order k1, k2
    assert cs5.oracle_ids == (omap[(0, a5.index)], omap[(0, b5.index)],
                              omap[(0, c5.index)])
    assert [c.name for c in cs5.constraints] == ["k1", "k2"]
    # k1 over [c5, a5]: var0=c5 -> dense 2, var1=a5 -> dense 0
    assert cs5.constraints[0].circuit == (
        ("var", 2), ("var", 0), ("mul", 0, 1))
    # flushes grouped by partition ascending (vpr-0 push before vpr-5 pull,
    # which here matches call order; both present)
    assert [f.log_values_per_row for f in sym.flushes] == [0, 5]
