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
