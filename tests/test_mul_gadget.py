"""u32 multiplication gadget tests."""

import random

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.mul import U32Mul

random.seed(141)


def test_u32_mul():
    log_rows = 2
    m3 = M3ConstraintSystem()
    t = m3.add_table("mul")
    xin = t.add_committed("xin", 0, 5)
    yin = t.add_committed("yin", 0, 5)
    g = U32Mul.build(t, "mul", xin, yin)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(32) for _ in range(1 << log_rows)]
    ys = [random.getrandbits(32) for _ in range(1 << log_rows)]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    outs = g.populate(tw, xs, ys)
    assert outs == [(x * y) & 0xFFFFFFFF for x, y in zip(xs, ys)]
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_mul_uu32_exp():
    """MulUU32 via the GKR exponentiation phase (`mul.rs:96-175`)."""
    from binius_tpu.m3.gadgets.mul import MulUU32

    log_rows = 2
    m3 = M3ConstraintSystem()
    t = m3.add_table("mul_exp")
    g = MulUU32.build(t, "mul")
    core, omap = m3.compile([log_rows])
    assert len(core.exponents) == 4
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(32) for _ in range(1 << log_rows)]
    ys = [random.getrandbits(32) for _ in range(1 << log_rows)]
    his, los = g.populate(tw, xs, ys)
    assert all(((x * y) >> 32, (x * y) & 0xFFFFFFFF) == (hi, lo)
               for x, y, hi, lo in zip(xs, ys, his, los))
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_mul_uu32_exp_wrong_output_rejected():
    """A lied-about output bit must violate the exp-equality constraint."""
    from binius_tpu.m3.gadgets.mul import MulUU32

    m3 = M3ConstraintSystem()
    t = m3.add_table("mul_exp")
    g = MulUU32.build(t, "mul")
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    xs, ys = [0xDEADBEEF, 3], [0x12345678, 5]
    g.populate(tw, xs, ys)
    # flip bit 7 of out_low in row 1
    vals = tw.get_column(g.out_low_bits[7])
    vals[1] ^= 1
    tw.set_column(g.out_low_bits[7], vals)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)


def test_u32_mul_bad_bit_rejected():
    m3 = M3ConstraintSystem()
    t = m3.add_table("mul")
    xin = t.add_committed("xin", 0, 5)
    yin = t.add_committed("yin", 0, 5)
    g = U32Mul.build(t, "mul", xin, yin)
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    xs, ys = [7, 9], [3, 5]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    g.populate(tw, xs, ys)
    # lie about bit 1 of y in row 0
    vals = tw.get_packed_ints(g.bit_cols[1])
    vals[0] ^= 0xFFFFFFFF
    tw.set_packed_ints(g.bit_cols[1], vals)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)
