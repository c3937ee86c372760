"""Barrel shifter gadget tests."""

import random

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.gadgets import barrel_shifter as bs

random.seed(111)


@pytest.mark.parametrize("kind", [bs.CIRCULAR_LEFT, bs.LOGICAL_LEFT, bs.LOGICAL_RIGHT])
def test_barrel_shifter(kind):
    log_rows = 2
    m3 = M3ConstraintSystem()
    t = m3.add_table("shift")
    xin = t.add_committed("xin", 0, 5)
    g = bs.BarrelShifter.build(t, "sh", xin, kind)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(32) for _ in range(1 << log_rows)]
    amts = [random.randrange(32) for _ in range(1 << log_rows)]
    tw.set_packed_ints(xin, xs)
    outs = g.populate(tw, xs, amts, kind)
    M = 0xFFFFFFFF
    for x, a, o in zip(xs, amts, outs):
        if kind == bs.CIRCULAR_LEFT:
            want = ((x << a) | (x >> (32 - a))) & M if a else x
        elif kind == bs.LOGICAL_LEFT:
            want = (x << a) & M
        else:
            want = x >> a
        assert o == want
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_barrel_shifter_bad_witness():
    m3 = M3ConstraintSystem()
    t = m3.add_table("shift")
    xin = t.add_committed("xin", 0, 5)
    g = bs.BarrelShifter.build(t, "sh", xin, bs.CIRCULAR_LEFT)
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    xs = [3, 5]
    tw.set_packed_ints(xin, xs)
    g.populate(tw, xs, [7, 1], bs.CIRCULAR_LEFT)
    vals = tw.get_packed_ints(g.stages[2])
    vals[0] ^= 4
    tw.set_packed_ints(g.stages[2], vals)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)
