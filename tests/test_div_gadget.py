"""DivUU32 gadget tests (`gadgets/div.rs`)."""

import random

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.div import DivUU32, WideAdd, WideSub

random.seed(171)


def test_wide_add_sub():
    log_rows = 3
    m3 = M3ConstraintSystem()
    t = m3.add_table("wide")
    xb = [t.add_committed(f"x{i}", 0, 0) for i in range(8)]
    yb = [t.add_committed(f"y{i}", 0, 0) for i in range(8)]
    add = WideAdd.build(t, "add", xb, yb)
    sub = WideSub.build(t, "sub", xb, yb)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [random.getrandbits(8) for _ in range(1 << log_rows)]
    ys = [random.getrandbits(8) for _ in range(1 << log_rows)]
    for i in range(8):
        tw.set_column(xb[i], [(v >> i) & 1 for v in xs])
        tw.set_column(yb[i], [(v >> i) & 1 for v in ys])
    zs = add.populate(tw, xs, ys)
    ds = sub.populate(tw, xs, ys)
    assert zs == [(x + y) & 0xFF for x, y in zip(xs, ys)]
    assert ds == [(x - y) & 0xFF for x, y in zip(xs, ys)]
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_div_uu32():
    log_rows = 2
    m3 = M3ConstraintSystem()
    t = m3.add_table("div")
    g = DivUU32.build(t, "div")
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    ps = [random.getrandbits(32) for _ in range(1 << log_rows)]
    qs = [random.getrandbits(16) + 1 for _ in range(1 << log_rows)]
    divs, rems = g.populate(tw, ps, qs)
    assert divs == [p // q for p, q in zip(ps, qs)]
    assert rems == [p % q for p, q in zip(ps, qs)]
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_div_uu32_wrong_quotient_rejected():
    m3 = M3ConstraintSystem()
    t = m3.add_table("div")
    g = DivUU32.build(t, "div")
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    g.populate(tw, [100, 17], [7, 5])
    # lie: bump the quotient in row 0 (and fix up nothing else)
    vals = tw.get_column(g.div_bits[0])
    vals[0] ^= 1
    tw.set_column(g.div_bits[0], vals)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)


def test_div_by_zero_rejected():
    m3 = M3ConstraintSystem()
    t = m3.add_table("div")
    g = DivUU32.build(t, "div")
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    # q = 0 in row 1: populate with q=1 then zero out the bits
    g.populate(tw, [10, 3], [2, 1])
    tw.set_column(g.q_bits[0], [0, 0])
    # rebuild dependent columns honestly is the prover's job; validation must
    # reject because q == 0 violates the non-zero claim
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)
