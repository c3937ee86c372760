"""M3 emulate channels (`emulate.rs:7-60`) and table stats (`builder/stat.rs`)."""

import pytest

from binius_tpu.m3.emulate import Channel
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.math.arith import ArithExpr


def test_channel_balance():
    ch = Channel()
    ch.push((1, 2))
    ch.push((1, 2))
    ch.pull((1, 2))
    assert not ch.is_balanced()
    ch.pull((1, 2))
    assert ch.is_balanced()
    ch.assert_balanced()


def test_channel_pull_before_push():
    ch = Channel()
    ch.pull(5)
    assert not ch.is_balanced()
    ch.push(5)
    assert ch.is_balanced()


def test_channel_assert_message():
    ch = Channel()
    ch.push("a")
    ch.pull("b")
    with pytest.raises(AssertionError, match="Unbalanced push"):
        ch.assert_balanced()


def test_table_stat():
    cs = M3ConstraintSystem()
    t = cs.add_table("demo")
    x = t.add_committed("x", 5, 0)
    y = t.add_committed("y", 5, 0)
    bits = t.add_committed("bits", 0, 5)
    z = t.add_computed("z", ArithExpr.var(0) * ArithExpr.var(1), [x, y])
    ch = cs.add_channel()
    t.push(ch, [x], multiplicity=2)
    t.pull(ch, [y])
    v0, v1 = ArithExpr.var(0), ArithExpr.var(1)
    t.assert_zero("mul", [x, y, z], v0 * v1 + ArithExpr.var(2))
    t.assert_zero("bool", [bits], v0 * v0 + v0)

    st = t.stat()
    # committed: x (32) + y (32) + bits (1 bit * 32 vpr)
    assert st.bits_per_row_committed == 32 + 32 + 32
    assert st.bits_per_row_virtual == 128  # computed z at B128
    assert st.total_flush_count == 3
    cost = st.assert_zero_cost_approx()
    assert cost > 0
    text = str(st)
    assert "mul" in text and "bool" in text and "flush count: 3" in text
