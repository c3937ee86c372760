"""Non-power-of-two table sizes: step-down flush masking + sizes in the
proof (`constraint_system/verify.rs:390-430`, `prove.rs:177`)."""

import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.statement import m3_prove, m3_verify
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.math.arith import ArithExpr

V = ArithExpr.var


def _three_table_system():
    """Sizes {5, 4, 1}: an arbitrary-size producer and two consumers."""
    m3 = M3ConstraintSystem()
    chan = m3.add_channel()
    t0 = m3.add_table("producer")
    vals0 = t0.add_committed("vals", 5, 0)
    dbl0 = t0.add_committed("dbl", 5, 0)
    # a zero constraint that padding rows satisfy: dbl = vals xor vals = 0
    t0.assert_zero("dbl", [vals0, dbl0], V(0) + V(0) + V(1))
    t0.push(chan, [vals0])

    t1 = m3.add_table("consumer4")
    t1.require_power_of_two_size()
    vals1 = t1.add_committed("vals", 5, 0)
    t1.pull(chan, [vals1])

    t2 = m3.add_table("consumer1")
    vals2 = t2.add_committed("vals", 5, 0)
    t2.pull(chan, [vals2])
    return m3, (vals0, dbl0, vals1, vals2)


def test_nonpo2_prove_verify():
    m3, (vals0, dbl0, vals1, vals2) = _three_table_system()
    sizes = [5, 4, 1]
    wi = WitnessIndex.with_sizes(m3, sizes)
    pushed = [10, 20, 30, 40, 50]
    wi.table(0).set_column(vals0, pushed)
    wi.table(0).set_column(dbl0, [0] * 5)
    wi.table(1).set_column(vals1, pushed[:4])
    wi.table(2).set_column(vals2, pushed[4:])

    core, omap = m3.compile_sizes(sizes)
    witness = wi.to_core_witness(core, omap)
    validate_witness(core, witness)

    proof = m3_prove(m3, wi)
    m3_verify(m3, proof)


def test_nonpo2_unmasked_padding_would_imbalance():
    """Without the step-down the 3 zero padding rows of the producer would
    push 3 extra zero tuples; the masked system must reject a witness where
    a consumer relies on them."""
    m3, (vals0, dbl0, vals1, vals2) = _three_table_system()
    sizes = [5, 4, 1]
    wi = WitnessIndex.with_sizes(m3, sizes)
    wi.table(0).set_column(vals0, [10, 20, 30, 40, 50])
    wi.table(0).set_column(dbl0, [0] * 5)
    wi.table(1).set_column(vals1, [10, 20, 30, 0])  # 0 is only in padding
    wi.table(2).set_column(vals2, [40])

    core, omap = m3.compile_sizes(sizes)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)


def test_nonpo2_wrong_size_spec_rejected():
    m3, _ = _three_table_system()
    with pytest.raises(AssertionError):
        m3.compile_sizes([5, 3, 1])  # consumer4 requires a power of two


def test_proof_size_binding():
    """The verifier instantiates from the sizes in the proof; a system with
    a different table count rejects."""
    m3, (vals0, dbl0, vals1, vals2) = _three_table_system()
    sizes = [5, 4, 1]
    wi = WitnessIndex.with_sizes(m3, sizes)
    wi.table(0).set_column(vals0, [1, 2, 3, 4, 5])
    wi.table(0).set_column(dbl0, [0] * 5)
    wi.table(1).set_column(vals1, [1, 2, 3, 4])
    wi.table(2).set_column(vals2, [5])
    proof = m3_prove(m3, wi)

    other = M3ConstraintSystem()
    other.add_table("only")
    with pytest.raises(ValueError):
        m3_verify(other, proof)
