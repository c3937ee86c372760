"""Constraint-system serialization round-trip tests."""

import random

from binius_tpu.constraint_system import prove as csp
from binius_tpu.constraint_system import serialization as ser
from binius_tpu.constraint_system.system import Flush, PULL, PUSH
from binius_tpu.fields import tower

random.seed(161)


def test_roundtrip_u32_add_system():
    import importlib.util
    spec = importlib.util.spec_from_file_location("tcs", "tests/test_constraint_system.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    system, witness = m.build_u32_add()
    raw = ser.serialize(system)
    system2 = ser.deserialize(raw)
    assert system2.digest() == system.digest()
    assert ser.serialize(system2) == raw
    # a proof made against the original verifies against the deserialized
    proof = csp.prove(system, witness)
    csp.verify(system2, proof)


def test_roundtrip_with_flushes_and_transparents():
    from binius_tpu.constraint_system import oracle as om
    from binius_tpu.math.arith import ArithExpr
    from binius_tpu.protocols import transparent as tp

    oracles = om.OracleSet()
    a = oracles.add_committed(4, 5, "a")
    s = oracles.add_committed(4, 5, "sel")
    t1 = oracles.add_transparent(tp.StepDown(4, 7), "mask")
    t2 = oracles.add_transparent(tp.MLEFromValues(tuple(range(16)), 5), "pat")
    comp = oracles.add_composite(4, [a, s], ArithExpr.var(0) * ArithExpr.var(1) + 3, "c")
    from binius_tpu.constraint_system.system import ConstraintSet, ConstraintSystem
    system = ConstraintSystem(
        oracles,
        [ConstraintSet(4, (a, s), (ArithExpr.var(0) * ArithExpr.var(1),))],
        flushes=[Flush(0, PUSH, (a,), 2, (s,)), Flush(0, PULL, (a,))],
        n_channels=1)
    raw = ser.serialize(system)
    system2 = ser.deserialize(raw)
    assert system2.digest() == system.digest()
    o = system2.oracles[comp]
    assert o.variant == om.COMPOSITE
    assert o.composite.evaluate_scalar(7, [5, 9]) == \
        system.oracles[comp].composite.evaluate_scalar(7, [5, 9])
    assert system2.flushes[0].selector_ids == (s,)
    assert system2.oracles[t1].transparent.evaluate_scalar([1, 0, 1, 0]) == \
        system.oracles[t1].transparent.evaluate_scalar([1, 0, 1, 0])
