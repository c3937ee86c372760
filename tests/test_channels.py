"""Channel/flush (multiset) and non-zero claim tests through the full prover."""

import random

import pytest

from binius_tpu.constraint_system import oracle as om
from binius_tpu.constraint_system import prove as csp
from binius_tpu.constraint_system.system import (Boundary, ConstraintSystem, Flush,
                                                 NonZeroClaim, PULL, PUSH)
from binius_tpu.fields import tower

random.seed(61)


def build_permutation_system(n=3):
    """Table column `a` pushes its values into channel 0; column `b` (a
    permutation of `a`) pulls them back out."""
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    b_id = oracles.add_committed(n, 5, "b")
    a_vals = [random.getrandbits(32) for _ in range(1 << n)]
    b_vals = list(a_vals)
    random.shuffle(b_vals)
    system = ConstraintSystem(
        oracles, [],
        flushes=[Flush(0, PUSH, (a_id,)), Flush(0, PULL, (b_id,))],
        n_channels=1)
    witness = {a_id: (5, tower.from_ints(5, a_vals)),
               b_id: (5, tower.from_ints(5, b_vals))}
    return system, witness, (a_vals, b_vals)


def test_permutation_channel_balances():
    system, witness, _ = build_permutation_system()
    proof = csp.prove(system, witness)
    csp.verify(system, proof)


def test_unbalanced_channel_rejected():
    system, witness, (a_vals, b_vals) = build_permutation_system()
    bad = list(b_vals)
    bad[0] ^= 1
    witness[1] = (5, tower.from_ints(5, bad))
    with pytest.raises(ValueError):
        csp.prove(system, witness)  # prover detects imbalance


def test_boundary_balances():
    """Boundary pushes a tuple; the table pulls it among its rows."""
    n = 2
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    a_vals = [random.getrandbits(32) for _ in range(1 << n)]
    # table pulls all its rows; boundaries push exactly those values
    system = ConstraintSystem(oracles, [], flushes=[Flush(0, PULL, (a_id,))],
                              n_channels=1)
    witness = {a_id: (5, tower.from_ints(5, a_vals))}
    boundaries = [Boundary(0, PUSH, (v,)) for v in a_vals]
    proof = csp.prove(system, witness, boundaries)
    csp.verify(system, proof, boundaries)
    # wrong boundary set -> verifier rejects
    bad = [Boundary(0, PUSH, (v ^ 1,)) for v in a_vals]
    with pytest.raises(ValueError):
        csp.verify(system, proof, bad)


def test_non_zero_claim():
    n = 3
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    a_vals = [random.getrandbits(32) | 1 for _ in range(1 << n)]
    system = ConstraintSystem(oracles, [], non_zero_claims=[NonZeroClaim(a_id)])
    witness = {a_id: (5, tower.from_ints(5, a_vals))}
    proof = csp.prove(system, witness)
    csp.verify(system, proof)
    # a zero entry makes the product zero -> verifier rejects
    zero_vals = list(a_vals)
    zero_vals[3] = 0
    witness[a_id] = (5, tower.from_ints(5, zero_vals))
    proof2 = csp.prove(system, witness)
    with pytest.raises(ValueError):
        csp.verify(system, proof2)
