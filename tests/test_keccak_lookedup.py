"""Lookedup Keccak-f variant (`gadgets/hash/keccak/lookedup.rs` counterpart):
chi through the bit-AND lookup channel, zero zerocheck constraints."""

import os
import random

import pytest

from binius_tpu.constraint_system import prove as csp
from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.keccak import KeccakLookedupCS, keccak_f

random.seed(77)
FULL = os.environ.get("BINIUS_M3_TEST_PROVE_VERIFY", "") not in ("", "0")


def _build(log_n):
    n = 1 << log_n
    m3 = M3ConstraintSystem()
    cs = KeccakLookedupCS.build(m3, log_n)
    sizes = cs.table_sizes(n)
    core, omap = m3.compile_sizes(sizes)
    wi = WitnessIndex.with_sizes(m3, sizes)
    rows = [[random.getrandbits(64) for _ in range(25)] for _ in range(n)]
    outs = cs.populate(wi, rows)
    for got, lanes in zip(outs, rows):
        assert got == keccak_f(lanes)
    witness = wi.to_core_witness(core, omap)
    return core, witness, sizes


def test_keccak_lookedup_validates():
    core, witness, sizes = _build(1)
    assert not core.constraint_sets, "lookedup chi must be constraint-free"
    validate_witness(core, witness)


def test_keccak_lookedup_tampered_and_rejected():
    core, witness, sizes = _build(0)
    # corrupt one committed round-output bit: the merged pull leaves the
    # bit-AND table and the channel cannot balance
    oid = max(oid for oid, (lvl, _) in witness.items() if lvl == 0)
    lvl, data = witness[oid]
    import jax.numpy as jnp
    witness[oid] = (lvl, data.at[0].set(data[0] ^ 1))
    with pytest.raises(ValueError):
        validate_witness(core, witness)


@pytest.mark.skipif(not FULL, reason="set BINIUS_M3_TEST_PROVE_VERIFY=1")
def test_keccak_lookedup_full_prove():
    core, witness, sizes = _build(0)
    proof = csp.prove(core, witness, log_inv_rate=1, table_sizes=sizes)
    csp.verify(core, proof, log_inv_rate=1, table_sizes=sizes)
