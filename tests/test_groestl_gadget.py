"""Grøstl permutation gadget tests (`gadgets/hash/groestl.rs`)."""

import random

import numpy as np
import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.hash.groestl import _permute
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.groestl import (Permutation, sbox_tower_matrix_cols,
                                           sbox_tower_offset)

random.seed(181)


def test_derived_affine_constants_match_reference():
    """Parity anchors: the conjugated S-box affine constants must equal the
    reference's precomputed tables (`groestl.rs:31-44`)."""
    assert sbox_tower_matrix_cols() == (0x62, 0xD2, 0x79, 0x41, 0xF4, 0xD5,
                                        0x81, 0x4E)
    assert sbox_tower_offset() == 0x14


def _run_variant(variant: str, log_rows: int = 1):
    m3 = M3ConstraintSystem()
    t = m3.add_table("groestl")
    g = Permutation.build(t, "perm", variant)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    states = [np.array([[random.getrandbits(8) for _ in range(8)]
                        for _ in range(8)], dtype=np.uint8)
              for _ in range(1 << log_rows)]
    outs = g.populate(tw, states)
    for st, out in zip(states, outs):
        want = _permute(st, is_q=(variant == "Q"))
        assert np.array_equal(np.array(out, dtype=np.uint8), want), variant
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)
    return core, omap, wi, g


def test_groestl_p_permutation():
    _run_variant("P")


def test_groestl_q_permutation():
    _run_variant("Q")


def test_groestl_bad_inv_bit_rejected():
    m3 = M3ConstraintSystem()
    t = m3.add_table("groestl")
    g = Permutation.build(t, "perm", "P")
    core, omap = m3.compile([1])
    wi = WitnessIndex(m3, [1])
    tw = wi.table(0)
    states = [np.zeros((8, 8), dtype=np.uint8) for _ in range(2)]
    g.populate(tw, states)
    sb = g.rounds[3].sbox[2]
    vals = tw.get_column(sb.inv_bits[5])
    vals[0] ^= 1
    tw.set_column(sb.inv_bits[5], vals)
    witness = wi.to_core_witness(core, omap)
    with pytest.raises(ValueError):
        validate_witness(core, witness)
