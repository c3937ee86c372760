"""Merkle-tree inclusion gadget tests (`gadgets/merkle_tree/`)."""

import random

import numpy as np
import pytest

from binius_tpu.constraint_system.system import validate_witness
from binius_tpu.hash.groestl import compress_pairs
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.merkle_tree import (MerkleTreeCS, MerkleTreeTrace,
                                               digest_to_channel_values)

random.seed(191)


def _random_leaves(n):
    return [bytes(random.getrandbits(8) for _ in range(32)) for _ in range(n)]


def _build(trace, n_mult_bits=4):
    m3 = M3ConstraintSystem()
    cs = MerkleTreeCS(m3, n_multiplicity_bits=n_mult_bits)
    sizes = cs.table_sizes(trace)
    core, omap = m3.compile_sizes(sizes)
    wi = WitnessIndex.with_sizes(m3, sizes)
    cs.fill_tables(trace, wi)
    witness = wi.to_core_witness(core, omap)
    boundaries = cs.make_boundaries(trace)
    return m3, cs, core, witness, boundaries


def test_merkle_inclusion_validates():
    leaves = _random_leaves(4)
    trace = MerkleTreeTrace.generate(7, leaves, [1, 2])
    assert len(trace.events) == 3
    m3, cs, core, witness, boundaries = _build(trace)
    validate_witness(core, witness, boundaries)


def test_merkle_deeper_tree():
    leaves = _random_leaves(8)
    trace = MerkleTreeTrace.generate(3, leaves, [5])
    m3, cs, core, witness, boundaries = _build(trace)
    validate_witness(core, witness, boundaries)


def test_merkle_wrong_root_rejected():
    leaves = _random_leaves(4)
    trace = MerkleTreeTrace.generate(7, leaves, [0])
    # corrupt the root boundary
    rid, digest = trace.roots[0]
    bad = bytes([digest[0] ^ 1]) + digest[1:]
    trace.roots[0] = (rid, bad)
    m3, cs, core, witness, boundaries = _build(trace)
    with pytest.raises(ValueError):
        validate_witness(core, witness, boundaries)


def test_merkle_wrong_sibling_rejected():
    leaves = _random_leaves(4)
    trace = MerkleTreeTrace.generate(1, leaves, [0])
    # corrupt a sibling digest in an event: parent digests no longer chain
    e = trace.events[0]
    import dataclasses
    trace.events[0] = dataclasses.replace(
        e, right=bytes([e.right[0] ^ 1]) + e.right[1:])
    m3, cs, core, witness, boundaries = _build(trace)
    with pytest.raises(ValueError):
        validate_witness(core, witness, boundaries)


def test_trace_chaining():
    """Parents recompute as compress(left || right) up to the root."""
    leaves = _random_leaves(8)
    trace = MerkleTreeTrace.generate(0, leaves, [2, 7])
    for e in trace.events:
        parent = bytes(compress_pairs(
            np.frombuffer(e.left + e.right, dtype=np.uint8)[None, :])[0])
        # the parent appears either as another event's child or as the root
        found = [trace.roots[0][1]] \
            + [x.left for x in trace.events] + [x.right for x in trace.events]
        assert parent in found
