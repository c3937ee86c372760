"""Bitsliced Grøstl device kernels vs the from-spec host implementation.

The bitsliced path (`hash/groestl_bitslice.py`) derives its AES S-box circuit
from the GF(((2^2)^2)^2) tower decomposition; these tests pin every public
entry point against `hash/groestl.py` (itself tested against spec vectors in
test_hash_transcript.py).
"""

import numpy as np
import pytest

from binius_tpu.hash import groestl_bitslice as gb
from binius_tpu.hash.groestl import (
    _permute, aes_sbox, bytes_to_state, compress_pairs, groestl256)

RNG = np.random.default_rng(7)


def test_sbox_circuit_all_inputs():
    xs = np.arange(256, dtype=np.uint8)
    planes = gb._bytes_to_bitplanes_np(xs)
    out = gb._sbox_planes([p for p in planes], np)
    got = gb._bitplanes_to_bytes_np(np.stack(out))
    assert np.array_equal(got, aes_sbox()[xs])


@pytest.mark.parametrize("is_q", [False, True])
def test_permute_planes_matches_spec(is_q):
    import jax.numpy as jnp

    n = 64
    states = RNG.integers(0, 256, size=(n, 64), dtype=np.uint8)
    # bitsliced
    w = jnp.asarray(np.ascontiguousarray(states).view("<u4"))
    planes = gb.blockplanes_to_state(gb.words_to_byteplanes(w))
    out_planes = gb.permute_planes(planes, is_q)
    out_w = gb.byteplanes_to_words(gb.state_to_blockplanes(out_planes))
    got = (np.asarray(out_w).astype("<u4").view(np.uint8).reshape(n, 64))
    # spec path
    ref_state = _permute(bytes_to_state(states), is_q)
    ref = ref_state.swapaxes(-1, -2).reshape(n, 64)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("leaf_len", [32, 64, 128, 256])
def test_leaf_hashing_matches_groestl256(leaf_len):
    blobs = RNG.integers(0, 256, size=(64, leaf_len), dtype=np.uint8)
    got = gb.hash_leaves_device_bs(blobs)
    ref = np.stack([
        np.frombuffer(groestl256(blobs[i].tobytes()), dtype=np.uint8)
        for i in range(blobs.shape[0])])
    assert np.array_equal(got, ref)


def test_pairs_kernel_matches_compression():
    import jax.numpy as jnp

    d = RNG.integers(0, 256, size=(128, 32), dtype=np.uint8)
    dig32 = jnp.asarray(np.ascontiguousarray(d).view("<u4"))
    got = (np.asarray(gb.pairs_kernel(dig32)).astype("<u4")
           .view(np.uint8).reshape(-1, 32))
    ref = compress_pairs(d.reshape(-1, 64))
    assert np.array_equal(got, ref)


def test_commit_codeword_device_matches_host_tree():
    """Full device tree (bitsliced leaves + levels) == host tree."""
    import jax.numpy as jnp

    from binius_tpu.merkle.tree import MerkleTree, commit_codeword_device
    from binius_tpu.protocols.fri import leaf_blobs
    from binius_tpu.merkle.tree import hash_leaves

    n, limbs, log_coset = 1 << 11, 4, 2
    cw_np = RNG.integers(0, 2**32, size=(n, limbs), dtype=np.uint32)
    dev = commit_codeword_device(jnp.asarray(cw_np), log_coset)
    host = MerkleTree.build(hash_leaves(leaf_blobs(cw_np, log_coset)))
    assert dev.root == host.root
    assert len(dev.layers) == len(host.layers)
    for a, b in zip(dev.layers, host.layers):
        assert np.array_equal(a, b)
