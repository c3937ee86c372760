"""Grøstl-256, Merkle tree, and Fiat-Shamir transcript tests."""

import numpy as np
import pytest

from binius_tpu.hash.groestl import Groestl256, compress_pairs, groestl256
from binius_tpu.merkle.tree import MerkleTree, hash_leaves, verify_branch
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript


def test_groestl_official_vectors():
    # Official Grøstl-256 KATs from the SHA-3 submission package.
    assert groestl256(b"").hex() == (
        "1a52d11d550039be16107f9c58db9ebcc417f16f736adb2502567119f0083467")
    assert groestl256(b"abc").hex() == (
        "f3c1bb19c048801326a7efbcf16e3d7887446249829c379e1840d1a3a1e7d4d2")


def test_groestl_streaming_chunked():
    data = bytes(range(256)) * 3
    for chunks in [[data], [data[:1], data[1:]], [data[i:i+37] for i in range(0, len(data), 37)]]:
        g = Groestl256()
        for c in chunks:
            g.update(c)
        assert g.finalize() == groestl256(data)


def test_hash_leaves_matches_single():
    blobs = np.frombuffer(bytes(range(200)) + bytes(200), dtype=np.uint8).reshape(4, 100)
    got = hash_leaves(blobs)
    for i in range(4):
        assert got[i].tobytes() == groestl256(blobs[i].tobytes())


def test_merkle_roundtrip():
    rng = np.random.default_rng(0)
    blobs = rng.integers(0, 256, size=(16, 48), dtype=np.uint8)
    tree = MerkleTree.build(hash_leaves(blobs))
    for i in [0, 7, 15]:
        br = tree.branch(i)
        assert verify_branch(tree.root, i, groestl256(blobs[i].tobytes()), br)
        # wrong leaf fails
        assert not verify_branch(tree.root, i, groestl256(b"wrong"), br)
        # wrong index fails
        assert not verify_branch(tree.root, i ^ 1, groestl256(blobs[i].tobytes()), br)


def test_compress_pairs_is_output_transform():
    a, b = groestl256(b"left"), groestl256(b"right")
    out = compress_pairs(np.frombuffer(a + b, dtype=np.uint8)[None, :])[0]
    assert out.shape == (32,)
    # deterministic and distinct from plain digest
    out2 = compress_pairs(np.frombuffer(a + b, dtype=np.uint8)[None, :])[0]
    assert out.tobytes() == out2.tobytes() != groestl256(a + b)


def test_transcript_prover_verifier_agree():
    pt = ProverTranscript()
    w = pt.message()
    w.write_scalar(7, 0x1234567890ABCDEF)
    c1 = pt.sample_scalar(7)
    w = pt.message()
    w.write_scalars(7, [1, 2, 3])
    pt.decommitment().write_bytes(b"advice-bytes")
    c2 = pt.sample_bits(10)
    proof = pt.finalize()

    vt = VerifierTranscript(proof)
    r = vt.message()
    assert r.read_scalar(7) == 0x1234567890ABCDEF
    assert vt.sample_scalar(7) == c1
    assert vt.message().read_scalars(7, 3) == [1, 2, 3]
    assert vt.decommitment().read_bytes(12) == b"advice-bytes"
    assert vt.sample_bits(10) == c2
    vt.finalize()


def test_transcript_advice_does_not_affect_challenges():
    def run(advice):
        pt = ProverTranscript()
        pt.message().write_scalar(7, 42)
        pt.decommitment().write_bytes(advice)
        return pt.sample_scalar(7)
    assert run(b"aaaa") == run(b"bbbb")


def test_transcript_observed_data_affects_challenges():
    def run(v):
        pt = ProverTranscript()
        pt.message().write_scalar(7, v)
        return pt.sample_scalar(7)
    assert run(1) != run(2)


def test_transcript_unread_detection():
    pt = ProverTranscript()
    pt.message().write_scalar(7, 42)
    vt = VerifierTranscript(pt.finalize())
    with pytest.raises(ValueError):
        vt.finalize()


def test_sample_deterministic_sequence():
    # Samples with no observations: digest chain of H("")
    pt1, pt2 = ProverTranscript(), ProverTranscript()
    seq1 = [pt1.sample_scalar(7) for _ in range(5)]
    seq2 = [pt2.sample_scalar(7) for _ in range(5)]
    assert seq1 == seq2
    assert len(set(seq1)) == 5


def test_sha256_challenger_state_machine():
    """HasherChallenger<Sha256> (`crates/hash/src/sha2.rs` alternate hash):
    same state machine as the Grøstl instance, byte-checkable against
    hashlib directly."""
    import hashlib

    from binius_tpu.transcript.fiat_shamir import HasherChallenger

    c = HasherChallenger("sha256")
    d0 = hashlib.sha256(b"").digest()
    # first sample: buffer = H(""), running hasher already fed it
    assert c.sample(8) == d0[:8]
    c.observe(b"hello")
    # observe absorbed the sampler index (8 bytes LE) then the data
    h = hashlib.sha256(d0 + (8).to_bytes(8, "little") + b"hello")
    d1 = h.digest()
    assert c.sample(32) == d1
    # next refill re-keys on the previous digest
    assert c.sample(4) == hashlib.sha256(d1).digest()[:4]


def test_sha256_transcript_round_trip():
    from binius_tpu.transcript.transcript import (ProverTranscript,
                                                  VerifierTranscript)

    pt = ProverTranscript("sha256")
    pt.message().write_bytes(b"abc")
    ch = pt.sample_scalar(7)
    proof = pt.finalize()
    vt = VerifierTranscript(proof, "sha256")
    assert vt.message().read_bytes(3) == b"abc"
    assert vt.sample_scalar(7) == ch

    gt = ProverTranscript()
    gt.message().write_bytes(b"abc")
    assert gt.sample_scalar(7) != ch  # different challenger hash
