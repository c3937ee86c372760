"""Vision Mark-32 hash tests (`crates/hash/src/vision/`)."""

import numpy as np

from binius_tpu.fields import scalar
from binius_tpu.hash import vision
from binius_tpu.merkle.tree import MerkleTree, verify_branch, vision_scheme


def test_golden_vectors():
    """Byte-exact parity with the reference (`digest.rs:367-407`)."""
    assert vision.digest(bytes([0xDE, 0xAD, 0xBE, 0xEF])).hex() == \
        "8ed389809fabe91cead4786eb08e2d32647a9ac69143040de500e4465c72f173"
    long = (b"One part of the mysterious existence of Captain Nemo had been "
            b"unveiled and, if his identity had not been recognised, at least, "
            b"the nations united against him were no longer hunting a chimerical "
            b"creature, but a man who had vowed a deadly hatred against them")
    assert vision.digest(long).hex() == \
        "b615664d0249149b5655a86919169f0fd4b44fec83d4c43e4f1f124c3f9a82c3"
    unaligned = (b"You can prove anything you want by coldly logical reason--if "
                 b"you pick the proper postulates.")
    assert vision.digest(unaligned).hex() == \
        "0aa2879dcac953550ebe5d9da2a91d3c0356feca9044acf4edca87b28d9959e1"


def test_streaming_chunks_match_oneshot():
    data = bytes(range(256)) * 2
    one = vision.digest(data)
    h = vision.VisionHasherDigest()
    h.update(data[:63]).update(data[63:128]).update(data[128:163]).update(data[163:])
    assert h.finalize() == one


def test_mds_matrix_is_mds_like():
    """Every entry nonzero and matrix invertible (sanity on the derived MDS)."""
    m = vision._mds_matrix()
    assert m.shape == (24, 24) and (m != 0).all()
    # invertible over B8: Gaussian elimination with field inverse
    a = [[int(v) for v in row] for row in m]
    n = 24
    for c in range(n):
        piv = next(r for r in range(c, n) if a[r][c])
        a[c], a[piv] = a[piv], a[c]
        inv = scalar.invert(3, a[c][c])
        a[c] = [scalar.mul(3, inv, v) for v in a[c]]
        for r in range(n):
            if r != c and a[r][c]:
                f = a[r][c]
                a[r] = [v ^ scalar.mul(3, f, w) for v, w in zip(a[r], a[c])]
    assert all(a[i][i] == 1 for i in range(n))


def test_device_batch_matches_scalar():
    rng = np.random.default_rng(11)
    msgs = rng.integers(0, 256, size=(6, 130), dtype=np.uint8)
    dev = vision.digest_many(msgs)
    for i in range(6):
        assert bytes(dev[i]) == vision.digest(bytes(msgs[i]))


def test_merkle_over_vision():
    """The Merkle VCS instantiates over Vision (`merkle_tree/scheme.rs`)."""
    scheme = vision_scheme()
    rng = np.random.default_rng(5)
    blobs = rng.integers(0, 256, size=(8, 48), dtype=np.uint8)
    leaves = np.asarray(scheme.hash_leaves(blobs))
    tree = MerkleTree.build(leaves, scheme)
    for i in (0, 3, 7):
        br = tree.branch(i)
        assert verify_branch(tree.root, i, leaves[i].tobytes(), br, scheme)
    bad = bytearray(leaves[2].tobytes())
    bad[0] ^= 1
    assert not verify_branch(tree.root, 2, bytes(bad), tree.branch(2), scheme)
