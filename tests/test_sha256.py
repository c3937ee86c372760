"""SHA-256 gadget tests: circuit digest vs hashlib, witness validation."""

import hashlib
import random

from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.gadgets.sha256 import Sha256

random.seed(121)


def test_sha256_circuit_witness():
    log_rows = 1
    m3 = M3ConstraintSystem()
    t = m3.add_table("sha256")
    msg = [t.add_committed(f"m{i}", 0, 5) for i in range(16)]
    gadget = Sha256.build(t, "sha", msg)
    core, omap = m3.compile([log_rows])
    wi = m3_witness = __import__("binius_tpu.m3.builder.witness", fromlist=["WitnessIndex"]).WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    rows = []
    raw_msgs = []
    for _ in range(1 << log_rows):
        raw = bytes(random.getrandbits(8) for _ in range(64))
        raw_msgs.append(raw)
        rows.append([int.from_bytes(raw[4 * i:4 * i + 4], "big") for i in range(16)])
    for i, col in enumerate(msg):
        tw.set_packed_ints(col, [r[i] for r in rows])
    digests = gadget.populate(tw, rows)
    # digest matches hashlib sha256 compression of a single block:
    # sha256(one 64-byte block with padding) requires 2 blocks, so instead
    # compare against a direct reimplementation check: hashlib on the raw
    # 64-byte message equals our compression only when we replicate padding;
    # simplest exact check: compress the padded block of b"" (length 0).
    for words, digest in zip(rows, digests):
        # cross-check against hashlib via one-shot: build a message whose
        # single padded block equals `words`? Instead verify algebraically:
        # recompute with an independent textbook implementation.
        assert digest == _sha256_compress_ref(words)
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def _sha256_compress_ref(words):
    """Independent textbook single-block compression from the IV."""
    import struct
    K = __import__("binius_tpu.m3.gadgets.sha256", fromlist=["K"]).K
    IV = __import__("binius_tpu.m3.gadgets.sha256", fromlist=["IV"]).IV
    M = 0xFFFFFFFF

    def rotr(v, n):
        return ((v >> n) | (v << (32 - n))) & M

    w = list(words)
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M)
    a, b, c, d, e, f, g, h = IV
    for r in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g) & M
        t1 = (h + S1 + (ch & M) + K[r] + w[r]) & M
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & M
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
    return [(s + iv) & M for s, iv in zip([a, b, c, d, e, f, g, h], IV)]


def test_sha256_ref_matches_hashlib():
    """The textbook compression must agree with hashlib on b'abc' (whose
    padded message is a single block)."""
    import struct
    block = b"abc" + b"\x80" + bytes(52) + struct.pack(">Q", 24)
    words = [int.from_bytes(block[4 * i:4 * i + 4], "big") for i in range(16)]
    digest_words = _sha256_compress_ref(words)
    digest = b"".join(w.to_bytes(4, "big") for w in digest_words)
    assert digest == hashlib.sha256(b"abc").digest()
