"""Golden-transcript fixtures (docs/TRANSCRIPT.md).

Self-golden tests pin OUR proof/challenger byte format against committed
fixtures, so any accidental format change fails loudly (the analog of the
reference's serialization snapshot tests). Rust-captured fixtures are loaded
when present; this image cannot generate them (no Rust toolchain, no
egress), so that test skips with a pointer to the schema.

Regenerate self-goldens after an INTENTIONAL format change with
    BINIUS_REGEN_GOLDEN=1 python -m pytest tests/test_golden_transcript.py
and document the change in docs/TRANSCRIPT.md.
"""

import hashlib
import json
import os
import random

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
REGEN = os.environ.get("BINIUS_REGEN_GOLDEN", "") not in ("", "0")


def _golden(name: str, produce):
    path = os.path.join(FIXTURES, name)
    value = produce()
    if REGEN or not os.path.exists(path):
        os.makedirs(FIXTURES, exist_ok=True)
        with open(path, "w") as f:
            json.dump(value, f, indent=1, sort_keys=True)
        if not REGEN:
            pytest.skip(f"fixture {name} created; rerun to check")
    with open(path) as f:
        want = json.load(f)
    assert value == want, (
        f"{name} diverged — if the format change is intentional, regenerate "
        f"with BINIUS_REGEN_GOLDEN=1 and document it in docs/TRANSCRIPT.md")


def test_groestl_spec_vectors():
    """Grøstl-256 against spec digests (shared ground with the reference)."""
    from binius_tpu.hash.groestl import groestl256

    # Known-answer: empty-message digest from the Grøstl final submission.
    assert groestl256(b"").hex() == (
        "1a52d11d550039be16107f9c58db9ebcc417f16f736adb2502567119f0083467")


def test_challenger_self_golden():
    """Pin the HasherChallenger state machine byte-for-byte."""
    from binius_tpu.transcript.fiat_shamir import HasherChallenger

    def produce():
        ch = HasherChallenger()
        out = {"samples": []}
        ch.observe(b"binius-tpu golden")
        out["samples"].append(ch.sample(16).hex())
        ch.observe(bytes(range(64)))
        out["samples"].append(ch.sample(16).hex())
        out["samples"].append(ch.sample(33).hex())
        ch.observe(b"")
        out["samples"].append(ch.sample(4).hex())
        return out

    _golden("challenger_self_golden.json", produce)


def test_proof_self_golden():
    """Pin the end-to-end proof bytes for a fixed tiny circuit."""
    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets import arith

    def produce():
        rng = random.Random(42)
        log_n = 3
        n = 1 << log_n
        m3 = M3ConstraintSystem()
        t = m3.add_table("u32add")
        xin = t.add_committed("xin", 0, arith.LOG_U32)
        yin = t.add_committed("yin", 0, arith.LOG_U32)
        adder = arith.U32Add.build(t, "add", xin, yin)
        core, omap = m3.compile([log_n])
        wi = WitnessIndex(m3, [log_n])
        tw = wi.table(0)
        xs = [rng.getrandbits(32) for _ in range(n)]
        ys = [rng.getrandbits(32) for _ in range(n)]
        tw.set_packed_ints(xin, xs)
        tw.set_packed_ints(yin, ys)
        adder.populate(tw, xs, ys)
        witness = wi.to_core_witness(core, omap)
        proof = csp.prove(core, witness, log_inv_rate=1)
        csp.verify(core, proof, log_inv_rate=1)
        return {"n_bytes": len(proof),
                "sha256": hashlib.sha256(proof).hexdigest()}

    _golden("proof_self_golden.json", produce)


def test_rust_reference_fixtures():
    """Check Rust-captured challenger vectors when available
    (schema: docs/TRANSCRIPT.md)."""
    path = os.path.join(FIXTURES, "rust_challenger.json")
    if not os.path.exists(path):
        pytest.skip("no Rust-captured fixtures in this image "
                    "(see docs/TRANSCRIPT.md for the schema)")
    from binius_tpu.hash.groestl import groestl256
    from binius_tpu.transcript.fiat_shamir import HasherChallenger

    with open(path) as f:
        fx = json.load(f)
    for vec in fx.get("groestl256", []):
        got = groestl256(bytes.fromhex(vec["input_hex"]))
        assert got.hex() == vec["digest_hex"]
    for vec in fx.get("challenger", []):
        ch = HasherChallenger()
        for h in vec["observe_hex"]:
            ch.observe(bytes.fromhex(h))
        got = b"".join(ch.sample(n) for n in vec["sample_lens"])
        assert got.hex() == "".join(vec["samples_hex"])
