"""Keccak-f gadget tests: host permutation vs hashlib, circuit witness
validation (full prove gated behind BINIUS_M3_TEST_PROVE_VERIFY=1)."""

import hashlib
import random

from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.builder.test_utils import validate_system_witness
from binius_tpu.m3.gadgets.keccak import KeccakF, keccak_f

random.seed(101)


def test_keccak_f_matches_sha3():
    def sha3_256(msg: bytes) -> bytes:
        rate = 136
        p = bytearray(msg)
        p.append(0x06)
        while len(p) % rate:
            p.append(0)
        p[-1] |= 0x80
        lanes = [0] * 25
        for off in range(0, len(p), rate):
            block = p[off:off + rate]
            for i in range(rate // 8):
                lanes[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
            lanes = keccak_f(lanes)
        return b"".join(l.to_bytes(8, "little") for l in lanes[:4])

    for msg in [b"", b"abc", bytes(range(200))]:
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_keccak_circuit_witness():
    log_rows = 1
    m3 = M3ConstraintSystem()
    t = m3.add_table("keccak")
    state_in = [t.add_committed(f"in{i}", 0, 6) for i in range(25)]
    gadget = KeccakF.build(t, "kf", state_in)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    rows = [[random.getrandbits(64) for _ in range(25)] for _ in range(1 << log_rows)]
    outs = gadget.populate(tw, rows)
    for row_in, row_out in zip(rows, outs):
        assert row_out == keccak_f(row_in)
    witness = wi.to_core_witness(core, omap)
    validate_system_witness(core, witness)


def test_keccak_circuit_detects_bad_round():
    log_rows = 1
    m3 = M3ConstraintSystem()
    t = m3.add_table("keccak")
    state_in = [t.add_committed(f"in{i}", 0, 6) for i in range(25)]
    gadget = KeccakF.build(t, "kf", state_in)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    rows = [[random.getrandbits(64) for _ in range(25)] for _ in range(1 << log_rows)]
    gadget.populate(tw, rows)
    # corrupt one lane of round 7's output
    col = gadget.rounds_out[7][12]
    vals = tw.get_packed_ints(col)
    vals[0] ^= 1 << 33
    tw.set_packed_ints(col, vals)
    witness = wi.to_core_witness(core, omap)
    import pytest
    from binius_tpu.constraint_system.system import validate_witness
    with pytest.raises(ValueError):
        validate_witness(core, witness)
