"""End-to-end constraint system test: a u32 addition circuit (the reference's
`examples/u32_add.rs` shape) proven and verified through the full pipeline:
zerocheck -> evalcheck (shifted oracle) -> ring switch -> PIOP/FRI."""

import random

import pytest

from binius_tpu.constraint_system import oracle as om
from binius_tpu.constraint_system import prove as csp
from binius_tpu.constraint_system.system import ConstraintSet, ConstraintSystem, validate_witness
from binius_tpu.fields import tower
from binius_tpu.math.arith import ArithExpr
from binius_tpu.protocols import shift_ind

random.seed(77)


def build_u32_add(log_n_adds=2):
    """Committed B1 columns x, y, z, cout; virtual cin = cout >> 1 (in index
    space); constraints: carry propagation and xor-sum."""
    n = 5 + log_n_adds
    oracles = om.OracleSet()
    x_id = oracles.add_committed(n, 0, "x")
    y_id = oracles.add_committed(n, 0, "y")
    z_id = oracles.add_committed(n, 0, "z")
    cout_id = oracles.add_committed(n, 0, "cout")
    cin_id = oracles.add_shifted(cout_id, 1, 5, shift_ind.LOGICAL_LEFT, "cin")

    X, Y, CIN, Z, COUT = (ArithExpr.var(i) for i in range(5))
    carry = (X + CIN) * (Y + CIN) + CIN + COUT
    xsum = X + Y + CIN + Z
    cs = ConstraintSet(n, (x_id, y_id, cin_id, z_id, cout_id), (carry, xsum))
    system = ConstraintSystem(oracles, [cs])

    # witness
    n_adds = 1 << log_n_adds
    xb, yb, zb, coutb, cinb = [], [], [], [], []
    for _ in range(n_adds):
        xv = random.getrandbits(32)
        yv = random.getrandbits(32)
        zv = (xv + yv) & 0xFFFFFFFF
        cin = 0
        for i in range(32):
            xi, yi = (xv >> i) & 1, (yv >> i) & 1
            cout = (xi & yi) | (cin & (xi ^ yi))
            xb.append(xi)
            yb.append(yi)
            zb.append((zv >> i) & 1)
            cinb.append(cin)
            coutb.append(cout)
            cin = cout
    witness = {
        x_id: (0, tower.from_ints(0, xb)),
        y_id: (0, tower.from_ints(0, yb)),
        z_id: (0, tower.from_ints(0, zb)),
        cout_id: (0, tower.from_ints(0, coutb)),
        cin_id: (0, tower.from_ints(0, cinb)),
    }
    # sanity: cin really is the shifted cout
    assert cinb == shift_ind.apply_shift_ints(shift_ind.LOGICAL_LEFT, 5, 1, coutb)
    return system, witness


def test_validate_witness():
    system, witness = build_u32_add()
    validate_witness(system, witness)
    # corrupt one bit -> violation
    bad = dict(witness)
    z_id = 2
    vals = tower.to_ints(0, witness[z_id][1])
    vals[7] ^= 1
    bad[z_id] = (0, tower.from_ints(0, vals))
    with pytest.raises(ValueError):
        validate_witness(system, bad)


def test_u32_add_prove_verify_and_tamper():
    system, witness = build_u32_add()
    proof = csp.prove(system, witness)
    csp.verify(system, proof)
    assert len(proof) < 60_000, f"proof unexpectedly large: {len(proof)}"
    proof = bytearray(proof)
    rejected = 0
    for frac in (3, 2, 1.5, 1.1):
        bad = bytearray(proof)
        bad[int(len(bad) // frac)] ^= 1
        try:
            csp.verify(system, bytes(bad))
        except (ValueError, EOFError, AssertionError):
            rejected += 1
    assert rejected == 4



def test_u32_add_wrong_witness_rejected():
    system, witness = build_u32_add()
    z_id = 2
    vals = tower.to_ints(0, witness[z_id][1])
    vals[5] ^= 1
    witness[z_id] = (0, tower.from_ints(0, vals))
    # an honest prover would not produce this; the dishonest proof must fail
    proof = csp.prove(system, witness)
    with pytest.raises((ValueError, EOFError)):
        csp.verify(system, proof)
