"""Reference-format (CanonicalTower) constraint-system serialization.

The grammar is pinned by hand-assembled byte vectors derived from the
reference's serialization rules (`crates/utils/src/serialization.rs`
primitives, `crates/macros/src/lib.rs:41-44` enum encoding,
`oracle/symbolic.rs` struct orders); round-trip and digest properties on a
real M3-compiled system.
"""

import struct

from binius_tpu.constraint_system import canonical as canon
from binius_tpu.math.arith import ArithExpr


def _u32(v):
    return struct.pack("<I", v)


def _f128(v):
    return int(v).to_bytes(16, "little")


def test_byte_grammar_hand_vector():
    # one committed oracle + one shifted oracle, one zero constraint
    # x0 * x1, one flush, no exponents, 1 channel, one arbitrary table
    e = ArithExpr.var(0) * ArithExpr.var(1)
    sym = canon.SymbolicSystem(
        oracles=(
            canon.SymbolicOracle("a", 0, 0, 5, ("committed",)),
            canon.SymbolicOracle(None, 0, 0, 5,
                                 ("shifted", 0, 1, 5, "logical_right")),
        ),
        constraint_sets=(
            canon.SymbolicConstraintSet(
                0, 0, (0, 1),
                (canon.SymbolicConstraint("c", canon.circuit_steps(e),
                                          ("zero",)),)),
        ),
        non_zero_oracle_ids=(1,),
        flushes=(
            canon.SymbolicFlush(0, 0, (("oracle", 0), ("const", 3, 5)),
                                0, "pull", (1,), 2),
        ),
        exponents=(),
        channel_count=1,
        table_size_specs=(("arbitrary",), ("fixed", 4)),
    )
    want = b"".join([
        # oracles: Vec len 2
        _u32(2),
        # oracle 0: id, Some("a"), table_id, log_vpr, tower_level, variant 0
        _u32(0), b"\x01", _u32(1), b"a", _u32(0), _u32(0), _u32(5), b"\x00",
        # oracle 1: id, None, ..., variant 5 Shifted{id=0, off=1, block=5,
        # LogicalRight=2}
        _u32(1), b"\x00", _u32(0), _u32(0), _u32(5), b"\x05",
        _u32(0), _u32(1), _u32(5), b"\x02",
        # table_constraints: Vec len 1: table_id, vpr, oracle_ids, constraints
        _u32(1), _u32(0), _u32(0), _u32(2), _u32(0), _u32(1),
        # constraints: Vec len 1: name "c", circuit, predicate Zero=1
        _u32(1), _u32(1), b"c",
        # circuit: steps Var(0), Var(1), Mul(0,1)
        _u32(3), b"\x04", _u32(0), b"\x04", _u32(1), b"\x01", _u32(0), _u32(1),
        b"\x01",
        # non_zero_oracle_ids
        _u32(1), _u32(1),
        # flushes: Vec len 1: table_id, vpr, oracles, channel, dir Pull=1,
        # selectors, multiplicity u64
        _u32(1), _u32(0), _u32(0),
        _u32(2), b"\x00", _u32(0), b"\x01", _f128(3), _u32(5),
        _u32(0), b"\x01", _u32(1), _u32(1), struct.pack("<Q", 2),
        # exponents
        _u32(0),
        # channel_count
        _u32(1),
        # table_size_specs: Arbitrary=0, Fixed{log_size=4}=2
        _u32(2), b"\x00", b"\x02", _u32(4),
    ])
    got = canon.serialize(sym)
    assert got == want, (got.hex(), want.hex())
    assert canon.deserialize(got) == sym


def test_circuit_arc_identity_emission():
    """Arc-pointer dedup semantics (`arith_expr.rs:700-761`): a reused
    subexpression (`let s = x0 + x1; s.clone() * s` in Rust) duplicates its
    TOP node per use while the children Arcs minted at its construction are
    shared — steps: Var0, Var1, Add(0,1), Add(0,1), Mul(2,3)."""
    s = ArithExpr.var(0) + ArithExpr.var(1)
    e = s * s
    steps = canon.circuit_steps(e)
    assert steps == (("var", 0), ("var", 1), ("add", 0, 1), ("add", 0, 1),
                     ("mul", 2, 3))
    sym = canon.SymbolicOracle(None, 0, 0, 7, ("structured", steps))
    w = canon._W()
    canon._w_oracle(w, sym, 0)
    raw = w.b.getvalue()
    # skip id(4) + None(1) + table_id/vpr/level(12) + variant tag(1)
    body = raw[18:]
    n_steps = struct.unpack("<I", body[:4])[0]
    assert n_steps == 5
    assert body[4:].startswith(
        b"\x04" + _u32(0) + b"\x04" + _u32(1) + b"\x00" + _u32(0) + _u32(1)
        + b"\x00" + _u32(0) + _u32(1) + b"\x01" + _u32(2) + _u32(3))


def test_circuit_separate_construction_no_dedup():
    """Separately constructed equal subtrees must NOT dedup — the reference
    only dedups on Arc identity. `(x+ci)*(y+ci)+ci` emits three Var(ci)
    steps when every `ci` use mints a fresh Var (the Col-operand model)."""
    def V(i):
        return ArithExpr.var(i)
    e = (V(0) + V(2)) * (V(1) + V(2)) + V(2)
    steps = canon.circuit_steps(e)
    assert steps == (
        ("var", 0), ("var", 2), ("add", 0, 1),
        ("var", 1), ("var", 2), ("add", 3, 4),
        ("mul", 2, 5), ("var", 2), ("add", 6, 7))


def test_m3_round_trip_and_size_independent_digest():
    import random

    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.gadgets import arith

    def build():
        m3 = M3ConstraintSystem()
        t = m3.add_table("u32add")
        xin = t.add_committed("xin", 0, arith.LOG_U32)
        yin = t.add_committed("yin", 0, arith.LOG_U32)
        arith.U32Add.build(t, "add", xin, yin)
        return m3

    core_a, _ = build().compile([4])
    core_b, _ = build().compile([7])
    assert core_a.symbolic is not None
    raw = canon.serialize(core_a.symbolic)
    assert canon.deserialize(raw) == core_a.symbolic
    # the symbolic description is sizeless: digests agree across instance
    # sizes (the reference digest hashes the sizeless system, mod.rs:51)
    assert core_a.digest() == core_b.digest()
    assert core_a.digest() != b"\x00" * 32

    # ... and survives the BTPUCS round trip
    from binius_tpu.constraint_system import serialization as ser
    rt = ser.deserialize(ser.serialize(core_a))
    assert rt.digest() == core_a.digest()

    random.seed(0)
