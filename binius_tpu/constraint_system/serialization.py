"""Constraint-system serialization.

Counterpart of the reference's `SerializeBytes`/`DeserializeBytes` derive
surface for `ConstraintSystem` (`constraint_system/mod.rs:35-45`,
`crates/utils/src/serialization.rs`): a self-describing canonical byte
format so systems round-trip between builder and verifier processes and the
digest can be recomputed on the receiving side.

Format: length-prefixed little-endian sections; ArithExprs as postfix token
streams; transparents by registered constructor name + parameters (the
analog of the reference's `inventory`-based registry,
`transparent/serialization.rs`).
"""

from __future__ import annotations

import io
import struct

from ..math.arith import ArithExpr
from ..protocols import transparent as tp
from . import oracle as om
from .exp import Exp
from .system import Boundary, ConstraintSet, ConstraintSystem, Flush, NonZeroClaim


def _w_u32(b, v):
    b.write(struct.pack("<I", v))


def _w_i32(b, v):
    b.write(struct.pack("<i", -1 if v is None else v))


def _w_u128(b, v):
    b.write(int(v).to_bytes(16, "little"))


def _w_str(b, s):
    raw = s.encode()
    _w_u32(b, len(raw))
    b.write(raw)


def _r_u32(r):
    return struct.unpack("<I", r.read(4))[0]


def _r_i32(r):
    v = struct.unpack("<i", r.read(4))[0]
    return None if v == -1 else v


def _r_u128(r):
    return int.from_bytes(r.read(16), "little")


def _r_str(r):
    n = _r_u32(r)
    return r.read(n).decode()


def _w_expr(b, e: ArithExpr):
    """Postfix token stream."""
    if e.op == "const":
        b.write(b"c")
        _w_u32(b, e.level)
        _w_u128(b, e.value)
    elif e.op == "var":
        b.write(b"v")
        _w_u32(b, e.value)
    elif e.op in ("add", "mul"):
        _w_expr(b, e.args[0])
        _w_expr(b, e.args[1])
        b.write(b"+" if e.op == "add" else b"*")
    elif e.op == "pow":
        _w_expr(b, e.args[0])
        b.write(b"^")
        _w_u32(b, e.value)
    else:
        raise ValueError(e.op)
    return b


def _serialize_expr(e: ArithExpr) -> bytes:
    b = io.BytesIO()
    _w_expr(b, e)
    return b.getvalue()


def _deserialize_expr(data: bytes) -> ArithExpr:
    r = io.BytesIO(data)
    stack = []
    while True:
        tok = r.read(1)
        if not tok:
            break
        if tok == b"c":
            lvl = _r_u32(r)
            stack.append(ArithExpr.const(_r_u128(r), lvl))
        elif tok == b"v":
            stack.append(ArithExpr.var(_r_u32(r)))
        elif tok == b"+":
            y, x = stack.pop(), stack.pop()
            stack.append(ArithExpr("add", (x, y)))
        elif tok == b"*":
            y, x = stack.pop(), stack.pop()
            stack.append(ArithExpr("mul", (x, y)))
        elif tok == b"^":
            e = _r_u32(r)
            stack.append(ArithExpr("pow", (stack.pop(),), e))
        else:
            raise ValueError(tok)
    assert len(stack) == 1
    return stack[0]


# -- transparent registry ----------------------------------------------------

def _w_transparent(b, t) -> None:
    if isinstance(t, tp.Constant):
        _w_str(b, "constant")
        _w_u32(b, t.n_vars)
        _w_u32(b, t.level)
        _w_u128(b, t.value)
    elif isinstance(t, tp.EqIndTransparent):
        _w_str(b, "eq_ind")
        _w_u32(b, len(t.point))
        for v in t.point:
            _w_u128(b, v)
    elif isinstance(t, tp.StepDown):
        _w_str(b, "step_down")
        _w_u32(b, t.n_vars)
        _w_u32(b, t.index)
    elif isinstance(t, tp.StepUp):
        _w_str(b, "step_up")
        _w_u32(b, t.n_vars)
        _w_u32(b, t.index)
    elif isinstance(t, tp.Powers):
        _w_str(b, "powers")
        _w_u32(b, t.n_vars)
        _w_u128(b, t.base)
    elif isinstance(t, tp.MLEFromValues):
        _w_str(b, "mle_values")
        _w_u32(b, t.level)
        _w_u32(b, len(t.values))
        for v in t.values:
            _w_u128(b, v)
    elif isinstance(t, tp.StructuredArith):
        _w_str(b, "structured")
        _w_u32(b, t.n_vars)
        _w_u32(b, t.level)
        raw = _serialize_expr(t.expr)
        _w_u32(b, len(raw))
        b.write(raw)
    else:
        raise ValueError(f"unregistered transparent {type(t)}")


def _r_transparent(r):
    kind = _r_str(r)
    if kind == "constant":
        n, lvl, v = _r_u32(r), _r_u32(r), _r_u128(r)
        return tp.Constant(n, v, lvl)
    if kind == "eq_ind":
        k = _r_u32(r)
        return tp.EqIndTransparent(tuple(_r_u128(r) for _ in range(k)))
    if kind == "step_down":
        return tp.StepDown(_r_u32(r), _r_u32(r))
    if kind == "step_up":
        return tp.StepUp(_r_u32(r), _r_u32(r))
    if kind == "powers":
        return tp.Powers(_r_u32(r), _r_u128(r))
    if kind == "mle_values":
        lvl = _r_u32(r)
        n = _r_u32(r)
        return tp.MLEFromValues(tuple(_r_u128(r) for _ in range(n)), lvl)
    if kind == "structured":
        n, lvl = _r_u32(r), _r_u32(r)
        return tp.StructuredArith(_deserialize_expr(r.read(_r_u32(r))), n, lvl)
    raise ValueError(kind)


# -- system ------------------------------------------------------------------

MAGIC = b"BTPUCS03"


def serialize(system: ConstraintSystem) -> bytes:
    b = io.BytesIO()
    b.write(MAGIC)
    _w_u32(b, len(system.oracles))
    for o in system.oracles.oracles:
        _w_str(b, o.variant)
        _w_u32(b, o.n_vars)
        _w_u32(b, o.tower_level)
        _w_u32(b, len(o.inner))
        for i in o.inner:
            _w_u32(b, i)
        _w_u32(b, o.shift_offset)
        _w_u32(b, o.shift_block_bits)
        _w_str(b, o.shift_variant)
        _w_u128(b, o.lc_offset)
        _w_u32(b, len(o.lc_coeffs))
        for c in o.lc_coeffs:
            _w_u128(b, c)
        _w_u32(b, o.log_degree)
        if o.variant == om.TRANSPARENT:
            _w_transparent(b, o.transparent)
        if o.variant == om.COMPOSITE:
            expr = _serialize_expr(o.composite)
            _w_u32(b, len(expr))
            b.write(expr)
        _w_str(b, o.name)
    _w_u32(b, len(system.constraint_sets))
    for cs in system.constraint_sets:
        _w_u32(b, cs.n_vars)
        _w_u32(b, len(cs.oracle_ids))
        for i in cs.oracle_ids:
            _w_u32(b, i)
        _w_u32(b, len(cs.zero_constraints))
        for e in cs.zero_constraints:
            raw = _serialize_expr(e)
            _w_u32(b, len(raw))
            b.write(raw)
    _w_u32(b, len(system.flushes))
    for f in system.flushes:
        _w_u32(b, f.channel_id)
        _w_str(b, f.direction)
        _w_u32(b, len(f.oracle_ids))
        for i in f.oracle_ids:
            _w_u32(b, i)
        _w_u32(b, f.multiplicity)
        _w_u32(b, len(f.selector_ids))
        for s in f.selector_ids:
            _w_u32(b, s)
    _w_u32(b, system.n_channels)
    _w_u32(b, len(system.non_zero_claims))
    for nz in system.non_zero_claims:
        _w_u32(b, nz.oracle_id)
    _w_u32(b, len(system.exponents))
    for e in system.exponents:
        _w_u32(b, len(e.bits_ids))
        for i in e.bits_ids:
            _w_u32(b, i)
        _w_u32(b, e.exp_result_id)
        _w_u32(b, e.base_level)
        _w_i32(b, -1 if e.base_oracle is None else e.base_oracle)
        _w_u128(b, e.base_const if e.base_const is not None else 0)
    # trailing canonical (reference-format) symbolic blob, so the digest the
    # transcript observes survives a BTPUCS round trip
    if system.symbolic is not None:
        from . import canonical
        raw = canonical.serialize(system.symbolic)
        _w_u32(b, len(raw))
        b.write(raw)
    else:
        _w_u32(b, 0)
    return b.getvalue()


def deserialize(data: bytes) -> ConstraintSystem:
    r = io.BytesIO(data)
    assert r.read(8) == MAGIC, "bad magic"
    oracles = om.OracleSet()
    n = _r_u32(r)
    for oid in range(n):
        variant = _r_str(r)
        n_vars = _r_u32(r)
        level = _r_u32(r)
        inner = tuple(_r_u32(r) for _ in range(_r_u32(r)))
        shift_offset = _r_u32(r)
        shift_block_bits = _r_u32(r)
        shift_variant = _r_str(r)
        lc_offset = _r_u128(r)
        lc_coeffs = tuple(_r_u128(r) for _ in range(_r_u32(r)))
        log_degree = _r_u32(r)
        transparent = None
        composite = None
        if variant == om.TRANSPARENT:
            transparent = _r_transparent(r)
        if variant == om.COMPOSITE:
            composite = _deserialize_expr(r.read(_r_u32(r)))
        name = _r_str(r)
        oracles.oracles.append(om.Oracle(
            id=oid, n_vars=n_vars, tower_level=level, variant=variant, inner=inner,
            shift_offset=shift_offset, shift_block_bits=shift_block_bits,
            shift_variant=shift_variant, lc_offset=lc_offset, lc_coeffs=lc_coeffs,
            log_degree=log_degree, transparent=transparent, composite=composite,
            name=name))
    constraint_sets = []
    for _ in range(_r_u32(r)):
        n_vars = _r_u32(r)
        ids = tuple(_r_u32(r) for _ in range(_r_u32(r)))
        exprs = tuple(_deserialize_expr(r.read(_r_u32(r)))
                      for _ in range(_r_u32(r)))
        constraint_sets.append(ConstraintSet(n_vars, ids, exprs))
    flushes = []
    for _ in range(_r_u32(r)):
        ch = _r_u32(r)
        d = _r_str(r)
        ids = tuple(_r_u32(r) for _ in range(_r_u32(r)))
        mult = _r_u32(r)
        sel = tuple(_r_u32(r) for _ in range(_r_u32(r)))
        flushes.append(Flush(ch, d, ids, mult, sel))
    n_channels = _r_u32(r)
    nz = [NonZeroClaim(_r_u32(r)) for _ in range(_r_u32(r))]
    exponents = []
    for _ in range(_r_u32(r)):
        bits_ids = tuple(_r_u32(r) for _ in range(_r_u32(r)))
        result_id = _r_u32(r)
        base_level = _r_u32(r)
        base_oracle = _r_i32(r)
        base_const = _r_u128(r)
        exponents.append(Exp(
            bits_ids, result_id, base_level,
            base_const=None if base_oracle >= 0 else base_const,
            base_oracle=base_oracle if base_oracle >= 0 else None))
    n_canon = _r_u32(r)
    symbolic = None
    if n_canon:
        from . import canonical
        symbolic = canonical.deserialize(r.read(n_canon))
    return ConstraintSystem(oracles, constraint_sets, flushes, n_channels, nz,
                            exponents, symbolic=symbolic)
