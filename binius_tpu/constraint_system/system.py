"""Constraint system definition + witness validation.

Mirrors `crates/core/src/constraint_system/mod.rs` (subset, growing):
a set of multilinear oracles, zero-constraint sets over them, and (next
milestones) channels/flushes and exponents. `validate_witness` checks every
constraint directly against the witness without proving
(`constraint_system/validate.rs:24`).
"""

from __future__ import annotations

import dataclasses

from ..fields import tower
from ..hash.groestl import groestl256
from ..math.arith import ArithExpr
from . import oracle as om


PUSH = "push"
PULL = "pull"


@dataclasses.dataclass(frozen=True)
class ConstraintSet:
    """Zero constraints over a fixed list of oracles of equal n_vars."""

    n_vars: int
    oracle_ids: tuple
    zero_constraints: tuple  # tuple[ArithExpr] over local var indices


@dataclasses.dataclass(frozen=True)
class Flush:
    """A multiset flush into a channel (`constraint_system/channel.rs`).

    Pushes the tuple (col_0[r], ..., col_{k-1}[r]) for every row r of the
    table into `channel_id` (or pulls it out). `multiplicity` repeats the
    whole flush. With a selector oracle (0/1 column), only rows where the
    selector is 1 participate.
    """

    channel_id: int
    direction: str  # PUSH | PULL
    oracle_ids: tuple
    multiplicity: int = 1
    selector_ids: tuple = ()  # 0/1 oracles; a row participates iff ALL are 1


@dataclasses.dataclass(frozen=True)
class Boundary:
    """A statement-level (public) tuple pushed/pulled on a channel."""

    channel_id: int
    direction: str
    values: tuple  # B128 ints
    multiplicity: int = 1


@dataclasses.dataclass(frozen=True)
class NonZeroClaim:
    """Assert that an oracle is everywhere nonzero (`assert_nonzero`)."""

    oracle_id: int


@dataclasses.dataclass
class ConstraintSystem:
    oracles: om.OracleSet
    constraint_sets: list                # list[ConstraintSet]
    flushes: list = dataclasses.field(default_factory=list)    # list[Flush]
    n_channels: int = 0
    non_zero_claims: list = dataclasses.field(default_factory=list)  # list[NonZeroClaim]
    exponents: list = dataclasses.field(default_factory=list)  # list[exp.Exp]
    symbolic: object = None              # canonical.SymbolicSystem (m3-built)

    def digest(self) -> bytes:
        """Grøstl-256 of the reference-format (CanonicalTower) serialization
        of the sizeless symbolic system (`constraint_system/mod.rs:51-57`)
        when the system came from the M3 builder; hand-built (test) systems
        fall back to a structural hash of the sized form. Cached: the system
        is immutable after compile and both prove and verify observe it."""
        got = self.__dict__.get("_digest_cache")
        if got is not None:
            return got
        out = self._digest_uncached()
        self.__dict__["_digest_cache"] = out
        return out

    def _digest_uncached(self) -> bytes:
        if self.symbolic is not None:
            from . import canonical
            return canonical.digest(self.symbolic)
        toks = []
        for o in self.oracles.oracles:
            toks.append((o.id, o.n_vars, o.tower_level, o.variant, o.inner,
                         o.shift_offset, o.shift_block_bits, o.shift_variant,
                         o.lc_offset, o.lc_coeffs, o.log_degree))
        for cs in self.constraint_sets:
            toks.append((cs.n_vars, cs.oracle_ids,
                         tuple(c.serialize_tokens() for c in cs.zero_constraints)))
        for f in self.flushes:
            toks.append((f.channel_id, f.direction, f.oracle_ids, f.multiplicity,
                         f.selector_ids))
        toks.append(("channels", self.n_channels))
        for nz in self.non_zero_claims:
            toks.append(("nonzero", nz.oracle_id))
        for e in self.exponents:
            toks.append(e.tokens())
        return groestl256(repr(toks).encode())


def validate_witness(system: ConstraintSystem, witness: dict, boundaries=()) -> None:
    """Check all zero constraints and channel balance directly (no proving).

    witness: oracle id -> (level, device data). Mirrors
    `constraint_system/validate.rs:24`: zero constraints per constraint set,
    non-zero claims, and exact multiset balance of channel flushes against
    the boundaries.
    """
    _validate_channels(system, witness, boundaries)
    _validate_exponents(system, witness)
    for nz in system.non_zero_claims:
        level, data = tower.resolve_p1(*witness[nz.oracle_id])
        import jax.numpy as jnp
        zero = tower.is_zero(level, data)
        if bool(jnp.any(zero)):
            raise ValueError(f"non-zero claim violated on oracle {nz.oracle_id}")
    for cs in system.constraint_sets:
        mls = []
        for oid in cs.oracle_ids:
            level, data = tower.resolve_p1(*witness[oid])
            if level < 7:
                data = tower.embed(level, 7, data)
            mls.append(data)
        import jax.numpy as jnp
        for k, expr in enumerate(cs.zero_constraints):
            out = expr.evaluate(7, mls)
            if bool(jnp.any(out != 0)):
                raise ValueError(f"zero constraint {k} violated on oracles {cs.oracle_ids}")


def _validate_exponents(system: ConstraintSystem, witness: dict) -> None:
    """Recompute each exp-result column from its bit columns and compare
    (the validate-mode analog of `constraint_system/validate.rs`)."""
    if not system.exponents:
        return
    import jax.numpy as jnp

    from . import exp as exp_mod
    recomputed = dict(witness)
    exp_mod.make_exp_witnesses(system, recomputed)
    for e in system.exponents:
        lvl, have = tower.resolve_p1(*witness[e.exp_result_id])
        rlvl, want = tower.resolve_p1(*recomputed[e.exp_result_id])
        assert lvl == rlvl
        if bool(jnp.any(have != want)):
            raise ValueError(
                f"exp result column (oracle {e.exp_result_id}) does not match "
                f"base^exponent")


def _validate_channels(system: ConstraintSystem, witness: dict, boundaries) -> None:
    """Exact multiset balance per channel (the emulation-level check,
    `crates/m3/src/emulate.rs` Channel::is_balanced)."""
    if not system.flushes and not boundaries:
        return
    from collections import Counter

    counters = [Counter() for _ in range(system.n_channels)]

    def account(channel, direction, tup, mult):
        counters[channel][tup] += mult if direction == PUSH else -mult

    from . import witness as witness_mod
    for f in system.flushes:
        for oid in (*f.oracle_ids, *f.selector_ids):
            witness_mod.materialize(system.oracles, witness, oid)
        cols = [tower.to_ints(*tower.resolve_p1(*witness[oid]))
                for oid in f.oracle_ids]
        sels = [tower.to_ints(*tower.resolve_p1(*witness[sid]))
                for sid in f.selector_ids]
        n = len(cols[0])
        for r in range(n):
            if any(s[r] == 0 for s in sels):
                continue
            account(f.channel_id, f.direction, tuple(c[r] for c in cols), f.multiplicity)
    for b in boundaries:
        account(b.channel_id, b.direction, tuple(b.values), b.multiplicity)
    for c, counter in enumerate(counters):
        bad = {k: v for k, v in counter.items() if v != 0}
        if bad:
            raise ValueError(f"channel {c} is not balanced: {len(bad)} unbalanced tuples")
