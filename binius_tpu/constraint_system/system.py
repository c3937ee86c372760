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
    whole flush. Selectors are a later milestone (power-of-two tables only).
    """

    channel_id: int
    direction: str  # PUSH | PULL
    oracle_ids: tuple
    multiplicity: int = 1


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

    def digest(self) -> bytes:
        toks = []
        for o in self.oracles.oracles:
            toks.append((o.id, o.n_vars, o.tower_level, o.variant, o.inner,
                         o.shift_offset, o.shift_block_bits, o.shift_variant,
                         o.lc_offset, o.lc_coeffs, o.log_degree))
        for cs in self.constraint_sets:
            toks.append((cs.n_vars, cs.oracle_ids,
                         tuple(c.serialize_tokens() for c in cs.zero_constraints)))
        for f in self.flushes:
            toks.append((f.channel_id, f.direction, f.oracle_ids, f.multiplicity))
        toks.append(("channels", self.n_channels))
        for nz in self.non_zero_claims:
            toks.append(("nonzero", nz.oracle_id))
        return groestl256(repr(toks).encode())


def validate_witness(system: ConstraintSystem, witness: dict) -> None:
    """Check all zero constraints against the witness (no proving).

    witness: oracle id -> (level, device data).
    """
    for cs in system.constraint_sets:
        mls = []
        for oid in cs.oracle_ids:
            level, data = witness[oid]
            if level < 7:
                data = tower.embed(level, 7, data)
            mls.append(data)
        import jax.numpy as jnp
        for k, expr in enumerate(cs.zero_constraints):
            out = expr.evaluate(7, mls)
            if bool(jnp.any(out != 0)):
                raise ValueError(f"zero constraint {k} violated on oracles {cs.oracle_ids}")
