"""Evalcheck: recursively reduce evaluation claims on virtual oracles to
claims on committed oracles.

Mirrors `crates/core/src/protocols/evalcheck/` + `greedy_evalcheck`:
claims walk the oracle DAG; LinearCombination sends inner evals, Shifted and
Packed spawn bivariate sumchecks (shift indicator / tower-basis transparents)
which are batch-proven, producing new claims, until only committed-oracle
claims remain. Duplicate (oracle, point) claims are deduplicated
deterministically on both sides (the reference's EvalcheckHint mechanism).
"""

from __future__ import annotations

import dataclasses

from ..constraint_system import oracle as om
from ..fields import scalar, tower
from ..math import mle
from ..math.arith import bivariate_product
from . import shift_ind
from .sumcheck import prove as sc_prove
from .sumcheck import verify as sc_verify
from .sumcheck.common import LEVEL, CompositeSumClaim, SumcheckClaim


@dataclasses.dataclass(frozen=True)
class EvalcheckClaim:
    oracle_id: int
    point: tuple  # B128 ints
    eval: int


def _dedup_key(c: EvalcheckClaim):
    return (c.oracle_id, c.point)


@dataclasses.dataclass
class _ShiftEntry:
    claim: EvalcheckClaim
    oracle: om.Oracle


@dataclasses.dataclass
class _CompositeEntry:
    claim: EvalcheckClaim
    oracle: om.Oracle


class _Walker:
    """Shared prover/verifier reduction walk; transcript IO differs via hooks."""

    def __init__(self, oracles: om.OracleSet, transcript, is_prover: bool,
                 witness=None):
        self.oracles = oracles
        self.transcript = transcript
        self.is_prover = is_prover
        self.witness = witness  # dict oracle_id -> (level, data); prover only
        self.committed: list[EvalcheckClaim] = []
        self.seen: dict = {}

    # -- transcript hooks --------------------------------------------------
    def _io_scalars(self, values_if_prover):
        if self.is_prover:
            self.transcript.message().write_scalars(LEVEL, values_if_prover)
            return values_if_prover
        return self.transcript.message().read_scalars(LEVEL, values_if_prover)

    # -- main loop ---------------------------------------------------------
    def run(self, claims: list[EvalcheckClaim]) -> list[EvalcheckClaim]:
        queue = list(claims)
        while queue:
            shift_entries: list[_ShiftEntry] = []
            composite_entries: list[_CompositeEntry] = []
            next_queue: list[EvalcheckClaim] = []
            for claim in queue:
                key = _dedup_key(claim)
                if key in self.seen:
                    if self.seen[key] != claim.eval:
                        raise ValueError("conflicting duplicate evaluation claims")
                    continue
                self.seen[key] = claim.eval
                self._process(claim, shift_entries, composite_entries, next_queue)
            if shift_entries or composite_entries:
                next_queue.extend(self._run_sumcheck_batch(shift_entries,
                                                          composite_entries))
            queue = next_queue
        return self.committed

    def _process(self, claim: EvalcheckClaim, shift_entries, composite_entries,
                 next_queue) -> None:
        o = self.oracles[claim.oracle_id]
        if o.variant == om.COMMITTED:
            self.committed.append(claim)
        elif o.variant == om.TRANSPARENT:
            if not self.is_prover:
                if o.transparent.evaluate_scalar(list(claim.point)) != claim.eval:
                    raise ValueError(f"transparent oracle {o.id} evaluation mismatch")
        elif o.variant == om.REPEATING:
            inner = self.oracles[o.inner[0]]
            next_queue.append(EvalcheckClaim(inner.id, claim.point[:inner.n_vars], claim.eval))
        elif o.variant == om.LINEAR_COMBINATION:
            if self.is_prover:
                evals = [self._eval_witness(i, claim.point) for i in o.inner]
                self._io_scalars(evals)
            else:
                evals = self._io_scalars(len(o.inner))
                acc = o.lc_offset
                for e, c in zip(evals, o.lc_coeffs):
                    acc ^= scalar.mul(LEVEL, e, c)
                if acc != claim.eval:
                    raise ValueError(f"linear combination oracle {o.id} mismatch")
            for i, e in zip(o.inner, evals):
                next_queue.append(EvalcheckClaim(i, claim.point, e))
        elif o.variant == om.SHIFTED:
            shift_entries.append(_ShiftEntry(claim, o))
        elif o.variant == om.COMPOSITE:
            composite_entries.append(_CompositeEntry(claim, o))
        else:
            raise NotImplementedError(f"evalcheck for oracle variant {o.variant}")

    def _eval_witness(self, oid: int, point) -> int:
        level, data = self.witness[oid]
        o = self.oracles[oid]
        _, v = mle.evaluate(level, data, o.n_vars, LEVEL,
                            tower.from_ints(LEVEL, list(point)))
        return tower.to_ints(LEVEL, v[None, :])[0]

    def _run_sumcheck_batch(self, shift_entries, composite_entries) -> list[EvalcheckClaim]:
        """Batch-prove/verify the sumchecks spawned by shifted and composite
        oracles; returns the reduced inner-oracle claims."""
        from ..math.arith import ArithExpr, CompositionPoly

        specs = []  # (kind, entry, n_vars)
        for e in sorted(shift_entries, key=lambda e: -e.oracle.shift_block_bits):
            specs.append(("shift", e, e.oracle.shift_block_bits))
        for e in composite_entries:
            specs.append(("composite", e, e.oracle.n_vars))
        specs.sort(key=lambda s: -s[2])  # stable: shifts keep relative order

        claims, eq_points = [], []
        for kind, e, nv in specs:
            if kind == "shift":
                claims.append(SumcheckClaim(
                    nv, 2, (CompositeSumClaim(bivariate_product(), e.claim.eval),)))
                eq_points.append(None)
            else:
                o = e.oracle
                shifted_expr = o.composite.remap_vars(
                    {i: i + 1 for i in range(len(o.inner))})
                comp = CompositionPoly(ArithExpr.var(0) * shifted_expr,
                                       len(o.inner) + 1)
                claims.append(SumcheckClaim(
                    nv, len(o.inner) + 1, (CompositeSumClaim(comp, e.claim.eval),)))
                eq_points.append(list(e.claim.point))

        if self.is_prover:
            provers = []
            for (kind, e, nv), claim in zip(specs, claims):
                o = e.oracle
                if kind == "shift":
                    b = o.shift_block_bits
                    inner = self.oracles[o.inner[0]]
                    ilevel, idata = self.witness[o.inner[0]]
                    z_high = list(e.claim.point[b:])
                    if z_high:
                        eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, z_high))
                        plvl, proj = mle.evaluate_partial_high(
                            ilevel, idata, inner.n_vars, LEVEL, eq, inner.n_vars - b)
                    else:
                        plvl, proj = ilevel, idata
                    ind = shift_ind.partial_mle(o.shift_variant, b, o.shift_offset,
                                                list(e.claim.point[:b]))
                    provers.append(sc_prove.RegularSumcheckProver(
                        claim, [(plvl, proj), (LEVEL, ind)], order_high=False))
                else:
                    eq_ml = sc_prove.eq_ind_expansion_multilinear(list(e.claim.point))
                    mls = [eq_ml] + [self.witness[i] for i in o.inner]
                    provers.append(sc_prove.RegularSumcheckProver(
                        claim, mls, order_high=False,
                        eq_ind_challenges=tuple(e.claim.point)))
            out = sc_prove.batch_prove(provers, self.transcript)
            ml_evals = out.multilinear_evals
            challenges = out.challenges
        else:
            ver = sc_verify.batch_verify(claims, self.transcript, order_high=False,
                                         eq_ind_points=eq_points)
            ml_evals = ver.multilinear_evals
            challenges = ver.challenges

        n_rounds = claims[0].n_vars if claims else 0
        new_claims = []
        for (kind, e, nv), evals, claim in zip(specs, ml_evals, claims):
            o = e.oracle
            pt = sc_verify.claim_point(n_rounds, nv, challenges, order_high=False)
            if kind == "shift":
                b = o.shift_block_bits
                proj_eval, ind_eval = evals
                if not self.is_prover:
                    want = shift_ind.evaluate_scalar(o.shift_variant, b, o.shift_offset,
                                                     list(e.claim.point[:b]), pt)
                    if ind_eval != want:
                        raise ValueError("shift indicator evaluation mismatch")
                inner_point = tuple(pt) + tuple(e.claim.point[b:])
                new_claims.append(EvalcheckClaim(o.inner[0], inner_point, proj_eval))
            else:
                for iid, ev in zip(o.inner, evals[1:]):
                    new_claims.append(EvalcheckClaim(iid, tuple(pt), ev))
        return new_claims


def prove(oracles: om.OracleSet, witness: dict, claims: list[EvalcheckClaim],
          transcript) -> list[EvalcheckClaim]:
    """Reduce claims to committed-oracle claims, writing helper data to the
    transcript. `witness` maps oracle id -> (level, device data) for committed
    and inner oracles reachable from the claims."""
    return _Walker(oracles, transcript, True, witness).run(claims)


def verify(oracles: om.OracleSet, claims: list[EvalcheckClaim],
           transcript) -> list[EvalcheckClaim]:
    return _Walker(oracles, transcript, False).run(claims)
