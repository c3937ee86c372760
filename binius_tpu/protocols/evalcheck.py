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

import jax.numpy as jnp

from ..constraint_system import oracle as om
from ..fields import scalar, tower
from ..parallel import mesh as mesh_mod
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
    kind: str = "shift"  # "shift" | "packed"

    @property
    def block_bits(self) -> int:
        return (self.oracle.shift_block_bits if self.kind == "shift"
                else self.oracle.log_degree)


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
        # Prover-side device-work amortization (the reference's MemoizedData,
        # `evalcheck/prove.rs:173`, taken further: whole batches per kernel).
        self._eq_memo: dict = {}
        self._wit_eval_cache: dict = {}

    def _eq_expansion(self, point: tuple):
        """Memoized device eq-ind expansion of a B128 point tuple."""
        e = self._eq_memo.get(point)
        if e is None:
            e = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(point)))
            self._eq_memo[point] = e
        return e

    def _prefetch_witness_evals(self, queue) -> None:
        """Batch-evaluate all inner-oracle witness evals needed by the
        LinearCombination claims in `queue` (one device call per
        (level, n_vars, point) group instead of one per inner oracle)."""
        wanted: dict = {}
        for claim in queue:
            key = _dedup_key(claim)
            if key in self.seen:
                continue
            o = self.oracles[claim.oracle_id]
            if o.variant != om.LINEAR_COMBINATION:
                continue
            for iid in o.inner:
                k = (iid, claim.point)
                if k not in self._wit_eval_cache:
                    wanted[k] = None
        groups: dict = {}
        for iid, point in wanted:
            lvl, _ = self.witness[iid]
            n = self.oracles[iid].n_vars
            groups.setdefault((lvl, n, point), []).append(iid)
        for (lvl, n, point), iids in groups.items():
            eq = self._eq_expansion(point)
            stack = jnp.stack([tower.resolve_p1(*self.witness[i])[1]
                               for i in iids], axis=0)
            lvl = max(lvl, 0)
            _, out = mle.batched_evaluate_partial_high(lvl, stack, n, eq, 0)
            vals = tower.to_ints(LEVEL, out)
            for i, v in zip(iids, vals):
                self._wit_eval_cache[(i, point)] = v

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
            if self.is_prover:
                self._prefetch_witness_evals(queue)
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
                import os
                import time
                t0 = time.perf_counter()
                next_queue.extend(self._run_sumcheck_batch(shift_entries,
                                                          composite_entries))
                if os.environ.get("BINIUS_TRACE_PHASES", "") not in ("", "0"):
                    print(f"  [evalcheck] wave: {len(shift_entries)} shift/packed"
                          f" + {len(composite_entries)} composite claims:"
                          f" {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)
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
        elif o.variant == om.PACKED:
            # packed eval claim -> kappa-var bivariate sumcheck of the
            # projected inner against the tower-basis transparent
            # (`evalcheck/subclaims.rs` packed_sumcheck_meta)
            shift_entries.append(_ShiftEntry(claim, o, kind="packed"))
        elif o.variant == om.PROJECTED:
            # point rewrite only (`evalcheck/verify.rs:200-216`)
            pt = (claim.point[:o.start_index] + o.proj_values
                  + claim.point[o.start_index:])
            next_queue.append(EvalcheckClaim(o.inner[0], pt, claim.eval))
        elif o.variant == om.ZERO_PADDED:
            # divide out the select-row indicator (`evalcheck/verify.rs:261-295`)
            s, pad = o.start_index, o.log_degree
            zs = claim.point[s:s + pad]
            term = 1
            for i, z in enumerate(zs):
                bit = (o.nonzero_index >> i) & 1
                term = scalar.mul(LEVEL, term, z if bit else z ^ 1)
            sub_pt = claim.point[:s] + claim.point[s + pad:]
            if term == 0:
                if claim.eval != 0:
                    raise ValueError(f"zero-padded oracle {o.id} eval must vanish")
            else:
                inner_eval = scalar.mul(LEVEL, claim.eval, scalar.invert(LEVEL, term))
                next_queue.append(EvalcheckClaim(o.inner[0], sub_pt, inner_eval))
        elif o.variant == om.COMPOSITE:
            composite_entries.append(_CompositeEntry(claim, o))
        else:
            raise NotImplementedError(f"evalcheck for oracle variant {o.variant}")

    def _eval_witness(self, oid: int, point) -> int:
        cached = self._wit_eval_cache.get((oid, tuple(point)))
        if cached is not None:
            return cached
        level, data = tower.resolve_p1(*self.witness[oid])
        o = self.oracles[oid]
        _, v = mle.evaluate(level, data, o.n_vars, LEVEL,
                            tower.from_ints(LEVEL, list(point)))
        val = tower.to_ints(LEVEL, v[None, :])[0]
        self._wit_eval_cache[(oid, tuple(point))] = val
        return val

    def _shift_pair_stack(self, entries: list[_ShiftEntry], b: int):
        """(2k, 2^b, 4) B128 stack [proj_0, mult_0, proj_1, mult_1, ...] for
        k shift/packed entries with equal block bits b: inner-multilinear
        projections batched per (level, n_vars, suffix) group; multipliers
        are shift indicators (one batched carry-DP kernel) or tower-basis
        vectors (packed)."""
        k = len(entries)
        groups: dict = {}
        for idx, e in enumerate(entries):
            o = e.oracle
            inner = self.oracles[o.inner[0]]
            ilevel, _ = self.witness[o.inner[0]]
            z_high = (tuple(e.claim.point[b:]) if e.kind == "shift"
                      else tuple(e.claim.point))
            groups.setdefault((ilevel, inner.n_vars, z_high), []).append(idx)
        chunks, order = [], []
        for (ilevel, n, z_high), idxs in groups.items():
            if n == b or ilevel != tower.P1:
                # packed B1 columns stay packed into the projection kernel
                # (tower.P1 group); unpack only for the direct-embed case
                datas = [tower.resolve_p1(*self.witness[entries[i].oracle.inner[0]])[1]
                         for i in idxs]
                ilevel = max(ilevel, 0)
            else:
                datas = [self.witness[entries[i].oracle.inner[0]][1] for i in idxs]
            stack = jnp.stack(datas, axis=0)
            if n == b:
                proj = tower.embed(ilevel, LEVEL, stack)
            else:
                _, proj = mle.batched_evaluate_partial_high(
                    ilevel, stack, n, self._eq_expansion(z_high), b)
            chunks.append(proj)
            order.extend(idxs)
        inv = [0] * k
        for pos, idx in enumerate(order):
            inv[idx] = pos
        proj_all = jnp.take(jnp.concatenate(chunks, axis=0),
                            jnp.asarray(inv, dtype=jnp.int32), axis=0)
        shift_idx = [i for i, e in enumerate(entries) if e.kind == "shift"]
        mult_rows = [None] * k
        if shift_idx:
            se = [entries[i] for i in shift_idx]
            ind = shift_ind.partial_mle_batch(
                [e.oracle.shift_variant for e in se], b,
                [e.oracle.shift_offset for e in se],
                [list(e.claim.point[:b]) for e in se])
            for pos, i in enumerate(shift_idx):
                mult_rows[i] = ind[pos]
        for i, e in enumerate(entries):
            if e.kind == "packed":
                mult_rows[i] = tower.from_ints(LEVEL, _tower_basis_values(
                    self.oracles[e.oracle.inner[0]].tower_level, b))
        ind_all = jnp.stack(mult_rows, axis=0)
        if mesh_mod.is_mesh_sharded(proj_all):
            m = mesh_mod.mesh_of(proj_all)
            if m is not None:
                ind_all = mesh_mod.put_replicated(m, ind_all)
        return jnp.stack([proj_all, ind_all], axis=1).reshape(2 * k, 1 << b, 4)

    def _run_sumcheck_batch(self, shift_entries, composite_entries) -> list[EvalcheckClaim]:
        """Batch-prove/verify the sumchecks spawned by shifted and composite
        oracles; returns the reduced inner-oracle claims."""
        from ..math.arith import ArithExpr, CompositionPoly

        specs = []  # (kind, entry, n_vars)
        for e in sorted(shift_entries, key=lambda e: -e.block_bits):
            specs.append((e.kind, e, e.block_bits))
        for e in composite_entries:
            specs.append(("composite", e, e.oracle.n_vars))
        specs.sort(key=lambda s: -s[2])  # stable: shifts keep relative order

        claims, eq_points = [], []
        for kind, e, nv in specs:
            if kind in ("shift", "packed"):
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
            import os
            import time as _time
            trace2 = os.environ.get("BINIUS_TRACE_PHASES", "") == "2"
            t_setup = _time.perf_counter()
            provers = []
            i = 0
            while i < len(specs):
                kind, e, nv = specs[i]
                if kind in ("shift", "packed"):
                    # contiguous run of shift/packed specs with equal n_vars
                    # -> ONE batched device-resident prover for all of them
                    j = i
                    while (j < len(specs) and specs[j][0] in ("shift", "packed")
                           and specs[j][2] == nv):
                        j += 1
                    group = [s[1] for s in specs[i:j]]
                    provers.append(sc_prove.BatchedBivariateSumcheckProver(
                        claims[i:j], self._shift_pair_stack(group, nv),
                        order_high=False))
                    i = j
                else:
                    o = e.oracle
                    eq_ml = (LEVEL, self._eq_expansion(tuple(e.claim.point)))
                    mls = [eq_ml] + [tower.resolve_p1(*self.witness[ii])
                                     for ii in o.inner]
                    provers.append(sc_prove.RegularSumcheckProver(
                        claims[i], mls, order_high=False,
                        eq_ind_challenges=tuple(e.claim.point)))
                    i += 1
            if trace2:
                print(f"    [wave] setup {len(provers)} provers"
                      f" ({sum(1 for s in specs if s[0] != 'composite')} sh/pk):"
                      f" {( _time.perf_counter() - t_setup) * 1e3:.1f} ms",
                      flush=True)
                t_setup = _time.perf_counter()
            out = sc_prove.batch_prove(provers, self.transcript)
            if trace2:
                print(f"    [wave] batch_prove ({claims[0].n_vars if claims else 0}"
                      f" rounds): {(_time.perf_counter() - t_setup) * 1e3:.1f} ms",
                      flush=True)
            ml_evals = out.multilinear_evals
            challenges = out.challenges
        else:
            ver = sc_verify.batch_verify(claims, self.transcript, order_high=False,
                                         eq_ind_points=eq_points)
            ml_evals = ver.multilinear_evals
            challenges = ver.challenges

        n_rounds = claims[0].n_vars if claims else 0
        # verifier: all shift-indicator checks of the wave in ONE vectorized
        # carry DP (native batch muls) instead of per-claim Python DPs
        shift_wants: dict = {}
        if not self.is_prover:
            sidx, svar, sb, soff, sx, sy = [], [], [], [], [], []
            for w_i, ((kind, e, nv), _evals) in enumerate(zip(specs, ml_evals)):
                if kind != "shift":
                    continue
                o = e.oracle
                b = o.shift_block_bits
                pt = sc_verify.claim_point(n_rounds, nv, challenges, order_high=False)
                sidx.append(w_i)
                svar.append(o.shift_variant)
                sb.append(b)
                soff.append(o.shift_offset)
                sx.append(list(e.claim.point[:b]))
                sy.append(list(pt))
            if sidx:
                got = shift_ind.evaluate_scalar_batch(svar, sb, soff, sx, sy)
                shift_wants = dict(zip(sidx, got))
        new_claims = []
        for w_i, ((kind, e, nv), evals, claim) in enumerate(zip(specs, ml_evals,
                                                                claims)):
            o = e.oracle
            pt = sc_verify.claim_point(n_rounds, nv, challenges, order_high=False)
            if kind == "shift":
                b = o.shift_block_bits
                proj_eval, ind_eval = evals
                if not self.is_prover:
                    if ind_eval != shift_wants[w_i]:
                        raise ValueError("shift indicator evaluation mismatch")
                inner_point = tuple(pt) + tuple(e.claim.point[b:])
                new_claims.append(EvalcheckClaim(o.inner[0], inner_point, proj_eval))
            elif kind == "packed":
                proj_eval, tb_eval = evals
                if not self.is_prover:
                    ilevel = self.oracles[o.inner[0]].tower_level
                    want = _tower_basis_eval(ilevel, o.log_degree, pt)
                    if tb_eval != want:
                        raise ValueError("tower basis evaluation mismatch")
                inner_point = tuple(pt) + tuple(e.claim.point)
                new_claims.append(EvalcheckClaim(o.inner[0], inner_point, proj_eval))
            else:
                for iid, ev in zip(o.inner, evals[1:]):
                    new_claims.append(EvalcheckClaim(iid, tuple(pt), ev))
        return new_claims


def _tower_basis_values(level: int, kappa: int) -> list[int]:
    """beta_v for v in 0..2^kappa: basis of T_{level+kappa} over T_level as
    B128 ints (`transparent/tower_basis.rs` semantics; the canonical packing
    makes beta_v = 1 << (v * 2^level))."""
    return [1 << (v << level) for v in range(1 << kappa)]


def _tower_basis_eval(level: int, kappa: int, pt: list[int]) -> int:
    """Host MLE evaluation of the tower-basis transparent at pt."""
    acc = 0
    for v, beta in enumerate(_tower_basis_values(level, kappa)):
        term = beta
        for i, z in enumerate(pt):
            bit = (v >> i) & 1
            term = scalar.mul(LEVEL, term, z if bit else z ^ 1)
        acc ^= term
    return acc


def prove(oracles: om.OracleSet, witness: dict, claims: list[EvalcheckClaim],
          transcript) -> list[EvalcheckClaim]:
    """Reduce claims to committed-oracle claims, writing helper data to the
    transcript. `witness` maps oracle id -> (level, device data) for committed
    and inner oracles reachable from the claims."""
    return _Walker(oracles, transcript, True, witness).run(claims)


def verify(oracles: om.OracleSet, claims: list[EvalcheckClaim],
           transcript) -> list[EvalcheckClaim]:
    return _Walker(oracles, transcript, False).run(claims)
