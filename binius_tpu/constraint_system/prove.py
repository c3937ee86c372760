"""Top-level constraint-system prover and verifier.

Mirrors the phase structure of `crates/core/src/constraint_system/prove.rs:74`
and `verify.rs:55` (channels/flushes and GKR-exp phases land in the next
milestones):

  1. setup: observe the constraint-system digest;
  2. commit: pack committed columns, build commit meta + FRI params, RS
     encode + Merkle commit, root -> transcript;
  3. zerocheck over all constraint sets (eq-ind sumcheck reduction);
  4. evalcheck: reduce virtual-oracle claims to committed claims;
  5. ring switch: committed small-field claims -> PIOP sumcheck claims;
  6. PIOP: interleaved sumcheck + FRI opening;
  7. finalize -> proof bytes.
"""

from __future__ import annotations

import dataclasses
import os
import time

from ..fields import scalar, tower
from ..math.arith import CompositionPoly
from ..parallel import mesh as mesh_mod
from ..protocols import evalcheck, gkr_gpa, ring_switch
from ..protocols import fri as fri_mod
from ..protocols import piop
from ..protocols.sumcheck import univariate_zerocheck as uzc
from ..utils import tracing
from ..protocols.sumcheck import zerocheck as zc
from ..protocols.sumcheck.common import LEVEL
from ..transcript.transcript import ProverTranscript, VerifierTranscript
from . import oracle as om
from . import witness as witness_mod
from . import exp as exp_mod
from .system import PULL, PUSH, ConstraintSystem

SECURITY_BITS = 100

_TRACE_PHASES = os.environ.get("BINIUS_TRACE_PHASES", "") not in ("", "0")


class _PhaseTimer:
    """Phase span timing (the analog of the reference's tracing spans with
    `perfetto_category = "phase.main"`, `constraint_system/prove.rs:179-184`).
    Enabled by BINIUS_TRACE_PHASES=1; timings are collected either way and
    exposed via `last_phase_times`."""

    def __init__(self, what: str):
        self.what = what
        self.times: dict = {}
        self.sizes: dict = {}  # per-phase proof bytes (`prove.rs:596-602`)
        self._t0 = time.perf_counter()
        self._cur = None
        self._tape_mark = None
        self._transcript = None

    def phase(self, name: str, transcript=None) -> None:
        self._finish()
        self._tape_mark = (len(transcript._tape) if transcript is not None
                           else None)
        self._transcript = transcript
        self._cur = (name, time.perf_counter())

    def _finish(self) -> None:
        if self._cur is not None:
            name, t0 = self._cur
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            tracing.record(f"{self.what}.{name}", t0, dt)
            size = ""
            if getattr(self, "_tape_mark", None) is not None:
                nb = len(self._transcript._tape) - self._tape_mark
                self.sizes[name] = self.sizes.get(name, 0) + nb
                size = f", {nb} proof bytes"
            if _TRACE_PHASES:
                print(f"[{self.what}] phase {name}: {dt * 1e3:.1f} ms{size}",
                      flush=True)
            self._cur = None

    def done(self) -> dict:
        self._finish()
        self.times["total"] = time.perf_counter() - self._t0
        if _TRACE_PHASES:
            print(f"[{self.what}] total: {self.times['total'] * 1e3:.1f} ms", flush=True)
        global last_phase_times, last_phase_sizes
        last_phase_times = dict(self.times)
        last_phase_sizes = dict(self.sizes)
        return self.times


last_phase_times: dict = {}
last_phase_sizes: dict = {}


@dataclasses.dataclass
class CommitLayout:
    """Deterministic ordering of committed oracles for the PIOP batch."""

    oracle_ids: list       # committed oracle ids, ascending by packed n_vars
    packed_n_vars: list
    commit_meta: piop.CommitMeta
    oracle_to_idx: dict

    @staticmethod
    def from_system(system: ConstraintSystem) -> "CommitLayout":
        ids = system.oracles.committed_ids()
        keyed = []
        for oid in ids:
            o = system.oracles[oid]
            # tiny columns (n_vars + level < 7) repeat-pack into one B128
            # element (`piop/prove.rs:461-487` padded_packed_eval)
            packed = max(0, o.n_vars + o.tower_level - 7)
            keyed.append((packed, oid))
        keyed.sort()
        ordered = [oid for _, oid in keyed]
        packed_vars = [p for p, _ in keyed]
        max_v = max(packed_vars, default=0)
        counts = [0] * (max_v + 1)
        for p in packed_vars:
            counts[p] += 1
        return CommitLayout(ordered, packed_vars,
                            piop.CommitMeta(tuple(counts)),
                            {oid: i for i, oid in enumerate(ordered)})


def make_fri_params(commit_meta: piop.CommitMeta, log_inv_rate: int) -> fri_mod.FRIParams:
    return piop.make_commit_params(commit_meta, SECURITY_BITS, log_inv_rate)


def _zerocheck_claims(system: ConstraintSystem, ascending: bool = False):
    """(sorted constraint sets by n_vars, zerocheck claims)."""
    key = (lambda s: s.n_vars) if ascending else (lambda s: -s.n_vars)
    sets = sorted(system.constraint_sets, key=key)
    claims = [zc.ZerocheckClaim(s.n_vars, len(s.oracle_ids),
                                tuple(CompositionPoly(e, len(s.oracle_ids))
                                      for e in s.zero_constraints))
              for s in sets]
    return sets, claims


_FORCE_GENERIC_ZC = os.environ.get("BINIUS_FORCE_GENERIC_ZEROCHECK", "") not in ("", "0")


def _zerocheck_skip(system: ConstraintSystem) -> int:
    """Deterministic univariate-skip round count for this system (0 selects
    the generic eq-ind zerocheck path)."""
    if _FORCE_GENERIC_ZC or not system.constraint_sets:
        return 0
    _, claims = _zerocheck_claims(system, ascending=True)
    return uzc.compute_skip_rounds(claims)


def _to_evalcheck_claims(sets, ver_or_out, challenges_order_high):
    """Zerocheck outputs -> evalcheck claims on the participating oracles."""
    from ..protocols.sumcheck import verify as sc_verify
    n_rounds = sets[0].n_vars if sets else 0
    out = []
    for s, evals in zip(sets, ver_or_out.multilinear_evals):
        pt = tuple(sc_verify.claim_point(n_rounds, s.n_vars, ver_or_out.challenges,
                                         challenges_order_high))
        for oid, ev in zip(s.oracle_ids, evals[1:]):  # skip eq multilinear
            out.append(evalcheck.EvalcheckClaim(oid, pt, ev))
    return out


def _observe_boundaries(transcript, boundaries) -> None:
    w = transcript.observe()
    for b in boundaries:
        w.write_u64(b.channel_id)
        w.write_bytes(b.direction.encode())
        w.write_u64(b.multiplicity)
        w.write_scalars(LEVEL, list(b.values))


def _make_flush_oracles(system: ConstraintSystem, alpha: int, beta: int):
    """Instantiate the flush oracles (both sides do this identically):
    a LinearCombination alpha + sum beta^i col_i, or — with a selector —
    the Composite 1 + sel * (1 + alpha + sum beta^i col_i), so deselected
    rows contribute 1 to the grand product. Returns [(flush, oracle_id)].

    Flushes are stable-sorted by channel id first — the reference
    canonicalizes the flush order this way on BOTH sides before any oracle
    augmentation (`prove.rs:150`, `verify.rs:333` `sort_by_key(channel_id)`),
    so flush-oracle ids and GPA claim order follow (channel, emission)."""
    from ..math.arith import ArithExpr
    out = []
    for f in sorted(system.flushes, key=lambda f: f.channel_id):
        n_vars = system.oracles[f.oracle_ids[0]].n_vars
        coeff = beta
        terms = []
        for oid in f.oracle_ids:
            assert system.oracles[oid].n_vars == n_vars
            terms.append((oid, coeff))
            coeff = scalar.mul(LEVEL, coeff, beta)
        if not f.selector_ids:
            oid = system.oracles.add_linear_combination(n_vars, terms, alpha,
                                                        f"flush_{len(out)}")
        else:
            ns = len(f.selector_ids)
            inner_ids = [*f.selector_ids, *f.oracle_ids]
            mix = ArithExpr.const(alpha ^ 1, 7)
            for i, (_, c) in enumerate(terms):
                mix = mix + ArithExpr.const(c, 7) * ArithExpr.var(i + ns)
            sel = ArithExpr.var(0)
            for s in range(1, ns):
                sel = sel * ArithExpr.var(s)
            expr = ArithExpr.const(1) + sel * mix
            oid = system.oracles.add_composite(n_vars, inner_ids, expr,
                                               f"flush_{len(out)}")
        out.append((f, oid))
    return out


def _boundary_value(b, alpha: int, beta: int) -> int:
    acc = alpha
    coeff = beta
    for v in b.values:
        acc ^= scalar.mul(LEVEL, coeff, v)
        coeff = scalar.mul(LEVEL, coeff, beta)
    return acc


def _check_channel_balance(system, boundaries, flush_products, alpha, beta) -> None:
    lhs = [1] * system.n_channels
    rhs = [1] * system.n_channels
    for (f, _), p in flush_products:
        side = lhs if f.direction == PUSH else rhs
        side[f.channel_id] = scalar.mul(
            LEVEL, side[f.channel_id], scalar.pow(LEVEL, p, f.multiplicity))
    for b in boundaries:
        v = scalar.pow(LEVEL, _boundary_value(b, alpha, beta), b.multiplicity)
        side = lhs if b.direction == PUSH else rhs
        side[b.channel_id] = scalar.mul(LEVEL, side[b.channel_id], v)
    for c in range(system.n_channels):
        if lhs[c] != rhs[c]:
            raise ValueError(f"channel {c} is not balanced")


def _gpa_instances(system: ConstraintSystem, flush_oracles):
    """Deterministic GPA instance list: (oracle_id, kind) sorted desc by
    n_vars, flushes before non-zero claims at equal size."""
    inst = [(oid, "flush", f) for f, oid in flush_oracles]
    inst += [(nz.oracle_id, "nonzero", None) for nz in system.non_zero_claims]
    inst.sort(key=lambda t: -system.oracles[t[0]].n_vars)
    return inst


def prove(system: ConstraintSystem, witness: dict, boundaries: list = (),
          log_inv_rate: int = 1, table_sizes: list = None, mesh=None,
          group_claims: bool = None, min_shard_elems: int = None) -> bytes:
    """witness: oracle id -> (level, device data) for committed and virtual
    oracles (prover materializes virtual columns during witness generation).

    table_sizes: optional per-table row counts, written to the transcript as
    the proof's first message (`prove.rs:177`); the M3 verifier reads them
    back to instantiate step-down masks (`m3/builder/statement.py`).

    mesh: optional 1-D `jax.sharding.Mesh` (`parallel.mesh.make_mesh()`).
    Every witness column's element axis is sharded over it, and all device
    kernels — commit NTT, zerocheck round evals, folds, FRI folds — run SPMD
    under GSPMD with collectives on the mesh axis. Field ops are exact, so
    proof bytes are identical with and without a mesh
    (tests/test_sharding.py).

    group_claims: force the same-structure zerocheck claim-grouping regime
    on/off (None = BINIUS_GROUP_CLAIMS env, then platform default). This is
    the reference's NTTOptions/ThreadingSettings analog: a per-call dispatch
    regime override (`ntt/src/dynamic_dispatch.rs:56`).

    min_shard_elems: columns with fewer elements than this replicate instead
    of sharding under `mesh` (None = parallel.mesh.MIN_SHARD_ELEMS)."""
    timer = _PhaseTimer("prove")
    transcript = ProverTranscript()
    transcript.observe().write_bytes(system.digest())
    _observe_boundaries(transcript, boundaries)
    if table_sizes is not None:
        w = transcript.message()
        w.write_u64(len(table_sizes))
        for s in table_sizes:
            w.write_u64(s)
    # Work on copies: flush oracles are instantiated during proving.
    system = ConstraintSystem(system.oracles.clone(), system.constraint_sets,
                              system.flushes, system.n_channels,
                              system.non_zero_claims, system.exponents)
    witness = dict(witness)
    if mesh is not None:
        min_elems = (mesh_mod.MIN_SHARD_ELEMS if min_shard_elems is None
                     else min_shard_elems)
        witness = {oid: (lvl, mesh_mod.put_row_sharded(mesh, lvl, data,
                                                       min_elems=min_elems))
                   for oid, (lvl, data) in witness.items()}

    # --- commit phase ---
    timer.phase("commit", transcript)
    # exp-result columns are committed but prover-computed (`exp.rs:118`)
    exp_witnesses = exp_mod.make_exp_witnesses(system, witness)
    layout = CommitLayout.from_system(system)
    fri_params = make_fri_params(layout.commit_meta, log_inv_rate)
    packed_mles = []
    for oid, packed_vars in zip(layout.oracle_ids, layout.packed_n_vars):
        o = system.oracles[oid]
        level, data = witness[oid]
        if level == tower.P1:
            # bit-packed B1 words ARE the B128 limb layout: packing is a view
            assert o.tower_level == 0
            packed, pv = data.reshape(-1, tower.n_limbs(LEVEL)), o.n_vars - 7
        else:
            assert level == o.tower_level
            packed, pv = piop.pack_multilinear(level, data, o.n_vars)
        assert pv == packed_vars
        packed_mles.append((packed, pv))
    codeword, tree, _ = piop.commit(fri_params, layout.commit_meta, packed_mles)
    transcript.message().write_bytes(tree.root)

    # --- exponentiation phase (`prove.rs:236-274`) ---
    timer.phase("exp", transcript)
    exp_ec_claims = exp_mod.prove_phase(system, witness, exp_witnesses, transcript)

    # --- channel / non-zero (grand product) phase ---
    timer.phase("gpa", transcript)
    gpa_ec_claims = []
    if system.flushes or system.non_zero_claims:
        alpha = transcript.sample_scalar(LEVEL)
        beta = transcript.sample_scalar(LEVEL)
        flush_oracles = _make_flush_oracles(system, alpha, beta)
        instances = _gpa_instances(system, flush_oracles)
        gpa_claims, gpa_wits, flush_products = [], [], []
        w = transcript.message()
        for oid, kind, f in instances:
            lvl, data = witness_mod.materialize(system.oracles, witness, oid)
            if lvl < LEVEL:
                data = tower.embed(lvl, LEVEL, data)
            gw = gkr_gpa.GrandProductWitness.compute(system.oracles[oid].n_vars, data)
            p = gw.product
            if kind == "flush" and p == 0:
                raise ValueError("zero flush product (table row collides with challenge)")
            w.write_scalar(LEVEL, p)
            gpa_claims.append(gkr_gpa.GrandProductClaim(system.oracles[oid].n_vars, p))
            gpa_wits.append(gw)
            if kind == "flush":
                flush_products.append(((f, oid), p))
        _check_channel_balance(system, boundaries, flush_products, alpha, beta)
        gpa_out = gkr_gpa.batch_prove(gpa_claims, gpa_wits, transcript)
        for (oid, kind, f), pt, ev in zip(instances, gpa_out.eval_points, gpa_out.evals):
            gpa_ec_claims.append(evalcheck.EvalcheckClaim(oid, tuple(pt), ev))

    # --- zerocheck phase ---
    timer.phase("zerocheck", transcript)
    skip = _zerocheck_skip(system)
    if skip > 0:
        sets, claims = _zerocheck_claims(system, ascending=True)
        mls_per_claim = [[witness[oid] for oid in s.oracle_ids] for s in sets]
        zc_out = uzc.batch_prove(claims, mls_per_claim, transcript, skip,
                                 group_claims=group_claims)
        ec_claims = [evalcheck.EvalcheckClaim(oid, tuple(pt), ev)
                     for s, evs, pt in zip(sets, zc_out.multilinear_evals,
                                           zc_out.eval_points)
                     for oid, ev in zip(s.oracle_ids, evs)]
        ec_claims += gpa_ec_claims
    else:
        sets, claims = _zerocheck_claims(system)
        mls_per_claim = [[tower.resolve_p1(*witness[oid]) for oid in s.oracle_ids]
                         for s in sets]
        zc_out = zc.batch_prove(claims, mls_per_claim, transcript, order_high=False)
        ec_claims = _to_evalcheck_claims(sets, zc_out, False) + gpa_ec_claims
    ec_claims += exp_ec_claims

    # --- evalcheck phase ---
    timer.phase("evalcheck", transcript)
    committed_claims = evalcheck.prove(system.oracles, witness, ec_claims, transcript)

    # --- ring switch ---
    timer.phase("ring_switch", transcript)
    rs_claims = _ring_switch_claims(system, layout, committed_claims)
    witnesses_by_idx = [witness[oid] for oid in layout.oracle_ids]
    reduced = ring_switch.prove(rs_claims, witnesses_by_idx, transcript)

    # --- PIOP ---
    timer.phase("piop", transcript)
    piop.prove(fri_params, layout.commit_meta, codeword, tree, packed_mles,
               reduced.transparent_mles, reduced.sumcheck_claims, transcript)
    out = transcript.finalize()
    timer.done()
    return out


def _ring_switch_claims(system, layout, committed_claims):
    keyed = []
    for c in committed_claims:
        o = system.oracles[c.oracle_id]
        idx = layout.oracle_to_idx[c.oracle_id]
        packed = layout.packed_n_vars[idx]
        pt = tuple(c.point)
        kappa = 7 - o.tower_level
        if len(pt) < kappa:
            # tiny column: pad the eval point with zeros to kappa — consistent
            # with the repeat-packed element (`ring_switch/common.rs:169-176`)
            pt = pt + (0,) * (kappa - len(pt))
        keyed.append((packed, idx, ring_switch.RingSwitchEvalClaim(
            idx, o.tower_level, pt, c.eval)))
    keyed.sort(key=lambda t: (t[0], t[1]))
    return [k[2] for k in keyed]


def peek_table_sizes(proof: bytes) -> list[int]:
    """Read the table-size prefix of a proof produced with table_sizes
    (the message tape starts with them; sampling state is irrelevant)."""
    t = VerifierTranscript(proof)
    r = t.message()
    return [r.read_u64() for _ in range(r.read_u64())]


def verify(system: ConstraintSystem, proof: bytes, boundaries: list = (),
           log_inv_rate: int = 1, table_sizes: list = None) -> None:
    transcript = VerifierTranscript(proof)
    transcript.observe().write_bytes(system.digest())
    _observe_boundaries(transcript, boundaries)
    if table_sizes is not None:
        r = transcript.message()
        n = r.read_u64()
        got = [r.read_u64() for _ in range(n)]
        if got != list(table_sizes):
            raise ValueError("table sizes in proof do not match the instance")
    system = ConstraintSystem(system.oracles.clone(), system.constraint_sets,
                              system.flushes, system.n_channels,
                              system.non_zero_claims, system.exponents)

    layout = CommitLayout.from_system(system)
    fri_params = make_fri_params(layout.commit_meta, log_inv_rate)
    commitment = transcript.message().read_bytes(32)

    # --- exponentiation phase (`verify.rs:121-150`) ---
    exp_ec_claims = exp_mod.verify_phase(system, transcript)

    # --- channel / non-zero (grand product) phase ---
    gpa_ec_claims = []
    if system.flushes or system.non_zero_claims:
        alpha = transcript.sample_scalar(LEVEL)
        beta = transcript.sample_scalar(LEVEL)
        flush_oracles = _make_flush_oracles(system, alpha, beta)
        instances = _gpa_instances(system, flush_oracles)
        r = transcript.message()
        gpa_claims, flush_products = [], []
        for oid, kind, f in instances:
            p = r.read_scalar(LEVEL)
            if kind == "nonzero" and p == 0:
                raise ValueError(f"non-zero claim on oracle {oid} failed")
            gpa_claims.append(gkr_gpa.GrandProductClaim(system.oracles[oid].n_vars, p))
            if kind == "flush":
                flush_products.append(((f, oid), p))
        _check_channel_balance(system, boundaries, flush_products, alpha, beta)
        gpa_out = gkr_gpa.batch_verify(gpa_claims, transcript)
        for (oid, kind, f), pt, ev in zip(instances, gpa_out.eval_points, gpa_out.evals):
            gpa_ec_claims.append(evalcheck.EvalcheckClaim(oid, tuple(pt), ev))

    skip = _zerocheck_skip(system)
    if skip > 0:
        sets, claims = _zerocheck_claims(system, ascending=True)
        zc_ver = uzc.batch_verify(claims, transcript, skip)
        ec_claims = [evalcheck.EvalcheckClaim(oid, tuple(pt), ev)
                     for s, evs, pt in zip(sets, zc_ver.multilinear_evals,
                                           zc_ver.eval_points)
                     for oid, ev in zip(s.oracle_ids, evs)]
        ec_claims += gpa_ec_claims
    else:
        sets, claims = _zerocheck_claims(system)
        zc_ver = zc.batch_verify(claims, transcript, order_high=False)
        ec_claims = _to_evalcheck_claims(sets, zc_ver, False) + gpa_ec_claims
    ec_claims += exp_ec_claims

    committed_claims = evalcheck.verify(system.oracles, ec_claims, transcript)

    rs_claims = _ring_switch_claims(system, layout, committed_claims)
    reduced = ring_switch.verify(rs_claims, transcript)

    piop.verify(fri_params, layout.commit_meta, commitment,
                reduced.transparent_mles, reduced.sumcheck_claims, transcript)
    transcript.finalize()
