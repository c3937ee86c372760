"""Sumcheck provers (TPU device kernels + host orchestration).

The round-eval computation is the prover's hot loop (reference:
`crates/hal/src/sumcheck_round_calculation.rs`); here it is a jitted XLA
program per (composition set, bucketed shape): split each multilinear into
its X=0/X=1 halves, extrapolate to the extra domain points, evaluate the
compositions batch-wise and XOR-reduce. Folding binds one variable per round
(`crates/hal/src/sumcheck_folding.rs`).

Compile amortization: multilinear buffers are padded to power-of-4 sizes and
the *active* element count is a traced scalar, so consecutive rounds (and
different claims with the same composition set) share compiled kernels; the
inactive tail is masked out of the reductions. This replaces the reference's
subcube blocking (`MAX_SRC_SUBCUBE_LOG_BITS`) as the shape-management story.

Batching follows the rear-loaded scheme (`sumcheck/verify_sumcheck.rs`):
claims sorted descending by n_vars activate when the remaining round count
equals their n_vars.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...fields import scalar, tower
from ...math import fold, mle
from ...parallel import mesh as mesh_mod
from ...math.univariate import EvaluationDomain
from . import common
from .common import LEVEL, SumcheckClaim


#: Batch all of a claim's compositions into ONE round-eval kernel. 2x faster
#: warm (shared halves/extrapolations, 25x fewer dispatches) but the bigger
#: graph compiles ~13x slower on XLA:CPU (274 s vs 21 s for a keccak-shaped
#: claim) and stage-2 re-bucketing recompiles per shape — so default ON for
#: TPU (remote compile service), OFF for CPU. BINIUS_BATCH_ROUND_KERNELS=0/1
#: overrides.
def _batch_round_kernels() -> bool:
    import os
    env = os.environ.get("BINIUS_BATCH_ROUND_KERNELS", "")
    if env != "":
        return env not in ("0",)
    return jax.default_backend() in ("tpu", "axon")


def _bucket_log(log_m: int) -> int:
    """Pad log-size up to the next even value (power-of-4 buckets)."""
    return log_m + (log_m & 1)


def _group_comp_specs(comp_specs: tuple):
    """Partition (cexpr, used) compositions by identical compact structure:
    [(cexpr, used_rows, orig_indices)].

    Reference-parity lowering merges a whole table partition's constraints
    into ONE claim (`translate_constraint_set`), so a keccak-class claim
    carries hundreds of compositions that are 24 copies of the same few
    expressions over different columns. Tracing them individually would
    blow the graph (and XLA:CPU compile ~linearly with it); instead each
    distinct structure evaluates ONCE on a (G, k, ...) gather of its used
    rows — the same op count as a single composition, data-parallel over
    the group axis (the claims-grouping trick one level down)."""
    order: dict = {}
    for ci, (cexpr, used) in enumerate(comp_specs):
        order.setdefault((cexpr, len(used)), []).append((tuple(used), ci))
    return [(cexpr, tuple(u for u, _ in entries), tuple(ci for _, ci in entries))
            for (cexpr, _k), entries in order.items()]


def _pad_to(level: int, data, log_size: int):
    cur = tower.batch_shape(level, data)[0]
    want = 1 << log_size
    if cur == want:
        return data
    assert cur < want
    pad = tower.zeros(level, (want - cur,))
    return jnp.concatenate([data, pad], axis=0)


def _mask01(shape_len: int, active, extra_dims: int):
    """0/1 uint32 mask of the first `active` positions (traced scalar)."""
    iota = jax.lax.broadcasted_iota(jnp.uint32, (shape_len, 1), 0)[:, 0]
    m = (iota < active).astype(jnp.uint32)
    for _ in range(extra_dims):
        m = m[:, None]
    return m


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 5, 7))
def _round_values_jit(comp_specs: tuple, levels: tuple, log_padded: int, order_high: bool,
                      mls: tuple, points: tuple, active, spmd: bool = False):
    """Values of each composite round polynomial at each domain point, with
    the active prefix length `active` (traced) masked into the reduction.

    comp_specs: tuple of (compact expr, used multilinear indices). ALL of a
    claim's compositions evaluate in ONE kernel so the halves split and the
    extrapolations to the extra domain points are computed once and shared
    (the per-composition version recomputed them n_comps times and paid
    n_comps dispatches per round).

    Returns (n_comps * n_points, 4) B128 rows, composition-major.
    """
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    halves = []
    for lvl, data in zip(levels, mls):
        if order_high:
            e0 = jax.lax.slice_in_dim(data, 0, half, axis=0)
            e1 = jax.lax.dynamic_slice_in_dim(data, act_half, half, axis=0)
        else:
            d = data.reshape(tower.elem_shape(lvl, (half, 2)))
            if tower.has_limb_dim(lvl):
                e0, e1 = d[:, 0, :], d[:, 1, :]
            else:
                e0, e1 = d[:, 0], d[:, 1]
        if lvl < LEVEL:
            e0 = tower.embed(lvl, LEVEL, e0)
            e1 = tower.embed(lvl, LEVEL, e1)
        halves.append((e0, e1))
    mask = _mask01(half, act_half, 1 if tower.has_limb_dim(LEVEL) else 0)
    # evaluations of every multilinear at each domain point, shared by comps
    at_point = []
    for x in points:
        if x == 0:
            at_point.append([h[0] for h in halves])
        elif x == 1:
            at_point.append([h[1] for h in halves])
        else:
            xc = tower.full(LEVEL, (), x)
            at_point.append([fold.extrapolate_line(LEVEL, h[0], h[1], xc)
                             for h in halves])
    out_slots = [[None] * len(at_point) for _ in comp_specs]
    for cexpr, used_rows, origs in _group_comp_specs(comp_specs):
        if len(origs) == 1:
            used = used_rows[0]
            for pi, rows_all in enumerate(at_point):
                v = cexpr.evaluate(LEVEL, [rows_all[u] for u in used])
                v = jnp.where(mask.astype(bool), v, jnp.zeros_like(v))
                out_slots[origs[0]][pi] = tower.xor_reduce(v, axis=0, spmd=spmd)
        else:
            idx = jnp.asarray(np.array(used_rows, dtype=np.int32))
            k = len(used_rows[0])
            for pi, rows_all in enumerate(at_point):
                ev = jnp.stack(rows_all, axis=0)         # (m, half, 4)
                sub = jnp.take(ev, idx, axis=0)          # (G, k, half, 4)
                v = cexpr.evaluate(LEVEL, [sub[:, i] for i in range(k)])
                v = jnp.where(mask[None].astype(bool), v, jnp.zeros_like(v))
                red = tower.xor_reduce(v, axis=1, spmd=spmd)  # (G, 4)
                for g, oc in enumerate(origs):
                    out_slots[oc][pi] = red[g]
    return jnp.stack([s for comp in out_slots for s in comp])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 4, 6))
def _round_values_stacked_jit(comp_specs: tuple, log_padded: int, order_high: bool,
                              stack, points: tuple, active, spmd: bool = False):
    """Stacked variant of `_round_values_jit`: the claim's multilinears live
    in ONE (m, padded, 4) B128 array (built after the first fold), so the
    whole round is a single dispatch on both backends."""
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(stack, 0, half, axis=1)
        e1 = jax.lax.dynamic_slice_in_dim(stack, act_half, half, axis=1)
    else:
        d = stack.reshape(stack.shape[0], half, 2, 4)
        e0, e1 = d[:, :, 0, :], d[:, :, 1, :]
    mask = _mask01(half, act_half, 1)
    at_point = []
    for x in points:
        if x == 0:
            at_point.append(e0)
        elif x == 1:
            at_point.append(e1)
        else:
            xc = tower.full(LEVEL, (), x)
            at_point.append(fold.extrapolate_line(LEVEL, e0, e1, xc))
    out_slots = [[None] * len(at_point) for _ in comp_specs]
    for cexpr, used_rows, origs in _group_comp_specs(comp_specs):
        if len(origs) == 1:
            used = used_rows[0]
            for pi, ev in enumerate(at_point):
                v = cexpr.evaluate(LEVEL, [ev[u] for u in used])
                v = jnp.where(mask.astype(bool), v, jnp.zeros_like(v))
                out_slots[origs[0]][pi] = tower.xor_reduce(v, axis=0, spmd=spmd)
        else:
            # same-structure compositions: one network on a (G, k, half, 4)
            # gather instead of G traced copies
            idx = jnp.asarray(np.array(used_rows, dtype=np.int32))
            k = len(used_rows[0])
            for pi, ev in enumerate(at_point):
                sub = jnp.take(ev, idx, axis=0)          # (G, k, half, 4)
                v = cexpr.evaluate(LEVEL, [sub[:, i] for i in range(k)])
                v = jnp.where(mask[None].astype(bool), v, jnp.zeros_like(v))
                red = tower.xor_reduce(v, axis=1, spmd=spmd)  # (G, 4)
                for g, oc in enumerate(origs):
                    out_slots[oc][pi] = red[g]
    return jnp.stack([s for comp in out_slots for s in comp])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5, 7))
def _round_values_stacked_take_jit(cexpr, log_padded: int, order_high: bool,
                                   stack, used_idx, points: tuple, active,
                                   spmd: bool = False):
    """Per-composition stacked round evals with TRACED row indices: the
    kernel compiles once per (composition structure, shape) and is reused
    across every composition and claim with that arity; only the used rows
    are gathered, halved, and extrapolated."""
    sub = jnp.take(stack, used_idx, axis=0)
    arity = used_idx.shape[0]
    return _round_values_stacked_jit.__wrapped__(
        ((cexpr, tuple(range(arity))),), log_padded, order_high, sub, points,
        active, spmd)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fold_jit(level: int, log_padded: int, order_high: bool, data, r, active):
    """Fold one variable on a padded buffer; result stays padded at the same
    size with the active prefix halved (tail = garbage, masked downstream)."""
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(data, 0, half, axis=0)
        e1 = jax.lax.dynamic_slice_in_dim(data, act_half, half, axis=0)
    else:
        d = data.reshape(tower.elem_shape(level, (half, 2)))
        if tower.has_limb_dim(level):
            e0, e1 = d[:, 0, :], d[:, 1, :]
        else:
            e0, e1 = d[:, 0], d[:, 1]
    if level < LEVEL:
        e0 = tower.embed(level, LEVEL, e0)
        e1 = tower.embed(level, LEVEL, e1)
    folded = fold.extrapolate_line(LEVEL, e0, e1, r)
    pad = jnp.zeros_like(folded)
    return jnp.concatenate([folded, pad], axis=0)


class RegularSumcheckProver:
    """Proves a `SumcheckClaim` over held multilinear witness data.

    multilinears: list of (level, device_array) of matching n_vars.
    `eq_ind_challenges`: if set, multilinear 0 must be the eq-indicator
    expansion of that point; its final eval is recomputed by the verifier
    rather than sent (zerocheck / eq-ind sumcheck convention).
    """

    def __init__(self, claim: SumcheckClaim, multilinears, order_high: bool,
                 eq_ind_challenges: tuple | None = None):
        assert len(multilinears) == claim.n_multilinears
        self.claim = claim
        self.order_high = order_high
        self.eq_ind_challenges = eq_ind_challenges
        self.n_remaining = claim.n_vars
        self.log_padded = max(_bucket_log(claim.n_vars), 1) if claim.n_vars else 0
        self.mesh = next((mesh_mod.mesh_of(d) for _, d in multilinears
                          if mesh_mod.is_mesh_sharded(d)), None)
        self.spmd = self.mesh is not None
        if self.spmd:
            # all kernel operands must live on the mesh (mixed placements are
            # an error); large element axes shard, the rest replicate
            self.mls = [(lvl, mesh_mod.put_row_sharded(
                self.mesh, lvl, _pad_to(lvl, d, self.log_padded)))
                for lvl, d in multilinears]
        else:
            self.mls = [(lvl, _pad_to(lvl, d, self.log_padded))
                        for lvl, d in multilinears]
        self._stack = None  # (m, padded, 4) after the first fold
        if (_batch_round_kernels() and claim.n_vars > 0
                and all(lvl == LEVEL for lvl, _ in self.mls)):
            # All-B128 inputs (e.g. post-skip-fold stage-2 data of a merged
            # partition claim): move to the stacked representation BEFORE
            # the first round. The per-multilinear first-round kernel
            # traces m slice/extrapolate subgraphs + an m-way stack per
            # domain point — at reference-parity claim sizes (keccak: ~1200
            # multilinears in ONE claim) that MLIR is ~600 KB and the
            # remote TPU compile helper OOMs (SIGKILL). The stacked kernel
            # is one gather + one shared network per composition structure.
            self._stack = jnp.stack([d for _, d in self.mls], axis=0)
            self.mls = None
        deg = claim.max_individual_degree()
        self.domain = EvaluationDomain.from_subspace(3, deg + 1)
        # Pre-compact each composition to the multilinears it actually uses;
        # all of a claim's compositions then run in ONE kernel per round
        # (shared halves/extrapolations), compiled once per distinct CLAIM
        # structure + shape bucket (all 24 Keccak round groups share one).
        self._compact = []
        for cs in claim.composite_sums:
            used = sorted(cs.composition.expr.vars_used())
            remap = {v: i for i, v in enumerate(used)}
            self._compact.append((cs.composition.expr.remap_vars(remap), tuple(used)))

    @property
    def n_vars(self) -> int:
        return self.claim.n_vars

    def compute_round_polys(self) -> list[list[int]]:
        """Round polynomial coefficients (one list per composite claim)."""
        pts = self.domain.points
        n_pts = len(pts)
        active = jnp.uint32(1 << self.n_remaining)
        if self._stack is not None:
            if _batch_round_kernels() or len(self._compact) == 1:
                vals = _round_values_stacked_jit(tuple(self._compact), self.log_padded,
                                                 self.order_high, self._stack, pts,
                                                 active, self.spmd)
                flat = tower.to_ints(LEVEL, vals)
                return [self.domain.interpolate(LEVEL, flat[ci * n_pts:(ci + 1) * n_pts])
                        for ci in range(len(self._compact))]
            # per-composition dispatch on the shared stack (XLA:CPU):
            # traced row indices -> one compile per composition STRUCTURE,
            # reused across comps/claims; only used rows are extrapolated
            out = []
            for cexpr, used in self._compact:
                used_idx = jnp.asarray(np.array(used, dtype=np.int32))
                vals = _round_values_stacked_take_jit(cexpr, self.log_padded,
                                                      self.order_high, self._stack,
                                                      used_idx, pts, active,
                                                      self.spmd)
                flat = tower.to_ints(LEVEL, vals)
                out.append(self.domain.interpolate(LEVEL, flat[:n_pts]))
            return out
        if _batch_round_kernels() or len(self._compact) == 1:
            levels = tuple(lvl for lvl, _ in self.mls)
            datas = tuple(d for _, d in self.mls)
            vals = _round_values_jit(tuple(self._compact), levels, self.log_padded,
                                     self.order_high, datas, pts, active, self.spmd)
            flat = tower.to_ints(LEVEL, vals)
            return [self.domain.interpolate(LEVEL, flat[ci * n_pts:(ci + 1) * n_pts])
                    for ci in range(len(self._compact))]
        # per-composition kernels: tiny graphs compiled once per distinct
        # composition STRUCTURE, shared across claims (XLA:CPU path)
        results = []
        for cexpr, used in self._compact:
            levels = tuple(self.mls[u][0] for u in used)
            datas = tuple(self.mls[u][1] for u in used)
            spec = ((cexpr, tuple(range(len(used)))),)
            results.append(_round_values_jit(spec, levels, self.log_padded,
                                             self.order_high, datas, pts, active,
                                             self.spmd))
        out = []
        for vals in results:
            flat = tower.to_ints(LEVEL, vals)
            out.append(self.domain.interpolate(LEVEL, flat[:n_pts]))
        return out

    def fold(self, challenge: int) -> None:
        ch = tower.from_ints(LEVEL, [challenge])[0]
        if self.spmd:
            ch = mesh_mod.put_replicated(self.mesh, ch)
        active = jnp.uint32(1 << self.n_remaining)
        if self._stack is not None:
            self._stack = _biv_fold_jit(self.log_padded, self.order_high,
                                        self._stack, ch, active)
            self.n_remaining -= 1
            target = max(_bucket_log(self.n_remaining), 0)
            if self.log_padded > target:
                self._stack = jax.lax.slice_in_dim(self._stack, 0, 1 << target,
                                                   axis=1)
                self.log_padded = target
            return
        new = []
        for lvl, data in self.mls:
            folded = _fold_jit(lvl, self.log_padded, self.order_high, data, ch, active)
            new.append((LEVEL, folded))
        self.n_remaining -= 1
        # NB: _fold_jit keeps the buffer size (folded half + zero pad), so
        # log_padded is unchanged until an explicit shrink below.
        # re-bucket: shrink the buffer when it falls out of the power-of-4 bucket
        target = max(_bucket_log(self.n_remaining), 0)
        if self.log_padded > target:
            new = [(lvl, jax.lax.slice_in_dim(d, 0, 1 << target, axis=0))
                   for lvl, d in new]
            self.log_padded = target
        self.mls = new
        if _batch_round_kernels():
            # after the first fold everything is B128: move to ONE stacked
            # array so each further round is a single round-eval + a single
            # fold dispatch (was ~n_mls + n_comps host round-trips — the
            # dominant cost over the TPU tunnel at small sizes). On XLA:CPU
            # the per-ml buffers win (gather traffic > dispatch savings,
            # measured keccak 2^6 stage2: 29 s per-ml vs 51 s stacked).
            self._stack = jnp.stack([d for _, d in self.mls], axis=0)
            self.mls = None

    def finish(self) -> list[int]:
        """Multilinear evaluations at the bound point (all rounds folded)."""
        assert self.n_remaining == 0
        if self._stack is not None:
            return tower.to_ints(LEVEL, self._stack[:, 0, :])
        out = []
        for lvl, data in self.mls:
            out.append(tower.to_ints(lvl, data)[0])
        return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5, 7))
def _grouped_round_coeffs_jit(comp_specs: tuple, log_padded: int, order_high: bool,
                              gstack, active, points: tuple, interp,
                              spmd: bool = False):
    """Round-polynomial coefficients for G same-structure claims in ONE
    dispatch. gstack: (G, m, padded, 4) B128 — every claim's multilinears on
    a leading group axis (row 0 = the shared eq-indicator expansion for
    eq-ind claims). interp: (n_pts, n_pts, 4) inverse-Vandermonde rows.

    The group axis is pure data parallelism: the traced graph is the same op
    count as one claim's kernel, just on (G, ...) tensors, so grouping 24
    claims costs ONE compile and ONE relay round-trip per round instead of
    24. Returns (n_comps, n_coeffs, G, 4).
    """
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(gstack, 0, half, axis=2)
        e1 = jax.lax.dynamic_slice_in_dim(gstack, act_half, half, axis=2)
    else:
        d = gstack.reshape(gstack.shape[0], gstack.shape[1], half, 2, 4)
        e0, e1 = d[:, :, :, 0, :], d[:, :, :, 1, :]
    mask = _mask01(half, act_half, 1)[None, :, :]       # (1, half, 1)
    at_point = []
    for x in points:
        if x == 0:
            at_point.append(e0)
        elif x == 1:
            at_point.append(e1)
        else:
            xc = tower.full(LEVEL, (), x)
            at_point.append(fold.extrapolate_line(LEVEL, e0, e1, xc))
    rows = []
    for cexpr, used in comp_specs:
        for ev in at_point:
            v = cexpr.evaluate(LEVEL, [ev[:, u] for u in used])   # (G, half, 4)
            v = jnp.where(mask.astype(bool), v, jnp.zeros_like(v))
            rows.append(tower.xor_reduce(v, axis=1, spmd=spmd))   # (G, 4)
    n_pts = len(at_point)
    vals = jnp.stack(rows).reshape(len(comp_specs), n_pts, -1, 4)
    # device interpolation: coeffs[j] = XOR_i interp[j, i] * vals[i]
    prod = tower.mul(LEVEL, interp[None, :, :, None, :], vals[:, None, :, :, :])
    return tower.xor_reduce(prod, axis=2)  # (n_comps, n_coeffs, G, 4)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _grouped_fold_jit(log_padded: int, order_high: bool, gstack, r, active):
    """Fold one variable of every claim in the group; ONE dispatch."""
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(gstack, 0, half, axis=2)
        e1 = jax.lax.dynamic_slice_in_dim(gstack, act_half, half, axis=2)
    else:
        d = gstack.reshape(gstack.shape[0], gstack.shape[1], half, 2, 4)
        e0, e1 = d[:, :, :, 0, :], d[:, :, :, 1, :]
    folded = fold.extrapolate_line(LEVEL, e0, e1, r)
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=2)


class GroupedRegularSumcheckProver:
    """G claims with IDENTICAL structure (n_vars, compositions, multilinear
    count/order) proven as one device-resident batch: a (G, m, padded, 4)
    stack, one round-eval+interpolate kernel and one fold kernel per round
    for the whole group.

    Transcript-equivalent to G separate `RegularSumcheckProver`s inside a
    front-loaded batch (`multi_claim` protocol): per-claim round polys are
    returned for host-side phi-power mixing and per-claim final evals are
    written in claim order. This collapses the uzc stage-2 dispatch count —
    keccak's 24 round-group claims go from 48 relay round-trips per sumcheck
    round to 2 (reference analog: the per-claim `MemoizedData` amortization
    in `sumcheck/prove/batch_prove.rs` taken across claims).
    """

    multi_claim = True

    def __init__(self, claims: list, gstack, order_high: bool,
                 eq_ind_challenges: tuple | None = None):
        """claims: list[SumcheckClaim], all structurally identical. gstack:
        (G, m, 2^n_vars, 4) B128 device array (claim-major; row 0 per claim
        must be the eq expansion when eq_ind_challenges is set)."""
        assert claims
        nv = claims[0].n_vars
        assert all(c.n_vars == nv for c in claims)
        assert all(c.composite_sums[i].composition.expr
                   == claims[0].composite_sums[i].composition.expr
                   for c in claims for i in range(len(c.composite_sums)))
        self.claims = claims
        self.claim = claims[0]
        self.n_claims = len(claims)
        self.order_high = order_high
        self.eq_ind_challenges = eq_ind_challenges
        self.n_remaining = nv
        self.log_padded = max(_bucket_log(nv), 1)
        self.mesh = (mesh_mod.mesh_of(gstack)
                     if mesh_mod.is_mesh_sharded(gstack) else None)
        self.spmd = self.mesh is not None
        if gstack.shape[2] < (1 << self.log_padded):
            pad = ((0, 0), (0, 0), (0, (1 << self.log_padded) - gstack.shape[2]), (0, 0))
            gstack = jnp.pad(gstack, pad)
        if self.spmd:
            # element axis (2) shards across the mesh; the group axis stays
            # unsharded — XOR reductions stay over the unsharded claim axes
            # and the element reduction threads spmd=True (halving tree)
            gstack = mesh_mod.put_axis_sharded(self.mesh, gstack, 2)
        self.gstack = gstack
        deg = self.claim.max_individual_degree()
        self.domain = EvaluationDomain.from_subspace(3, deg + 1)
        self._interp = jnp.asarray(_interp_matrix_np(self.domain.points))
        self._compact = []
        for cs in self.claim.composite_sums:
            used = sorted(cs.composition.expr.vars_used())
            remap = {v: i for i, v in enumerate(used)}
            self._compact.append((cs.composition.expr.remap_vars(remap), tuple(used)))

    @property
    def n_vars(self) -> int:
        return self.claims[0].n_vars

    def compute_round_polys(self) -> list[list[list[int]]]:
        """Per claim, per composition: round-poly coefficients."""
        active = jnp.uint32(1 << self.n_remaining)
        coeffs = _grouped_round_coeffs_jit(tuple(self._compact), self.log_padded,
                                           self.order_high, self.gstack, active,
                                           self.domain.points, self._interp,
                                           self.spmd)
        flat = np.asarray(jax.device_get(coeffs))  # (n_comps, n_coeffs, G, 4)
        n_comps, n_coeffs = flat.shape[0], flat.shape[1]
        out = []
        for g in range(self.n_claims):
            claim_polys = []
            for ci in range(n_comps):
                claim_polys.append([
                    int(sum(int(x) << (32 * k) for k, x in enumerate(flat[ci, j, g])))
                    for j in range(n_coeffs)])
            out.append(claim_polys)
        return out

    def fold(self, challenge: int) -> None:
        ch = tower.from_ints(LEVEL, [challenge])[0]
        if self.spmd:
            ch = mesh_mod.put_replicated(self.mesh, ch)
        active = jnp.uint32(1 << self.n_remaining)
        self.gstack = _grouped_fold_jit(self.log_padded, self.order_high,
                                        self.gstack, ch, active)
        self.n_remaining -= 1
        target = max(_bucket_log(self.n_remaining), 0)
        if self.log_padded > target:
            self.gstack = jax.lax.slice_in_dim(self.gstack, 0, 1 << target, axis=2)
            self.log_padded = target

    def finish(self) -> list[list[int]]:
        """Per-claim multilinear evals (eq eval included), claim order."""
        assert self.n_remaining == 0
        vals = np.asarray(jax.device_get(self.gstack[:, :, 0, :]))  # (G, m, 4)
        out = []
        for g in range(self.n_claims):
            out.append([int(sum(int(x) << (32 * k) for k, x in enumerate(vals[g, mi])))
                        for mi in range(vals.shape[1])])
        return out


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def _biv_round_values_jit(log_padded: int, order_high: bool, stack, idx_a, idx_b,
                          active, spmd: bool = False):
    """Bivariate-product round values: stack [m, padded, limbs]; idx_a/idx_b
    [n_comps] traced row indices. Returns (3 * n_comps, 4): values at
    X = 0, 1, 2 grouped per point."""
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(stack, 0, half, axis=1)
        e1 = jax.lax.dynamic_slice_in_dim(stack, act_half, half, axis=1)
    else:
        d = stack.reshape(stack.shape[0], half, 2, 4)
        e0, e1 = d[:, :, 0, :], d[:, :, 1, :]
    mask = _mask01(half, act_half, 1)[None, :, :]
    two = tower.full(LEVEL, (), 2)
    rows = []
    for which in range(3):
        if which == 0:
            e = e0
        elif which == 1:
            e = e1
        else:
            e = fold.extrapolate_line(LEVEL, e0, e1, two)
        a = jnp.take(e, idx_a, axis=0)
        b = jnp.take(e, idx_b, axis=0)
        prod = tower.mul(LEVEL, a, b)
        prod = jnp.where(mask.astype(bool), prod, jnp.zeros_like(prod))
        rows.append(tower.xor_reduce(prod, axis=1, spmd=spmd))  # (n_comps, 4)
    return jnp.concatenate(rows, axis=0)


def _mul3d(a, b):
    """(r, c, 4) x (r, c, 4) B128 mul through the 2-D fast path: flattened
    operands qualify for the fused bitsliced Pallas kernel (VMEM-resident
    gate network). With the 3-D shape, `tower.mul` fell back to the packed
    collect path whose HLO temps cost ~7 KB per element — a 2^18-element
    chunk kernel still compiled to a 17 GB program (u32_add 2^22)."""
    r, c, _ = a.shape
    return tower.mul(LEVEL, a.reshape(r * c, 4), b.reshape(r * c, 4)) \
        .reshape(r, c, 4)


@functools.partial(jax.jit, static_argnums=(4,))
def _biv_round_chunk_jit(e0, e1, idx_a, idx_b, spmd: bool = False):
    """One element-axis chunk of the bivariate round values (streamed path):
    e0/e1 (m, chunk, 4) active slices — no masking needed, the caller slices
    exactly the active region. Returns (3 * n_comps, 4) XOR partials."""
    m, c, _ = e0.shape
    two = jnp.broadcast_to(tower.full(LEVEL, (), 2), (m * c, 4))
    diff = (e0 ^ e1).reshape(m * c, 4)
    e2 = (e0.reshape(m * c, 4) ^ tower.mul(LEVEL, diff, two)).reshape(m, c, 4)
    rows = []
    for e in (e0, e1, e2):
        a = jnp.take(e, idx_a, axis=0)
        b = jnp.take(e, idx_b, axis=0)
        prod = _mul3d(a, b)
        rows.append(tower.xor_reduce(prod, axis=1, spmd=spmd))
    return jnp.concatenate(rows, axis=0)


@jax.jit
def _biv_fold_chunk_jit(e0, e1, r):
    m, c, _ = e0.shape
    rr = jnp.broadcast_to(r, (m * c, 4))
    diff = (e0 ^ e1).reshape(m * c, 4)
    return (e0.reshape(m * c, 4) ^ tower.mul(LEVEL, diff, rr)).reshape(m, c, 4)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _biv_fold_jit(log_padded: int, order_high: bool, stack, r, active):
    half = 1 << (log_padded - 1)
    act_half = active >> 1
    if order_high:
        e0 = jax.lax.slice_in_dim(stack, 0, half, axis=1)
        e1 = jax.lax.dynamic_slice_in_dim(stack, act_half, half, axis=1)
    else:
        d = stack.reshape(stack.shape[0], half, 2, 4)
        e0, e1 = d[:, :, 0, :], d[:, :, 1, :]
    folded = fold.extrapolate_line(LEVEL, e0, e1, r)
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)


class BivariateSumcheckProver:
    """Specialized prover for claims whose composites are all products of two
    multilinears (the PIOP shape) — the analog of the reference's v3
    `BivariateSumcheckProver` (`sumcheck/v3/bivariate_product.rs:27`).

    Multilinear indices enter the kernel as traced arrays, so claims of any
    width share one compiled kernel per shape bucket.
    """

    eq_ind_challenges = None

    def __init__(self, claim: SumcheckClaim, multilinears=None,
                 order_high: bool = True, prestacked=None):
        self.claim = claim
        self.order_high = order_high
        self.n_remaining = claim.n_vars
        self.log_padded = max(_bucket_log(claim.n_vars), 1) if claim.n_vars else 0
        if prestacked is not None:
            # (m, 2^n_vars, 4) B128 stack built by the caller (avoids m
            # per-column embed/pad dispatches — the uzc stage-3 path)
            assert prestacked.shape[0] == claim.n_multilinears
            self.mesh = mesh_mod.mesh_of(prestacked) \
                if mesh_mod.is_mesh_sharded(prestacked) else None
            self.spmd = self.mesh is not None
            if prestacked.shape[1] < (1 << self.log_padded):
                prestacked = jnp.pad(
                    prestacked,
                    ((0, 0), (0, (1 << self.log_padded) - prestacked.shape[1]), (0, 0)))
            self.stack = prestacked
        else:
            assert len(multilinears) == claim.n_multilinears
            self.mesh = next((mesh_mod.mesh_of(d) for _, d in multilinears
                              if mesh_mod.is_mesh_sharded(d)), None)
            self.spmd = self.mesh is not None
            cols = []
            for lvl, d in multilinears:
                if lvl < LEVEL:
                    d = tower.embed(lvl, LEVEL, d)
                d = _pad_to(LEVEL, d, self.log_padded)
                if self.spmd:
                    d = mesh_mod.put_row_sharded(self.mesh, LEVEL, d)
                cols.append(d)
            self.stack = jnp.stack(cols, axis=0)  # (m, padded, 4)
        idx_a, idx_b = [], []
        for cs in claim.composite_sums:
            expr = cs.composition.expr
            assert expr.op == "mul" and expr.args[0].op == "var" and expr.args[1].op == "var", \
                "BivariateSumcheckProver requires pure product compositions"
            idx_a.append(expr.args[0].value)
            idx_b.append(expr.args[1].value)
        self.idx_a = jnp.asarray(np.array(idx_a, dtype=np.int32))
        self.idx_b = jnp.asarray(np.array(idx_b, dtype=np.int32))
        self.domain = EvaluationDomain.from_subspace(3, 3)

    @property
    def n_vars(self) -> int:
        return self.claim.n_vars

    #: composition-element budget for the streamed big-operand path: the
    #: B128 Karatsuba mul materializes ~27 base-product lanes (~432 B) per
    #: (composition, element) pair, so an unchunked round at piop-2^22
    #: scale compiled a 34 GB HBM program, and a fixed element chunk still
    #: blew 17 GB when ring-switch contributed hundreds of product claims
    #: in one group (u32_add 2^22 campaign failures). Budget ~2^22 pairs
    #: (~1.8 GB of mul temps) per dispatch. The gate watches the PADDED
    #: buffer (what the compiled program sizes to), not the active prefix.
    _CHUNK_PAIRS = 1 << 22

    def _chunk_elems(self, rows: int = None) -> int:
        """Element chunk keeping rows x elems mul temps inside the budget;
        rows defaults to the composition count (round kernel); fold passes
        the multilinear count."""
        n = max(rows if rows is not None else len(self.claim.composite_sums), 1)
        c = self._CHUNK_PAIRS // n
        return 1 << max(10, c.bit_length() - 1)

    def compute_round_polys(self) -> list[list[int]]:
        if not len(self.idx_a):
            return []
        n_c = len(self.claim.composite_sums)
        act_half = (1 << self.n_remaining) >> 1
        # temps scale with BOTH the composition products (n_c rows) and the
        # X=2 extrapolation over all m multilinears — budget on the larger
        rows = max(n_c, self.stack.shape[0])
        if (self.order_high and not self.spmd and self.log_padded
                and (1 << (self.log_padded - 1)) > self._chunk_elems(rows)):
            # streamed: slice the active halves into chunks, accumulate the
            # per-chunk XOR partials (exact — the hypercube sum splits)
            chunk = min(self._chunk_elems(rows), act_half)
            acc = None
            for j0 in range(0, act_half, chunk):
                e0 = jax.lax.slice_in_dim(self.stack, j0, j0 + chunk, axis=1)
                e1 = jax.lax.slice_in_dim(self.stack, act_half + j0,
                                          act_half + j0 + chunk, axis=1)
                part = _biv_round_chunk_jit(e0, e1, self.idx_a, self.idx_b,
                                            self.spmd)
                acc = part if acc is None else acc ^ part
            flat3 = np.asarray(jax.device_get(acc)).reshape(3, n_c, 4)
        else:
            active = jnp.uint32(1 << self.n_remaining)
            vals = _biv_round_values_jit(self.log_padded, self.order_high,
                                         self.stack, self.idx_a, self.idx_b,
                                         active, self.spmd)
            flat3 = np.asarray(jax.device_get(vals)).reshape(3, n_c, 4)
        out = []
        for ci in range(n_c):
            values = [int(sum(int(x) << (32 * k) for k, x in enumerate(flat3[p, ci])))
                      for p in range(3)]
            out.append(self.domain.interpolate(LEVEL, values))
        return out

    def fold(self, challenge: int) -> None:
        ch = tower.from_ints(LEVEL, [challenge])[0]
        if self.spmd:
            ch = mesh_mod.put_replicated(self.mesh, ch)
        act_half = (1 << self.n_remaining) >> 1
        fold_chunk = self._chunk_elems(rows=self.stack.shape[0])
        if (self.order_high and not self.spmd and self.log_padded
                and (1 << (self.log_padded - 1)) > fold_chunk):
            chunk = min(fold_chunk, act_half)
            outs = []
            for j0 in range(0, act_half, chunk):
                e0 = jax.lax.slice_in_dim(self.stack, j0, j0 + chunk, axis=1)
                e1 = jax.lax.slice_in_dim(self.stack, act_half + j0,
                                          act_half + j0 + chunk, axis=1)
                outs.append(_biv_fold_chunk_jit(e0, e1, ch))
            self.n_remaining -= 1
            target = max(_bucket_log(self.n_remaining), 0)
            folded = jnp.concatenate(outs, axis=1)
            if (1 << target) > folded.shape[1]:
                folded = jnp.pad(folded, ((0, 0),
                                          (0, (1 << target) - folded.shape[1]),
                                          (0, 0)))
            self.stack = folded
            self.log_padded = target
            return
        active = jnp.uint32(1 << self.n_remaining)
        self.stack = _biv_fold_jit(self.log_padded, self.order_high, self.stack,
                                   ch, active)
        self.n_remaining -= 1
        target = max(_bucket_log(self.n_remaining), 0)
        if self.log_padded > target:
            self.stack = jax.lax.slice_in_dim(self.stack, 0, 1 << target, axis=1)
            self.log_padded = target

    def finish(self) -> list[int]:
        assert self.n_remaining == 0
        vals = self.stack[:, 0, :]
        return tower.to_ints(LEVEL, vals)


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(points: tuple) -> np.ndarray:
    """Inverse-Vandermonde W for a fixed domain, as (n, n, 4) uint32 limbs:
    coeffs_j = XOR_i W[j, i] * values_i. Host-precomputed once per domain."""
    dom = EvaluationDomain(3, points)
    n = len(points)
    w = np.zeros((n, n, 4), dtype=np.uint32)
    for i in range(n):
        unit = [0] * n
        unit[i] = 1
        coeffs = dom.interpolate(LEVEL, unit)
        for j, c in enumerate(coeffs):
            for limb in range(4):
                w[j, i, limb] = (c >> (32 * limb)) & 0xFFFFFFFF
    return w


@functools.partial(jax.jit, static_argnums=(0, 1, 7))
def _biv_round_coeffs_jit(log_padded: int, order_high: bool, stack, idx_a, idx_b,
                          active, interp, spmd: bool = False):
    """Per-claim round-polynomial coefficients with on-device interpolation.

    stack [m, padded, 4]; interp (3, 3, 4) B128. Returns (n_coeffs, n_c, 4).
    """
    vals = _biv_round_values_jit.__wrapped__(log_padded, order_high, stack,
                                             idx_a, idx_b, active, spmd)
    n_c = idx_a.shape[0]
    v = vals.reshape(3, n_c, 4)
    prod = tower.mul(LEVEL, interp[:, :, None, :], v[None, :, :, :])
    return tower.xor_reduce(prod, axis=1)  # (n_coeffs, n_c, 4)


class BatchedBivariateSumcheckProver:
    """k independent bivariate-product sumcheck claims of equal n_vars proven
    as ONE device-resident batch: a (2k, padded, 4) stack, one round-eval+
    interpolate kernel and one fold kernel per round for all claims.

    Transcript-equivalent to k separate provers in the front-loaded batch:
    `batch_prove` samples one batching coefficient per claim (`n_claims`) and
    writes per-claim final evals in claim order. This is the TPU-native
    analog of the reference's per-claim MemoizedData amortization
    (`evalcheck/prove.rs:173`) taken to its conclusion.
    """

    eq_ind_challenges = None
    multi_claim = True

    def __init__(self, claims: list, pair_stack, order_high: bool = False):
        """claims: list of SumcheckClaim (each 2 multilinears, one bivariate
        product composite). pair_stack: (2k, 2^n_vars, 4) B128 device array,
        rows [ml0_of_claim0, ml1_of_claim0, ml0_of_claim1, ...]."""
        assert claims
        nv = claims[0].n_vars
        assert all(c.n_vars == nv for c in claims)
        self.claims = claims
        self.n_claims = len(claims)
        self.order_high = order_high
        self.n_remaining = nv
        self.log_padded = max(_bucket_log(nv), 1)
        self.mesh = mesh_mod.mesh_of(pair_stack) if mesh_mod.is_mesh_sharded(pair_stack) else None
        self.spmd = self.mesh is not None
        k2 = pair_stack.shape[0]
        assert k2 == 2 * self.n_claims
        # Pad the claim count to a power of two so the jitted round/fold
        # kernels are shared across differently-sized claim groups (XLA
        # compiles per shape; compile time dominated round 1's profile).
        k_pad = 1 << max(0, (self.n_claims - 1).bit_length())
        if pair_stack.shape[1] < (1 << self.log_padded) or k_pad > self.n_claims:
            pair_stack = jnp.pad(
                pair_stack,
                ((0, 2 * k_pad - k2), (0, (1 << self.log_padded) - pair_stack.shape[1]),
                 (0, 0)))
        self.stack = pair_stack
        self.idx_a = jnp.asarray(np.arange(0, 2 * k_pad, 2, dtype=np.int32))
        self.idx_b = jnp.asarray(np.arange(1, 2 * k_pad, 2, dtype=np.int32))
        self.domain = EvaluationDomain.from_subspace(3, 3)

    @property
    def n_vars(self) -> int:
        return self.claims[0].n_vars

    def compute_round_polys(self) -> list[list[int]]:
        active = jnp.uint32(1 << self.n_remaining)
        interp = jnp.asarray(_interp_matrix_np(self.domain.points))
        coeffs = _biv_round_coeffs_jit(self.log_padded, self.order_high, self.stack,
                                       self.idx_a, self.idx_b, active, interp,
                                       self.spmd)
        flat = np.asarray(jax.device_get(coeffs))[:, :self.n_claims]  # (3, n_c, 4)
        out = []
        for ci in range(self.n_claims):
            out.append([int(sum(int(x) << (32 * k) for k, x in enumerate(flat[j, ci])))
                        for j in range(flat.shape[0])])
        return out

    def fold(self, challenge: int) -> None:
        ch = tower.from_ints(LEVEL, [challenge])[0]
        if self.spmd:
            ch = mesh_mod.put_replicated(self.mesh, ch)
        active = jnp.uint32(1 << self.n_remaining)
        self.stack = _biv_fold_jit(self.log_padded, self.order_high, self.stack,
                                   ch, active)
        self.n_remaining -= 1
        target = max(_bucket_log(self.n_remaining), 0)
        if self.log_padded > target:
            self.stack = jax.lax.slice_in_dim(self.stack, 0, 1 << target, axis=1)
            self.log_padded = target

    def finish(self) -> list[list[int]]:
        """Per-claim [ml0_eval, ml1_eval] lists, claim order."""
        assert self.n_remaining == 0
        vals = tower.to_ints(LEVEL, self.stack[:2 * self.n_claims, 0, :])
        return [[vals[2 * i], vals[2 * i + 1]] for i in range(self.n_claims)]


@dataclasses.dataclass
class BatchSumcheckOutput:
    challenges: list       # sampled challenges, in round order
    multilinear_evals: list  # per claim: list of evals (eq-ind eval included)


def batch_prove(provers: list, transcript) -> BatchSumcheckOutput:
    """Rear-loaded batched sumcheck proving; writes to `transcript`.

    Provers must be sorted descending by n_vars and share one evaluation
    order. A prover may carry several claims (`n_claims` > 1, e.g.
    `BatchedBivariateSumcheckProver`); it then consumes one batching
    coefficient per claim and its `compute_round_polys`/`finish` return one
    entry per claim, making the transcript identical to separate provers.
    """
    assert all(provers[i].n_vars >= provers[i + 1].n_vars for i in range(len(provers) - 1))
    import os
    import time as _time
    trace2 = os.environ.get("BINIUS_TRACE_PHASES", "") == "2"
    t_eval = t_mix = t_fold = 0.0
    n_rounds = provers[0].n_vars if provers else 0
    batch_coeffs: list[int] = []
    coeff_start: list[int] = []  # per prover, index of its first batch coeff
    challenges: list[int] = []
    next_idx = 0

    def _activate(idx: int) -> None:
        coeff_start.append(len(batch_coeffs))
        for _ in range(getattr(provers[idx], "n_claims", 1)):
            batch_coeffs.append(transcript.sample_scalar(LEVEL))

    for rnd in range(n_rounds):
        remaining = n_rounds - rnd
        while next_idx < len(provers) and provers[next_idx].n_vars == remaining:
            _activate(next_idx)
            next_idx += 1
        combined: list[int] = []
        for pi, p in enumerate(provers[:next_idx]):
            t0 = _time.perf_counter()
            polys = p.compute_round_polys()
            t_eval += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            if getattr(p, "multi_claim", False):
                n_claims = p.n_claims
                assert len(polys) == n_claims
                phis = batch_coeffs[coeff_start[pi]:coeff_start[pi] + n_claims]
                for coeffs, phi in zip(polys, phis):
                    combined = common.add_coeffs(combined, common.scale_coeffs(coeffs, phi))
            else:
                phi = batch_coeffs[coeff_start[pi]]
                for coeffs in polys:
                    combined = common.add_coeffs(combined, common.scale_coeffs(coeffs, phi))
            t_mix += _time.perf_counter() - t0
        proof_coeffs = common.truncate(combined)
        transcript.message().write_scalars(LEVEL, proof_coeffs)
        challenge = transcript.sample_scalar(LEVEL)
        challenges.append(challenge)
        t0 = _time.perf_counter()
        for p in provers[:next_idx]:
            p.fold(challenge)
        t_fold += _time.perf_counter() - t0
    if trace2 and n_rounds:
        print(f"    [batch_prove] {len(provers)} provers x {n_rounds} rounds:"
              f" eval+fetch {t_eval*1e3:.1f} / host-mix {t_mix*1e3:.1f}"
              f" / fold {t_fold*1e3:.1f} ms", flush=True)
    # 0-var claims activate after all rounds
    while next_idx < len(provers) and provers[next_idx].n_vars == 0:
        _activate(next_idx)
        next_idx += 1
    all_evals = []
    for p in provers:
        if getattr(p, "multi_claim", False):
            for evals in p.finish():
                transcript.message().write_scalars(LEVEL, evals)
                all_evals.append(evals)
        else:
            evals = p.finish()
            send = evals[1:] if p.eq_ind_challenges is not None else evals
            transcript.message().write_scalars(LEVEL, send)
            all_evals.append(evals)
    return BatchSumcheckOutput(challenges, all_evals)


def eq_ind_expansion_multilinear(point: list[int]):
    """(level, data) for the eq-indicator expansion of `point` (var 0 = point[0])."""
    e = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, point))
    return (LEVEL, e)
