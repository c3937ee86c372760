"""Univariate-skip batched zerocheck (DP24 §5 / Gruen-style skip).

TPU-native counterpart of the reference's three-stage reduction
(`crates/core/src/protocols/sumcheck/prove/univariate.rs`,
`prove/batch_zerocheck.rs`, `verify_zerocheck.rs`, `zerocheck.rs`):

  1. **Univariate round**: the first `skip_rounds` (low-indexed) variables of
     every claim are univariatized over a binary-subspace NTT domain. The
     honest round polynomial vanishes on the first 2^skip domain points (they
     map to the hypercube), so only the extension-coset evaluations are sent.
     Multilinears are extended to the extra cosets with a small-field additive
     NTT (inverse then forward-at-coset — `univariate.rs` `ntt_extrapolate`),
     compositions are evaluated in the small field, and the eq-indicator
     weighting over unskipped variables is applied on accumulation.
  2. **Eq-ind sumchecks** over the remaining variables, high-to-low, with
     front-loaded batching that REUSES the univariate-round batching
     coefficients (`front_loaded.rs` `new_prebatched`) — the verifier only
     learns the batched claimed sum from the univariate round.
  3. **Univariatizing reduction**: one `skip_rounds`-variable sumcheck of
     bivariate products (projected multilinear × Lagrange-coefficient MLE)
     that converts univariatized evals back to multilinear eval claims
     (`zerocheck.rs` `univariatizing_reduction_claim`).

Round-message encoding matches the reference (docs/TRANSCRIPT.md #2/#3,
both resolved round 4): per-claim round evals are computed on STAGGERED
domains (`deg_i` cosets each) and OddInterpolate+NTT-extended to the global
max domain before mixing (`prove/univariate.rs:566-640`); `skip_rounds`
follows `max_n_vars_and_skip_rounds` (`verify.rs:271-295`) with high-padding
of smaller claims (`prove/zerocheck.rs:77-115`). TPU-first internals:
round-eval weighting/mixing, Lagrange coefficients (barycentric), claimed
sums, folds, and projections are all batched device kernels, and
same-structure claims prove GROUPED (one dispatch per round).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp

from ...fields import scalar, tower
from ...math import mle
from ...parallel import mesh as mesh_mod
from ...math.arith import ArithExpr, CompositionPoly
from ...math.univariate import lagrange_evals_device, lagrange_evals_np
from ...ntt.additive_ntt import AdditiveNTT, NTTDomain
from . import prove as sc_prove
from .common import LEVEL, CompositeSumClaim, SumcheckClaim
from .front_loaded import FrontLoadedBatchProver, FrontLoadedBatchVerifier
from .zerocheck import ZerocheckClaim, to_sumcheck_claim

DOMAIN_LEVEL = 3  # B8 NTT twiddles: the reference's FDomain (verify.rs:227)

_TRACE = os.environ.get("BINIUS_TRACE_PHASES", "") not in ("", "0")


def _trace(msg: str, t0: float) -> float:
    t = time.perf_counter()
    if _TRACE:
        print(f"  [uzc] {msg}: {(t - t0) * 1e3:.1f} ms", flush=True)
    return t


def _max_degree(zc: ZerocheckClaim) -> int:
    return max((c.degree() for c in zc.compositions), default=0)


def _group_claims(override: bool | None = None) -> bool:
    """Same-structure claim grouping gate. Defaults to the round-kernel
    batching gate (TPU on, CPU off); `override` (plumbed from
    `csp.prove(..., group_claims=...)`) wins, then BINIUS_GROUP_CLAIMS=0/1 —
    the two dispatch regimes can be measured separately (the grouped kernels
    are new shapes — their first remote-TPU compile is expensive and worth
    isolating)."""
    if override is not None:
        return override
    env = os.environ.get("BINIUS_GROUP_CLAIMS", "")
    if env != "":
        return env not in ("0",)
    return sc_prove._batch_round_kernels()


def compute_skip_rounds(zc_claims: list[ZerocheckClaim]) -> int:
    """Deterministic skip-round count — the reference's
    `max_n_vars_and_skip_rounds` (`constraint_system/verify.rs:271-295`):
    min_i(domain_bits - log2_ceil(max_deg_i)), capped at the LARGEST claim's
    n_vars. Claims with fewer variables are high-padded by replicating their
    evals on the high variables (`prove/zerocheck.rs:77-115`)."""
    if not zc_claims:
        return 0
    domain_bits = 1 << DOMAIN_LEVEL
    max_skip = min(domain_bits - max(0, (_max_degree(c) - 1).bit_length())
                   for c in zc_claims)
    return max(0, min(max_skip, max(c.n_vars for c in zc_claims)))


def _high_pad(zc_claims: list[ZerocheckClaim], mls_per_claim: list, k: int):
    """High-pad claims with n_vars < k: replicate evals 2^(k - n_vars) times
    on the high variables (reference `high_pad_small_multilinear`,
    `prove/zerocheck.rs:77-115`). The padded MLE ignores the padding
    variables, so the reduced eval claim for such a claim restricts to the
    first n_vars skipped challenges."""
    out_c, out_m = [], []
    for zc, mls in zip(zc_claims, mls_per_claim):
        if zc.n_vars >= k:
            out_c.append(zc)
            out_m.append(mls)
            continue
        rep = 1 << (k - zc.n_vars)
        padded = []
        for lvl, d in mls:
            if lvl == tower.P1 and (1 << zc.n_vars) < 32:
                lvl, d = tower.resolve_p1(lvl, d)
            padded.append((lvl, jnp.tile(d, (rep,) + (1,) * (d.ndim - 1))))
        out_c.append(dataclasses.replace(zc, n_vars=k))
        out_m.append(padded)
    return out_c, out_m


@dataclasses.dataclass
class BatchZerocheckOutput:
    skipped_challenges: list      # skip_rounds challenges (var order, low vars)
    unskipped_challenges: list    # stage-2 challenges (round order, high-to-low)
    multilinear_evals: list       # per claim: evals of its multilinears
    eval_points: list             # per claim: full eval point (var order)


def _domain_points(max_domain_size: int) -> tuple:
    dom_log = max(1, (max_domain_size - 1).bit_length())
    dom = NTTDomain.create(DOMAIN_LEVEL, dom_log)
    return tuple(dom.subspace.get(i) for i in range(max_domain_size))


def _compact_compositions(zc: ZerocheckClaim):
    """[(compact_expr, used_vars)] per composition (kernel dedup)."""
    out = []
    for comp in zc.compositions:
        used = sorted(comp.expr.vars_used())
        remap = {v: i for i, v in enumerate(used)}
        out.append((comp.expr.remap_vars(remap), tuple(used)))
    return out


def _claim_round_evals(zc: ZerocheckClaim, mls: list, eq_pt: list[int],
                       skip: int, n_cosets: int, dom_log: int):
    """Device (n_comps, P, 4) univariate round evals on cosets 1..n_cosets-1
    of the skip-subspace, P = (n_cosets - 1) << skip."""
    n = zc.n_vars
    k = skip
    const_level = max((c.expr.binary_tower_level() for c in zc.compositions),
                      default=0)
    levels = [lvl for lvl, _ in mls]
    if any(lvl > 5 for lvl in levels) or const_level > 5:
        data_level = LEVEL
        datas = []
        for lvl, d in mls:
            lvl, d = tower.resolve_p1(lvl, d)
            datas.append(tower.embed(lvl, LEVEL, d) if lvl < LEVEL else d)
        packed_pos = []
    else:
        data_level = max([DOMAIN_LEVEL, const_level,
                          *[max(lvl, 0) for lvl in levels]])
        # bit-packed B1 columns ride into the kernel packed and unpack inside
        # the jit (fused: HBM holds words, not one lane per bit)
        datas = [d for _, d in mls]
        packed_pos = [i for i, lvl in enumerate(levels) if lvl == tower.P1]
    m = len(datas)
    m_pad = 1 << max(0, (m - 1).bit_length())

    plain_ids = [i for i in range(m) if i not in packed_pos]
    plain = [datas[i] for i in plain_ids]
    packed = [datas[i] for i in packed_pos]
    # chunking must slice packed stacks at word boundaries
    suffix = 1 << (n - k)
    P = (n_cosets - 1) << k
    max_chunk = max(1, (1 << 24) // max(1, m_pad * P))
    chunk = 1 << min(n - k, max(0, max_chunk.bit_length() - 1))
    if packed and (chunk << k) % 32 != 0:
        plain_ids = plain_ids + packed_pos
        plain = plain + [tower.unpack_b1(p) for p in packed]
        packed, packed_pos = [], []
    # pad to m_pad rows (zeros) on whichever stack exists
    n_pads = m_pad - m
    if plain:
        plain = plain + [jnp.zeros_like(plain[0])] * n_pads
        pad_rows = list(range(len(plain_ids), len(plain_ids) + n_pads))
    else:
        packed = packed + [jnp.zeros_like(packed[0])] * n_pads
        pad_rows = [len(plain) + len(packed_pos) + i for i in range(n_pads)]
    # kernel rows = concat([plain rows, unpacked packed rows]); perm maps
    # final stack position j -> kernel row holding multilinear j
    row_of = {i: r for r, i in enumerate(plain_ids)}
    for r, i in enumerate(packed_pos):
        row_of[i] = len(plain) + r
    perm = tuple([row_of[j] for j in range(m)] + pad_rows)
    stack = jnp.stack(plain, axis=0) if plain else None
    pstack = jnp.stack(packed, axis=0) if packed else None
    eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, eq_pt))  # (2^(n-k), 4)
    probe = stack if stack is not None else pstack
    mesh = mesh_mod.mesh_of(probe) if mesh_mod.is_mesh_sharded(probe) else None
    if mesh is not None:
        eq = mesh_mod.put_row_sharded(mesh, LEVEL, eq)

    compact = tuple(_compact_compositions(zc))
    acc = None
    for s0 in range(0, suffix, chunk):
        sub_plain = None
        if stack is not None:
            sub_plain = (stack[:, s0 << k:(s0 + chunk) << k, :]
                         if tower.has_limb_dim(data_level)
                         else stack[:, s0 << k:(s0 + chunk) << k])
        sub_packed = None
        if pstack is not None:
            sub_packed = pstack[:, (s0 << k) // 32:((s0 + chunk) << k) // 32]
        part = _uni_chunk_jit(data_level, k, n_cosets, dom_log, compact,
                              sub_plain, sub_packed, perm,
                              eq[s0:s0 + chunk], mesh is not None)
        acc = part if acc is None else acc ^ part
    return acc


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 7, 9))
def _uni_chunk_jit(data_level: int, k: int, n_cosets: int, dom_log: int,
                   compact: tuple, sub_plain, sub_packed, perm, eq_c,
                   spmd: bool = False):
    """One suffix chunk of the univariate round: NTT-extend every multilinear
    slice to cosets 1..n_cosets-1, evaluate compositions in the small field,
    weight by the eq indicator, XOR-reduce over the chunk.

    sub_plain: (m_plain, chunk << k [, limbs]) at data_level; sub_packed:
    (m_packed, chunk << k >> 5) bit-packed B1 words unpacked here (fused so
    only the words cross HBM); perm re-interleaves rows into original
    multilinear order. eq_c: (chunk, 4) B128. Returns (n_comps, P, 4) with
    P = (n_cosets-1) << k.
    """
    rows = []
    if sub_plain is not None:
        rows.append(sub_plain)
    if sub_packed is not None:
        rows.append(tower.unpack_b1(sub_packed))
    sub = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    if perm is not None and tuple(perm) != tuple(range(sub.shape[0])):
        sub = sub[jnp.asarray(perm, dtype=jnp.int32)]
    m_pad = sub.shape[0]
    chunk = sub.shape[1] >> k
    ntt = AdditiveNTT(NTTDomain.create(DOMAIN_LEVEL, dom_log))
    coset_bits = dom_log - k
    flat = sub.reshape(tower.elem_shape(data_level, (m_pad * chunk << k,)))
    log_z = (m_pad * chunk).bit_length() - 1
    coeffs = ntt.inverse(flat, data_level, (0, k, log_z), 0, coset_bits)
    cosets = []
    for c in range(1, n_cosets):
        ev = ntt.forward(coeffs, data_level, (0, k, log_z), c, coset_bits)
        cosets.append(ev.reshape(tower.elem_shape(data_level, (m_pad, chunk, 1 << k))))
    # ext: (m_pad, chunk, P)
    ext = jnp.concatenate(cosets, axis=-1 - (1 if tower.has_limb_dim(data_level) else 0))
    out = [None] * len(compact)
    for cexpr, used_rows, origs in sc_prove._group_comp_specs(compact):
        if len(origs) == 1:
            vals = cexpr.evaluate(data_level, [ext[u] for u in used_rows[0]])
            # subfield-scalar scaling: 16 base products instead of 81
            weighted = tower.scale_subfield(data_level, LEVEL, vals,
                                            eq_c[:, None, :])
            out[origs[0]] = tower.xor_reduce(weighted, axis=0, spmd=spmd)
        else:
            # same-structure compositions (one merged partition claim): one
            # network on a (G, k, chunk, P) gather, see _group_comp_specs
            import numpy as _np
            idx = jnp.asarray(_np.array(used_rows, dtype=_np.int32))
            k = len(used_rows[0])
            sub = jnp.take(ext, idx, axis=0)      # (G, k, chunk, P[, limbs])
            vals = cexpr.evaluate(data_level, [sub[:, i] for i in range(k)])
            weighted = tower.scale_subfield(data_level, LEVEL, vals,
                                            eq_c[:, None, :])
            red = tower.xor_reduce(weighted, axis=1, spmd=spmd)  # (G, P, 4)
            for g, oc in enumerate(origs):
                out[oc] = red[g]
    return jnp.stack(out, axis=0)


def _phi_power_weights(batch_coeffs: list[int], n_comps_per_claim: list[int]) -> list[int]:
    """Per-composition mixing weights phi_i^(j+1) (matches
    `batch_weighted_value`, front_loaded.py)."""
    from ...fields import scalar
    out = []
    for phi, n_c in zip(batch_coeffs, n_comps_per_claim):
        w = phi
        for _ in range(n_c):
            out.append(w)
            w = scalar.mul(LEVEL, w, phi)
    return out


def _run_front_loaded_prove(provers, transcript, coeffs=None):
    fl = FrontLoadedBatchProver(provers, transcript, coeffs=coeffs)
    n_rounds = max((p.n_vars for p in provers), default=0)
    challenges = []
    for _ in range(n_rounds):
        fl.send_round_proof(transcript)
        ch = transcript.sample_scalar(LEVEL)
        challenges.append(ch)
        fl.receive_challenge(ch)
    fl.finish(transcript)
    return fl, challenges


def _run_front_loaded_verify(claims, transcript, coeffs=None, presummed=None,
                             eq_ind_points=None):
    fl = FrontLoadedBatchVerifier(claims, transcript, coeffs=coeffs,
                                  presummed=presummed, eq_ind_points=eq_ind_points)
    n_rounds = max((c.n_vars for c in claims), default=0)
    for _ in range(n_rounds):
        fl.try_finish_claims(transcript)
        fl.receive_round_proof(transcript)
        ch = transcript.sample_scalar(LEVEL)
        fl.challenges.append(ch)
        fl.finish_round(ch)
    fl.try_finish_claims(transcript)
    fl.finish()
    return fl


def _reduction_composites(n_total: int, sums: list[int]):
    return tuple(
        CompositeSumClaim(
            CompositionPoly(ArithExpr.var(i) * ArithExpr.var(n_total), n_total + 1),
            s)
        for i, s in enumerate(sums))


def batch_prove(zc_claims: list[ZerocheckClaim], mls_per_claim: list,
                transcript, skip_rounds: int,
                group_claims: bool | None = None) -> BatchZerocheckOutput:
    """Claims must be sorted ASCENDING by n_vars; skip_rounds <= max n_vars
    (smaller claims high-pad). Writes the three reduction stages to
    `transcript`. `group_claims` overrides the grouping gate (None = env /
    platform default)."""
    assert zc_claims
    assert all(zc_claims[i].n_vars <= zc_claims[i + 1].n_vars
               for i in range(len(zc_claims) - 1))
    k = skip_rounds
    assert 0 < k <= zc_claims[-1].n_vars
    orig_nvars = [zc.n_vars for zc in zc_claims]
    zc_claims, mls_per_claim = _high_pad(zc_claims, mls_per_claim, k)
    max_n = zc_claims[-1].n_vars
    r = transcript.sample_scalars(LEVEL, max_n - k)  # unskipped eq challenges
    eq_pts = [r[len(r) - (zc.n_vars - k):] if zc.n_vars > k else []
              for zc in zc_claims]

    max_d = max(_max_degree(zc) for zc in zc_claims)
    max_domain_size = max(max_d, 1) << k
    points = _domain_points(max_domain_size)
    dom_log = max(1, (max_domain_size - 1).bit_length())

    # --- stage 1: univariate round (per-claim staggered domains,
    # `prove/batch_zerocheck.rs:183-210` + `prove/univariate.rs:566-640`) ---
    t0 = time.perf_counter()
    batch_coeffs = [transcript.sample_scalar(LEVEL) for _ in zc_claims]
    r_claims = []
    for i, (zc, mls) in enumerate(zip(zc_claims, mls_per_claim)):
        d_i = _max_degree(zc)
        if d_i < 2:
            # the round polynomial vanishes identically (degree < 2^k with
            # 2^k roots); its extension cosets are all zero
            r_claims.append(tower.zeros(LEVEL, (len(zc.compositions),
                                                max(max_d - 1, 0) << k)))
            continue
        ev = _claim_round_evals(zc, mls, eq_pts[i], k, d_i, dom_log)
        if d_i < max_d:
            # staggered domain smaller than the global one: re-interpolate
            # via OddInterpolate and NTT-extend (the reference's
            # `extrapolate_round_evals`; values are identical to direct
            # evaluation — same polynomial — but the device NTT only ran
            # d_i - 1 cosets)
            ev = _extrapolate_round_evals(ev, d_i, max_d, k, dom_log)
        r_claims.append(ev)
    mesh_on = any(mesh_mod.is_mesh_sharded(r) for r in r_claims)
    if mesh_on:
        # round evals are tiny; pull them off the mesh so the stage-1 mixing
        # and everything downstream runs single-device (identical bytes)
        import numpy as _np
        r_claims = [jnp.asarray(_np.asarray(jax.device_get(r))) for r in r_claims]
    r_all = jnp.concatenate(r_claims, axis=0)  # (total_comps, P, 4)
    weights = _phi_power_weights(batch_coeffs, [len(zc.compositions) for zc in zc_claims])
    msg = transcript.message()  # the round message is ALWAYS sent, possibly
    # empty — degree <= 1 everywhere makes zeros_prefix cover the whole
    # domain (`verify_zerocheck.rs:83`); obtaining the writer still
    # transitions the challenger (reference `observer()` semantics)
    if max_d >= 2:
        w_dev = tower.from_ints(LEVEL, weights)
        mixed = tower.xor_reduce(tower.mul(LEVEL, r_all, w_dev[:, None, :]), axis=0)
        msg.write_scalars(LEVEL, tower.to_ints(LEVEL, mixed))
    u_challenge = transcript.sample_scalar(LEVEL)

    lagr = lagrange_evals_device(points, u_challenge)          # (D, 4)
    if max_d >= 2:
        tail = lagr[1 << k:]
        sums_dev = tower.inner_product(LEVEL, r_all, tail[None, :, :], axis=1)
        claimed_sums = tower.to_ints(LEVEL, sums_dev)          # per composition
    else:
        claimed_sums = [0] * sum(len(zc.compositions) for zc in zc_claims)
    t0 = _trace(f"stage1 univariate ({len(zc_claims)} claims, "
                f"{len(claimed_sums)} comps, skip={k})", t0)

    # --- stage 2: eq-ind sumchecks over unskipped variables (high-to-low) ---
    sub_points = points[:1 << k]
    lagr_cube = lagrange_evals_device(sub_points, u_challenge)  # (2^k, 4)

    def s2_claim(zc, sums_i):
        base = to_sumcheck_claim(zc)
        return SumcheckClaim(zc.n_vars - k, zc.n_multilinears + 1, tuple(
            CompositeSumClaim(cs.composition, s)
            for cs, s in zip(base.composite_sums, sums_i)))

    comp_starts = []
    ci = 0
    for zc in zc_claims:
        comp_starts.append(ci)
        ci += len(zc.compositions)

    # Grouped same-structure proving follows the dispatch-regime split
    # (sumcheck/prove.py `_batch_round_kernels`): the grouped kernel is the
    # same op count as ONE claim's batched kernel on (G, ...) tensors — a
    # huge dispatch win on TPU (24 keccak claims: 2 relay round-trips per
    # round instead of 48) but it inherits the XLA:CPU compile blowup of
    # batched round kernels (~4 min for the keccak 25-composition graph).
    group_ok = _group_claims(group_claims)
    s2_provers = []
    i = 0
    while i < len(zc_claims):
        zc = zc_claims[i]
        j = i + 1
        if group_ok and zc.n_vars - k >= 1:
            key_i = _structure_key(zc)
            while (j < len(zc_claims)
                   and _structure_key(zc_claims[j]) == key_i):
                j += 1
        eq_pt = eq_pts[i]
        if j - i >= 2:
            # grouped: same-structure claims proven as ONE device batch;
            # works mesh-sharded too — the group axis is unsharded, the
            # element axis stays sharded (round-3 verdict weak #4)
            run_claims = [
                s2_claim(zc_claims[g],
                         claimed_sums[comp_starts[g]:comp_starts[g]
                                      + len(zc_claims[g].compositions)])
                for g in range(i, j)]
            eq_ml = sc_prove.eq_ind_expansion_multilinear(list(eq_pt))
            eq_data = eq_ml[1]
            g_mesh = next((mesh_mod.mesh_of(d)
                           for g in range(i, j) for _, d in mls_per_claim[g]
                           if mesh_mod.is_mesh_sharded(d)), None)
            if g_mesh is not None:
                eq_data = mesh_mod.put_row_sharded(g_mesh, LEVEL, eq_data)
            gstack = _fold_skipped_group([mls_per_claim[g] for g in range(i, j)],
                                         zc.n_vars, k, lagr_cube, eq_data)
            s2_provers.append(sc_prove.GroupedRegularSumcheckProver(
                run_claims, gstack, order_high=True,
                eq_ind_challenges=tuple(eq_pt)))
        else:
            mls = mls_per_claim[i]
            folded = _fold_skipped(mls, zc.n_vars, k, lagr_cube)
            claim = s2_claim(zc, claimed_sums[comp_starts[i]:comp_starts[i]
                                              + len(zc.compositions)])
            eq_ml = sc_prove.eq_ind_expansion_multilinear(list(eq_pt))
            s2_provers.append(sc_prove.RegularSumcheckProver(
                claim, [eq_ml, *folded], order_high=True,
                eq_ind_challenges=tuple(eq_pt)))
            j = i + 1
        i = j
    t0 = _trace("stage2 setup (fold_skipped)", t0)
    fl2, s2_challenges = _run_front_loaded_prove(s2_provers, transcript,
                                                 coeffs=batch_coeffs)
    t0 = _trace(f"stage2 eq-ind sumchecks ({len(s2_provers)} provers, "
                f"{len(zc_claims)} claims)", t0)

    # --- stage 3: univariatizing reduction sumcheck over skipped variables ---
    red_sums = []
    for i in range(len(zc_claims)):
        red_sums.extend(fl2.multilinear_evals[i][1:])  # drop eq eval
    # project all claims with equal n_vars in one batched kernel chain
    # (claims are ascending by n_vars so equal-n runs are contiguous)
    proj_parts = []
    i = 0
    while i < len(zc_claims):
        nv = zc_claims[i].n_vars
        j = i + 1
        while j < len(zc_claims) and zc_claims[j].n_vars == nv:
            j += 1
        flat_mls = [ml for g in range(i, j) for ml in mls_per_claim[g]]
        pt = list(reversed(s2_challenges[:nv - k]))
        proj_parts.append(_project_skipped_stacked(flat_mls, nv, k, pt))
        i = j
    proj_stack = jnp.concatenate([*proj_parts, lagr_cube[None]], axis=0)
    n_total = proj_stack.shape[0] - 1
    red_claim = SumcheckClaim(k, n_total + 1,
                              _reduction_composites(n_total, red_sums))
    red_prover = sc_prove.BivariateSumcheckProver(
        red_claim, prestacked=proj_stack, order_high=True)
    fl3, s3_challenges = _run_front_loaded_prove([red_prover], transcript)
    t0 = _trace(f"stage3 reduction ({n_total} multilinears)", t0)
    skipped = list(reversed(s3_challenges))
    concat_evals = fl3.multilinear_evals[0]
    assert len(concat_evals) == n_total + 1

    # regroup per claim; eval points are (skipped ++ per-claim unskipped).
    # A high-padded claim's MLE ignores the padding variables, so its eval
    # point is the first orig-n_vars skipped challenges.
    out_evals, out_points = [], []
    pos = 0
    for zc, n0 in zip(zc_claims, orig_nvars):
        out_evals.append(concat_evals[pos:pos + zc.n_multilinears])
        pos += zc.n_multilinears
        pt = skipped + list(reversed(s2_challenges[:zc.n_vars - k]))
        out_points.append(pt[:n0] if n0 < k else pt)
    return BatchZerocheckOutput(skipped, s2_challenges, out_evals, out_points)


def _extrapolate_round_evals(ev, d_i: int, max_d: int, k: int, dom_log: int):
    """Reference `extrapolate_round_evals` (`prove/univariate.rs:566-640`):
    round evals computed on a claim's own staggered domain (d_i * 2^k points,
    the zero prefix re-added) are interpolated into the novel basis with
    `OddInterpolate` over the F-upcast domain, zero-extended, forward-NTT'd to
    the full domain, and trimmed to the global max domain minus the zero
    prefix. Host-scalar: round evals are tiny (< 2^8 per composition)."""
    import numpy as _np

    from ...ntt.odd_interpolate import OddInterpolate

    rows = [_u32rows_to_ints(r) for r in _np.asarray(jax.device_get(ev))]
    n = d_i << k
    ell = (n & -n).bit_length() - 1
    # the subspace upcast of `univariate.rs:585-597`: same basis ints, B128 mul
    dom = NTTDomain.create(LEVEL, dom_log)
    oi = OddInterpolate.create(dom, n >> ell, ell, dom_log - ell)
    ntt = AdditiveNTT(dom)
    out: list[int] = []
    for row in rows:
        vals = [0] * (1 << k) + row
        coeffs = oi.inverse_transform(vals) + [0] * ((1 << dom_log) - n)
        evals = ntt.forward_scalar(coeffs, LEVEL, dom_log)
        out.extend(evals[1 << k:max_d << k])
    per = (max_d - 1) << k
    return tower.from_ints(LEVEL, out).reshape(len(rows), per, 4)


def _structure_key(zc: ZerocheckClaim):
    """Claims with equal keys share composition structure exactly and can be
    proven as one `GroupedRegularSumcheckProver` batch (keccak's 24
    round-group tables are identical up to witness data)."""
    return (zc.n_vars, zc.n_multilinears, tuple(c.expr for c in zc.compositions))


def _fold_skipped_group(mls_per_claim: list, n: int, k: int, lagr_cube,
                        eq_data):
    """Grouped `_fold_skipped`: Lagrange-fold the low k vars of EVERY claim's
    multilinears in one batched kernel chain and assemble the
    (G, m + 1, 2^(n-k), 4) group stack (row 0 = shared eq expansion)."""
    G = len(mls_per_claim)
    m = len(mls_per_claim[0])
    # bit-packed B1 columns stack as words and unpack inside the fold jit
    # (grouping by tower.P1; see mle.batched_evaluate_partial_low)
    flat = [ml for mls in mls_per_claim for ml in mls]
    groups: dict = {}
    for idx, (lvl, _) in enumerate(flat):
        groups.setdefault(lvl, []).append(idx)
    parts, order = [], []
    for lvl, idxs in groups.items():
        stack = jnp.stack([flat[i][1] for i in idxs], axis=0)
        _, folded = mle.batched_evaluate_partial_low(lvl, stack, n, lagr_cube, k)
        parts.append(folded)
        order.extend(idxs)
    full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if order != list(range(len(flat))):
        import numpy as _np
        inv = _np.argsort(_np.asarray(order))
        full = full[jnp.asarray(inv, dtype=jnp.int32)]
    body = full.reshape(G, m, full.shape[1], 4)
    eq_rows = jnp.broadcast_to(eq_data[None, None], (G, 1, eq_data.shape[0], 4))
    return jnp.concatenate([eq_rows, body], axis=1)


def _project_skipped_stacked(mls: list, n: int, k: int, point: list[int]):
    """`_project_skipped` without the per-multilinear splits: returns ONE
    (len(mls), 2^k, 4) B128 stack in input order (feeds the stage-3
    prestacked bivariate prover without len(mls) slice dispatches). Packed
    B1 columns group under tower.P1 and unpack inside the kernel."""
    groups: dict = {}
    for i, (lvl, _) in enumerate(mls):
        groups.setdefault(lvl, []).append(i)
    parts, order = [], []
    if n == k:
        for lvl, idxs in groups.items():
            stack = jnp.stack([tower.resolve_p1(lvl, mls[i][1])[1] if lvl == tower.P1
                               else mls[i][1] for i in idxs], axis=0)
            lvl = max(lvl, 0)
            parts.append(tower.embed(lvl, LEVEL, stack) if lvl < LEVEL else stack)
            order.extend(idxs)
    else:
        eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, point))
        for lvl, idxs in groups.items():
            stack = jnp.stack([mls[i][1] for i in idxs], axis=0)
            _, proj = mle.batched_evaluate_partial_high(lvl, stack, n, eq, k)
            parts.append(proj)
            order.extend(idxs)
    full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if order != list(range(len(mls))):
        import numpy as _np
        inv = _np.argsort(_np.asarray(order))
        full = full[jnp.asarray(inv, dtype=jnp.int32)]
    return full


def _fold_skipped(mls: list, n: int, k: int, lagr_cube) -> list:
    """Bind the low k vars of each multilinear with the Lagrange coefficient
    vector; returns [(LEVEL, data)] of 2^(n-k) entries each."""
    mls = [tower.resolve_p1(lvl, d) for lvl, d in mls]
    out = [None] * len(mls)
    groups: dict = {}
    for i, (lvl, _) in enumerate(mls):
        groups.setdefault(lvl, []).append(i)
    for lvl, idxs in groups.items():
        stack = jnp.stack([mls[i][1] for i in idxs], axis=0)
        _, folded = mle.batched_evaluate_partial_low(lvl, stack, n, lagr_cube, k)
        for j, i in enumerate(idxs):
            out[i] = (LEVEL, folded[j])
    return out


def _project_skipped(mls: list, n: int, k: int, point: list[int]) -> list:
    """Bind the high n-k vars of each multilinear at `point` (var order);
    returns [(LEVEL, data)] of 2^k entries each."""
    mls = [tower.resolve_p1(lvl, d) for lvl, d in mls]
    if n == k:
        return [(LEVEL, tower.embed(lvl, LEVEL, d)) for lvl, d in mls]
    eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, point))
    out = [None] * len(mls)
    groups: dict = {}
    for i, (lvl, _) in enumerate(mls):
        groups.setdefault(lvl, []).append(i)
    for lvl, idxs in groups.items():
        stack = jnp.stack([mls[i][1] for i in idxs], axis=0)
        _, proj = mle.batched_evaluate_partial_high(lvl, stack, n, eq, k)
        for j, i in enumerate(idxs):
            out[i] = (LEVEL, proj[j])
    return out


def batch_verify(zc_claims: list[ZerocheckClaim], transcript,
                 skip_rounds: int) -> BatchZerocheckOutput:
    assert zc_claims
    assert all(zc_claims[i].n_vars <= zc_claims[i + 1].n_vars
               for i in range(len(zc_claims) - 1))
    k = skip_rounds
    orig_nvars = [zc.n_vars for zc in zc_claims]
    zc_claims = [dataclasses.replace(zc, n_vars=k) if zc.n_vars < k else zc
                 for zc in zc_claims]
    max_n = zc_claims[-1].n_vars
    r = transcript.sample_scalars(LEVEL, max_n - k)
    eq_pts = [r[len(r) - (zc.n_vars - k):] if zc.n_vars > k else []
              for zc in zc_claims]

    max_d = max(_max_degree(zc) for zc in zc_claims)
    max_domain_size = max(max_d, 1) << k
    points = _domain_points(max_domain_size)

    batch_coeffs = [transcript.sample_scalar(LEVEL) for _ in zc_claims]
    n_evals = max(max_domain_size - (1 << k), 0)
    round_evals = transcript.message().read_scalars(LEVEL, n_evals)
    u_challenge = transcript.sample_scalar(LEVEL)

    # all stage-1 verifier algebra is O(D) host work — no device kernels
    lagr_tail = _u32rows_to_ints(lagrange_evals_np(points, u_challenge)[1 << k:])
    presummed = 0
    for ev, lg in zip(round_evals, lagr_tail):
        presummed ^= scalar.mul(LEVEL, ev, lg)

    # --- stage 2 ---
    s2_claims = []
    for zc in zc_claims:
        base = to_sumcheck_claim(zc)
        s2_claims.append(SumcheckClaim(zc.n_vars - k, zc.n_multilinears + 1,
                                       base.composite_sums))
    fl2 = _run_front_loaded_verify(s2_claims, transcript, coeffs=batch_coeffs,
                                   presummed=presummed,
                                   eq_ind_points=[list(p) for p in eq_pts])
    s2_challenges = fl2.challenges

    # --- stage 3 ---
    red_sums = []
    for evals in fl2.multilinear_evals:
        red_sums.extend(evals[1:])
    n_total = len(red_sums)
    red_claim = SumcheckClaim(k, n_total + 1,
                              _reduction_composites(n_total, red_sums))
    fl3 = _run_front_loaded_verify([red_claim], transcript)
    skipped = list(reversed(fl3.challenges))
    concat_evals = list(fl3.multilinear_evals[0])

    # check the Lagrange-MLE eval (last multilinear)
    sub_points = points[:1 << k]
    cube = _u32rows_to_ints(lagrange_evals_np(sub_points, u_challenge))
    eq = [1]
    for r_pt in skipped:
        eq = ([scalar.mul(LEVEL, c, r_pt ^ 1) for c in eq]
              + [scalar.mul(LEVEL, c, r_pt) for c in eq])
    expected = 0
    for c, e in zip(cube, eq):
        expected ^= scalar.mul(LEVEL, c, e)
    if concat_evals[-1] != expected:
        raise ValueError("univariate skip: Lagrange MLE evaluation mismatch")
    concat_evals = concat_evals[:-1]

    out_evals, out_points = [], []
    pos = 0
    for zc, n0 in zip(zc_claims, orig_nvars):
        out_evals.append(concat_evals[pos:pos + zc.n_multilinears])
        pos += zc.n_multilinears
        pt = skipped + list(reversed(s2_challenges[:zc.n_vars - k]))
        out_points.append(pt[:n0] if n0 < k else pt)
    return BatchZerocheckOutput(skipped, s2_challenges, out_evals, out_points)


def _u32rows_to_ints(a) -> list[int]:
    """(n, 4) uint32 B128 limb rows -> canonical ints (host)."""
    return [int(r[0]) | (int(r[1]) << 32) | (int(r[2]) << 64) | (int(r[3]) << 96)
            for r in a]
