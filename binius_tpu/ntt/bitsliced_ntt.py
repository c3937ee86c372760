"""Bitsliced additive NTT: fused butterfly stages on bit planes.

The packed-path NTT (`additive_ntt._transform_jit`) issues per-stage XLA ops
whose twiddle multiplies expand to MXU matmul glue — measured 23-27 Melem/s
on v5e, ~20x off the VPU ceiling that `fields/bitslice.py` demonstrates for
the same field algebra. This module runs the butterflies directly on the
bitsliced layout (bit b of 32 consecutive elements in one uint32 word):

  * an XOR butterfly is a plane XOR;
  * the twiddle multiply is the bitsliced Karatsuba network with the twiddle
    operand as 0/~0 MASK planes, built in-kernel from a per-word PACKED
    twiddle (4 bytes per 32 elements of HBM traffic instead of full planes);
  * a twiddle at subfield level `tl` scales level-`dl` data group-wise
    (`2^(dl-tl)` independent `tl`-level networks — the bitsliced analog of
    `tower.scale_subfield`);
  * all stages whose butterfly distance fits inside one VMEM tile are fused
    into a single Pallas kernel: pairing runs as `pltpu.roll` on the lane /
    sublane axis for word-aligned distances and as masked shifts inside the
    word for element distances < 32. Twiddles of intra-word stages split as
    (per-word base) XOR (trace-time-constant delta masks) because the LCH14
    twiddle is F2-linear in its index.
  * stages with larger distances (the first few of a big forward transform)
    run as XLA plane ops with the same algebra (`_stage_xla`), which is also
    the hermetic CPU reference for the kernel.

Semantics match `additive_ntt.AdditiveNTT.forward/inverse` (the reference's
`crates/ntt/src/additive_ntt.rs` NTTShape/coset/skip_rounds contract and
`crates/ntt/src/single_threaded.rs:18` butterfly order); tested against the
`forward_scalar` host oracle and the packed device path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bitslice, tower
from .additive_ntt import NTTDomain

LANE = 128
# Per-input VMEM tile budget (bytes); sets the sublane-row count per grid
# step and therefore which stages fuse into the kernel. The fused network's
# live set is ~15x the x-tile (measured: 29.7MB scoped VMEM at a 2MB tile),
# so keep the tile at 512KB to stay inside the 16MB scoped limit.
_TILE_BYTES = 1 << 19


@dataclasses.dataclass(frozen=True)
class _Stage:
    d_elems: int            # butterfly element distance 2^(i + log_x)
    deltas: tuple           # 2^tl uint32 delta-mask consts for intra-word
                            # stages (bit p of deltas[b] = bit b of the
                            # twiddle's p-dependent part); () if word-aligned


@dataclasses.dataclass(frozen=True)
class _Plan:
    dl: int                 # data tower level
    tl: int                 # twiddle tower level
    inverse: bool
    n_words: int
    stages: tuple           # _Stage tuple, in execution order
    sub: int                # sublane rows per pallas tile
    n_local: int            # how many trailing(fwd)/leading(inv) stages fuse


_PLAN_CACHE: dict = {}


def _tile_sub(dl: int, n_words: int) -> int:
    """Sublane rows per pallas tile; 0 when the word count can't tile."""
    if n_words % LANE:
        return 0
    planes = 1 << dl
    rows_total = n_words // LANE
    sub = max(_TILE_BYTES // (planes * LANE * 4), 1)
    sub = 1 << (sub.bit_length() - 1)
    while sub > rows_total:
        sub //= 2
    return max(sub, 1)


def _make_plan(domain: NTTDomain, dl: int, shape: tuple, coset: int,
               coset_bits: int, skip_rounds: int, inverse: bool):
    """Returns (plan, tw_np [n_stages, W] uint32 per-word packed twiddles)."""
    log_x, log_y, log_z = shape
    tl = domain.level
    assert tl <= 5, "packed twiddles need tl <= 5 (FEncode is B32)"
    assert dl >= tl
    key = (domain.level, domain.subspace.basis, dl, shape, coset, coset_bits,
           skip_rounds, inverse)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    n = 1 << (log_x + log_y + log_z)
    W = n >> 5
    assert W >= 1, "bitsliced NTT needs >= 32 elements"
    ell = domain.log_domain_size
    base_round = ell - (log_y + coset_bits)
    assert base_round >= 0, "domain too small"
    if inverse:
        stage_is = range(0, log_y - skip_rounds)
    else:
        stage_is = range(log_y - skip_rounds - 1, -1, -1)

    stages = []
    tw_rows = []
    warr = np.arange(W, dtype=np.uint64)
    for i in stage_is:
        r = base_round + i
        n_bits = log_y - 1 - i
        s = i + 1 + log_x              # element index shift to block index
        row = domain.s_evals[r]
        mask = np.uint64((1 << n_bits) - 1)
        # block index of each word's element 0 (element e = 32w + p)
        if s >= 5:
            j = (warr >> np.uint64(s - 5)) & mask
        else:
            j = (warr << np.uint64(5 - s)) & mask
        base = domain.twiddle(r, coset << n_bits) if coset_bits or coset else 0
        t = np.full(W, np.uint32(base & 0xFFFFFFFF), dtype=np.uint32)
        for b in range(min(n_bits, 64)):
            sel = ((j >> np.uint64(b)) & np.uint64(1)).astype(bool)
            if sel.any():
                t[sel] ^= np.uint32(row[b] & 0xFFFFFFFF)
        deltas = ()
        if (1 << (i + log_x)) < 32:
            # intra-word stage: twiddle(32w + p) = t[w] ^ delta(p >> s)
            dvals = []
            for p in range(32):
                jp = p >> s
                v = 0
                for b in range(5 - s):
                    if (jp >> b) & 1:
                        v ^= row[b]
                dvals.append(v)
            deltas = tuple(
                sum((((dvals[p] >> b) & 1) << p) for p in range(32))
                for b in range(1 << tl))
        stages.append(_Stage(1 << (i + log_x), deltas))
        tw_rows.append(t)

    sub = _tile_sub(dl, W)
    cap = sub * LANE // 2              # max within-tile butterfly word dist
    n_local = 0
    if sub:
        seq = stages if inverse else list(reversed(stages))
        for st in seq:
            if (st.d_elems >> 5) <= cap:
                n_local += 1
            else:
                break
    plan = _Plan(dl, tl, inverse, W, tuple(stages), sub, n_local)
    tw_np = (np.stack(tw_rows) if tw_rows
             else np.zeros((0, W), dtype=np.uint32))
    _PLAN_CACHE[key] = (plan, tw_np)
    return plan, tw_np


# ---------------------------------------------------------------------------
# Shared algebra
# ---------------------------------------------------------------------------

def _masks_from_packed(tl: int, tw, deltas: tuple):
    """Expand per-word packed twiddles into 2^tl bit-plane masks."""
    one = jnp.uint32(1)
    zero = jnp.uint32(0)
    out = []
    for b in range(1 << tl):
        m = zero - ((tw >> jnp.uint32(b)) & one)
        if deltas and deltas[b]:
            m = m ^ jnp.uint32(deltas[b])
        out.append(m)
    return out


def _scale(tl: int, dl: int, masks: list, x: list) -> list:
    """Multiply level-`dl` planes by the level-`tl` twiddle masks: the tower
    basis over the subfield is consecutive bit groups, so scaling acts
    group-wise (`tower.scale_subfield` on planes)."""
    if dl == tl:
        return bitslice._mul_bs(tl, masks, x)
    step = 1 << tl
    out = []
    for g in range(1 << (dl - tl)):
        out.extend(bitslice._mul_bs(tl, masks, x[g * step:(g + 1) * step]))
    return out


def _intra_word_masks(d: int):
    """mask_u = bits p with (p >> log2 d) even (u elements of each pair)."""
    mu = 0
    for p in range(32):
        if ((p // d) & 1) == 0:
            mu |= 1 << p
    return np.uint32(mu), np.uint32(~mu & 0xFFFFFFFF)


def _butterfly_intra(plan: _Plan, st: _Stage, masks, x: list) -> list:
    d = st.d_elems
    mu, mv = _intra_word_masks(d)
    if not plan.inverse:
        sc = _scale(plan.tl, plan.dl, masks, x)
        out = []
        for b in range(1 << plan.dl):
            xu = x[b] ^ ((sc[b] & mv) >> d)
            xv = x[b] ^ ((xu & mu) << d)
            out.append((xu & mu) | (xv & mv))
        return out
    xv = [x[b] ^ ((x[b] & mu) << d) for b in range(1 << plan.dl)]
    full = [(x[b] & mu) | (xv[b] & mv) for b in range(1 << plan.dl)]
    sc = _scale(plan.tl, plan.dl, masks, full)
    out = []
    for b in range(1 << plan.dl):
        xu = x[b] ^ ((sc[b] & mv) >> d)
        out.append((xu & mu) | (xv[b] & mv))
    return out


# ---------------------------------------------------------------------------
# XLA plane path (cross-tile stages + hermetic CPU reference)
# ---------------------------------------------------------------------------

def _stage_xla(plan: _Plan, st: _Stage, planes, tw_words):
    P = 1 << plan.dl
    W = plan.n_words
    if st.d_elems < 32:
        masks = _masks_from_packed(plan.tl, tw_words, st.deltas)
        x = [planes[b] for b in range(P)]
        return jnp.stack(_butterfly_intra(plan, st, masks, x))
    dw = st.d_elems >> 5
    nb = W // (2 * dw)
    x = planes.reshape(P, nb, 2, dw)
    u = [x[b, :, 0] for b in range(P)]
    v = [x[b, :, 1] for b in range(P)]
    twv = tw_words.reshape(nb, 2, dw)[:, 0]
    masks = _masks_from_packed(plan.tl, twv, ())
    if not plan.inverse:
        sc = _scale(plan.tl, plan.dl, masks, v)
        u = [u[b] ^ sc[b] for b in range(P)]
        v = [v[b] ^ u[b] for b in range(P)]
    else:
        v = [v[b] ^ u[b] for b in range(P)]
        sc = _scale(plan.tl, plan.dl, masks, v)
        u = [u[b] ^ sc[b] for b in range(P)]
    return jnp.stack([
        jnp.stack([u[b], v[b]], axis=1).reshape(W) for b in range(P)])


# ---------------------------------------------------------------------------
# Pallas fused-stage kernel
# ---------------------------------------------------------------------------

def _local_kernel(plan: _Plan, stage_slice: tuple, x_ref, tw_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu

    P = 1 << plan.dl
    x = [x_ref[b] for b in range(P)]
    shape = x[0].shape  # (sub, LANE)
    for si, st in enumerate(stage_slice):
        tw = tw_ref[si]
        masks = _masks_from_packed(plan.tl, tw, st.deltas)
        if st.d_elems < 32:
            x = _butterfly_intra(plan, st, masks, x)
            continue
        dw = st.d_elems >> 5
        if dw < LANE:
            axis, dd, n_ax = 1, dw, LANE
        else:
            axis, dd, n_ax = 0, dw // LANE, shape[0]
        iota = jax.lax.broadcasted_iota(jnp.uint32, shape, axis)
        is_u = ((iota // dd) & 1) == 0
        if not plan.inverse:
            sc = _scale(plan.tl, plan.dl, masks, x)
            nxt = []
            for b in range(P):
                xu = x[b] ^ pltpu.roll(sc[b], n_ax - dd, axis=axis)
                xv = x[b] ^ pltpu.roll(xu, dd, axis=axis)
                nxt.append(jnp.where(is_u, xu, xv))
            x = nxt
        else:
            xv = [x[b] ^ pltpu.roll(x[b], dd, axis=axis) for b in range(P)]
            full = [jnp.where(is_u, x[b], xv[b]) for b in range(P)]
            sc = _scale(plan.tl, plan.dl, masks, full)
            x = [jnp.where(is_u, x[b] ^ pltpu.roll(sc[b], n_ax - dd, axis=axis),
                           xv[b]) for b in range(P)]
    for b in range(P):
        o_ref[b] = x[b]


def _pair_kernel(plan: _Plan, st: _Stage, x_ref, tw_ref, o_ref):
    """One butterfly stage with the u/v halves delivered as separate
    sub-blocks of a (P, 1, 2, S, LANE) tile — used for distances too large
    to pair inside a local tile. The whole scale network stays in VMEM."""
    P = 1 << plan.dl
    masks = _masks_from_packed(plan.tl, tw_ref[0, 0], ())
    u = [x_ref[b, 0, 0] for b in range(P)]
    v = [x_ref[b, 0, 1] for b in range(P)]
    if not plan.inverse:
        sc = _scale(plan.tl, plan.dl, masks, v)
        u = [u[b] ^ sc[b] for b in range(P)]
        v = [v[b] ^ u[b] for b in range(P)]
    else:
        v = [v[b] ^ u[b] for b in range(P)]
        sc = _scale(plan.tl, plan.dl, masks, v)
        u = [u[b] ^ sc[b] for b in range(P)]
    for b in range(P):
        o_ref[b, 0, 0] = u[b]
        o_ref[b, 0, 1] = v[b]


def _pallas_pair(plan: _Plan, st: _Stage, planes, tw, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 1 << plan.dl
    W = plan.n_words
    dw = st.d_elems >> 5
    dwrows = dw // LANE
    nb = W // (2 * dw)
    # Mosaic requires the sublane block dim be a multiple of 8 or the full
    # dimension; dwrows is a power of two, so snap s_h to one of those.
    s_h = max(1, min(_TILE_BYTES // (P * 2 * LANE * 4), dwrows))
    s_h = 1 << (s_h.bit_length() - 1)
    if s_h < 8 and s_h != dwrows:
        s_h = min(8, dwrows)
    x5 = planes.reshape(P, nb, 2, dwrows, LANE)
    t4 = tw.reshape(nb, 2, dwrows, LANE)
    xspec = pl.BlockSpec((P, 1, 2, s_h, LANE), lambda j, t: (0, j, 0, t, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, s_h, LANE), lambda j, t: (j, 0, t, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, plan, st),
        out_shape=jax.ShapeDtypeStruct(x5.shape, jnp.uint32),
        grid=(nb, dwrows // s_h),
        in_specs=[xspec, tspec],
        out_specs=xspec,
        interpret=interpret,
    )(x5, t4)
    return out.reshape(P, W)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def _pallas_local(plan: _Plan, stage_slice: tuple, planes, tw, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 1 << plan.dl
    S = len(stage_slice)
    rows = plan.n_words // LANE
    p3 = planes.reshape(P, rows, LANE)
    t3 = tw.reshape(S, rows, LANE)
    xspec = pl.BlockSpec((P, plan.sub, LANE), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((S, plan.sub, LANE), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_local_kernel, plan, stage_slice),
        out_shape=jax.ShapeDtypeStruct(p3.shape, jnp.uint32),
        grid=(rows // plan.sub,),
        in_specs=[xspec, tspec],
        out_specs=xspec,
        interpret=interpret,
    )(p3, t3)
    return out.reshape(P, plan.n_words)


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------

def _run_planes(plan: _Plan, planes, tw_all, use_pallas: bool,
                interpret: bool):
    """Stage loop on planes (traced body; called under _planes_jit /
    _packed_jit so the whole transform is ONE dispatch + ONE compile)."""
    n_stages = len(plan.stages)
    n_local = plan.n_local if use_pallas else 0

    def cross(si, planes):
        st = plan.stages[si]
        if use_pallas and (st.d_elems >> 5) % LANE == 0:
            return _pallas_pair(plan, st, planes, tw_all[si], interpret)
        return _stage_xla(plan, st, planes, tw_all[si])

    if plan.inverse:
        if n_local:
            planes = _pallas_local(plan, plan.stages[:n_local], planes,
                                   tw_all[:n_local], interpret)
        for si in range(n_local, n_stages):
            planes = cross(si, planes)
    else:
        for si in range(0, n_stages - n_local):
            planes = cross(si, planes)
        if n_local:
            planes = _pallas_local(plan, plan.stages[n_stages - n_local:],
                                   planes, tw_all[n_stages - n_local:],
                                   interpret)
    return planes


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _planes_jit(plan, planes, tw_all, use_pallas, interpret):
    return _run_planes(plan, planes, tw_all, use_pallas, interpret)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _packed_jit(plan, data, tw_all, use_pallas, interpret):
    if use_pallas and not interpret:
        from ..fields import bitslice_pallas as bsp
        to_bs, from_bs = bsp.to_bitsliced, bsp.from_bitsliced
    else:
        to_bs, from_bs = bitslice.to_bitsliced, bitslice.from_bitsliced
    planes = to_bs(plan.dl, data)
    planes = _run_planes(plan, planes, tw_all, use_pallas, interpret)
    return from_bs(plan.dl, planes)


_DEV_TW_CACHE: dict = {}


def _dev_tw(plan: _Plan, tw_np):
    """Per-plan device twiddle stack. H2D of the ~n_stages*W/8 bytes per call
    costs more than the transform itself over the axon tunnel; the cache is
    keyed by plan identity (plans are interned in _PLAN_CACHE). Only used
    outside traces — inside a trace the array must be (re-)captured."""
    import jax.core as jc

    hit = _DEV_TW_CACHE.get(id(plan))
    if hit is not None:
        return hit
    arr = jnp.asarray(tw_np)
    if not isinstance(arr, jc.Tracer):
        _DEV_TW_CACHE[id(plan)] = arr
    return arr


def transform_planes(domain: NTTDomain, planes, data_level: int, shape: tuple,
                     coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0,
                     inverse: bool = False, use_pallas: bool = True,
                     interpret: bool = False):
    """Run the transform on bitsliced planes [2^data_level, n/32]."""
    plan, tw_np = _make_plan(domain, data_level, shape, coset, coset_bits,
                             skip_rounds, inverse)
    return _planes_jit(plan, planes, _dev_tw(plan, tw_np), use_pallas,
                       interpret)


def transform(domain: NTTDomain, data, data_level: int, shape: tuple,
              coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0,
              inverse: bool = False, use_pallas: bool = True,
              interpret: bool = False):
    """Packed-layout entry: bitslice, transform, unslice — one fused jit."""
    plan, tw_np = _make_plan(domain, data_level, shape, coset, coset_bits,
                             skip_rounds, inverse)
    return _packed_jit(plan, data, _dev_tw(plan, tw_np), use_pallas, interpret)


def wants_dispatch(domain_level: int, data_level: int, data) -> bool:
    """True when the bitsliced path should replace the packed stage loop:
    single-device TPU, big 1-D batch, B32-or-smaller twiddles."""
    if tower.NO_PALLAS:
        return False
    if domain_level > 5 or data_level < 5 or data_level < domain_level:
        return False
    if jax.default_backend() not in ("tpu", "axon") or jax.device_count() != 1:
        return False
    want_nd = 2 if tower.has_limb_dim(data_level) else 1
    if getattr(data, "ndim", None) != want_nd:
        return False
    n = data.shape[0]
    return n >= (1 << 15) and (n & (n - 1)) == 0
