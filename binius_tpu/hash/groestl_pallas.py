"""Fused-VMEM Pallas Grøstl-256 for Merkle commits.

The XLA bitsliced kernels (`groestl_bitslice.py`) bind on HBM traffic: the
~600-op round network materializes intermediates between fusions, measuring
~425 MB/s leaf hashing on v5e. This module runs the whole permutation
network inside one Pallas kernel so every gate works on VMEM-resident
(8, 8*Wt) tiles — the same lever that took the B128 multiply from 250 to
380 Melem/s (`fields/bitslice_pallas.py`). Reference counterpart:
`crates/hash/src/groestl/arch/groestl_multi_avx2.rs` (N-way SIMD digests).

Layout per bit-plane value: ``(8 sublanes = state row r, 8*Wt lanes)`` with
lane index ``c*Wt + w`` (state column c SLOW, ``w`` indexes uint32 words of
32 instances — same instance packing as `groestl_bitslice`). This makes:

* SubBytes — elementwise across the 8 bit values (`_sbox_planes` reused
  verbatim inside the kernel);
* ShiftBytes — row-dependent column rotation = ONE tile-aligned lane roll
  per (ref, shift): with c slow, the in-group read (c+s)%8 and its
  wrap-around coincide modulo the lane axis, so ``roll(x, lw - s*Wt)`` is
  exact with no mask (Wt a multiple of the 128-lane tile keeps every roll
  tile-aligned — the c-fast variant measured only 1.2x the XLA path because
  of 224 misaligned masked rolls per round);
* MixBytes — a full-sublane roll per circulant offset (8 rows exactly);
* AddRoundConstant — iota-derived masks, no tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .groestl import MIX, ROUNDS, SHIFTS_P, SHIFTS_Q
from .groestl_bitslice import _sbox_planes, _tower_ctx

try:  # pragma: no cover - platform probe
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)
LANE_TILE = 128  # lanes per (8, 128) uint32 Mosaic tile


def _iotas(lw: int, xp=jnp):
    """(column index c = lane // (lw//8), row index) iota grids."""
    wt = lw // 8
    if xp is np:
        c = (np.arange(lw, dtype=np.uint32)[None, :] // np.uint32(wt)
             ) * np.ones((8, 1), dtype=np.uint32)
        r = np.arange(8, dtype=np.uint32)[:, None] * np.ones(
            (1, lw), dtype=np.uint32)
        return c, r
    c = jax.lax.broadcasted_iota(U32, (8, lw), 1) // U32(wt)
    r = jax.lax.broadcasted_iota(U32, (8, lw), 0)
    return c, r


def _roll_lanes(x, k: int, xp=jnp):
    lw = x.shape[1]
    k %= lw
    if k == 0:
        return x
    if xp is np:
        return np.roll(x, k, axis=1)
    if pltpu is not None:
        try:
            return pltpu.roll(x, k, axis=1)
        except Exception:  # interpret mode on CPU backends
            pass
    return jnp.roll(x, k, axis=1)


def _roll_rows(x, k: int, xp=jnp):
    k %= 8
    if k == 0:
        return x
    if xp is np:
        return np.roll(x, k, axis=0)
    if pltpu is not None:
        try:
            return pltpu.roll(x, k, axis=0)
        except Exception:
            pass
    return jnp.roll(x, k, axis=0)


def _add_const(bits, rnd: int, is_q: bool, lw: int, xp=jnp):
    """AddRoundConstant: P xors (c<<4)^rnd into row 0; Q xors 0xFF into every
    byte and additionally (c<<4)^rnd into row 7 (`groestl.py:_round_*_const`)."""
    c_iota, r_iota = _iotas(lw, xp)
    u = np.uint32 if xp is np else U32
    r0 = 7 if is_q else 0
    out = list(bits)
    if is_q:
        out = [b ^ u(FULL) for b in out]
    row_mask = (r_iota == r0)
    for b in range(8):
        if b < 4:
            if (rnd >> b) & 1 == 0:
                continue
            e = xp.full((8, lw), FULL, dtype=u)
        else:
            e = (((c_iota >> u(b - 4)) & u(1)) * u(FULL))
            if (rnd >> b) & 1:
                e = e ^ u(FULL)
        out[b] = out[b] ^ xp.where(row_mask, e, u(0))
    return out


def _shift_bytes(bits, is_q: bool, lw: int, xp=jnp):
    """Row r rotates left by shifts[r] along the column axis:
    out[r, c*wt+w] = in[r, ((c+s_r)%8)*wt + w] = roll(in, lw - s_r*wt)[r]
    (the mod-8 column wrap coincides with the mod-lw lane wrap)."""
    shifts = SHIFTS_Q if is_q else SHIFTS_P
    wt = lw // 8
    _, r_iota = _iotas(lw, xp)
    out_bits = []
    for x in bits:
        out = x
        for r, s in enumerate(shifts):
            if s == 0:
                continue
            val = _roll_lanes(x, lw - s * wt, xp)  # reads in[l + s*wt]
            out = xp.where(r_iota == r, val, out)
        out_bits.append(out)
    return out_bits


def _xtime(bits):
    """GF(2^8)/0x11B doubling across the bit values."""
    b = bits
    return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7],
            b[3] ^ b[7], b[4], b[5], b[6]]


def _mix_bytes(bits, xp=jnp):
    """out[r] = sum_off MIX[off] * in[(r+off) % 8] (circulant, row rolls)."""
    a1 = bits
    a2 = _xtime(a1)
    a4 = _xtime(a2)
    tbl = {1: a1, 2: a2, 3: [a2[i] ^ a1[i] for i in range(8)], 4: a4,
           5: [a4[i] ^ a1[i] for i in range(8)],
           7: [a4[i] ^ a2[i] ^ a1[i] for i in range(8)]}
    acc = None
    for off in range(8):
        t = tbl[MIX[off]]
        term = [_roll_rows(t[i], 8 - off, xp) for i in range(8)]
        acc = term if acc is None else [acc[i] ^ term[i] for i in range(8)]
    return acc


def _permute(bits, is_q: bool, lw: int, ctx, xp=jnp):
    for rnd in range(ROUNDS):
        bits = _add_const(bits, rnd, is_q, lw, xp)
        bits = _sbox_planes(bits, xp, ctx)
        bits = _shift_bytes(bits, is_q, lw, xp)
        bits = _mix_bytes(bits, xp)
    return bits


def _iv_bits(lw: int, xp=jnp):
    """Grøstl-256 IV: all-zero state except bit 0 at (row 6, col 7)."""
    c_iota, r_iota = _iotas(lw, xp)
    u = np.uint32 if xp is np else U32
    h0 = xp.where((r_iota == 6) & (c_iota == 7), u(FULL), u(0))
    zero = xp.zeros((8, lw), dtype=u)
    return [h0] + [zero] * 7


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _leaf_kernel(n_blocks: int, lw: int, ctx, m_ref, o_ref):
    """Full Grøstl-256: IV, n_blocks compressions, output transform.

    m_ref rows: bit-major [8 bits][n_blocks][8 state rows]; o_ref rows:
    [8 bits][8 state rows] of trunc input state P(h)^h (column slicing
    happens outside)."""
    h = _iv_bits(lw)

    def body(k, h):
        m = [m_ref[pl.dslice(b * n_blocks * 8 + k * 8, 8), :]
             for b in range(8)]
        hp = _permute([h[b] ^ m[b] for b in range(8)], False, lw, ctx)
        qq = _permute(m, True, lw, ctx)
        return tuple(hp[b] ^ qq[b] ^ h[b] for b in range(8))

    h = list(jax.lax.fori_loop(0, n_blocks, body, tuple(h)))
    x = _permute(h, False, lw, ctx)
    for b in range(8):
        o_ref[b * 8:(b + 1) * 8, :] = x[b] ^ h[b]


def _pairs_kernel(lw: int, ctx, m_ref, o_ref):
    """2-to-1 PseudoCompression: trunc_256(P(a||b) ^ (a||b))."""
    m = [m_ref[b * 8:(b + 1) * 8, :] for b in range(8)]
    x = _permute(m, False, lw, ctx)
    for b in range(8):
        o_ref[b * 8:(b + 1) * 8, :] = x[b] ^ m[b]


# ---------------------------------------------------------------------------
# Host-callable wrappers (XLA layout prep outside the kernel)
# ---------------------------------------------------------------------------

def _lane_tile(W: int, n_blocks: int = 1) -> int:
    """Lanes-per-grid-cell (in W words), sized to keep refs in VMEM."""
    wt = LANE_TILE
    while wt > 16 and (wt * 8 * 8 * n_blocks * 8 * 4) > (4 << 20):
        wt //= 2
    return min(wt, max(16, W))


def _interleave_rows(x5, wt: int, xp=jnp):
    """[8 bits, nb, 8 c, 8 r, W] block planes -> ((8*nb*8, Wp*8), Wp) kernel
    rows [b][k][r] with lane index wb*(8*wt) + c*wt + win (c slow per
    wt-block, so in-kernel column rolls are wt-aligned)."""
    nb, W = x5.shape[1], x5.shape[-1]
    pad = (-W) % wt
    if pad:
        x5 = xp.pad(x5, ((0, 0),) * 4 + ((0, pad),))
    Wp = W + pad
    x = x5.reshape(8, nb, 8, 8, Wp // wt, wt)      # [b, k, c, r, wb, win]
    x = xp.transpose(x, (0, 1, 3, 4, 2, 5))        # [b, k, r, wb, c, win]
    if xp is np:
        x = np.ascontiguousarray(x)
    return x.reshape(8 * nb * 8, Wp * 8), Wp


def _deinterleave_state(o, wt: int, W: int, xp=jnp):
    """(64, Wp*8) kernel output -> [8 bits, 8 r, 8 c, W] state planes."""
    Wp = o.shape[1] // 8
    x = o.reshape(8, 8, Wp // wt, 8, wt)           # [b, r, wb, c, win]
    x = xp.transpose(x, (0, 1, 3, 2, 4))           # [b, r, c, wb, win]
    if xp is np:
        x = np.ascontiguousarray(x)
    return x.reshape(8, 8, 8, Wp)[:, :, :, :W]


def _leaf_call_impl(msg5, n_blocks: int, interpret: bool):
    W = msg5.shape[-1]
    wt = _lane_tile(W, n_blocks)
    m_rows, Wp = _interleave_rows(msg5, wt)
    lw = wt * 8
    out = pl.pallas_call(
        functools.partial(_leaf_kernel, n_blocks, lw, _tower_ctx()),
        grid=(Wp // wt,),
        in_specs=[pl.BlockSpec((8 * n_blocks * 8, lw), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, lw), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((64, Wp * 8), jnp.uint32),
        interpret=interpret,
    )(m_rows)
    return _deinterleave_state(out, wt, W)


def _pairs_call_impl(planes5, interpret: bool):
    W = planes5.shape[-1]
    wt = _lane_tile(W)
    m_rows, Wp = _interleave_rows(planes5, wt)
    lw = wt * 8
    out = pl.pallas_call(
        functools.partial(_pairs_kernel, lw, _tower_ctx()),
        grid=(Wp // wt,),
        in_specs=[pl.BlockSpec((64, lw), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, lw), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((64, Wp * 8), jnp.uint32),
        interpret=interpret,
    )(m_rows)
    return _deinterleave_state(out, wt, W)


def _digest_from_state(x):
    """[8, 8, 8, W] final state -> (N, 8) uint32 digests (cols 4..7)."""
    from .groestl_bitslice import byteplanes_to_words, state_to_blockplanes
    return byteplanes_to_words(state_to_blockplanes(x[:, :, 4:]))


def wants_dispatch(n_leaves: int) -> bool:
    import os
    if os.environ.get("BINIUS_NO_PALLAS", "0") in ("1",):
        return False
    return (jax.default_backend() in ("tpu", "axon") and n_leaves >= (32 * 16)
            and n_leaves % 32 == 0)


def _leaf_msg5(cw_u32, log_coset: int, blob_len: int):
    """(N_elems, limbs) codeword -> padded message block planes
    [8, nb, 8 c, 8 r, W]."""
    from .groestl import groestl256_pad
    from .groestl_bitslice import _pad_planes_np, words_to_byteplanes
    n = cw_u32.shape[0] >> log_coset
    w = cw_u32.reshape(n, blob_len // 4)
    planes = words_to_byteplanes(w)  # [8, blob_len, W]
    W = planes.shape[-1]
    pad = jnp.broadcast_to(jnp.asarray(_pad_planes_np(blob_len)),
                           (8, len(groestl256_pad(blob_len)) , W))
    msg = jnp.concatenate([planes, pad], axis=1)
    n_blocks = msg.shape[1] // 64
    # per-block byte p = c*8 + r
    return msg.reshape(8, n_blocks, 8, 8, W), n_blocks


@functools.partial(jax.jit, static_argnums=(1, 2))
def _leaf_hash_jit(cw_u32, log_coset: int, blob_len: int):
    """End-to-end jit: byteplane prep + pallas network + digest packing in
    ONE dispatch. The un-jitted wrapper ran the layout glue as ~10 eager ops
    per call — ~100 ms of relay latency per Merkle level over the axon
    tunnel, 20x the kernel time (round-4 commit_encode regression)."""
    msg5, n_blocks = _leaf_msg5(cw_u32, log_coset, blob_len)
    return _digest_from_state(_leaf_call_impl(msg5, n_blocks, False))


def leaf_hash_kernel(cw_u32, log_coset: int, blob_len: int, interpret=False):
    """Drop-in for `groestl_bitslice.leaf_hash_kernel` through the fused
    Pallas network: (N_elems, limbs) uint32 -> (n_leaves, 8) digests."""
    if interpret:
        # interpret mode runs EAGERLY — wrapping the interpret graph in jit
        # hands XLA:CPU a ~10k-op module that takes >90 min to compile
        msg5, n_blocks = _leaf_msg5(cw_u32, log_coset, blob_len)
        return _digest_from_state(_leaf_call_impl(msg5, n_blocks, True))
    return _leaf_hash_jit(cw_u32, log_coset, blob_len)


def _pairs_body(digests_u32, interpret: bool):
    from .groestl_bitslice import words_to_byteplanes
    n = digests_u32.shape[0] // 2
    w = digests_u32.reshape(n, 16)
    planes = words_to_byteplanes(w)  # [8, 64, W]
    planes5 = planes.reshape(8, 1, 8, 8, planes.shape[-1])
    return _digest_from_state(_pairs_call_impl(planes5, interpret))


_pairs_jit = jax.jit(functools.partial(_pairs_body, interpret=False))


def pairs_kernel(digests_u32, interpret=False):
    """Drop-in for `groestl_bitslice.pairs_kernel` (one Merkle level)."""
    if interpret:
        return _pairs_body(digests_u32, True)
    return _pairs_jit(digests_u32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def tree_levels(cw_u32, log_coset: int, blob_len: int, n_dev: int):
    """Whole device Merkle build in ONE dispatch: leaf digests plus `n_dev`
    2-to-1 reduction levels, returned leaf-up. The XLA module is only layout
    glue around the opaque pallas calls, so fusing the chain costs little
    compile time but removes a per-level relay round-trip (~10 ms each)."""
    msg5, n_blocks = _leaf_msg5(cw_u32, log_coset, blob_len)
    outs = [_digest_from_state(_leaf_call_impl(msg5, n_blocks, False))]
    for _ in range(n_dev):
        outs.append(_pairs_body(outs[-1], False))
    return tuple(outs)


# ---------------------------------------------------------------------------
# Pure-numpy mirror of the kernel dataflow (the CPU test oracle: executes the
# identical network and layout code with xp=np; only pltpu.roll and the
# pallas plumbing are TPU-specific, and those are equivalence-checked on chip
# by scripts/verify_groestl_pallas_tpu.py)
# ---------------------------------------------------------------------------

def _run_np(m_rows, n_blocks: int, lw: int, pairs: bool):
    ctx = _tower_ctx()
    if pairs:
        m = [m_rows[b * 8:(b + 1) * 8, :] for b in range(8)]
        x = _permute(m, False, lw, ctx, np)
        return np.stack([x[b] ^ m[b] for b in range(8)])
    h = _iv_bits(lw, np)
    for k in range(n_blocks):
        m = [m_rows[b * n_blocks * 8 + k * 8:
                    b * n_blocks * 8 + k * 8 + 8, :] for b in range(8)]
        hp = _permute([h[b] ^ m[b] for b in range(8)], False, lw, ctx, np)
        qq = _permute(m, True, lw, ctx, np)
        h = [hp[b] ^ qq[b] ^ h[b] for b in range(8)]
    x = _permute(h, False, lw, ctx, np)
    return np.stack([x[b] ^ h[b] for b in range(8)])


def leaf_hash_np(cw_np: np.ndarray, log_coset: int, blob_len: int) -> np.ndarray:
    msg5, n_blocks = _leaf_msg5(jnp.asarray(cw_np), log_coset, blob_len)
    msg5 = np.asarray(jax.device_get(msg5))
    W = msg5.shape[-1]
    wt = _lane_tile(W, n_blocks)
    m_rows, Wp = _interleave_rows(msg5, wt, np)
    out = _run_np(m_rows, n_blocks, Wp * 8, False)
    st = _deinterleave_state(out.reshape(64, Wp * 8), wt, W, np)
    return np.asarray(jax.device_get(_digest_from_state(jnp.asarray(st))))


def pairs_np(digests_np: np.ndarray) -> np.ndarray:
    from .groestl_bitslice import words_to_byteplanes
    n = digests_np.shape[0] // 2
    w = digests_np.reshape(n, 16)
    planes = np.asarray(jax.device_get(words_to_byteplanes(jnp.asarray(w))))
    W = planes.shape[-1]
    planes5 = planes.reshape(8, 1, 8, 8, W)
    wt = _lane_tile(W)
    m_rows, Wp = _interleave_rows(planes5, wt, np)
    out = _run_np(m_rows, 1, Wp * 8, True)
    st = _deinterleave_state(out.reshape(64, Wp * 8), wt, W, np)
    return np.asarray(jax.device_get(_digest_from_state(jnp.asarray(st))))
