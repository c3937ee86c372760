"""Bitsliced Grøstl-256: gather-free device hashing for Merkle commits.

The reference parallelizes Grøstl with GFNI/AVX2 N-way SIMD
(`crates/hash/src/groestl/arch/groestl_multi_avx2.rs`). The TPU-native analog
stores bit ``b`` of byte position ``pos`` for 32 hash instances in one
``uint32`` word, so every gate processes 32 instances per lane-op — the same
layout as :mod:`binius_tpu.fields.bitslice`. The payoff on this target:
**zero gathers**. The table-based jnp path (`hash/groestl.py` ``_permute``
with ``xp.take``) compiles pathologically on the remote TPU compile service
(156 MB executable, ~38 min); here SubBytes is a boolean circuit, so the whole
permutation is elementwise XOR/AND ops XLA fuses without blowing up.

The AES S-box circuit is *derived*, not transcribed: GF(2^8) is decomposed as
GF(((2^2)^2)^2) (the classic Satoh/Canright tower), the basis isomorphism is
found by brute-force search over the 256 field elements at import time, and
inversion uses the norm/conjugate formula at each tower level — ~40 ANDs and
~140 XORs per S-box, amortized over 32 instances per word. Every derived
constant is asserted against `hash/groestl.py`'s from-first-principles tables.

Layout: a permutation state is ``[8 bits, 8 rows, 8 cols, W]`` uint32 where
``W = n_instances / 32``; byte ``state[r, c]`` of instance ``32*w + k`` has
bit ``b`` stored in bit ``k`` of ``planes[b, r, c, w]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bitslice import _transpose32
from ..fields.scalar import invert_matrix
from .groestl import (IV_256, MIX, ROUNDS, SHIFTS_P, SHIFTS_Q, _consts,
                      _gf_mul, aes_sbox, groestl256_pad)

U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Tower decomposition of GF(2^8)/0x11B, derived numerically.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tower_ctx():
    """Derive the GF(((2^2)^2)^2) tower basis inside GF(2^8)/0x11B.

    Returns (Tinv, Bout, nu_mat):
      * ``Tinv``: 8x8 F2 matrix (rows=out bit, cols=in bit) mapping standard
        polynomial-basis byte bits to tower coordinates ``t0..t7`` where the
        element is ``hi*W + lo`` (hi = bits 7..4 as GF(16), lo = bits 3..0),
        GF(16) elements are ``h2*Y + l2`` (GF(4) pairs), GF(4) = ``b1*u + b0``.
      * ``Bout``: 8x8 F2 matrix mapping tower coords of the field inverse to
        the S-box output bits (affine matrix folded in; the 0x63 constant is
        applied separately as plane NOTs).
      * ``nu_mat``: 4x4 F2 matrix for multiplication by ``nu = W^2 + W`` in
        GF(16) tower coordinates.
    """
    mul = _gf_mul
    # GF(4): u^2 + u + 1 = 0
    u = next(x for x in range(2, 256) if mul(x, x) ^ x ^ 1 == 0)
    gf4 = (0, 1, u, u ^ 1)
    # GF(16) = GF(4)[Y]/(Y^2 + Y + u)
    Y = next(x for x in range(256)
             if (mul(x, x) ^ x) == u and x not in gf4)
    b16 = (1, u, Y, mul(u, Y))  # GF(16) basis over F2 (coords l0,l1,h0,h1)
    gf16 = set()
    for m in range(16):
        v = 0
        for i in range(4):
            if (m >> i) & 1:
                v ^= b16[i]
        gf16.add(v)
    # GF(256) = GF(16)[W]/(W^2 + W + nu)
    W = next(x for x in range(256)
             if (mul(x, x) ^ x) in gf16 and x not in gf16 and (mul(x, x) ^ x) != 0)
    nu = mul(W, W) ^ W
    basis8 = tuple(b16) + tuple(mul(b, W) for b in b16)

    # T: tower coords -> standard byte (columns = basis elements as bitmasks)
    T_cols = list(basis8)
    Tinv_cols = invert_matrix(T_cols, 8)  # standard byte -> tower coords

    # AES affine: out_i = x_i ^ x_{i+4} ^ x_{i+5} ^ x_{i+6} ^ x_{i+7} (+0x63)
    A_cols = []
    for j in range(8):  # column j: image of unit bit j
        v = 0
        for i in range(8):
            if j in (i, (i + 4) % 8, (i + 5) % 8, (i + 6) % 8, (i + 7) % 8):
                v |= 1 << i
        A_cols.append(v)
    # Bout = A * T: tower coords of inverse -> standard -> affine (sans const)
    Bout_cols = []
    for c in T_cols:
        v = 0
        for i in range(8):
            if (c >> i) & 1:
                v ^= A_cols[i]
        Bout_cols.append(v)

    def tower4(x: int) -> int:
        """GF(16) element -> 4 tower coords (via Tinv; upper 4 must be 0)."""
        t = 0
        for i in range(8):
            bit = bin(Tinv_cols_row(i) & x).count("1") & 1
            t |= bit << i
        assert t < 16, (x, t)
        return t

    def Tinv_cols_row(i: int) -> int:
        # row i of Tinv as an input-bit mask
        r = 0
        for j in range(8):
            if (Tinv_cols[j] >> i) & 1:
                r |= 1 << j
        return r

    # nu_mat: 4x4, column j = tower4(nu * b16[j])
    nu_mat = [tower4(mul(nu, b16[j])) for j in range(4)]

    def to_np(cols, n):
        m = np.zeros((n, n), dtype=np.uint8)
        for j, c in enumerate(cols):
            for i in range(n):
                m[i, j] = (c >> i) & 1
        return m

    Tinv = to_np(Tinv_cols, 8)
    Bout = to_np(Bout_cols, 8)
    NuM = to_np(nu_mat, 4)

    # Self-check the whole S-box circuit on all 256 inputs (numpy planes,
    # 256 instances = 8 words).
    sb = aes_sbox()
    xs = np.arange(256, dtype=np.uint8)
    bits_in = _bytes_to_bitplanes_np(xs)
    bits_out = _sbox_planes([b for b in bits_in], np, (Tinv, Bout, NuM))
    got = _bitplanes_to_bytes_np(np.stack(bits_out))
    assert np.array_equal(got, sb[xs]), "derived S-box circuit mismatch"
    return Tinv, Bout, NuM


def _bytes_to_bitplanes_np(xs: np.ndarray) -> np.ndarray:
    """(N,) uint8 -> [8, N/32] uint32 planes (host helper for self-checks)."""
    n = xs.shape[0]
    planes = np.zeros((8, n // 32), dtype=np.uint32)
    for b in range(8):
        bits = (xs >> b) & 1
        planes[b] = np.packbits(
            bits.reshape(-1, 32)[:, ::-1], axis=1, bitorder="big"
        ).view(">u4").astype(np.uint32).reshape(-1)
    return planes


def _bitplanes_to_bytes_np(planes: np.ndarray) -> np.ndarray:
    n = planes.shape[1] * 32
    out = np.zeros(n, dtype=np.uint8)
    for b in range(8):
        w = planes[b].astype(">u4").view(np.uint8).reshape(-1, 4)
        bits = np.unpackbits(w, axis=1, bitorder="big")[:, ::-1].reshape(-1)
        out |= (bits << b).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# The S-box circuit on bit planes (xp-generic; planes are arrays of any shape).
# ---------------------------------------------------------------------------

def _apply_mat(mat: np.ndarray, bits: list, xp) -> list:
    out = []
    for i in range(mat.shape[0]):
        acc = None
        for j in range(mat.shape[1]):
            if mat[i, j]:
                acc = bits[j] if acc is None else acc ^ bits[j]
        if acc is None:
            acc = xp.zeros_like(bits[0])
        out.append(acc)
    return out


def _mul4(a, b):
    """GF(4) multiply on (b0, b1) plane pairs: 3 AND + 4 XOR."""
    a0, a1 = a
    b0, b1 = b
    p = a0 & b0
    q = a1 & b1
    t = (a0 ^ a1) & (b0 ^ b1)
    return (p ^ q, t ^ p)


def _sq4(a):
    a0, a1 = a
    return (a0 ^ a1, a1)


def _mulz4(a):
    """Multiply by u (the GF(4) generator): (b0,b1) -> (b1, b0^b1)."""
    a0, a1 = a
    return (a1, a0 ^ a1)


def _mul16(a, b):
    """GF(16) multiply on 4-bit tower coords (lists [l0,l1,h0,h1])."""
    al, ah = (a[0], a[1]), (a[2], a[3])
    bl, bh = (b[0], b[1]), (b[2], b[3])
    p1 = _mul4(ah, bh)
    p2 = _mul4(al, bl)
    p3 = _mul4((al[0] ^ ah[0], al[1] ^ ah[1]), (bl[0] ^ bh[0], bl[1] ^ bh[1]))
    hi = (p3[0] ^ p2[0], p3[1] ^ p2[1])
    zp1 = _mulz4(p1)
    lo = (p2[0] ^ zp1[0], p2[1] ^ zp1[1])
    return [lo[0], lo[1], hi[0], hi[1]]


def _sq16(a):
    al, ah = (a[0], a[1]), (a[2], a[3])
    sl, sh = _sq4(al), _sq4(ah)
    zh = _mulz4(sh)
    return [sl[0] ^ zh[0], sl[1] ^ zh[1], sh[0], sh[1]]


def _inv16(a):
    """GF(16) inverse: norm over GF(4) (whose inverse is squaring)."""
    al, ah = (a[0], a[1]), (a[2], a[3])
    n = _mul4(ah, al)
    s_ah = _mulz4(_sq4(ah))
    s_al = _sq4(al)
    norm = (n[0] ^ s_ah[0] ^ s_al[0], n[1] ^ s_ah[1] ^ s_al[1])
    d = _sq4(norm)  # x^-1 = x^2 in GF(4)
    hi = _mul4(ah, d)
    lo = _mul4((ah[0] ^ al[0], ah[1] ^ al[1]), d)
    return [lo[0], lo[1], hi[0], hi[1]]


def _sbox_planes(bits: list, xp, ctx=None) -> list:
    """AES S-box as a boolean circuit on 8 bit planes."""
    Tinv, Bout, NuM = ctx if ctx is not None else _tower_ctx()
    t = _apply_mat(Tinv, bits, xp)
    lo, hi = t[0:4], t[4:8]
    # GF(256) inverse: d = (hi^2*nu + hi*lo + lo^2)^-1; (hi*d)*W + (hi+lo)*d
    hl = _mul16(hi, lo)
    nh = _apply_mat(NuM, _sq16(hi), xp)
    sl = _sq16(lo)
    norm = [hl[i] ^ nh[i] ^ sl[i] for i in range(4)]
    d = _inv16(norm)
    out_hi = _mul16(hi, d)
    out_lo = _mul16([hi[i] ^ lo[i] for i in range(4)], d)
    inv_bits = out_lo + out_hi
    out = _apply_mat(Bout, inv_bits, xp)
    # XOR the affine constant 0x63 (bits 0, 1, 5, 6)
    full = np.uint32(0xFFFFFFFF)
    for i in (0, 1, 5, 6):
        out[i] = out[i] ^ full
    return out


# ---------------------------------------------------------------------------
# The permutation on [8, 8, 8, W] states.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _const_masks() -> tuple[np.ndarray, np.ndarray]:
    """AddRoundConstant as plane masks: [ROUNDS, 8 bits, 8, 8, 1] uint32."""
    pc, qc = _consts()

    def to_mask(cs):
        m = np.zeros((ROUNDS, 8, 8, 8, 1), dtype=np.uint32)
        for r in range(ROUNDS):
            for b in range(8):
                m[r, b] = (((cs[r] >> b) & 1).astype(np.uint32) * FULL)[..., None]
        return m

    return to_mask(pc), to_mask(qc)


def _xtime(st, xp):
    """GF(2^8)/0x11B doubling on the bit axis of [8, ...] states."""
    b = [st[i] for i in range(8)]
    return xp.stack([b[7], b[0] ^ b[7], b[1], b[2] ^ b[7],
                     b[3] ^ b[7], b[4], b[5], b[6]])


def permute_planes(st, is_q: bool, xp=jnp):
    """P or Q on a bitsliced state [8 bits, 8 rows, 8 cols, W]."""
    pm, qm = _const_masks()
    consts = qm if is_q else pm
    shifts = SHIFTS_Q if is_q else SHIFTS_P
    if xp is not np:
        consts = xp.asarray(consts)
    for r in range(ROUNDS):
        st = st ^ consts[r]
        bits = _sbox_planes([st[i] for i in range(8)], xp)
        st = xp.stack(bits)
        # ShiftBytes: row i rotates left by shifts[i] along the col axis
        st = xp.stack([xp.roll(st[:, i], -shifts[i], axis=-2)
                       for i in range(8)], axis=1)
        # MixBytes: out[i] = sum_off MIX[off] * in[(i+off) % 8]
        a1 = st
        a2 = _xtime(a1, xp)
        a4 = _xtime(a2, xp)
        tbl = {1: a1, 2: a2, 3: a2 ^ a1, 4: a4, 5: a4 ^ a1,
               7: a4 ^ a2 ^ a1}
        acc = None
        for off in range(8):
            term = xp.roll(tbl[MIX[off]], -off, axis=1)
            acc = term if acc is None else acc ^ term
        st = acc
    return st


def compress_planes(h, m, xp=jnp):
    """f(h, m) = P(h^m) ^ Q(m) ^ h on bitsliced states."""
    return permute_planes(h ^ m, False, xp) ^ permute_planes(m, True, xp) ^ h


# ---------------------------------------------------------------------------
# Layout transforms (device): uint32 words <-> bit-plane states.
# ---------------------------------------------------------------------------

def words_to_byteplanes(w):
    """[N, L32] uint32 (N instances, L32 words each) -> [8 bits, L32*4, W].

    Pure reshapes/transposes + the 32x32 bit transpose — no gathers. Byte
    position ``p`` of an instance is byte ``p % 4`` of word ``p // 4``
    (little-endian uint32)."""
    n, L32 = w.shape
    assert n % 32 == 0
    m = jnp.transpose(w.reshape(n // 32, 32, L32), (2, 1, 0))  # [L32, 32, W]
    t = _transpose32(m)  # [L32, 32 bitplanes, W]
    # bit index 8*byte + bit -> [L32, 4 bytes, 8 bits, W] -> [8, L32*4, W]
    t = t.reshape(L32, 4, 8, n // 32)
    return jnp.transpose(t, (2, 0, 1, 3)).reshape(8, L32 * 4, n // 32)


def byteplanes_to_words(p):
    """Inverse of :func:`words_to_byteplanes`: [8, n_bytes, W] -> [N, L32]."""
    _, n_bytes, W = p.shape
    L32 = n_bytes // 4
    t = jnp.transpose(p.reshape(8, L32, 4, W), (1, 2, 0, 3)).reshape(L32, 32, W)
    m = _transpose32(t)  # [L32, 32, W] word values
    return jnp.transpose(m, (2, 1, 0)).reshape(W * 32, L32)


def blockplanes_to_state(p):
    """[8 bits, 64, W] (byte order: col*8 + row) -> [8, 8 rows, 8 cols, W]."""
    b, _, W = p.shape
    return jnp.transpose(p.reshape(8, 8, 8, W), (0, 2, 1, 3))


def state_to_blockplanes(st):
    n_bytes = st.shape[1] * st.shape[2]
    return jnp.transpose(st, (0, 2, 1, 3)).reshape(8, n_bytes, st.shape[-1])


@functools.lru_cache(maxsize=None)
def _iv_state_np() -> np.ndarray:
    """IV as a [8, 8, 8, 1] plane mask (broadcast over W)."""
    st = np.zeros((8, 8, 8, 1), dtype=np.uint32)
    iv = IV_256.reshape(8, 8).T  # [row, col] (column-major fill)
    for b in range(8):
        st[b] = (((iv >> b) & 1).astype(np.uint32) * FULL)[..., None]
    return st


@functools.lru_cache(maxsize=None)
def _pad_planes_np(blob_len: int) -> np.ndarray:
    """Padding suffix as constant planes [8, pad_len, 1]."""
    pad = groestl256_pad(blob_len)
    m = np.zeros((8, len(pad), 1), dtype=np.uint32)
    for b in range(8):
        m[b, :, 0] = ((pad >> b) & 1).astype(np.uint32) * FULL
    return m


# ---------------------------------------------------------------------------
# Jitted entry points (the device Merkle kernels).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2))
def leaf_hash_kernel(cw_u32, log_coset: int, blob_len: int):
    """Grøstl-256 of each leaf of a committed codeword, bitsliced.

    cw_u32: (N_elems, limbs) uint32; leaves are 2^log_coset consecutive
    elements (blob_len bytes). Returns (n_leaves, 8) uint32 digests."""
    n = cw_u32.shape[0] >> log_coset
    L32 = blob_len // 4
    w = cw_u32.reshape(n, L32)
    planes = words_to_byteplanes(w)  # [8, blob_len, W]
    W = planes.shape[-1]
    pad = jnp.broadcast_to(jnp.asarray(_pad_planes_np(blob_len)),
                           (8, blob_len + len(groestl256_pad(blob_len))
                            - blob_len, W))
    msg = jnp.concatenate([planes, pad], axis=1)
    n_blocks = msg.shape[1] // 64
    h = jnp.broadcast_to(jnp.asarray(_iv_state_np()), (8, 8, 8, W))
    for i in range(n_blocks):
        m = blockplanes_to_state(msg[:, i * 64:(i + 1) * 64])
        h = compress_planes(h, m)
    # output transform: trunc_256(P(h) ^ h) = cols 4..7
    x = permute_planes(h, False) ^ h
    out = state_to_blockplanes(x[:, :, 4:])  # [8, 32 bytes, W]
    return byteplanes_to_words(out)  # (n, 8) uint32


@jax.jit
def pairs_kernel(digests_u32):
    """One Merkle level: (N, 8) uint32 digests -> (N/2, 8) uint32.

    2-to-1 compression = trunc_256(P(a||b) ^ (a||b)), bitsliced."""
    n = digests_u32.shape[0] // 2
    w = digests_u32.reshape(n, 16)
    planes = words_to_byteplanes(w)  # [8, 64, W]
    m = blockplanes_to_state(planes)
    x = permute_planes(m, False) ^ m
    out = state_to_blockplanes(x[:, :, 4:])
    return byteplanes_to_words(out)


def hash_leaves_device_bs(blobs: np.ndarray) -> np.ndarray:
    """Host-callable batched digest through the bitsliced kernel:
    (N, L) uint8 -> (N, 32) uint8. N must be a multiple of 32 and L % 4 == 0."""
    n, length = blobs.shape
    w = np.ascontiguousarray(blobs).view("<u4").reshape(n, length // 4)
    out = leaf_hash_kernel(jnp.asarray(w), 0, length)
    # device_get can hand back a transposed (F-order) view on TPU; the byte
    # view needs a contiguous last axis.
    return (np.ascontiguousarray(np.asarray(jax.device_get(out)).astype("<u4"))
            .view(np.uint8).reshape(n, 32))
