"""Grøstl-256 hash (standard, per the final Grøstl SHA-3 submission spec).

The reference uses Grøstl-256 as its transcript challenger and Merkle hash
(`crates/hash/src/groestl/`, tested there against the `groestl_crypto` crate).
This is a from-spec implementation:

  * 512-bit state as an 8x8 byte matrix filled column-wise,
  * 10 rounds of AddRoundConstant / SubBytes (AES S-box) / ShiftBytes /
    MixBytes (circulant matrix over GF(2^8)/0x11B),
  * compression f(h, m) = P(h^m) ^ Q(m) ^ h, output trunc_256(P(h) ^ h).

All functions are written against an array-module parameter `xp` so the same
code runs vectorized on host numpy (transcript) and as jnp on TPU (batched
Merkle leaf hashing, the analog of `Groestl256Parallel`).
"""

from __future__ import annotations

import functools

import numpy as np

ROUNDS = 10
ROWS = 8
COLS = 8  # 512-bit state

# P shifts row i left by i; Q shifts by the spec's sigma_Q.
SHIFTS_P = (0, 1, 2, 3, 4, 5, 6, 7)
SHIFTS_Q = (1, 3, 5, 7, 0, 2, 4, 6)

# MixBytes circulant: B[i][j] = MIX[(j - i) % 8]
MIX = (2, 2, 3, 4, 5, 3, 5, 7)


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply modulo the AES polynomial x^8+x^4+x^3+x+1 (0x11B)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


@functools.lru_cache(maxsize=None)
def aes_sbox() -> np.ndarray:
    """AES S-box generated from first principles (inverse + affine map)."""
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    table = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8)) ^ (0x63 >> i)) & 1
            s |= bit << i
        table[x] = s
    assert table[0] == 0x63 and table[1] == 0x7C and table[0x53] == 0xED
    return table


@functools.lru_cache(maxsize=None)
def gf_mul_table() -> np.ndarray:
    """mul_table[c][x] = c * x in GF(2^8)/0x11B for the MixBytes constants."""
    t = np.zeros((8, 256), dtype=np.uint8)
    for c in range(8):
        for x in range(256):
            t[c, x] = _gf_mul(c, x)
    return t


def bytes_to_state(data: np.ndarray) -> np.ndarray:
    """(..., 64) uint8 -> (..., 8, 8) state[row, col], filled column-wise."""
    return data.reshape(*data.shape[:-1], COLS, ROWS).swapaxes(-1, -2)


def state_to_bytes(state: np.ndarray) -> np.ndarray:
    return state.swapaxes(-1, -2).reshape(*state.shape[:-2], 64)


def _round_p_const(r: int) -> np.ndarray:
    c = np.zeros((ROWS, COLS), dtype=np.uint8)
    c[0, :] = (np.arange(COLS, dtype=np.uint8) << 4) ^ np.uint8(r)
    return c


def _round_q_const(r: int) -> np.ndarray:
    c = np.full((ROWS, COLS), 0xFF, dtype=np.uint8)
    c[ROWS - 1, :] ^= (np.arange(COLS, dtype=np.uint8) << 4) ^ np.uint8(r)
    return c


@functools.lru_cache(maxsize=None)
def _consts() -> tuple[np.ndarray, np.ndarray]:
    p = np.stack([_round_p_const(r) for r in range(ROUNDS)])
    q = np.stack([_round_q_const(r) for r in range(ROUNDS)])
    return p, q


def _permute(state, is_q: bool, xp=np):
    """Apply P or Q to (..., 8, 8) state using array module xp."""
    sbox = aes_sbox()
    mul = gf_mul_table()
    pc, qc = _consts()
    consts = qc if is_q else pc
    shifts = SHIFTS_Q if is_q else SHIFTS_P
    if xp is not np:
        sbox = xp.asarray(sbox)
        mul = xp.asarray(mul)
        consts = xp.asarray(consts)
    for r in range(ROUNDS):
        state = state ^ consts[r]
        state = xp.take(sbox, state.astype(xp.int32) if xp is not np else state, axis=0)
        # ShiftBytes: row i rotates left by shifts[i]
        rows = [xp.roll(state[..., i, :], -shifts[i], axis=-1) for i in range(ROWS)]
        state = xp.stack(rows, axis=-2)
        # MixBytes: out[i] = sum_j MIX[(j - i) % 8] * state[j]
        acc = None
        for i_off in range(ROWS):
            # contribution of state row j to out row i where (j - i) % 8 == i_off
            coeff = MIX[i_off]
            mrow = mul[coeff]
            mapped = xp.take(mrow, state.astype(xp.int32) if xp is not np else state, axis=0)
            # out[i] += mapped[(i + i_off) % 8]
            shifted = xp.roll(mapped, -i_off, axis=-2)
            acc = shifted if acc is None else acc ^ shifted
        state = acc
    return state


# ---------------------------------------------------------------------------
# Fast host path: T-table permutation on 8 column ints (64-bit each).
# The transcript challenger performs thousands of sequential single-block
# compressions; numpy per-op overhead dominated round-1 profiles (2.1M
# np.roll calls), so the single-state path runs on Python ints with combined
# SubBytes+MixBytes tables (the classic AES T-table trick; same output).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ttables() -> tuple:
    """T[j][x] = 64-bit int whose byte i is MIX[(j-i)%8] * sbox[x]."""
    sbox = aes_sbox()
    out = []
    for j in range(ROWS):
        row = []
        for x in range(256):
            s = int(sbox[x])
            v = 0
            for i in range(ROWS):
                v |= _gf_mul(MIX[(j - i) % 8], s) << (8 * i)
            row.append(v)
        out.append(tuple(row))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _col_consts() -> tuple:
    """(p_consts, q_consts): per round, per column, a 64-bit XOR mask
    (byte i of column c = const[i][c])."""
    pc, qc = _consts()
    def pack(cs):
        rounds = []
        for r in range(ROUNDS):
            rounds.append(tuple(
                int(sum(int(cs[r][i, c]) << (8 * i) for i in range(ROWS)))
                for c in range(COLS)))
        return tuple(rounds)
    return pack(pc), pack(qc)


def _permute_cols(cols: list[int], is_q: bool) -> list[int]:
    """P or Q on a state given as 8 column ints (byte i of col = row i)."""
    T = _ttables()
    p_consts, q_consts = _col_consts()
    consts = q_consts if is_q else p_consts
    shifts = SHIFTS_Q if is_q else SHIFTS_P
    for r in range(ROUNDS):
        rc = consts[r]
        cols = [c ^ rc[i] for i, c in enumerate(cols)]
        T0, T1, T2, T3, T4, T5, T6, T7 = T
        s0, s1, s2, s3, s4, s5, s6, s7 = shifts
        new = []
        for c in range(COLS):
            acc = (T0[(cols[(c + s0) % 8]) & 0xFF]
                   ^ T1[(cols[(c + s1) % 8] >> 8) & 0xFF]
                   ^ T2[(cols[(c + s2) % 8] >> 16) & 0xFF]
                   ^ T3[(cols[(c + s3) % 8] >> 24) & 0xFF]
                   ^ T4[(cols[(c + s4) % 8] >> 32) & 0xFF]
                   ^ T5[(cols[(c + s5) % 8] >> 40) & 0xFF]
                   ^ T6[(cols[(c + s6) % 8] >> 48) & 0xFF]
                   ^ T7[(cols[(c + s7) % 8] >> 56) & 0xFF])
            new.append(acc)
        cols = new
    return cols


def _bytes_to_cols(data) -> list[int]:
    """64 bytes (column-major fill) -> 8 column ints (byte i = row i)."""
    b = bytes(data)
    return [int.from_bytes(b[8 * c:8 * c + 8], "little") for c in range(COLS)]


def _cols_to_bytes(cols: list[int]) -> bytes:
    return b"".join(c.to_bytes(8, "little") for c in cols)


def _compress_cols(h: list[int], m: list[int]) -> list[int]:
    hp = _permute_cols([a ^ b for a, b in zip(h, m)], False)
    qm = _permute_cols(m, True)
    return [a ^ b ^ c for a, b, c in zip(hp, qm, h)]


def _output_transform_cols(h: list[int]) -> bytes:
    x = _permute_cols(h, False)
    return _cols_to_bytes([a ^ b for a, b in zip(x, h)])[32:]


def compress(h: np.ndarray, m: np.ndarray, xp=np) -> np.ndarray:
    """f(h, m) = P(h ^ m) ^ Q(m) ^ h on (..., 8, 8) states."""
    return _permute(h ^ m, False, xp) ^ _permute(m, True, xp) ^ h


def output_transform(h: np.ndarray, xp=np) -> np.ndarray:
    """Omega(h): trunc_256(P(h) ^ h) -> (..., 32) bytes."""
    x = _permute(h, False, xp) ^ h
    return state_to_bytes(x)[..., 32:]


IV_256 = np.zeros(64, dtype=np.uint8)
IV_256[62] = 0x01  # 512-bit big-endian encoding of 256


def groestl256_pad(n_bytes: int) -> np.ndarray:
    """Padding suffix for an n_bytes message: 0x80, zeros, 64-bit BE block count."""
    blocks = (n_bytes + 8) // 64 + 1
    pad_len = blocks * 64 - n_bytes
    pad = np.zeros(pad_len, dtype=np.uint8)
    pad[0] = 0x80
    pad[-8:] = np.frombuffer(np.uint64(blocks).byteswap().tobytes(), dtype=np.uint8)
    return pad


def groestl256(data: bytes) -> bytes:
    """One-shot Grøstl-256 digest (host, T-table path)."""
    pad = groestl256_pad(len(data)).tobytes()
    msg = bytes(data) + pad
    h = _bytes_to_cols(IV_256.tobytes())
    for i in range(len(msg) // 64):
        h = _compress_cols(h, _bytes_to_cols(msg[i * 64:(i + 1) * 64]))
    return _output_transform_cols(h)


class Groestl256:
    """Streaming Grøstl-256 (digest-style API used by the transcript)."""

    def __init__(self):
        self._buf = bytearray()
        self._h = _bytes_to_cols(IV_256.tobytes())
        self._n_bytes = 0

    def update(self, data: bytes) -> "Groestl256":
        self._buf.extend(data)
        self._n_bytes += len(data)
        n_blocks = len(self._buf) // 64
        if n_blocks:
            blocks = bytes(self._buf[:n_blocks * 64])
            h = compress_seq_native(self._h, blocks)
            if h is None:
                h = self._h
                for i in range(n_blocks):
                    h = _compress_cols(h, _bytes_to_cols(blocks[i * 64:(i + 1) * 64]))
            self._h = h
            del self._buf[:n_blocks * 64]
        return self

    def copy(self) -> "Groestl256":
        c = Groestl256.__new__(Groestl256)
        c._buf = bytearray(self._buf)
        c._h = list(self._h)
        c._n_bytes = self._n_bytes
        return c

    def finalize(self) -> bytes:
        msg = bytes(self._buf) + groestl256_pad(self._n_bytes).tobytes()
        h = list(self._h)
        for i in range(len(msg) // 64):
            h = _compress_cols(h, _bytes_to_cols(msg[i * 64:(i + 1) * 64]))
        return _output_transform_cols(h)


def compress_pairs(pairs: np.ndarray, xp=np) -> np.ndarray:
    """2-to-1 Merkle compression: (..., 64) bytes -> (..., 32) bytes.

    The Grøstl output transformation applied to the concatenated digests:
    trunc_256(P(a||b) ^ (a||b)) — exactly `Groestl256ByteCompression`
    (`crates/hash/src/groestl/compression.rs:24-36`, Matyas-Meyer-Oseas).
    Host batches route through the native C T-table path when available
    (pure-Python fallback below); device batches stay vectorized.
    """
    if xp is np:
        lib = _native_lib()
        if lib is not None:
            flat = np.ascontiguousarray(pairs.reshape(-1, 64)).astype(
                np.uint8, copy=False)
            out = np.empty((flat.shape[0], 32), dtype=np.uint8)
            lib.groestl_compress_pairs(_ptr8(flat), flat.shape[0], _ptr8(out))
            return out.reshape(*pairs.shape[:-1], 32)
        if pairs.ndim == 2 and pairs.shape[0] <= 8:
            out = np.empty((pairs.shape[0], 32), dtype=np.uint8)
            for i in range(pairs.shape[0]):
                cols = _bytes_to_cols(pairs[i].tobytes())
                x = _permute_cols(cols, False)
                out[i] = np.frombuffer(
                    _cols_to_bytes([a ^ b for a, b in zip(x, cols)])[32:],
                    dtype=np.uint8)
            return out
    m = bytes_to_state(pairs)
    return state_to_bytes(_permute(m, False, xp) ^ m)[..., 32:]


# ---------------------------------------------------------------------------
# Native C dispatch (host hot path; see ../native/groestl.c). The reference
# runs its challenger/Merkle hashing in native Rust; the tables the C core
# uses are the ones derived from first principles above — no constants live
# in C. BINIUS_NO_NATIVE=1 forces pure Python.
# ---------------------------------------------------------------------------

import ctypes as _ctypes


def _ptr64(a: np.ndarray):
    return a.ctypes.data_as(_ctypes.POINTER(_ctypes.c_uint64))


def _ptr8(a: np.ndarray):
    return a.ctypes.data_as(_ctypes.POINTER(_ctypes.c_uint8))


@functools.lru_cache(maxsize=None)
def _native_lib():
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if lib is None:
        return None
    t = np.array(_ttables(), dtype=np.uint64)
    pc, qc = _col_consts()
    pcs = np.array(pc, dtype=np.uint64)
    qcs = np.array(qc, dtype=np.uint64)
    sp = np.array(SHIFTS_P, dtype=np.int32)
    sq = np.array(SHIFTS_Q, dtype=np.int32)
    lib.groestl_init(_ptr64(t), _ptr64(pcs), _ptr64(qcs),
                     sp.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
                     sq.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)))
    return lib


def _iv_cols_np() -> np.ndarray:
    return np.frombuffer(IV_256.tobytes(), dtype=np.uint64).copy()


_py_permute_cols = _permute_cols
_py_compress_cols = _compress_cols
_py_groestl256 = groestl256


def _permute_cols(cols: list[int], is_q: bool) -> list[int]:  # noqa: F811
    lib = _native_lib()
    if lib is None:
        return _py_permute_cols(cols, is_q)
    a = np.array(cols, dtype=np.uint64)
    lib.groestl_permute(_ptr64(a), int(is_q))
    return [int(x) for x in a]


def _compress_cols(h: list[int], m: list[int]) -> list[int]:  # noqa: F811
    lib = _native_lib()
    if lib is None:
        return _py_compress_cols(h, m)
    ah = np.array(h, dtype=np.uint64)
    am = np.array(m, dtype=np.uint64)
    lib.groestl_compress(_ptr64(ah), _ptr64(am))
    return [int(x) for x in ah]


def groestl256(data: bytes) -> bytes:  # noqa: F811
    lib = _native_lib()
    if lib is None:
        return _py_groestl256(data)
    iv = _iv_cols_np()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    out = np.empty(32, dtype=np.uint8)
    lib.groestl_digest(_ptr64(iv), _ptr8(buf), len(data), _ptr8(out))
    return out.tobytes()


def digest_rows_native(blobs: np.ndarray) -> np.ndarray | None:
    """Batch Grøstl-256 of equal-length rows via C, or None w/o the lib."""
    lib = _native_lib()
    if lib is None:
        return None
    blobs = np.ascontiguousarray(blobs).astype(np.uint8, copy=False)
    n, length = blobs.shape
    iv = _iv_cols_np()
    out = np.empty((n, 32), dtype=np.uint8)
    lib.groestl_digest_batch(_ptr64(iv), _ptr8(blobs), n, length, _ptr8(out))
    return out


def compress_seq_native(h: list[int], blocks: bytes) -> list[int] | None:
    """Absorb len(blocks)/64 blocks into column state h via C, or None."""
    lib = _native_lib()
    if lib is None:
        return None
    ah = np.array(h, dtype=np.uint64)
    buf = np.frombuffer(blocks, dtype=np.uint8)
    lib.groestl_compress_seq(_ptr64(ah), _ptr8(buf), len(blocks) // 64)
    return [int(x) for x in ah]
