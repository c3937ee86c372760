"""Ring switching (DP24 §4-5): reduce small-field evaluation claims on
committed multilinears to PIOP sumcheck claims on their packed multilinears.

Mirrors `crates/core/src/ring_switch/` + `crates/core/src/tensor_algebra.rs`:

  * tensor-algebra partial evaluations (one per claim, mixed per shared
    eval-point prefix) are sent and checked against the claimed evals;
  * row-batching challenges fold the tensor elements vertically into the
    sums of the reduced sumcheck claims;
  * the transparent multiplier is the ring-switch eq indicator
    A(v) = sum_u rowcoeff_u * coord_u(mix * eq(z_suffix, v))
    (`ring_switch/eq_ind.rs:41-149`).

Conventions: a committed multilinear at tower level l with n variables has
kappa = 7 - l; the eval point splits into prefix (z_0..z_{kappa-1}) and
suffix; the packed multilinear has n - kappa variables.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..fields import scalar, tower
from ..parallel import mesh as mesh_mod
from ..math import mle
from .piop import PIOPSumcheckClaim
from .sumcheck.common import LEVEL


# ---------------------------------------------------------------------------
# Tensor algebra over (B_l, B128): numpy coordinate matrices + the native
# batch field kernel. This is the verifier's hottest host path (the PIOP
# transparent checks call ring_switch_eq_ind_eval per claim); the original
# per-coordinate Python-int version spent 73 of 91 s of a keccak-2^3 verify
# in `transpose`.
# ---------------------------------------------------------------------------

import numpy as np

_M64 = (1 << 64) - 1


def coord(level: int, e: int, j: int) -> int:
    """j-th B_level coordinate of a B128 element (basis = bit slices)."""
    w = 1 << level
    return (e >> (j * w)) & ((1 << w) - 1)


def from_coords(level: int, coords: list[int]) -> int:
    w = 1 << level
    out = 0
    for j, c in enumerate(coords):
        out |= c << (j * w)
    return out


def _ints_to_pairs(elems: list) -> np.ndarray:
    m = np.empty((len(elems), 2), dtype=np.uint64)
    for i, e in enumerate(elems):
        m[i, 0] = e & _M64
        m[i, 1] = e >> 64
    return m


def _pairs_to_ints(m: np.ndarray) -> list:
    return [int(m[i, 0]) | (int(m[i, 1]) << 64) for i in range(m.shape[0])]


@functools.lru_cache(maxsize=None)
def _coord_layout(level: int):
    """(limb, offset, mask) arrays for the k = 2^(7-level) coordinates."""
    w = 1 << level
    k = 128 // w
    js = np.arange(k, dtype=np.uint64)
    limb = ((js * w) // 64).astype(np.int64)
    off = ((js * w) % 64).astype(np.uint64)
    mask = np.uint64(_M64 if w == 64 else (1 << w) - 1)
    return limb, off, mask


def _to_coords(level: int, m: np.ndarray) -> np.ndarray:
    """(k, 2) uint64 pairs -> (k, k) coordinate matrix C[i, j]."""
    limb, off, mask = _coord_layout(level)
    return (m[:, limb] >> off[None, :]) & mask


def _from_coords_np(level: int, C: np.ndarray) -> np.ndarray:
    """(k, k) coordinate matrix -> (k, 2) uint64 pairs."""
    limb, off, mask = _coord_layout(level)
    vals = (C & mask) << off[None, :]
    out = np.zeros((C.shape[0], 2), dtype=np.uint64)
    np.bitwise_or.at(out, (slice(None), limb), vals)  # scatter-OR into limbs
    return out


def _mul_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched B128 multiply on (k, 2) uint64 pair arrays (native kernel,
    scalar fallback)."""
    from .. import native as native_mod
    lib = native_mod.get_lib()
    k = a.shape[0]
    out = np.empty((k, 2), dtype=np.uint64)
    if lib is not None:
        import ctypes
        p64 = ctypes.POINTER(ctypes.c_uint64)
        a = np.ascontiguousarray(a)
        b = np.ascontiguousarray(b)
        lib.tower_mul_batch(LEVEL, a.ctypes.data_as(p64), b.ctypes.data_as(p64),
                            out.ctypes.data_as(p64), k)
        return out
    for i in range(k):
        v = scalar.mul(LEVEL, int(a[i, 0]) | (int(a[i, 1]) << 64),
                       int(b[i, 0]) | (int(b[i, 1]) << 64))
        out[i, 0] = v & _M64
        out[i, 1] = v >> 64
    return out


class TensorAlgElem:
    """2^kappa vertical B128 elements; kappa = 7 - level. Stored as a
    (2^kappa, 2) uint64 pair matrix; `elems` materializes Python ints."""

    __slots__ = ("level", "_m")

    def __init__(self, level: int, elems):
        self.level = level
        self._m = elems if isinstance(elems, np.ndarray) else _ints_to_pairs(elems)

    @property
    def elems(self) -> list:
        return _pairs_to_ints(self._m)

    @property
    def kappa(self) -> int:
        return 7 - self.level

    @staticmethod
    def zero(level: int) -> "TensorAlgElem":
        return TensorAlgElem(level, np.zeros((1 << (7 - level), 2), dtype=np.uint64))

    @staticmethod
    def from_vertical(level: int, x: int) -> "TensorAlgElem":
        e = TensorAlgElem.zero(level)
        e._m[0, 0] = x & _M64
        e._m[0, 1] = x >> 64
        return e

    def add(self, other: "TensorAlgElem") -> "TensorAlgElem":
        assert self.level == other.level
        return TensorAlgElem(self.level, self._m ^ other._m)

    def scale_vertical(self, s: int) -> "TensorAlgElem":
        sv = np.empty((self._m.shape[0], 2), dtype=np.uint64)
        sv[:, 0] = s & _M64
        sv[:, 1] = s >> 64
        return TensorAlgElem(self.level, _mul_pairs(self._m, sv))

    def transpose(self) -> "TensorAlgElem":
        C = _to_coords(self.level, self._m)
        return TensorAlgElem(self.level, _from_coords_np(self.level,
                                                         np.ascontiguousarray(C.T)))

    def scale_horizontal(self, s: int) -> "TensorAlgElem":
        return self.transpose().scale_vertical(s).transpose()

    def fold_vertical(self, coeffs: list[int]) -> int:
        t = self.transpose()
        prods = _mul_pairs(t._m, _ints_to_pairs(list(coeffs)))
        lo = int(np.bitwise_xor.reduce(prods[:, 0]))
        hi = int(np.bitwise_xor.reduce(prods[:, 1]))
        return lo | (hi << 64)


# ---------------------------------------------------------------------------
# Claims
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RingSwitchEvalClaim:
    """Evaluation claim on a committed small-field multilinear.

    point has n_vars = packed_n_vars + kappa entries (B128 ints).
    """

    committed_idx: int   # index into the commit metadata ordering
    level: int           # tower level of the committed multilinear
    point: tuple         # tuple[int]
    eval: int

    @property
    def kappa(self) -> int:
        return 7 - self.level

    @property
    def prefix(self) -> tuple:
        return self.point[:self.kappa]

    @property
    def suffix(self) -> tuple:
        return self.point[self.kappa:]


def _witness_n_vars(level: int, data) -> int:
    """log2 element count of a device multilinear at `level` (elements are
    the leading axis in every tower layout; bit-packed B1 counts bits)."""
    return (tower.p1_n_elems(level, data) - 1).bit_length()


def _group_by(values):
    """Group equal values, preserving first-seen order. Returns (uniques,
    index_of_each)."""
    uniq, idx = [], []
    for v in values:
        try:
            i = uniq.index(v)
        except ValueError:
            i = len(uniq)
            uniq.append(v)
        idx.append(i)
    return uniq, idx


def _mixing_coeffs(transcript, n_claims: int) -> list[int]:
    m = (n_claims - 1).bit_length() if n_claims > 1 else 0
    challenges = transcript.sample_scalars(LEVEL, m)
    coeffs = [1]
    for r in challenges:
        coeffs = ([scalar.mul(LEVEL, c, r ^ 1) for c in coeffs]
                  + [scalar.mul(LEVEL, c, r) for c in coeffs])
    return coeffs[:n_claims]


def _eq_expansion_scalar(point: list[int]) -> list[int]:
    out = [1]
    for r in point:
        out = ([scalar.mul(LEVEL, c, r ^ 1) for c in out]
               + [scalar.mul(LEVEL, c, r) for c in out])
    return out


# ---------------------------------------------------------------------------
# Ring-switch eq indicator
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _eq_ind_mle_jit(level: int, suffix_pt, mix, row_coeffs):
    """Device MLE of A: evals[v] = sum_u embed(coord_u(mix*eq_v)) * rowcoeff_u."""
    eq = mle.eq_ind_partial_eval(LEVEL, suffix_pt)
    scaled = tower.mul(LEVEL, eq, mix)
    coords = tower.split_to_subfield(LEVEL, level, scaled)  # (2^n, 2^kappa[, limbs])
    emb = tower.embed(level, LEVEL, coords)
    return tower.inner_product(LEVEL, emb, row_coeffs, axis=1)


def ring_switch_eq_ind_mle(level: int, suffix: list[int], mix: int, row_coeffs: list[int]):
    """(data, n_vars) device multilinear of the ring-switch eq indicator."""
    k = 1 << (7 - level)
    sp = tower.from_ints(LEVEL, list(suffix))
    mx = tower.from_ints(LEVEL, [mix])[0]
    rc = tower.from_ints(LEVEL, list(row_coeffs[:k]))
    if tower.has_limb_dim(LEVEL):
        rc = rc[None, :, :]
    data = _eq_ind_mle_jit(level, sp, mx, rc)
    return data, len(suffix)


def ring_switch_eq_ind_eval(level: int, suffix: list[int], mix: int,
                            row_coeffs: list[int], query: list[int]) -> int:
    """Host evaluation of A at an arbitrary B128 query point
    (`ring_switch/eq_ind.rs:160-186`)."""
    assert len(query) == len(suffix)
    acc = TensorAlgElem.from_vertical(level, mix)
    for z, q in zip(suffix, query):
        vert = acc.scale_vertical(z)
        hztl = acc.scale_horizontal(q)
        acc = acc.add(vert).add(hztl)
    return acc.fold_vertical(row_coeffs)


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_ind_eval_batch_jit(level: int, zs, qs, mixes, rc):
    """Batched ring_switch_eq_ind_eval for n claims sharing one query point:
    zs (k, n, limbs) per-claim suffixes, qs (k, limbs) query, mixes
    (n, limbs), rc (2^kappa, limbs) row coeffs; returns (n, limbs) evals.

    Same tensor-algebra recursion as the scalar path, vectorized over claims
    with a lax.scan over the k steps (one traced body regardless of k), with
    transposes realized as subfield split / axis-swap / join (the coordinate
    matrix of each element). A (z=0, q=0) step is the identity, so callers
    pad k freely for kernel reuse.
    """

    acc = _eq_ind_acc_init(level, mixes)
    acc, _ = jax.lax.scan(_eq_ind_step(level), acc, (zs, qs))
    return tower.inner_product(LEVEL, _ta_transpose(level, acc), rc[None], axis=1)


def _ta_transpose(level: int, a):
    """Swap the tensor factors of batched tensor-algebra elements
    (n, 2^kappa, limbs): the coordinate matrix of each element transposes."""
    coords = tower.split_to_subfield(LEVEL, level, a)
    return tower.join_from_subfield(LEVEL, level, jnp.swapaxes(coords, 1, 2))


def _eq_ind_step(level: int):
    def step(acc, zq):
        z, q = zq
        vert = tower.mul(LEVEL, acc, z[:, None])
        hztl = _ta_transpose(level, tower.mul(LEVEL, _ta_transpose(level, acc),
                                              q[None, None]))
        return acc ^ vert ^ hztl, None
    return step


def _eq_ind_acc_init(level: int, mixes):
    acc = tower.zeros(LEVEL, (mixes.shape[0], 1 << (7 - level)))
    return acc.at[:, 0].set(mixes)


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_ind_suffix_products_jit(level: int, zs, qs):
    """P_s = prod_i (1 + z_i (x) 1 + 1 (x) q_i) per distinct suffix, with unit
    mixing: (u, 2^kappa, limbs) tensor-algebra elements. The algebra is
    commutative, so a claim's eval is fold_vertical((mix (x) 1) * P_s) —
    the expensive k-step scan depends only on the suffix."""
    ones = tower.from_ints(LEVEL, [1] * zs.shape[1])
    acc = _eq_ind_acc_init(level, ones)
    acc, _ = jax.lax.scan(_eq_ind_step(level), acc, (zs, qs))
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_ind_apply_mix_fold_jit(level: int, prods, sel, mixes, rc):
    """out_i = fold_vertical((mix_i (x) 1) * P_{sel_i}): gather the suffix
    product, scale every vertical coefficient by the claim's mixing
    coefficient, transpose, row-fold with rc."""
    acc = jnp.take(prods, sel, axis=0)
    acc = tower.mul(LEVEL, acc, mixes[:, None])
    return tower.inner_product(LEVEL, _ta_transpose(level, acc), rc[None], axis=1)


def ring_switch_eq_ind_eval_batch(level: int, suffixes: list, mixes: list[int],
                                  row_coeffs: list[int],
                                  query: list[int]) -> list[int]:
    """Evaluate A for many claims (same level, same suffix length) at one
    shared query point with a single device kernel. Claim count and step
    count are padded to powers of two so kernels are reused across groups.

    The mixing coefficient enters as `from_vertical(mix)` = left-mult by
    (mix (x) 1) in the COMMUTATIVE tensor algebra, so it commutes through
    every recursion step (`eq_ind.rs:163-184`): the expensive k-step scan
    depends only on the suffix. With duplicate suffixes (evalcheck funnels
    committed claims to a handful of shared points — keccak 2^6: 1926
    claims, 1 distinct suffix) the scan runs once per DISTINCT suffix and a
    cheap gather-scale-fold kernel applies each claim's mix."""
    n = len(mixes)
    k = len(query)
    assert all(len(s) == k for s in suffixes)
    uniq: dict[tuple, int] = {}
    for s in suffixes:
        uniq.setdefault(tuple(s), len(uniq))
    pad_k = 1 << max(0, (k - 1).bit_length())
    qs = tower.from_ints(LEVEL, list(query) + [0] * (pad_k - k))
    rc = tower.from_ints(LEVEL, list(row_coeffs[:1 << (7 - level)]))
    if len(uniq) < n:
        u = len(uniq)
        pad_u = 1 << max(0, (u - 1).bit_length())
        flat = [0] * (pad_k * pad_u)
        for i, s in enumerate(uniq):
            for j in range(k):
                flat[j * pad_u + i] = s[j]
        zs = tower.from_ints(LEVEL, flat)
        zs = zs.reshape(tower.elem_shape(LEVEL, (pad_k, pad_u)))
        prods = _eq_ind_suffix_products_jit(level, zs, qs)
        if u * 128 < n:
            # out(mix) is F2-LINEAR in mix (scale, transpose, and the
            # rc-fold are all F2-linear): evaluate the 128 bit-basis images
            # per DISTINCT suffix on device, then each claim is a bit-masked
            # XOR of basis images — no per-claim multiplies (keccak: 1926
            # claims -> one 128-row kernel + host XORs)
            V = 128
            rows = u * V
            pad_r = 1 << max(0, (rows - 1).bit_length())
            sel = np.zeros(pad_r, dtype=np.int32)
            mix_basis = [0] * pad_r
            for ui in range(u):
                for j in range(V):
                    sel[ui * V + j] = ui
                    mix_basis[ui * V + j] = 1 << j
            mx = tower.from_ints(LEVEL, mix_basis)
            W = _eq_ind_apply_mix_fold_jit(level, prods, jnp.asarray(sel), mx, rc)
            W_np = np.asarray(jax.device_get(W))[:rows].reshape(u, V, 4)
            mix_words = np.zeros((n, 4), dtype=np.uint32)
            for i, m in enumerate(mixes):
                for w in range(4):
                    mix_words[i, w] = (m >> (32 * w)) & 0xFFFFFFFF
            bits = np.unpackbits(mix_words.view(np.uint8), axis=1,
                                 bitorder="little")        # (n, 128)
            su = np.asarray([uniq[tuple(s)] for s in suffixes], dtype=np.int32)
            masked = np.where(bits[:, :, None].astype(bool), W_np[su],
                              np.uint32(0))
            out_np = np.bitwise_xor.reduce(masked, axis=1)  # (n, 4)
            return [int(r[0]) | (int(r[1]) << 32) | (int(r[2]) << 64)
                    | (int(r[3]) << 96) for r in out_np]
        pad_n = 1 << max(0, (n - 1).bit_length())
        sel = np.zeros(pad_n, dtype=np.int32)
        for i, s in enumerate(suffixes):
            sel[i] = uniq[tuple(s)]
        mx = tower.from_ints(LEVEL, list(mixes) + [0] * (pad_n - n))
        out = _eq_ind_apply_mix_fold_jit(level, prods, jnp.asarray(sel), mx, rc)
        return tower.to_ints(LEVEL, out)[:n]
    pad_n = 1 << max(0, (n - 1).bit_length())
    flat = [0] * (pad_k * pad_n)
    for i, s in enumerate(suffixes):
        for j in range(k):
            flat[j * pad_n + i] = s[j]
    zs = tower.from_ints(LEVEL, flat)
    zs = zs.reshape(tower.elem_shape(LEVEL, (pad_k, pad_n)))
    mx = tower.from_ints(LEVEL, list(mixes) + [0] * (pad_n - n))
    out = _eq_ind_eval_batch_jit(level, zs, qs, mx, rc)
    return tower.to_ints(LEVEL, out)[:n]


class _BatchedEqIndEvals:
    """Lazy group-batched evaluator behind the verifier's per-claim transparent
    eval closures: the PIOP verifier queries every claim of a (level, k) group
    at the same final-challenge point, so the first query computes the whole
    group in one kernel and the rest are dictionary hits."""

    def __init__(self, claims, mixing, row_coeffs):
        self._row_coeffs = row_coeffs
        self._groups: dict = {}
        self._members: dict = {}
        for i, (c, m) in enumerate(zip(claims, mixing)):
            key = (c.level, len(c.suffix))
            self._groups.setdefault(key, []).append((i, list(c.suffix), m))
            self._members[i] = key
        self._cache: dict = {}

    def eval(self, i: int, query: list[int]) -> int:
        key = (self._members[i], tuple(query))
        got = self._cache.get(key)
        if got is None:
            members = self._groups[self._members[i]]
            level, _k = self._members[i]
            vals = ring_switch_eq_ind_eval_batch(
                level, [s for _, s, _ in members], [m for _, _, m in members],
                self._row_coeffs, list(query))
            got = {j: v for (j, _, _), v in zip(members, vals)}
            self._cache[key] = got
        return got[i]


# ---------------------------------------------------------------------------
# Prove / verify
# ---------------------------------------------------------------------------

def _partial_eval_tensor(claim: RingSwitchEvalClaim, witness) -> TensorAlgElem:
    """a_u = MLE of f(u, .) at z_suffix, u over the low kappa variables."""
    level, data = tower.resolve_p1(*witness)
    assert level == claim.level
    n = len(claim.point)
    k = claim.kappa
    eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(claim.suffix)))
    _, partial = mle.evaluate_partial_high(level, data, n, LEVEL, eq, n - k)
    return TensorAlgElem(level, tower.to_ints(LEVEL, partial))


@dataclasses.dataclass
class ReducedRingSwitch:
    sumcheck_claims: list   # list[PIOPSumcheckClaim]
    transparent_mles: list  # prover: [(data, n_vars)]; verifier: [(n_vars, eval_fn)]


@functools.partial(jax.jit, static_argnums=(0,))
def _fold_vertical_batch_jit(level: int, scaled, rc):
    """Batched TensorAlgElem.fold_vertical: scaled (k, 2^kappa, 4limbs) B128,
    rc (2^kappa, 4). Returns (k, 4): transpose each element then row-fold."""
    coords = tower.split_to_subfield(LEVEL, level, scaled)   # (k, 2^kj, 2^ki)
    coords_t = jnp.swapaxes(coords, 1, 2)                    # (k, 2^ki, 2^kj)
    joined = tower.join_from_subfield(LEVEL, level, coords_t)  # (k, 2^kappa, 4)
    return tower.inner_product(LEVEL, joined, rc[None, :, :], axis=1)


@jax.jit
def _eq_ind_mle_batch_jit(eq, mix, c):
    """Batched ring-switch eq-indicator MLEs over one shared suffix expansion:
    eq (2^n, 4), mix (k, 4) -> (k, 2^n, 4).

    A(x) = sum_u rc_u * embed(coord_u(x)) is F2-linear in x = mix * eq_v, so
    it is applied as 128 precomputed B128 constants c_b = rc_{b//w} * 2^(b%w)
    (see _eq_ind_linear_consts) selected by the bits of x and XOR-reduced —
    a bit-plane matmul instead of 2^kappa tower multiplies per element."""
    scaled = tower.mul(LEVEL, eq[None, :, :], mix[:, None, :])
    bits = tower.split_to_subfield(LEVEL, 0, scaled)          # (k, 2^n, 128)
    sel = jnp.where(bits[..., None] != 0, c[None, None, :, :], jnp.uint32(0))
    return tower.xor_reduce(sel, axis=2)


def _eq_ind_linear_consts(level: int, row_coeffs: list[int]):
    """(128, 4) device constants of the F2-linear map x -> A(x)."""
    w = 1 << level
    c_ints = [scalar.mul(LEVEL, row_coeffs[b // w], 1 << (b % w))
              for b in range(128)]
    return tower.from_ints(LEVEL, c_ints)


def prove(claims: list[RingSwitchEvalClaim], witnesses: list, transcript) -> ReducedRingSwitch:
    """witnesses[i] = (level, data) for committed multilinear i (claim order
    references committed_idx). Claims must be sorted ascending by packed
    n_vars (len(suffix)).

    All tensor-algebra work is batched on device: claims group by
    (level, n_vars, suffix) for one partial-eval kernel each (the reference
    shares eq expansions per suffix, `ring_switch/prove.rs:42`; here whole
    claim groups share one kernel), and the row-batch fold + transparent
    MLEs run as per-level batch kernels.
    """
    import os as _os
    import time as _time
    _trace_on = _os.environ.get("BINIUS_TRACE_PHASES", "") not in ("", "0")
    _t0 = _time.perf_counter()

    def _trace(msg):
        nonlocal _t0
        t = _time.perf_counter()
        if _trace_on:
            print(f"  [ring_switch] {msg}: {(t - _t0) * 1e3:.1f} ms", flush=True)
        _t0 = t

    n = len(claims)
    mixing = _mixing_coeffs(transcript, n)
    mix_dev = tower.from_ints(LEVEL, mixing)  # (n, 4)

    # --- batched tensor-algebra partial evals, scaled by mixing coeffs ---
    eq_memo: dict = {}

    def eq_of(suffix):
        e = eq_memo.get(suffix)
        if e is None:
            e = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(suffix)))
            eq_memo[suffix] = e
        return e

    levels = sorted({c.level for c in claims})
    scaled_by_level: dict = {}   # level -> (k_lvl, 2^kappa, 4) device
    pos_in_level: list = [None] * n
    claims_of_level: dict = {lvl: [] for lvl in levels}
    for i, c in enumerate(claims):
        pos_in_level[i] = len(claims_of_level[c.level])
        claims_of_level[c.level].append(i)
    for lvl in levels:
        idxs = claims_of_level[lvl]
        kappa = 7 - lvl
        groups: dict = {}
        for pos, i in enumerate(idxs):
            c = claims[i]
            wit_n = _witness_n_vars(*witnesses[c.committed_idx])
            groups.setdefault((len(c.point), c.suffix, wit_n), []).append(pos)
        chunks, order = [], []
        for (nv, suffix, wit_n), poss in groups.items():
            stack = jnp.stack(
                [tower.resolve_p1(*witnesses[claims[idxs[p]].committed_idx])[1]
                 for p in poss], axis=0)
            if nv == kappa:
                if wit_n < kappa:
                    # tiny column: repeat the short value vector to fill one
                    # packed element (padded_packed_eval semantics)
                    reps = [1] * stack.ndim
                    reps[1] = 1 << (kappa - wit_n)
                    stack = jnp.tile(stack, reps)
                _, t = 7, mesh_mod.pull_local(tower.embed(lvl, LEVEL, stack))
            else:
                _, t = mle.batched_evaluate_partial_high(
                    lvl, stack, nv, eq_of(suffix), kappa)
            # per-claim tensor elements are tiny (k, 2^kappa, 4); leave the
            # mesh here so the mixing/fold tail stays single-device
            chunks.append(mesh_mod.pull_local(t))
            order.extend(poss)
        inv = [0] * len(idxs)
        for p2, p in enumerate(order):
            inv[p] = p2
        tensors = jnp.take(jnp.concatenate(chunks, axis=0),
                           jnp.asarray(inv, dtype=jnp.int32), axis=0)
        mix_lvl = jnp.take(mix_dev, jnp.asarray(idxs, dtype=jnp.int32), axis=0)
        scaled_by_level[lvl] = tower.mul(LEVEL, tensors, mix_lvl[:, None, :])
    _trace(f"tensor partial evals ({n} claims)")

    # --- mix per shared prefix, write tensor elements to the transcript ---
    prefixes, claim_to_prefix = _group_by([c.prefix for c in claims])
    w = transcript.message()
    for pi in range(len(prefixes)):
        members = [i for i, p in enumerate(claim_to_prefix) if p == pi]
        lvl = claims[members[0]].level
        rows = jnp.take(scaled_by_level[lvl],
                        jnp.asarray([pos_in_level[i] for i in members],
                                    dtype=jnp.int32), axis=0)
        mixed = tower.xor_reduce(rows, axis=0)
        w.write_scalars(LEVEL, tower.to_ints(LEVEL, mixed))
    _trace(f"prefix mixing ({len(prefixes)} prefixes)")

    # --- row-batching challenges, batched vertical folds ---
    max_kappa = max(c.kappa for c in claims)
    row_challenges = transcript.sample_scalars(LEVEL, max_kappa)
    row_coeffs = _eq_expansion_scalar(row_challenges)
    row_batched = [0] * n
    rb_by_level: dict = {}
    for lvl in levels:
        kappa = 7 - lvl
        rc = tower.from_ints(LEVEL, row_coeffs[:1 << kappa])
        rb_by_level[lvl] = _fold_vertical_batch_jit(lvl, scaled_by_level[lvl], rc)
    for lvl in levels:
        vals = tower.to_ints(LEVEL, rb_by_level[lvl])
        for pos, i in enumerate(claims_of_level[lvl]):
            row_batched[i] = vals[pos]
    transcript.message().write_scalars(LEVEL, row_batched)
    _trace("row-batch folds")

    # --- batched transparent MLEs, grouped by (level, suffix) ---
    transparents: list = [None] * n
    tgroups: dict = {}
    for i, c in enumerate(claims):
        tgroups.setdefault((c.level, c.suffix), []).append(i)
    for (lvl, suffix), idxs in tgroups.items():
        cconsts = _eq_ind_linear_consts(lvl, row_coeffs)
        eq = eq_of(suffix)
        # chunk to bound the (k, 2^n, 128, 4) select intermediate at ~2^24 words
        max_chunk = max(1, (1 << 24) // max(1, eq.shape[0] * 128 * 4))
        for start in range(0, len(idxs), max_chunk):
            part = idxs[start:start + max_chunk]
            mix_part = jnp.take(mix_dev, jnp.asarray(part, dtype=jnp.int32), axis=0)
            out = _eq_ind_mle_batch_jit(eq, mix_part, cconsts)
            # one transfer + host slices: per-claim device gathers here cost
            # ~8 ms dispatch each (17 s of a keccak-2^6 prove); the PIOP
            # prover re-stacks these in a single upload
            out_np = np.asarray(jax.device_get(out))
            for j, i in enumerate(part):
                transparents[i] = (out_np[j], len(suffix))
    _trace(f"transparent MLEs ({len(tgroups)} groups)")
    sc = [PIOPSumcheckClaim(len(c.suffix), c.committed_idx, i, rb)
          for i, (c, rb) in enumerate(zip(claims, row_batched))]
    return ReducedRingSwitch(sc, transparents)


def verify(claims: list[RingSwitchEvalClaim], transcript) -> ReducedRingSwitch:
    n = len(claims)
    mixing = _mixing_coeffs(transcript, n)
    prefixes, claim_to_prefix = _group_by([c.prefix for c in claims])
    kappa_by_prefix = {}
    for c, pi in zip(claims, claim_to_prefix):
        kappa_by_prefix.setdefault(pi, c.kappa)
        assert kappa_by_prefix[pi] == c.kappa
    # expected mixed evals per prefix
    expected = [0] * len(prefixes)
    for c, m, pi in zip(claims, mixing, claim_to_prefix):
        expected[pi] ^= scalar.mul(LEVEL, c.eval, m)
    r = transcript.message()
    tensor_elems = []
    for pi, prefix in enumerate(prefixes):
        k = kappa_by_prefix[pi]
        elems = r.read_scalars(LEVEL, 1 << k)
        # evaluate the vertical-elems MLE at the prefix point
        cur = list(elems)
        for z in prefix:
            cur = [cur[2 * i] ^ scalar.mul(LEVEL, cur[2 * i] ^ cur[2 * i + 1], z)
                   for i in range(len(cur) // 2)]
        if cur[0] != expected[pi]:
            raise ValueError("ring switch: tensor element mismatch with eval claims")
        tensor_elems.append(TensorAlgElem(7 - k, elems))
    max_kappa = max(c.kappa for c in claims)
    row_challenges = transcript.sample_scalars(LEVEL, max_kappa)
    row_coeffs = _eq_expansion_scalar(row_challenges)
    row_batched = transcript.message().read_scalars(LEVEL, n)
    mixed_rb = [0] * len(prefixes)
    for rb, pi in zip(row_batched, claim_to_prefix):
        mixed_rb[pi] ^= rb
    for t, want in zip(tensor_elems, mixed_rb):
        if t.fold_vertical(row_coeffs) != want:
            raise ValueError("ring switch: row-batched sum mismatch")
    batched = _BatchedEqIndEvals(claims, mixing, row_coeffs)
    transparents = [
        (len(c.suffix), (lambda i: lambda q: batched.eval(i, q))(i))
        for i, c in enumerate(claims)
    ]
    sc = [PIOPSumcheckClaim(len(c.suffix), c.committed_idx, i, rb)
          for i, (c, rb) in enumerate(zip(claims, row_batched))]
    return ReducedRingSwitch(sc, transparents)
