"""Additive (LCH14) NTT over binary tower fields — TPU-native.

Semantics match the reference's `crates/ntt/src/additive_ntt.rs` (NTTShape,
coset / skip_rounds behavior) and `crates/ntt/src/twiddle.rs` (twiddle factors
= normalized subspace polynomial evaluations); validated against a direct
novel-polynomial-basis evaluation oracle in tests.

Design (TPU-first): twiddles are precomputed on host with numpy (they are
pure functions of the subspace — the analog of `PrecomputedTwiddleAccess`),
shipped once to device, and the butterfly stages run as XLA-fused vector ops
over a (Z, Y, X) tensor view. Stage fusion into a Pallas VMEM kernel is the
planned optimization for large transforms.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import scalar, tower
from ..math.binary_subspace import BinarySubspace


def _subspace_map(e: int, c: int, level: int) -> int:
    """W_{i+1} value from W_i value: e * (e + c)."""
    return scalar.mul(level, e, e ^ c)


@dataclasses.dataclass(frozen=True)
class NTTDomain:
    """Precomputed twiddle data for an NTT over a binary subspace.

    `s_evals[i][j]` = normalized subspace poly  W-hat_i(beta_{i+1+j}), and
    `norm_consts[i]` = W_i(beta_i) (unnormalized), as in the reference
    `precompute_subspace_evals` (`crates/ntt/src/twiddle.rs:244`).
    """

    level: int
    subspace: BinarySubspace
    s_evals: tuple          # tuple of tuples of ints
    norm_consts: tuple

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def create(level: int, log_domain_size: int, basis: tuple | None = None) -> "NTTDomain":
        if basis is None:
            sub = BinarySubspace.with_dim(level, log_domain_size)
        else:
            sub = BinarySubspace(level, basis)
        b = sub.basis
        assert b[0] == 1, "domain must include 1 as first basis element"
        d = sub.dim
        norm_consts = [1]
        s_evals = [list(b[1:])]
        for _ in range(1, d):
            prev_n = norm_consts[-1]
            prev = s_evals[-1]
            norm_consts.append(_subspace_map(prev[0], prev_n, level))
            s_evals.append([_subspace_map(e, prev_n, level) for e in prev[1:]])
        out = []
        for nc, row in zip(norm_consts, s_evals):
            inv = scalar.invert(level, nc)
            out.append(tuple(scalar.mul(level, e, inv) for e in row))
        return NTTDomain(level, sub, tuple(out), tuple(norm_consts))

    @property
    def log_domain_size(self) -> int:
        return self.subspace.dim

    def twiddle(self, round_i: int, index: int) -> int:
        """W-hat_{round_i} evaluated at sum of beta_{round_i+1+b} over bits b
        of index (host scalar; the `OnTheFlyTwiddleAccess::get` semantics)."""
        row = self.s_evals[round_i]
        out = 0
        b = 0
        while index:
            if index & 1:
                out ^= row[b]
            index >>= 1
            b += 1
        return out

    def stage_twiddles_np(self, round_i: int, n_bits: int, high_bits: int = 0) -> np.ndarray:
        """Vector of twiddles t[j] = self.twiddle(round_i, (high_bits << n_bits) | j)
        for j in [0, 2^n_bits), as numpy (uint64 for level<=6, else (., 4) uint32)."""
        row = self.s_evals[round_i]
        base = self.twiddle(round_i, high_bits << n_bits)
        if self.level <= 6:
            out = np.full(1 << n_bits, np.uint64(base), dtype=np.uint64)
            for b in range(n_bits):
                idx = np.arange(1 << n_bits, dtype=np.uint64)
                mask = ((idx >> np.uint64(b)) & np.uint64(1)).astype(bool)
                out[mask] ^= np.uint64(row[b])
            return out
        out = np.zeros((1 << n_bits, 4), dtype=np.uint32)
        for limb in range(4):
            acc = np.full(1 << n_bits, (base >> (32 * limb)) & 0xFFFFFFFF, dtype=np.uint32)
            for b in range(n_bits):
                idx = np.arange(1 << n_bits)
                mask = ((idx >> b) & 1).astype(bool)
                acc[mask] ^= np.uint32((row[b] >> (32 * limb)) & 0xFFFFFFFF)
            out[:, limb] = acc
        return out

    def twiddles_to_device(self, np_tw: np.ndarray):
        if self.level <= 5:
            return tower.from_numpy(self.level, np_tw.astype(np.uint32))
        return tower.from_numpy(self.level, np_tw)


@dataclasses.dataclass(frozen=True)
class AdditiveNTT:
    """Batched additive NTT over `domain` for data at tower level `data_level`.

    Twiddle/data tower levels may differ (e.g. B32 twiddles, B128 data in FRI
    folding); the twiddle is embedded into the data field.
    """

    domain: NTTDomain

    @property
    def level(self) -> int:
        return self.domain.level

    def _sharded(self, data, shape):
        """Mesh of a row-sharded operand, if the explicit shard_map path
        applies (GSPMD replicates the stage loop instead of partitioning it;
        see scripts/scaling_report.py + ntt/sharded_ntt.py)."""
        from ..parallel import mesh as mesh_mod
        if not mesh_mod.is_mesh_sharded(data):
            return None
        m = mesh_mod.mesh_of(data)
        from . import sharded_ntt
        return m if sharded_ntt.suitable(self, data, shape, m) else None

    def _stage_twiddle_arrays(self, log_y: int, coset: int, coset_bits: int, skip_rounds: int):
        """Device twiddle vector per stage i (in forward-stage order i desc)."""
        ell = self.domain.log_domain_size
        base_round = ell - (log_y + coset_bits)
        assert base_round >= 0, "domain too small"
        out = {}
        for i in range(log_y):
            r = base_round + i
            n_bits = log_y - 1 - i
            tw = self.domain.stage_twiddles_np(r, n_bits, high_bits=coset)
            out[i] = self.domain.twiddles_to_device(tw)
        return out

    def forward(self, data, data_level: int, shape: tuple[int, int, int],
                coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0,
                bitsliced: bool | None = None):
        """Forward transform (novel-basis coeffs -> evaluations), not in-place.

        `data`: flat array of 2^(log_x+log_y+log_z) elements (natural order,
        X fastest). Returns same-shape flat array.

        Big single-device TPU batches take the fused bitsliced Pallas path
        (`bitsliced_ntt`); the packed stage loop below is the portable and
        mesh-sharded path. `bitsliced=False` forces the packed path.
        """
        log_x, log_y, log_z = shape
        from . import bitsliced_ntt
        if bitsliced is not False and bitsliced_ntt.wants_dispatch(
                self.level, data_level, data):
            return bitsliced_ntt.transform(
                self.domain, data, data_level, shape, coset=coset,
                coset_bits=coset_bits, skip_rounds=skip_rounds)
        sh = self._sharded(data, shape)
        if sh is not None:
            from . import sharded_ntt
            return sharded_ntt.transform_sharded(
                self, data, data_level, shape, coset, coset_bits,
                skip_rounds, False, sh)
        tws = self._stage_twiddle_arrays(log_y, coset, coset_bits, skip_rounds)
        stages = tuple(range(log_y - skip_rounds - 1, -1, -1))
        tw_list = tuple(tws[i] for i in stages)
        return _transform_jit(data, data_level, self.level, log_x, log_y, log_z,
                              stages, tw_list, False)

    def inverse(self, data, data_level: int, shape: tuple[int, int, int],
                coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0,
                bitsliced: bool | None = None):
        """Inverse transform (evaluations -> novel-basis coeffs)."""
        log_x, log_y, log_z = shape
        from . import bitsliced_ntt
        if bitsliced is not False and bitsliced_ntt.wants_dispatch(
                self.level, data_level, data):
            return bitsliced_ntt.transform(
                self.domain, data, data_level, shape, coset=coset,
                coset_bits=coset_bits, skip_rounds=skip_rounds, inverse=True)
        sh = self._sharded(data, shape)
        if sh is not None:
            from . import sharded_ntt
            return sharded_ntt.transform_sharded(
                self, data, data_level, shape, coset, coset_bits,
                skip_rounds, True, sh)
        tws = self._stage_twiddle_arrays(log_y, coset, coset_bits, skip_rounds)
        stages = tuple(range(0, log_y - skip_rounds))
        tw_list = tuple(tws[i] for i in stages)
        return _transform_jit(data, data_level, self.level, log_x, log_y, log_z,
                              stages, tw_list, True)

    # ---- host oracle (tests / verifier-side small transforms) -------------

    def forward_scalar(self, values: list[int], data_level: int, log_y: int,
                       coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0) -> list[int]:
        """Naive host forward transform on Python ints (single column)."""
        data = list(values)
        ell = self.domain.log_domain_size
        base = ell - (log_y + coset_bits)
        for i in range(log_y - skip_rounds - 1, -1, -1):
            r = base + i
            for j in range(1 << (log_y - 1 - i)):
                t = self.domain.twiddle(r, (coset << (log_y - 1 - i)) | j)
                for k in range(1 << i):
                    i0 = (j << (i + 1)) | k
                    i1 = i0 | (1 << i)
                    u, v = data[i0], data[i1]
                    u ^= scalar.mul(data_level, t, v)
                    v ^= u
                    data[i0], data[i1] = u, v
        return data

    def inverse_scalar(self, values: list[int], data_level: int, log_y: int,
                       coset: int = 0, coset_bits: int = 0, skip_rounds: int = 0) -> list[int]:
        data = list(values)
        ell = self.domain.log_domain_size
        base = ell - (log_y + coset_bits)
        for i in range(0, log_y - skip_rounds):
            r = base + i
            for j in range(1 << (log_y - 1 - i)):
                t = self.domain.twiddle(r, (coset << (log_y - 1 - i)) | j)
                for k in range(1 << i):
                    i0 = (j << (i + 1)) | k
                    i1 = i0 | (1 << i)
                    u, v = data[i0], data[i1]
                    v ^= u
                    u ^= scalar.mul(data_level, t, v)
                    data[i0], data[i1] = u, v
        return data


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 8))
def _transform_jit(data, data_level: int, tw_level: int, log_x: int, log_y: int,
                   log_z: int, stages: tuple, tw_list, inverse: bool):
    """Run butterfly stages over the (Z, Y, X) view of flat `data`."""
    shp = (1 << log_z, 1 << log_y, 1 << log_x)
    d = data.reshape(tower.elem_shape(data_level, shp))
    for i, tw in zip(stages, tw_list):
        blocks = 1 << (log_y - 1 - i)
        inner = 1 << i
        view = d.reshape(tower.elem_shape(data_level, (shp[0], blocks, 2, inner, shp[2])))
        u, v = view[:, :, 0], view[:, :, 1]
        t = tw[None, :, None, None]  # twiddles stay at their own level:
        # subfield-scalar butterflies (scale_subfield) cost 2^(dl-tl)
        # base products instead of the full Karatsuba tree
        if inverse:
            v = tower.add(data_level, v, u)
            u = tower.add(data_level, u, tower.scale_subfield(tw_level, data_level, t, v))
        else:
            u = tower.add(data_level, u, tower.scale_subfield(tw_level, data_level, t, v))
            v = tower.add(data_level, v, u)
        stacked = jnp.stack([u, v], axis=2)
        d = stacked.reshape(tower.elem_shape(data_level, shp))
    return d.reshape(tower.elem_shape(data_level, (1 << (log_x + log_y + log_z),)))
