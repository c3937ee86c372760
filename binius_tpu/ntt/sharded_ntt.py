"""Mesh-sharded additive NTT via shard_map (SURVEY hard part #5).

GSPMD cannot partition the packed stage loop — the butterfly reshapes make
it replicate the FULL transform on every shard (measured by
`scripts/scaling_report.py`: per-shard FLOPs constant at any mesh size).
This module distributes it explicitly, the way a multi-chip LCH14 NTT wants
to be laid out on ICI:

  * data row-sharded over the mesh axis = contiguous element blocks, so a
    butterfly with element distance `d` is SHARD-LOCAL iff `d <` the shard
    size;
  * the (at most log2(n_dev)) cross-shard stages exchange whole blocks with
    the partner shard via `jax.lax.ppermute`; the twiddle is constant per
    shard there (block >= 2 shards), so each stage is one permute + one
    subfield scale + XORs;
  * the remaining stages run the ordinary packed stage loop inside
    shard_map; per-shard twiddles come from the coset identity
    twiddle(r, (c << nb)|j) with c = (coset << log_dev) | shard — the same
    mechanism `AdditiveNTT` uses for cosets, evaluated host-side per shard
    and fed in as row-sharded arrays.

Counterpart of the reference's `MultithreadedNTT` stride split
(`crates/ntt/src/multithreaded.rs:18`), re-designed for explicit collectives
instead of shared memory. Proof-byte equality 1-vs-8 shards is pinned by
tests/test_sharding.py; stage math is `additive_ntt._transform_jit`'s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    import jax as _jax_sm
    import functools as _ft_sm

    def shard_map(f=None, *, mesh, in_specs, out_specs, check_rep=False):
        if f is None:
            return _ft_sm.partial(shard_map, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_rep=check_rep)
        return _jax_sm.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=check_rep)
    _jax_sm.shard_map  # jax >= 0.8
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..fields import tower
from ..parallel import mesh as mesh_mod
from . import additive_ntt as ant


def suitable(ntt, data, shape, mesh) -> bool:
    log_x, log_y, log_z = shape
    if mesh is None or log_z != 0 or ntt.level > 5:
        return False
    n_dev = int(mesh.devices.size)
    if n_dev & (n_dev - 1) or n_dev < 2:
        return False
    log_dev = n_dev.bit_length() - 1
    # every shard must hold at least one full X batch row pair
    return log_y - log_dev >= 1


def transform_sharded(ntt, data, data_level: int, shape: tuple, coset: int,
                      coset_bits: int, skip_rounds: int, inverse: bool,
                      mesh):
    log_x, log_y, _ = shape
    tl = ntt.level
    dom = ntt.domain
    n = 1 << (log_x + log_y)
    n_dev = int(mesh.devices.size)
    log_dev = n_dev.bit_length() - 1
    S = n >> log_dev
    log_yp = log_y - log_dev

    if inverse:
        all_is = list(range(0, log_y - skip_rounds))
    else:
        all_is = list(range(log_y - skip_rounds - 1, -1, -1))
    cross_is = [i for i in all_is if (1 << (i + log_x)) >= S]
    local_is = [i for i in all_is if (1 << (i + log_x)) < S]

    ell = dom.log_domain_size
    base_round = ell - (log_y + coset_bits)

    # cross-stage twiddles: one scalar per (stage, shard)
    cross_tws = []
    for i in cross_is:
        r = base_round + i
        n_bits = log_y - 1 - i
        vals = []
        for s in range(n_dev):
            j = ((s * S) >> (i + 1 + log_x)) & ((1 << n_bits) - 1)
            vals.append(dom.twiddle(r, (coset << n_bits) | j))
        cross_tws.append(vals)
    cross_np = np.array(cross_tws, dtype=np.uint64).reshape(len(cross_is),
                                                            n_dev)

    # local-stage twiddles: the shard's block is the (coset', coset_bits')
    # sub-transform with coset' = (coset << log_dev) | shard
    local_tw_stacks = []
    for i in local_is:
        r = base_round + i
        n_bits = log_yp - 1 - i
        rows = []
        for s in range(n_dev):
            rows.append(dom.stage_twiddles_np(
                r, n_bits, high_bits=(coset << log_dev) | s))
        local_tw_stacks.append(np.stack(rows))

    from jax.sharding import NamedSharding

    nd = data.ndim
    data_spec = P(mesh_mod.AXIS, *([None] * (nd - 1)))
    cross_dev = mesh_mod.put_replicated(
        mesh, jnp.asarray(cross_np.astype(np.uint32)))
    local_devs = []
    for arr in local_tw_stacks:
        a = dom.twiddles_to_device(arr)  # [n_dev, 2^n_bits(, limbs)]
        local_devs.append(jax.device_put(
            a, NamedSharding(mesh, P(mesh_mod.AXIS,
                                     *([None] * (a.ndim - 1))))))

    local_specs = tuple(P(mesh_mod.AXIS, *([None] * (a.ndim - 1)))
                        for a in local_devs)
    # the shard-local sub-transform keeps the global stage indices: local
    # stages are exactly those with i < log_yp
    local_stage_tuple = tuple(local_is)

    perm_cache = {}

    def perms(D):
        if D not in perm_cache:
            perm_cache[D] = [(j, j ^ D) for j in range(n_dev)]
        return perm_cache[D]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(data_spec, P(None, None)) + local_specs,
        out_specs=data_spec, check_rep=False)
    def body(local, cross_tw, *ltws):
        s = jax.lax.axis_index(mesh_mod.AXIS)

        def scale(t, x):
            return tower.scale_subfield(tl, data_level, t, x)

        def cross_stage(k, i, x):
            D = (1 << (i + log_x)) // S
            other = jax.lax.ppermute(x, mesh_mod.AXIS, perm=perms(D))
            t = cross_tw[k, s]
            is_u = (s & D) == 0
            # lax.cond, not where: each shard runs exactly ONE branch, so a
            # cross stage costs one subfield scale per element — the same
            # arithmetic the packed single-device stage spends per pair
            if not inverse:
                return jax.lax.cond(
                    is_u,
                    lambda: tower.add(data_level, x, scale(t, other)),
                    lambda: tower.add(data_level,
                                      tower.add(data_level, x, other),
                                      scale(t, x)))
            return jax.lax.cond(
                is_u,
                lambda: tower.add(data_level, x,
                                  scale(t, tower.add(data_level, x, other))),
                lambda: tower.add(data_level, x, other))

        def run_local(x):
            if not local_is:
                return x
            tw_list = tuple(lt[0] for lt in ltws)
            return ant._transform_jit(x, data_level, tl, log_x, log_yp, 0,
                                      local_stage_tuple, tw_list, inverse)

        if inverse:
            local = run_local(local)
            for k, i in enumerate(cross_is):
                local = cross_stage(k, i, local)
        else:
            for k, i in enumerate(cross_is):
                local = cross_stage(k, i, local)
            local = run_local(local)
        return local

    return body(data, cross_dev, *local_devs)
