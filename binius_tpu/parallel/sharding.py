"""Multi-chip hypercube sharding for the prover (SURVEY.md §5.7-5.8).

The reference is single-node (rayon); the TPU-native scale-out story is:
shard the boolean hypercube's variables across a `jax.sharding.Mesh` axis,
keep folds shard-local by binding LOW variables (adjacent pairs), and reduce
sumcheck round evaluations with an explicit all_gather + local XOR combine
(GSPMD cannot partition XOR monoids). NTT butterflies run under jit and
cross-shard stages lower to collective permutes on ICI.

These helpers productize the pattern validated by
`__graft_entry__.dryrun_multichip`.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import tower
from ..math import fold

LEVEL = 7
AXIS = "hypercube"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_multilinear(mesh: Mesh, data):
    """Place a B128 multilinear with the high variables sharded over the mesh."""
    return jax.device_put(data, NamedSharding(mesh, P(AXIS, None)))


def sharded_bivariate_round_evals(mesh: Mesh, log_n: int):
    """Jitted fn(a, b, active_unused) -> (3, 4) round values for the bivariate
    product sum over a sharded hypercube; the fold variable is the LOW
    variable, so pair extraction is shard-local and only the final XOR
    reduction crosses chips."""
    n_dev = mesh.devices.size
    log_local = log_n - (n_dev - 1).bit_length()

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(AXIS, None), P(AXIS, None)),
                       out_specs=P(None, None), check_rep=False)
    def kernel(a_blk, b_blk):
        e0a, e1a = fold.evals_01(LEVEL, a_blk, log_local, False)
        e0b, e1b = fold.evals_01(LEVEL, b_blk, log_local, False)
        two = tower.full(LEVEL, (), 2)
        v0 = tower.xor_reduce(tower.mul(LEVEL, e0a, e0b), axis=0)
        v1 = tower.xor_reduce(tower.mul(LEVEL, e1a, e1b), axis=0)
        v2 = tower.xor_reduce(
            tower.mul(LEVEL, fold.extrapolate_line(LEVEL, e0a, e1a, two),
                      fold.extrapolate_line(LEVEL, e0b, e1b, two)), axis=0)
        partial = jnp.stack([v0, v1, v2])
        gathered = jax.lax.all_gather(partial, AXIS)
        return tower.xor_reduce(gathered, axis=0)

    return jax.jit(kernel)


def sharded_fold_low(mesh: Mesh, log_n: int):
    """Jitted fn(data, r) folding the LOW variable shard-locally; output keeps
    the shard axis (each shard's active half is its prefix)."""
    n_dev = mesh.devices.size
    log_local = log_n - (n_dev - 1).bit_length()

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(AXIS, None), P(None)),
                       out_specs=P(AXIS, None), check_rep=False)
    def kernel(blk, r):
        e0, e1 = fold.evals_01(LEVEL, blk, log_local, False)
        return fold.extrapolate_line(LEVEL, e0, e1, r)

    return jax.jit(kernel)


def sharded_xor_sum(mesh: Mesh):
    """Jitted field sum of a sharded B128 vector (per-shard XOR + all_gather)."""

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(AXIS, None),),
                       out_specs=P(None), check_rep=False)
    def kernel(blk):
        partial = tower.xor_reduce(blk, axis=0)
        gathered = jax.lax.all_gather(partial[None, :], AXIS)
        return tower.xor_reduce(gathered, axis=0)

    return jax.jit(kernel)
