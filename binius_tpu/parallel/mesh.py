"""Mesh placement for the prover (SURVEY.md §5.8; scale-out design).

The prover scales across chips by sharding the boolean hypercube's element
axis of every large multilinear over a 1-D `jax.sharding.Mesh`. All device
kernels are ordinary jitted XLA programs, so under sharded operands GSPMD
partitions them SPMD and inserts the collectives (the reference's rayon
parallelism has no cross-node story at all — `crates/core` is single-node).

Two rules make this work:

* XOR reductions over a sharded axis must avoid custom reduce computations
  (GSPMD limitation); kernels thread a static ``spmd`` flag into
  `tower.xor_reduce`, selected per-prover by inspecting operand shardings.
* Every operand of a kernel whose peers are mesh-placed must itself be
  mesh-placed (mixing differently-committed arrays is an error), so
  `put_row_sharded` falls back to mesh replication for small/indivisible
  arrays.

Because GSPMD partitioning is semantics-preserving and all field ops are
exact (carry-free XOR/AND algebra), proof bytes are identical at 1 chip and
N chips — tests/test_sharding.py asserts this end to end.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import tower

AXIS = "hypercube"

#: Don't shard element axes smaller than this (per-shard tiles would be
#: degenerate and collective latency dominates); replicate instead.
MIN_SHARD_ELEMS = 1 << 10


def make_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def is_mesh_sharded(x) -> bool:
    """True if x is committed to >1 device."""
    try:
        return len(x.sharding.device_set) > 1
    except AttributeError:
        return False


def any_mesh_sharded(arrays) -> bool:
    return any(is_mesh_sharded(x) for x in arrays)


def mesh_of(x) -> Mesh | None:
    """Mesh that `x` is committed to. jit outputs may carry an opaque
    GSPMDSharding without a `.mesh`; reconstruct a 1-D mesh from the device
    set then (device order = id order, matching make_mesh)."""
    s = getattr(x, "sharding", None)
    m = getattr(s, "mesh", None)
    if m is not None and not isinstance(m, Mesh):
        m = None  # AbstractMesh etc.
    if m is None and s is not None and len(getattr(s, "device_set", ())) > 1:
        import numpy as np
        devs = sorted(s.device_set, key=lambda d: d.id)
        m = Mesh(np.array(devs), (AXIS,))
    return m


def is_cross_process(mesh: Mesh) -> bool:
    """True when the mesh spans devices this process cannot address
    (multi-controller deployment, SURVEY §5.8)."""
    local = set(jax.local_devices())
    return any(d not in local for d in mesh.devices.flat)


def _put(data, sharding: NamedSharding):
    """device_put, or process-local staging when the target sharding spans
    non-addressable devices: every process passes the (identical,
    deterministically generated) host value and contributes only its
    addressable shards (`jax.make_array_from_callback` — the
    `make_array_from_process_local_data` pattern of
    parallel/distributed.py; witness generation is deterministic so each
    host can also generate only its rows at scale)."""
    if not is_cross_process(sharding.mesh):
        return jax.device_put(data, sharding)
    import numpy as np
    np_data = np.asarray(data)
    return jax.make_array_from_callback(np_data.shape, sharding,
                                        lambda idx: np_data[idx])


def put_row_sharded(mesh: Mesh, level: int, data, min_elems: int = MIN_SHARD_ELEMS):
    """Place a multilinear on the mesh: element (leading) axis sharded when
    large and divisible, replicated otherwise."""
    bshape = tower.batch_shape(level, data) if data.ndim else ()
    n = bshape[0] if bshape else 1
    n_dev = mesh.devices.size
    if bshape and n >= max(min_elems, n_dev) and n % n_dev == 0:
        spec = P(AXIS, *([None] * (data.ndim - 1)))
    else:
        spec = P(*([None] * data.ndim))
    return _put(data, NamedSharding(mesh, spec))


def put_replicated(mesh: Mesh, data):
    return _put(data, NamedSharding(mesh, P(*([None] * data.ndim))))


def put_axis_sharded(mesh: Mesh, data, axis: int,
                     min_elems: int = MIN_SHARD_ELEMS):
    """Shard one axis of an arbitrary-rank array (e.g. the element axis of a
    grouped-claim stack); replicates when too small or not divisible."""
    n = data.shape[axis]
    n_dev = mesh.devices.size
    spec = [None] * data.ndim
    if n >= max(min_elems, n_dev) and n % n_dev == 0:
        spec[axis] = AXIS
    return jax.device_put(data, NamedSharding(mesh, P(*spec)))


def pull_local(x):
    """Fetch a (small) mesh-committed array back to an uncommitted local
    array; no-op for already-local arrays. Used where tiny per-claim tensors
    leave the sharded data path and re-enter host-orchestrated math. Under a
    multi-controller mesh, shards owned by other processes are gathered via
    the multihost allgather (every process gets the full value — these are
    tiny transcript-bound tensors, and hosts must agree on them anyway)."""
    if is_mesh_sharded(x):
        import jax.numpy as jnp
        import numpy as np
        if not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return jnp.asarray(np.asarray(
                multihost_utils.process_allgather(x, tiled=True)))
        return jnp.asarray(np.asarray(jax.device_get(x)))
    return x
