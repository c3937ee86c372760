"""Multi-host initialization for the sharded prover (SURVEY §5.8).

One TPU pod slice = many hosts, each owning a subset of chips. JAX's
runtime makes multi-host SPMD look single-program: after
`jax.distributed.initialize`, `jax.devices()` lists EVERY chip in the slice,
a `Mesh` built over them spans hosts, and the same jitted prover kernels run
with ICI/DCN collectives inserted by GSPMD. Because `prove(..., mesh=...)`
is already written against a global mesh (parallel/mesh.py), multi-host is
a deployment configuration, not a code path:

    from binius_tpu.parallel import distributed, mesh
    distributed.initialize()            # per-host process, e.g. via SLURM/GKE
    proof = prove(system, witness, mesh=mesh.make_mesh())

Proof bytes are identical at any device count (tests/test_sharding.py); the
host-side transcript runs redundantly and deterministically on every
process, which keeps hosts in lockstep without extra communication (each
host computes the same challenges from the same committed data).

`tests/test_distributed.py` integration-tests the multi-CONTROLLER path on
this single-host image: two spawned processes initialize against a local
coordinator, build one global 4-device CPU mesh, and (a) run the sharded
multiply + XOR-reduce kernel on a cross-process-sharded array with identical
results on both ranks (Gloo collectives), and (b) round 5: run the FULL
10-phase `prove(..., mesh=...)` across both processes with proof bytes
identical to the single-process prover. Process-local witness staging lives
in `parallel/mesh.py:_put`: when the mesh spans non-addressable devices,
each process contributes only its addressable shards via
`jax.make_array_from_callback` (witness generation is deterministic, so at
scale each host can generate just its own rows); `mesh.pull_local` gathers
tiny cross-process transcript tensors with the multihost allgather.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime. With no arguments, relies on the TPU
    environment's auto-detection (GKE/Cloud TPU metadata); arguments follow
    `jax.distributed.initialize`."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multi_host() -> bool:
    return jax.process_count() > 1


def local_device_fraction() -> tuple[int, int]:
    """(local device count, global device count)."""
    return len(jax.local_devices()), len(jax.devices())
