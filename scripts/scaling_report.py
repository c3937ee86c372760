"""Scaling-efficiency dress rehearsal on the virtual CPU mesh.

Wall-clock on a virtual mesh is meaningless (one physical host), so this
reports what CAN be validated without hardware: for the two prover hot
kernels (sumcheck-style multiply+XOR-reduce and the RS-encode NTT) compiled
at 1/2/4/8 shards, the number and kind of inserted collectives and the
per-shard FLOP balance from the compiled HLO. The ">70% scaling at N>=2
hosts" north star (SURVEY §5.8) needs real chips; this harness pins the
communication structure the compiler actually emits so regressions (e.g. an
op that silently gathers the full array onto every shard) show up as a
collective-count or flop-imbalance change.

Usage: python scripts/scaling_report.py  [--log-n 18]
"""

import argparse
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + " --xla_cpu_max_isa=AVX2").strip()
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from binius_tpu.fields import tower  # noqa: E402
from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain  # noqa: E402
from binius_tpu.parallel import mesh as mesh_mod  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def _collective_counts(hlo: str) -> dict:
    out = {}
    for c in COLLECTIVES:
        n = len(re.findall(rf"\b{c}(?:-start)?\(", hlo)) + len(
            re.findall(rf"= \S+ {c}", hlo))
        if n:
            out[c] = n
    return out


def _report(name: str, build, sizes=(1, 2, 4, 8)):
    rows = []
    base_flops = None
    for n_dev in sizes:
        mesh, lowered = build(n_dev)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        cols = _collective_counts(hlo)
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = (cost or {}).get("flops", float("nan"))
        if n_dev == 1:
            base_flops = flops
        balance = (base_flops / (flops * n_dev)
                   if base_flops and flops else float("nan"))
        rows.append((n_dev, flops, balance, cols))
    print(f"\n## {name}")
    print("| shards | flops/shard | work balance vs 1-shard | collectives |")
    print("|---|---|---|---|")
    for n_dev, flops, balance, cols in rows:
        cstr = ", ".join(f"{k} x{v}" for k, v in sorted(cols.items())) or "none"
        print(f"| {n_dev} | {flops:.3g} | {balance:.2f} | {cstr} |")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)
    args = ap.parse_args()
    n = 1 << args.log_n
    rng = np.random.default_rng(5)
    a_np = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)

    def build_mulreduce(n_dev):
        mesh = mesh_mod.make_mesh(n_dev)
        a = mesh_mod.put_row_sharded(mesh, 7, jnp.asarray(a_np))
        b = mesh_mod.put_row_sharded(mesh, 7, jnp.asarray(b_np))
        spmd = n_dev > 1
        fn = jax.jit(lambda x, y: tower.xor_reduce(
            tower.mul(7, x, y), axis=0, spmd=spmd))
        return mesh, fn.lower(a, b)

    # composition-eval + accumulate: the sumcheck round-eval inner shape
    _report("B128 multiply + XOR-reduce (sumcheck round-eval core)",
            build_mulreduce)

    d_np = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    dom = NTTDomain.create(5, args.log_n - 2)
    ntt = AdditiveNTT(dom)

    def build_ntt(n_dev):
        from binius_tpu.ntt import sharded_ntt

        mesh = mesh_mod.make_mesh(n_dev)
        d = mesh_mod.put_row_sharded(mesh, 5, jnp.asarray(d_np))
        shape = (2, args.log_n - 2, 0)
        if n_dev > 1:
            # the explicit shard_map path AdditiveNTT.forward dispatches to
            # for committed row-sharded operands (the sharding is invisible
            # under a jit tracer, so call it directly here)
            fn = jax.jit(lambda x: sharded_ntt.transform_sharded(
                ntt, x, 5, shape, 0, 0, 0, False, mesh))
        else:
            fn = jax.jit(lambda x: ntt.forward(x, 5, shape, bitsliced=False))
        return mesh, fn.lower(d)

    _report("additive NTT B32 encode (commit hot loop)", build_ntt)


if __name__ == "__main__":
    main()
