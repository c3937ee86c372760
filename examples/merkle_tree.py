"""Merkle-tree inclusion example (counterpart of `examples/merkle_tree_32b.rs`).

Proves inclusion of opened leaves in a Grøstl-256 Merkle tree: the nodes
table recomputes parent digests as compress(left || right) and the channel
balance chains paths from boundary leaves up to boundary roots. Usage:
    python examples/merkle_tree.py --log-n-leaves 4 --n-opened 3 [--cpu]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
from binius_tpu.utils.jax_cache import cache_dir as _binius_cache_dir

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_cpu_max_isa=AVX2").strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
elif jax.default_backend() in ("tpu", "axon"):
    jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n-leaves", type=int, default=4)
    ap.add_argument("--n-opened", type=int, default=3)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets.merkle_tree import MerkleTreeCS, MerkleTreeTrace

    random.seed(0)
    n = 1 << args.log_n_leaves
    leaves = [bytes(random.getrandbits(8) for _ in range(32)) for _ in range(n)]
    opened = random.sample(range(n), args.n_opened)
    print(f"merkle_tree: proving {args.n_opened} inclusions in a "
          f"{n}-leaf tree on {jax.devices()[0]}")

    t0 = time.perf_counter()
    trace = MerkleTreeTrace.generate(7, leaves, opened)
    m3 = M3ConstraintSystem()
    cs = MerkleTreeCS(m3)
    sizes = cs.table_sizes(trace)
    core, omap = m3.compile_sizes(sizes)
    wi = WitnessIndex.with_sizes(m3, sizes)
    cs.fill_tables(trace, wi)
    witness = wi.to_core_witness(core, omap)
    boundaries = cs.make_boundaries(trace)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    validate_witness(core, witness, boundaries)
    t2 = time.perf_counter()
    print(f"validate-time: {(t2 - t1) * 1e3:.1f} ms")

    proof = csp.prove(core, witness, boundaries,
                      log_inv_rate=args.log_inv_rate, table_sizes=sizes)
    t3 = time.perf_counter()
    print(f"prove-time: {(t3 - t2) * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    csp.verify(core, proof, boundaries,
               log_inv_rate=args.log_inv_rate, table_sizes=sizes)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
