"""Lookedup Keccak-f example (counterpart of `examples/keccak_lookups.rs`).

Proves 2^log_n_permutations Keccak-f[1600] permutations with chi enforced
through the bit-AND lookup channel (zero zerocheck constraints; the
nonlinearity lives in the grand product). Usage:
    python examples/keccak_lookups.py --log-n-permutations 3 [--cpu]
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
    ap.add_argument("--log-n-permutations", type=int, default=1)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    ap.add_argument("--skip-prove", action="store_true")
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets.keccak import KeccakLookedupCS, keccak_f

    random.seed(0)
    n = 1 << args.log_n_permutations
    print(f"keccak_lookups: proving {n} permutations on {jax.devices()[0]}")

    t0 = time.perf_counter()
    m3 = M3ConstraintSystem()
    cs = KeccakLookedupCS.build(m3, args.log_n_permutations)
    sizes = cs.table_sizes(n)
    core, omap = m3.compile_sizes(sizes)
    wi = WitnessIndex.with_sizes(m3, sizes)
    rows = [[random.getrandbits(64) for _ in range(25)] for _ in range(n)]
    outs = cs.populate(wi, rows)
    assert outs[0] == keccak_f(rows[0])
    witness = wi.to_core_witness(core, omap)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    validate_witness(core, witness)
    t2 = time.perf_counter()
    print(f"validate-time: {(t2 - t1) * 1e3:.1f} ms")
    if args.skip_prove:
        return
    proof = csp.prove(core, witness, log_inv_rate=args.log_inv_rate,
                      table_sizes=sizes)
    t3 = time.perf_counter()
    print(f"prove-time: {(t3 - t2) * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    csp.verify(core, proof, log_inv_rate=args.log_inv_rate, table_sizes=sizes)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
