"""Grøstl P-permutation example circuit (counterpart of `examples/groestl.rs`).

Proves 2^log_n_permutations Grøstl-256 P permutations. Usage:
    python examples/groestl.py --log-n-permutations 3 [--cpu]
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
    # sitecustomize pre-imports jax on the axon platform; env vars are too
    # late for platform choice, switch via config (see CLAUDE.md). The CPU
    # cache is safe only with the pinned ISA (tests/conftest.py).
    sys.argv.remove("--cpu")
    if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_cpu_max_isa=AVX2").strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
elif jax.default_backend() in ("tpu", "axon"):
    # persistent cache is safe only for TPU executables (see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n-permutations", type=int, default=3)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    ap.add_argument("--skip-prove", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="run the full witness semantic check before proving"
                         " (debug; host-materializes every column — skipped"
                         " by default above 2^16 rows where the fetch can"
                         " exhaust device memory)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove this many FRESH witnesses (run 1 pays compile"
                         "/cache loads; later runs are the honest warm number)")
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.hash.groestl import _permute
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets.groestl import Permutation

    random.seed(0)
    n = 1 << args.log_n_permutations
    print(f"groestl: proving {n} Grøstl P permutations on {jax.devices()[0]}")

    m3 = M3ConstraintSystem()
    t = m3.add_table("groestl_p")
    g = Permutation.build(t, "perm", "P")
    core, omap = m3.compile([args.log_n_permutations])

    def make_witness(rng):
        wi = WitnessIndex(m3, [args.log_n_permutations])
        states = [np.array([[rng.getrandbits(8) for _ in range(8)]
                            for _ in range(8)], dtype=np.uint8) for _ in range(n)]
        outs = g.populate(wi.table(0), states)
        assert np.array_equal(np.array(outs[0], dtype=np.uint8),
                              _permute(states[0], is_q=False))
        return wi.to_core_witness(core, omap)

    t0 = time.perf_counter()
    witness = make_witness(random)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    t2 = t1
    if args.validate or n < (1 << 14):
        validate_witness(core, witness)
        t2 = time.perf_counter()
        print(f"validate-time: {(t2 - t1) * 1e3:.1f} ms")
    if args.skip_prove:
        return
    for i in range(args.repeat):
        if i > 0:
            witness = make_witness(random)
        t2 = time.perf_counter()
        proof = csp.prove(core, witness, log_inv_rate=args.log_inv_rate)
        t3 = time.perf_counter()
        tag = "" if args.repeat == 1 else f"[{'first' if i == 0 else 'warm'}]"
        print(f"prove-time{tag}: {(t3 - t2) * 1e3:.1f} ms")
        for k, v in csp.last_phase_times.items():
            print(f"  prove.{k}: {v * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    t3 = time.perf_counter()
    csp.verify(core, proof, log_inv_rate=args.log_inv_rate)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
