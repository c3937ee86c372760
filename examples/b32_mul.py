"""BinaryField32b multiplication example (counterpart of `examples/b32_mul.rs`).

Proves 2^log_n_muls B32 products c = a * b. Usage:
    python examples/b32_mul.py --log-n-muls 10
"""

import argparse
import os
import numpy as np
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n-muls", type=int, default=8)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    ap.add_argument("--validate", action="store_true",
                    help="run the full witness semantic check before proving"
                         " (debug; host-materializes every column — skipped"
                         " by default above 2^16 rows where the fetch can"
                         " exhaust device memory)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove this many FRESH witnesses (run 1 pays compile"
                         "/cache loads; later runs are the honest warm number)")
    args = ap.parse_args()

    from binius_tpu.constraint_system import oracle as om
    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import (ConstraintSet, ConstraintSystem,
                                                     validate_witness)
    from binius_tpu.fields import tower
    from binius_tpu.math.arith import ArithExpr

    n_vars = args.log_n_muls
    n = 1 << n_vars
    print(f"b32_mul: proving {n} B32 multiplications on {jax.devices()[0]}")

    oracles = om.OracleSet()
    a_id = oracles.add_committed(n_vars, 5, "a")
    b_id = oracles.add_committed(n_vars, 5, "b")
    c_id = oracles.add_committed(n_vars, 5, "c")
    A, B, C = (ArithExpr.var(i) for i in range(3))
    system = ConstraintSystem(
        oracles, [ConstraintSet(n_vars, (a_id, b_id, c_id), (A * B + C,))])

    def make_witness(seed):
        rng = np.random.default_rng(seed)
        A = tower.from_numpy(5, rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        B = tower.from_numpy(5, rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        C = tower.mul(5, A, B)  # product witness computed on device
        return {a_id: (5, A), b_id: (5, B), c_id: (5, C)}

    t0 = time.perf_counter()
    witness = make_witness(0)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    if args.validate or n <= (1 << 16):
        validate_witness(system, witness)
    for i in range(args.repeat):
        if i > 0:
            witness = make_witness(i)
        t2 = time.perf_counter()
        proof = csp.prove(system, witness, log_inv_rate=args.log_inv_rate)
        t3 = time.perf_counter()
        tag = "" if args.repeat == 1 else f"[{'first' if i == 0 else 'warm'}]"
        print(f"prove-time{tag}: {(t3 - t2) * 1e3:.1f} ms")
        for k, v in csp.last_phase_times.items():
            print(f"  prove.{k}: {v * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    t3 = time.perf_counter()
    csp.verify(system, proof, log_inv_rate=args.log_inv_rate)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
