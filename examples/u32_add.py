"""u32 addition example circuit (counterpart of `examples/u32_add.rs`).

Proves 2^log_n_adds u32 additions. Usage:
    python examples/u32_add.py --log-n-adds 8 --log-inv-rate 1
"""

import argparse
import os
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
    ap.add_argument("--log-n-adds", type=int, default=5)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    ap.add_argument("--validate", action="store_true",
                    help="run the full witness semantic check before proving"
                         " (debug; host-materializes every column — skipped"
                         " by default above 2^16 rows where the fetch can"
                         " exhaust device memory)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove this many FRESH witnesses (run 1 pays compile"
                         "/cache loads; later runs are the honest warm number"
                         " — identical args would let the relay memoize)")
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets import arith

    n = 1 << args.log_n_adds
    print(f"u32_add: proving {n} u32 additions on {jax.devices()[0]}")

    m3 = M3ConstraintSystem()
    t = m3.add_table("u32add")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    adder = arith.U32Add.build(t, "add", xin, yin)
    core, omap = m3.compile([args.log_n_adds])

    import numpy as np

    def make_witness(seed):
        wi = WitnessIndex(m3, [args.log_n_adds])
        tw = wi.table(0)
        rng = np.random.default_rng(seed)
        xs = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
        ys = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
        tw.set_packed_ints(xin, xs)
        tw.set_packed_ints(yin, ys)
        adder.populate(tw, xs, ys)
        return wi.to_core_witness(core, omap)

    t0 = time.perf_counter()
    witness = make_witness(0)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    if args.validate or (1 << args.log_n_adds) <= (1 << 16):
        validate_witness(core, witness)
    for i in range(args.repeat):
        if i > 0:
            witness = make_witness(i)
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
