"""Bitwise u32 ops example (counterpart of `examples/bitwise_ops.rs`).

Proves 2^log_n_ops rows of u32 AND/XOR/OR. Usage:
    python examples/bitwise_ops.py --log-n-ops 8
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
    ap.add_argument("--log-n-ops", type=int, default=5)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets import arith

    n = 1 << args.log_n_ops
    print(f"bitwise_ops: proving {n} rows of u32 AND/XOR/OR on {jax.devices()[0]}")

    m3 = M3ConstraintSystem()
    t = m3.add_table("bitwise")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    and_out = arith.u32_bitwise_and(t, "and", xin, yin)
    xor_out = arith.u32_bitwise_xor(t, "xor", xin, yin)
    or_out = arith.u32_bitwise_or(t, "or", xin, yin)
    core, omap = m3.compile([args.log_n_ops])

    t0 = time.perf_counter()
    wi = WitnessIndex(m3, [args.log_n_ops])
    tw = wi.table(0)
    import numpy as np
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    ys = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    tw.set_packed_ints(and_out, xs & ys)
    tw.set_packed_ints(xor_out, xs ^ ys)
    tw.set_packed_ints(or_out, xs | ys)
    witness = wi.to_core_witness(core, omap)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    validate_witness(core, witness)
    t2 = time.perf_counter()
    proof = csp.prove(core, witness, log_inv_rate=args.log_inv_rate)
    t3 = time.perf_counter()
    print(f"prove-time: {(t3 - t2) * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    csp.verify(core, proof, log_inv_rate=args.log_inv_rate)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
