"""SHA-256 compression example circuit (counterpart of `examples/sha256.rs`).

Proves 2^log_n_compressions SHA-256 compressions. Usage:
    python examples/sha256.py --log-n-compressions 3 [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n-compressions", type=int, default=3)
    ap.add_argument("--log-inv-rate", type=int, default=1)
    ap.add_argument("--skip-prove", action="store_true")
    args = ap.parse_args()

    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import validate_witness
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets.sha256 import Sha256

    random.seed(0)
    n = 1 << args.log_n_compressions
    print(f"sha256: proving {n} SHA-256 compressions on {jax.devices()[0]}")

    m3 = M3ConstraintSystem()
    t = m3.add_table("sha256")
    msg = [t.add_committed(f"m{i}", 0, 5) for i in range(16)]
    gadget = Sha256.build(t, "sha", msg)
    core, omap = m3.compile([args.log_n_compressions])

    t0 = time.perf_counter()
    wi = WitnessIndex(m3, [args.log_n_compressions])
    tw = wi.table(0)
    rows = [[random.getrandbits(32) for _ in range(16)] for _ in range(n)]
    for i, col in enumerate(msg):
        tw.set_packed_ints(col, [r[i] for r in rows])
    gadget.populate(tw, rows)
    witness = wi.to_core_witness(core, omap)
    t1 = time.perf_counter()
    print(f"trace-gen-time: {(t1 - t0) * 1e3:.1f} ms")

    validate_witness(core, witness)
    t2 = time.perf_counter()
    print(f"validate-time: {(t2 - t1) * 1e3:.1f} ms")
    if args.skip_prove:
        return
    proof = csp.prove(core, witness, log_inv_rate=args.log_inv_rate)
    t3 = time.perf_counter()
    print(f"prove-time: {(t3 - t2) * 1e3:.1f} ms")
    for k, v in csp.last_phase_times.items():
        print(f"  prove.{k}: {v * 1e3:.1f} ms")
    print(f"proof-size: {len(proof)} bytes")
    csp.verify(core, proof, log_inv_rate=args.log_inv_rate)
    t4 = time.perf_counter()
    print(f"verify-time: {(t4 - t3) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
