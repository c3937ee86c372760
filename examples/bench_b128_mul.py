"""Microbench: B128 element-wise multiply — packed tower.mul (MXU path) vs
bitsliced VPU network (`fields/bitslice.py`) — on whatever backend is live.

Usage: python examples/bench_b128_mul.py [--cpu] [log_n]
"""

import os
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

import numpy as np

from binius_tpu.fields import bitslice, tower


def timeit(fn, a, b, iters=20):
    """Chain iterations through the output so every call has fresh inputs
    (the remote execution relay memoizes identical dispatches)."""
    out = fn(a, b)
    np.asarray(jax.device_get(out[:1]))  # block_until_ready is unreliable
    t0 = time.perf_counter()             # over the remote-execution tunnel;
    for _ in range(iters):               # a host fetch forces completion.
        out = fn(out, b)
    np.asarray(jax.device_get(out[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log_n
    rng = np.random.default_rng(1)
    a = tower.from_numpy(7, rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32))
    b = tower.from_numpy(7, rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32))
    a = jax.device_put(a)
    b = jax.device_put(b)

    jit_tower = jax.jit(lambda x, y: tower.mul(7, x, y))
    rows = [("tower.mul (packed/MXU)", jit_tower),
            ("bitslice.mul (VPU)", lambda x, y: bitslice.mul(7, x, y))]
    if jax.default_backend() in ("tpu", "axon"):
        from binius_tpu.fields import bitslice_pallas
        rows.append(("bitslice_pallas.mul", lambda x, y: bitslice_pallas.mul(7, x, y)))
    for name, fn in rows:
        t_c0 = time.perf_counter()
        dt = timeit(fn, a, b)
        print(f"{name:26s} n=2^{log_n}: {dt * 1e3:8.3f} ms warm "
              f"({n / dt / 1e6:9.2f} Melem/s; first-call {time.perf_counter() - t_c0:.1f}s)",
              flush=True)

    # sanity: same results
    got = tower.to_ints(7, bitslice.mul(7, a[:64], b[:64]))
    want = tower.to_ints(7, tower.mul(7, a[:64], b[:64]))
    assert got == want, "bitslice and tower multiply disagree"
    print("agreement check: OK")


if __name__ == "__main__":
    main()
