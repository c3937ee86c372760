"""Benchmark entry point (driver runs this on real TPU hardware).

Round-1 metric: additive-NTT Reed-Solomon encoding throughput (the prover's
commit-phase hot loop, reference `crates/ntt/` + `reed_solomon/`): B32
elements transformed per second at log_y=18 with an interleaved batch of 4
(2^20 total elements per transform).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/binius_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from binius_tpu.fields import tower
    from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain

    log_x, log_y = 2, 18
    n = 1 << (log_x + log_y)
    ntt = AdditiveNTT(NTTDomain.create(5, log_y))
    rng = np.random.default_rng(7)
    data = tower.from_numpy(5, rng.integers(0, 2**32, size=n, dtype=np.uint32))

    out = ntt.forward(data, 5, (log_x, log_y, 0))
    out.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt.forward(data, 5, (log_x, log_y, 0))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    value = n / dt / 1e6
    print(json.dumps({
        "metric": "additive_ntt_b32_encode_throughput",
        "value": round(value, 2),
        "unit": "Melem/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
