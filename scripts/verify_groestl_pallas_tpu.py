"""On-chip equivalence + throughput for the fused Pallas Grøstl kernels.

Covers what the numpy-network tests cannot: pltpu.roll semantics and the
pallas grid/dslice plumbing. Run on the real chip:
    python scripts/verify_groestl_pallas_tpu.py [log_leaves]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
from binius_tpu.utils.jax_cache import cache_dir

if jax.default_backend() in ("tpu", "axon"):
    jax.config.update("jax_compilation_cache_dir", cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp
from binius_tpu.hash import groestl_bitslice as gb
from binius_tpu.hash import groestl_pallas as gp

log_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 12
rng = np.random.default_rng(0)

t0 = time.time()
d = jnp.asarray(rng.integers(0, 2**32, size=(1024, 8), dtype=np.uint32))
ref = np.asarray(jax.device_get(gb.pairs_kernel(d)))
got = np.asarray(jax.device_get(gp.pairs_kernel(d)))
ok = np.array_equal(ref, got)
print(f"pairs on-chip match: {ok} ({time.time()-t0:.1f}s)", flush=True)
assert ok

t0 = time.time()
cw = jnp.asarray(rng.integers(0, 2**32, size=(1 << 12, 4), dtype=np.uint32))
ref = np.asarray(jax.device_get(gb.leaf_hash_kernel(cw, 2, 64)))
got = np.asarray(jax.device_get(gp.leaf_hash_kernel(cw, 2, 64)))
ok = np.array_equal(ref, got)
print(f"leaf64 on-chip match: {ok} ({time.time()-t0:.1f}s)", flush=True)
assert ok

t0 = time.time()
cw = jnp.asarray(rng.integers(0, 2**32, size=(1 << 13, 4), dtype=np.uint32))
ref = np.asarray(jax.device_get(gb.leaf_hash_kernel(cw, 4, 256)))
got = np.asarray(jax.device_get(gp.leaf_hash_kernel(cw, 4, 256)))
ok = np.array_equal(ref, got)
print(f"leaf256 on-chip match: {ok} ({time.time()-t0:.1f}s)", flush=True)
assert ok

# throughput: 2^log_leaves leaves x 64 B, chained timing (bench.py recipe)
n = 1 << (log_leaves + 2)
x = jax.device_put(rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32))


def make_step(kern):
    @jax.jit
    def step(x):
        dd = kern(x, 2, 64).reshape(-1, 4)
        return jnp.concatenate([x[:dd.shape[0]] ^ dd, x[dd.shape[0]:]], axis=0)
    return step


for name, kern in (("xla", gb.leaf_hash_kernel), ("pallas", gp.leaf_hash_kernel)):
    step = make_step(kern)
    out = step(x)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = step(out)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {n * 16 / dt / 1e6:.1f} MB/s ({dt*1e3:.1f} ms)", flush=True)
print("ALL OK")
