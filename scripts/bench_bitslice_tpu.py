"""Micro-benchmark: bitsliced B128 multiply paths on the real chip.

Times (a) the bit-transpose round trip alone, (b) the jnp gate network
end-to-end (bitslice.mul), (c) the Pallas-fused network end-to-end
(bitslice_pallas.mul). Honest timing per CLAUDE.md: chain outputs, force a
host fetch.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from binius_tpu.utils.jax_cache import cache_dir as _binius_cache_dir
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from binius_tpu.fields import bitslice, tower  # noqa: E402


def timeit(fn, x, iters=10):
    out = fn(x)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    n = 1 << 20
    rng = np.random.default_rng(1)
    a = jax.device_put(tower.from_numpy(
        7, rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)))
    b = jax.device_put(tower.from_numpy(
        7, rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)))

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def roundtrip(level, x):
        return bitslice.from_bitsliced(level, bitslice.to_bitsliced(level, x))

    dt = timeit(lambda x: roundtrip(7, x), a)
    print(f"transpose roundtrip (in+out): {dt*1e3:.2f} ms  "
          f"({n/dt/1e6:.0f} Melem/s)")

    dt = timeit(lambda x: bitslice.mul(7, x, b), a)
    print(f"bitslice.mul e2e:             {dt*1e3:.2f} ms  "
          f"({n/dt/1e6:.0f} Melem/s)")

    try:
        from binius_tpu.fields import bitslice_pallas
        dt = timeit(lambda x: bitslice_pallas.mul(7, x, b), a)
        print(f"pallas mul e2e:               {dt*1e3:.2f} ms  "
              f"({n/dt/1e6:.0f} Melem/s)")

        a_bs = bitslice.to_bitsliced(7, a)
        b_bs = bitslice.to_bitsliced(7, b)
        dt = timeit(lambda x: bitslice_pallas.mul_planes(7, x, b_bs), a_bs)
        print(f"pallas network only:          {dt*1e3:.2f} ms  "
              f"({n/dt/1e6:.0f} Melem/s)")
        # correctness spot check vs jnp path
        got = bitslice_pallas.mul(7, a, b)
        want = bitslice.mul(7, a, b)
        ok = bool(jnp.all(got == want))
        print(f"pallas == jnp: {ok}")
    except Exception as e:
        print(f"pallas path failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
