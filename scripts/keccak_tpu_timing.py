"""On-chip keccak prove timing: cold-process vs warm-in-process, per phase.

Proves 2^log_n Keccak-f permutations twice in one process on the default
(TPU) backend; the second prove is the honest warm number (the first pays
persistent-cache executable loads + jit tracing; see CLAUDE.md). Phase
breakdown prints via BINIUS_TRACE_PHASES=1.

Usage: python scripts/keccak_tpu_timing.py [log_n] [--device-merkle]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("BINIUS_TRACE_PHASES", "1")
if "--device-merkle" in sys.argv:
    sys.argv.remove("--device-merkle")
    os.environ["BINIUS_DEVICE_MERKLE"] = "1"

import jax
from binius_tpu.utils.jax_cache import cache_dir as _binius_cache_dir

jax.config.update("jax_compilation_cache_dir", _binius_cache_dir("tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 6

from binius_tpu.utils import tracing
tracing.install_compile_counter()

from binius_tpu.constraint_system import prove as csp
from binius_tpu.m3.builder.table import M3ConstraintSystem
from binius_tpu.m3.builder.witness import WitnessIndex
from binius_tpu.m3.gadgets.keccak import KeccakF

random.seed(0)
n = 1 << LOG_N
print(f"keccak 2^{LOG_N} on {jax.devices()[0]}", flush=True)

m3 = M3ConstraintSystem()
t = m3.add_table("keccak")
state_in = [t.add_committed(f"in{i}", 0, 6) for i in range(25)]
gadget = KeccakF.build(t, "kf", state_in)
core, omap = m3.compile([LOG_N])

def make_witness(seed):
    rng = random.Random(seed)
    wi = WitnessIndex(m3, [LOG_N])
    tw = wi.table(0)
    rows = [[rng.getrandbits(64) for _ in range(25)] for _ in range(n)]
    gadget.populate(tw, rows)
    return wi.to_core_witness(core, omap)


t0 = time.perf_counter()
witnesses = [make_witness(s) for s in (0, 1)]
print(f"trace-gen x2 {time.perf_counter()-t0:.1f}s", flush=True)

# Distinct witnesses per prove: the axon relay memoizes identical dispatches,
# and a repeat prove of the SAME witness is fully deterministic (same
# transcript, same challenges) — its dispatches could be served from the
# memo and under-report the warm time (ADVICE r04).
for tag, witness in zip(("first(incl. cache loads + tracing)", "warm"),
                        witnesses):
    t0 = time.perf_counter()
    proof = csp.prove(core, witness, log_inv_rate=1)
    print(f"prove[{tag}] {time.perf_counter()-t0:.1f}s  "
          f"proof {len(proof)} B", flush=True)

for tag in ("first", "warm"):
    t0 = time.perf_counter()
    csp.verify(core, proof, log_inv_rate=1)
    print(f"verify[{tag}] {time.perf_counter()-t0:.1f}s", flush=True)

cs = tracing.compile_stats()
print(f"compile budget: {cs['count']} XLA compiles, {cs['secs']:.1f}s "
      f"(cache hits excluded)", flush=True)
