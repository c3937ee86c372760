"""Persistent XLA compilation cache setup.

The cache lives INSIDE the repo (`.cache/jax_{tpu,cpu}` next to the package,
gitignored) rather than /tmp: this box reboots between working sessions and
/tmp is wiped, which silently turns every "warm" TPU run into a full remote
recompile (round 4 lost ~3 h to exactly that). The CPU cache is only safe
together with a pinned ISA (`--xla_cpu_max_isa=AVX2`, see CLAUDE.md) — the
caller is responsible for the flag; `tests/conftest.py` and the example CLIs
set it.

Env override: BINIUS_JAX_CACHE_DIR (a root under which tpu/ and cpu/ are
created).
"""

from __future__ import annotations

import os


def cache_dir(kind: str) -> str:
    """kind: 'tpu' | 'cpu'."""
    root = os.environ.get("BINIUS_JAX_CACHE_DIR")
    if not root:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        root = os.path.join(os.path.dirname(pkg), ".cache")
    d = os.path.join(root, f"jax_{kind}")
    os.makedirs(d, exist_ok=True)
    return d


def setup(kind: str) -> None:
    """Point jax's persistent compilation cache at the repo-local dir."""
    import jax

    d = cache_dir(kind)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
