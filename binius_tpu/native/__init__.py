"""Native (C) host kernels: build-on-first-import via the system compiler,
loaded with ctypes. The device path stays JAX/XLA; this accelerates host
scalar algebra only (see b128.c). Disable with BINIUS_NO_NATIVE=1."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_LIB = None
_TRIED = False


def _build_and_load():
    here = os.path.dirname(os.path.abspath(__file__))
    srcs = [os.path.join(here, f) for f in ("b128.c", "groestl.c")]
    h = hashlib.sha256()
    for src in srcs:
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "binius_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"b128_{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, *srcs],
            check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    u64, p64 = ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)
    lib.tower_init.argtypes = []
    lib.tower_mul.argtypes = [ctypes.c_int, u64, u64, u64, u64, p64]
    lib.tower_square.argtypes = [ctypes.c_int, u64, u64, p64]
    lib.tower_invert.argtypes = [ctypes.c_int, u64, u64, p64]
    lib.tower_pow.argtypes = [ctypes.c_int, u64, u64, u64, p64]
    lib.tower_mul_batch.argtypes = [ctypes.c_int, p64, p64, p64, ctypes.c_size_t]
    lib.tower_dot_b128.argtypes = [p64, p64, ctypes.c_size_t, p64]
    lib.tower_barycentric_weights.argtypes = [p64, ctypes.c_size_t, p64]
    lib.tower_lagrange_evals.argtypes = [p64, p64, ctypes.c_size_t, u64, u64,
                                         p64, p64]
    p8 = ctypes.POINTER(ctypes.c_uint8)
    p32 = ctypes.POINTER(ctypes.c_int32)
    sz = ctypes.c_size_t
    lib.groestl_init.argtypes = [p64, p64, p64, p32, p32]
    lib.groestl_permute.argtypes = [p64, ctypes.c_int]
    lib.groestl_compress.argtypes = [p64, p64]
    lib.groestl_compress_seq.argtypes = [p64, p8, sz]
    lib.groestl_output_transform.argtypes = [p64, p8]
    lib.groestl_digest.argtypes = [p64, p8, sz, p8]
    lib.groestl_digest_batch.argtypes = [p64, p8, sz, sz, p8]
    lib.groestl_compress_pairs.argtypes = [p8, sz, p8]
    lib.groestl_tree_layers.argtypes = [p8, sz, p8]
    lib.tower_init()
    return lib


def get_lib():
    """The loaded native library, or None (no compiler / disabled)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("BINIUS_NO_NATIVE", "") in ("", "0"):
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
    return _LIB
