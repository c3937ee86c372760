"""Fused Pallas Grøstl network vs the XLA bitsliced oracle.

The network helpers are xp-generic; running them with xp=np executes the
IDENTICAL gate/roll/mask code the pallas kernel traces, in milliseconds and
with no XLA compile (jitting or interpreting the ~10k-op kernel graph on
XLA:CPU takes >90 min — measured, do not re-attempt). What numpy cannot
cover — pltpu.roll direction and the pallas grid/dslice plumbing — is
checked on the real chip by `scripts/verify_groestl_pallas_tpu.py`.
"""

import numpy as np
import pytest

from binius_tpu.hash import groestl_bitslice as gb
from binius_tpu.hash import groestl_pallas as gp


def test_pairs_network_matches_bitsliced():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
    ref = np.asarray(gb.pairs_kernel(jnp.asarray(d)))
    got = gp.pairs_np(d)
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("log_coset,limbs", [(0, 16), (2, 4), (4, 4)])
def test_leaf_network_matches_bitsliced(log_coset, limbs):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 1 << (7 + log_coset)
    cw = rng.integers(0, 2**32, size=(n, limbs), dtype=np.uint32)
    blob_len = (limbs * 4) << log_coset
    ref = np.asarray(gb.leaf_hash_kernel(jnp.asarray(cw), log_coset, blob_len))
    got = gp.leaf_hash_np(cw, log_coset, blob_len)
    assert np.array_equal(ref, got)


def test_pairs_network_matches_spec_digest():
    """Independent oracle: the host T-table/native Grøstl compression."""
    from binius_tpu.hash.groestl import compress_pairs

    rng = np.random.default_rng(2)
    d = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    digests = np.ascontiguousarray(d).view("<u4")
    got = gp.pairs_np(digests)
    got_bytes = (np.ascontiguousarray(got.astype("<u4"))
                 .view(np.uint8).reshape(-1, 32))
    want = compress_pairs(d.reshape(32, 64))
    assert np.array_equal(got_bytes, np.asarray(want))
