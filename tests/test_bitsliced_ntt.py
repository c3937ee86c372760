"""Bitsliced NTT vs the packed device path and the host scalar oracle.

The packed path (`AdditiveNTT.forward/inverse`) is itself validated against a
novel-basis evaluation oracle in test_ntt.py, so it serves as the fast oracle
here. The plane machinery is generic in the twiddle tower level, so the
structural matrix runs at tl=3 (B8 domain: the Karatsuba network is ~120 ops
per stage instead of ~1000, keeping XLA:CPU compiles cheap); one tl=5 case
compiles the production-size network, and the B128-data case (the FRI commit
configuration) is TPU-gated. The Pallas kernel runs hermetically via
interpret mode (same trace the TPU compiles, minus Mosaic)."""

import os

import jax
import numpy as np
import pytest

from binius_tpu.fields import bitslice, tower
from binius_tpu.ntt import bitsliced_ntt
from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain


def _rand(level, n, seed):
    rng = np.random.default_rng(seed)
    if tower.has_limb_dim(level):
        return tower.from_numpy(level, rng.integers(
            0, 2**32, size=(n, 1 << (level - 5)), dtype=np.uint32))
    mask = np.uint32(0xFFFFFFFF if level == 5 else (1 << (1 << level)) - 1)
    return tower.from_numpy(
        level, rng.integers(0, 2**32, size=n, dtype=np.uint32) & mask)


CASES = [
    # (dl, tl, log_x, log_y, log_z, coset, coset_bits, skip, inverse)
    (3, 3, 0, 8, 0, 0, 0, 0, False),      # intra-word only
    (3, 3, 0, 8, 0, 0, 0, 0, True),
    (3, 3, 4, 7, 0, 0, 0, 0, False),      # word + lane pairing
    (3, 3, 4, 7, 0, 0, 0, 0, True),
    (3, 3, 6, 8, 0, 0, 0, 0, False),      # + sublane pairing
    (3, 3, 2, 6, 2, 0, 0, 0, False),      # z batch
    (3, 3, 2, 7, 0, 1, 1, 0, False),      # coset
    (3, 3, 0, 8, 0, 0, 0, 2, False),      # skip_rounds
    (3, 3, 0, 8, 0, 0, 0, 1, True),
    (4, 3, 3, 8, 0, 0, 0, 0, False),      # dl > tl: group-wise scale
    (4, 3, 3, 7, 0, 1, 1, 1, True),
]

# The production-size B32 network (rs_encode config): XLA:CPU takes ~6 min to
# compile and ~2 min to run the 12k-op graph (it neither fuses nor
# multithreads it well), so these run opt-in / on TPU where the path is
# actually enabled. Structural coverage above is tl-generic; the tl=5
# network itself is tested in test_bitslice.py.
SLOW_CASES = [
    (5, 5, 0, 12, 0, 0, 0, 1, False),
    (5, 5, 0, 12, 0, 0, 0, 0, True),
]
if os.environ.get("BINIUS_SLOW_TESTS") or jax.default_backend() in ("tpu",
                                                                    "axon"):
    CASES = CASES + SLOW_CASES


@pytest.mark.parametrize("dl,tl,log_x,log_y,log_z,coset,coset_bits,skip,inv",
                         CASES)
def test_vs_packed(dl, tl, log_x, log_y, log_z, coset, coset_bits, skip, inv):
    n = 1 << (log_x + log_y + log_z)
    dom = NTTDomain.create(tl, log_y + coset_bits)
    ntt = AdditiveNTT(dom)
    data = _rand(dl, n, seed=dl * 100 + log_y + log_x)
    kw = dict(coset=coset, coset_bits=coset_bits, skip_rounds=skip)
    want = (ntt.inverse if inv else ntt.forward)(
        data, dl, (log_x, log_y, log_z), **kw)
    got = bitsliced_ntt.transform(dom, data, dl, (log_x, log_y, log_z),
                                  inverse=inv, use_pallas=False, **kw)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


PALLAS_CASES = [
    # log_x=6, log_y=8 at tl=3: one fused kernel covering intra-word,
    # lane-roll and sublane-roll pairing in the same grid step
    (3, 3, 6, 8, False),
    (3, 3, 6, 8, True),
    (4, 3, 5, 8, False),
]


@pytest.mark.parametrize("dl,tl,log_x,log_y,inv", PALLAS_CASES)
def test_pallas_interpret_vs_xla(dl, tl, log_x, log_y, inv):
    n = 1 << (log_x + log_y)
    dom = NTTDomain.create(tl, log_y)
    data = _rand(dl, n, seed=9)
    planes = bitslice.to_bitsliced(dl, data)
    ref = bitsliced_ntt.transform_planes(dom, planes, dl, (log_x, log_y, 0),
                                         inverse=inv, use_pallas=False)
    got = bitsliced_ntt.transform_planes(dom, planes, dl, (log_x, log_y, 0),
                                         inverse=inv, use_pallas=True,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("inv", [False, True])
def test_pallas_pair_kernel_interpret(inv, monkeypatch):
    # shrink the tile budget so the top stage exceeds the local-kernel cap
    # and routes through the paired-block kernel (d_w = LANE)
    from binius_tpu.ntt import bitsliced_ntt as bn
    monkeypatch.setattr(bn, "_TILE_BYTES", 1 << 13)
    monkeypatch.setattr(bn, "_PLAN_CACHE", {})
    monkeypatch.setattr(bn, "_DEV_TW_CACHE", {})
    dl, tl, log_x, log_y = 3, 3, 6, 8
    n = 1 << (log_x + log_y)
    dom = NTTDomain.create(tl, log_y)
    data = _rand(dl, n, seed=21)
    planes = bitslice.to_bitsliced(dl, data)
    plan, _ = bn._make_plan(dom, dl, (log_x, log_y, 0), 0, 0, 0, inv)
    assert plan.n_local < len(plan.stages), "no cross stage exercised"
    assert any((st.d_elems >> 5) % bn.LANE == 0
               for st in (plan.stages[plan.n_local:] if inv
                          else plan.stages[:len(plan.stages) - plan.n_local]))
    ref = bn.transform_planes(dom, planes, dl, (log_x, log_y, 0),
                              inverse=inv, use_pallas=False)
    got = bn.transform_planes(dom, planes, dl, (log_x, log_y, 0),
                              inverse=inv, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_round_trip():
    n = 1 << 8
    dom = NTTDomain.create(3, 8)
    data = _rand(3, n, seed=3)
    fwd = bitsliced_ntt.transform(dom, data, 3, (0, 8, 0), use_pallas=False)
    back = bitsliced_ntt.transform(dom, fwd, 3, (0, 8, 0), inverse=True,
                                   use_pallas=False)
    np.testing.assert_array_equal(np.asarray(data), np.asarray(back))


def test_vs_scalar_oracle():
    log_x, log_y = 2, 6
    n = 1 << (log_x + log_y)
    dom = NTTDomain.create(3, log_y)
    ntt = AdditiveNTT(dom)
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 256, size=n, dtype=np.uint32)
    data = tower.from_numpy(3, vals)
    got = np.asarray(bitsliced_ntt.transform(dom, data, 3, (log_x, log_y, 0),
                                             use_pallas=False))
    col = [int(vals[(y << log_x)]) for y in range(1 << log_y)]
    want = ntt.forward_scalar(col, 3, log_y)
    np.testing.assert_array_equal(got[:: 1 << log_x],
                                  np.asarray(want, dtype=np.uint32))


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="B128-data kernel (FRI commit config) needs Mosaic")
def test_b128_data_on_tpu():
    # the rs_encode configuration: B128 data over B32 twiddles
    dl, log_y = 7, 15
    n = 1 << log_y
    dom = NTTDomain.create(5, log_y)
    ntt = AdditiveNTT(dom)
    data = _rand(dl, n, seed=5)
    want = ntt.forward(data, dl, (2, log_y - 2, 0), skip_rounds=1,
                       bitsliced=False)
    got = bitsliced_ntt.transform(dom, data, dl, (2, log_y - 2, 0),
                                  skip_rounds=1, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
