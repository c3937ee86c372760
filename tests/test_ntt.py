"""Additive NTT tests.

Ground truth: the mathematical definition — forward NTT = evaluations of the
novel-polynomial-basis polynomial over the subspace domain (DP24 §2.3),
computed directly on host ints. The butterfly implementations (host scalar and
TPU device) must match it, and inverse must round-trip.
"""

import random

import numpy as np
import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math.binary_subspace import BinarySubspace
from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain

random.seed(7)


def normalized_w_evals(level, basis, p, count):
    """[W-hat_0(p), ..., W-hat_{count-1}(p)] for subspace with `basis`."""
    out = []
    w = p           # unnormalized W_i(p)
    wb = list(basis)  # unnormalized W_i(beta_j) for j >= i
    for i in range(count):
        nc = wb[i]  # W_i(beta_i)
        out.append(scalar.mul(level, w, scalar.invert(level, nc)))
        w = scalar.mul(level, w, w ^ nc)
        wb = [scalar.mul(level, e, e ^ nc) for e in wb]
    return out


def novel_basis_eval(level, domain: NTTDomain, coeffs, log_y, coset, coset_bits):
    """Oracle: evaluate novel-basis poly at the coset points of S^(log_y+coset_bits)."""
    ell = domain.log_domain_size
    i_dim = log_y + coset_bits
    r = ell - i_dim
    if r == 0:
        sub_basis = list(domain.subspace.basis)
    else:
        sub_basis = [1] + list(domain.s_evals[r])
    sub_basis = sub_basis[:i_dim]
    out = []
    for y in range(1 << log_y):
        idx = (coset << log_y) | y
        p = 0
        for b in range(i_dim):
            if (idx >> b) & 1:
                p ^= sub_basis[b]
        ws = normalized_w_evals(level, sub_basis, p, log_y)
        acc = 0
        for k, c in enumerate(coeffs):
            term = c
            for i in range(log_y):
                if (k >> i) & 1:
                    term = scalar.mul(level, term, ws[i])
            acc ^= term
        out.append(acc)
    return out


@pytest.mark.parametrize("log_y,coset,coset_bits", [(4, 0, 0), (3, 1, 1), (3, 2, 2), (5, 3, 2)])
def test_forward_scalar_matches_novel_basis_oracle(log_y, coset, coset_bits):
    level = 5
    dom = NTTDomain.create(level, log_y + coset_bits + 1)
    ntt = AdditiveNTT(dom)
    coeffs = [random.getrandbits(32) for _ in range(1 << log_y)]
    got = ntt.forward_scalar(coeffs, level, log_y, coset, coset_bits)
    want = novel_basis_eval(level, dom, coeffs, log_y, coset, coset_bits)
    assert got == want


@pytest.mark.parametrize("level,log_y", [(5, 6), (4, 5), (6, 4), (7, 4)])
def test_device_forward_matches_scalar(level, log_y):
    dom = NTTDomain.create(level if level <= 6 else 7, log_y + 2)
    ntt = AdditiveNTT(dom)
    n = 1 << log_y
    coeffs = [random.getrandbits(scalar.bits(level)) for _ in range(n)]
    want = ntt.forward_scalar(coeffs, level, log_y, coset=1, coset_bits=2)
    got_dev = ntt.forward(tower.from_ints(level, coeffs), level, (0, log_y, 0),
                          coset=1, coset_bits=2)
    assert tower.to_ints(level, got_dev) == want


def test_device_roundtrip_and_batching():
    level, log_x, log_y, log_z = 5, 2, 5, 1
    dom = NTTDomain.create(level, log_y)
    ntt = AdditiveNTT(dom)
    n = 1 << (log_x + log_y + log_z)
    vals = [random.getrandbits(32) for _ in range(n)]
    data = tower.from_ints(level, vals)
    fwd = ntt.forward(data, level, (log_x, log_y, log_z))
    back = ntt.inverse(fwd, level, (log_x, log_y, log_z))
    assert tower.to_ints(level, back) == vals
    # batching semantics: column (x=1, z=0) transforms independently
    col = [vals[(y << log_x) | 1] for y in range(1 << log_y)]
    want_col = ntt.forward_scalar(col, level, log_y)
    got = tower.to_ints(level, fwd)
    got_col = [got[(y << log_x) | 1] for y in range(1 << log_y)]
    assert got_col == want_col


def test_skip_rounds():
    level, log_y = 5, 5
    dom = NTTDomain.create(level, log_y)
    ntt = AdditiveNTT(dom)
    vals = [random.getrandbits(32) for _ in range(1 << log_y)]
    want = ntt.forward_scalar(vals, level, log_y, skip_rounds=2)
    got = ntt.forward(tower.from_ints(level, vals), level, (0, log_y, 0), skip_rounds=2)
    assert tower.to_ints(level, got) == want
    # skip_rounds=log_y is identity
    same = ntt.forward(tower.from_ints(level, vals), level, (0, log_y, 0), skip_rounds=log_y)
    assert tower.to_ints(level, same) == vals


def test_cross_field_twiddles():
    """B32 twiddles acting on B128 data (the FRI fold configuration)."""
    tw_level, data_level, log_y = 5, 7, 4
    dom = NTTDomain.create(tw_level, log_y + 1)
    ntt = AdditiveNTT(dom)
    vals = [random.getrandbits(128) for _ in range(1 << log_y)]
    want = ntt.forward_scalar(vals, data_level, log_y, coset=1, coset_bits=1)
    got = ntt.forward(tower.from_ints(data_level, vals), data_level, (0, log_y, 0),
                      coset=1, coset_bits=1)
    assert tower.to_ints(data_level, got) == want


def test_twiddle_linearity():
    dom = NTTDomain.create(5, 8)
    # twiddle(i, a ^ b) == twiddle(i, a) ^ twiddle(i, b)  (F2-linearity)
    for i in [0, 2, 4]:
        a, b = random.getrandbits(3), random.getrandbits(3)
        assert dom.twiddle(i, a ^ b) == dom.twiddle(i, a) ^ dom.twiddle(i, b)
    # stage_twiddles_np matches scalar twiddle
    tws = dom.stage_twiddles_np(2, 4, high_bits=1)
    for j in range(16):
        assert int(tws[j]) == dom.twiddle(2, (1 << 4) | j)


@pytest.mark.parametrize("d,ell,coset_bits", [(3, 2, 2), (5, 3, 3), (1, 2, 1), (7, 1, 3)])
def test_odd_interpolate_recovers_coefficients(d, ell, coset_bits):
    """OddInterpolate vs the novel-basis evaluation oracle
    (`ntt/src/odd_interpolate.rs` tests' property): evaluate a random
    degree < d*2^ell polynomial on the first d cosets, interpolate, and
    recover the coefficients."""
    from binius_tpu.ntt.odd_interpolate import OddInterpolate

    level = 5
    dom = NTTDomain.create(level, ell + coset_bits)
    n = d << ell
    coeffs = [random.getrandbits(32) for _ in range(n)]
    padded = coeffs + [0] * ((1 << (ell + coset_bits)) - n)
    evals_full = novel_basis_eval(level, dom, padded, ell + coset_bits, 0, 0)
    evals = evals_full[:n]
    oi = OddInterpolate.create(dom, d, ell, coset_bits)
    assert oi.inverse_transform(evals) == coeffs
