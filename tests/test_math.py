"""Math layer tests: MLE evaluation, eq indicators, folds, arith exprs, domains."""

import random

import numpy as np
import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import arith, fold, mle, univariate

random.seed(99)


def rand_elems(level, n):
    return [random.getrandbits(scalar.bits(level)) for _ in range(n)]


def test_eq_expansion_matches_pointwise():
    lvl, k = 7, 4
    point = rand_elems(lvl, k)
    e = mle.eq_ind_partial_eval(lvl, tower.from_ints(lvl, point))
    vals = tower.to_ints(lvl, e)
    for j in range(1 << k):
        want = 1
        for i in range(k):
            term = point[i] if (j >> i) & 1 else point[i] ^ 1
            want = scalar.mul(lvl, want, term)
        assert vals[j] == want
    # partition of unity: sum of eq table = 1
    acc = 0
    for v in vals:
        acc ^= v
    assert acc == 1


@pytest.mark.parametrize("level", [0, 3, 5, 7])
def test_evaluate_at_vertex(level):
    n = 4
    data_ints = rand_elems(level, 1 << n)
    data = tower.from_ints(level, data_ints)
    for j in [0, 5, 15]:
        pt = [(j >> i) & 1 for i in range(n)]
        out_level, val = mle.evaluate(level, data, n, 7, tower.from_ints(7, pt))
        got = tower.to_ints(out_level, val[None] if val.ndim < 2 else val[None, :])[0]
        assert got == data_ints[j]


def test_partial_low_high_consistency():
    lvl, n = 5, 6
    data = tower.from_ints(lvl, rand_elems(lvl, 1 << n))
    point = rand_elems(7, n)
    p = tower.from_ints(7, point)
    # full evaluation
    _, full_val = mle.evaluate(lvl, data, n, 7, p)
    # low 3 then high... bind low 3 vars, then remaining 3 (now low)
    e_lo = mle.eq_ind_partial_eval(7, p[:3])
    l1, partial = mle.evaluate_partial_low(lvl, data, n, 7, e_lo, 3)
    _, v2 = mle.evaluate(l1, partial, 3, 7, p[3:])
    assert tower.to_ints(7, v2[None, :]) == tower.to_ints(7, full_val[None, :])
    # bind high 3 vars first
    e_hi = mle.eq_ind_partial_eval(7, p[3:])
    l2, partial_hi = mle.evaluate_partial_high(lvl, data, n, 7, e_hi, 3)
    _, v3 = mle.evaluate(l2, partial_hi, 3, 7, p[:3])
    assert tower.to_ints(7, v3[None, :]) == tower.to_ints(7, full_val[None, :])


def test_fold_matches_partial_eval():
    lvl, n = 7, 5
    data_ints = rand_elems(lvl, 1 << n)
    data = tower.from_ints(lvl, data_ints)
    r = rand_elems(7, 1)
    rr = tower.from_ints(7, r)[0]
    # fold_low == evaluate_partial_low with 1-var query
    e = mle.eq_ind_partial_eval(7, tower.from_ints(7, r))
    _, want = mle.evaluate_partial_low(lvl, data, n, 7, e, 1)
    _, got = fold.fold_low(lvl, data, n, 7, rr)
    assert tower.to_ints(7, got) == tower.to_ints(7, want)
    # fold_high == evaluate_partial_high with 1-var query
    _, want_h = mle.evaluate_partial_high(lvl, data, n, 7, e, 1)
    _, got_h = fold.fold_high(lvl, data, n, 7, rr)
    assert tower.to_ints(7, got_h) == tower.to_ints(7, want_h)


def test_fold_subfield_promotion():
    lvl, n = 0, 4  # B1 data folded with B128 challenge
    data_ints = [random.getrandbits(1) for _ in range(1 << n)]
    data = tower.from_ints(lvl, data_ints)
    r = rand_elems(7, 1)
    out_level, got = fold.fold_low(lvl, data, n, 7, tower.from_ints(7, r)[0])
    assert out_level == 7
    for j in range(1 << (n - 1)):
        e0, e1 = data_ints[2 * j], data_ints[2 * j + 1]
        want = e0 ^ scalar.mul(7, e0 ^ e1, r[0])
        assert tower.to_ints(7, got)[j] == want


def test_arith_expr():
    x, y = arith.ArithExpr.var(0), arith.ArithExpr.var(1)
    c = arith.ArithExpr.const(0x2D, 3)
    e = x * y + c * x + y ** 3
    assert e.degree() == 3
    assert e.n_vars() == 2
    assert e.binary_tower_level() == 3
    a, b = rand_elems(7, 8), rand_elems(7, 8)
    got = tower.to_ints(7, e.evaluate(7, [tower.from_ints(7, a), tower.from_ints(7, b)]))
    for i in range(8):
        want = scalar.mul(7, a[i], b[i]) ^ scalar.mul(7, 0x2D, a[i]) ^ scalar.pow(7, b[i], 3)
        assert got[i] == want
        assert e.evaluate_scalar(7, [a[i], b[i]]) == want


def test_evaluation_domain_roundtrip():
    dom = univariate.EvaluationDomain.from_subspace(3, 5)
    assert dom.points == (0, 1, 2, 3, 4)
    vals = rand_elems(7, 5)
    coeffs = dom.interpolate(7, vals)
    for p, v in zip(dom.points, vals):
        assert univariate.evaluate_univariate(7, coeffs, p) == v
    z = rand_elems(7, 1)[0]
    assert dom.extrapolate(7, vals, z) == univariate.evaluate_univariate(7, coeffs, z)


def test_extrapolate_line():
    lvl = 7
    x0, x1, z = (rand_elems(lvl, 1)[0] for _ in range(3))
    want = univariate.extrapolate_line_scalar(lvl, x0, x1, z)
    got = fold.extrapolate_line(
        lvl,
        tower.from_ints(lvl, [x0]),
        tower.from_ints(lvl, [x1]),
        tower.from_ints(lvl, [z])[0],
    )
    assert tower.to_ints(lvl, got) == [want]
    # z=0 -> x0, z=1 -> x1
    assert univariate.extrapolate_line_scalar(lvl, x0, x1, 0) == x0
    assert univariate.extrapolate_line_scalar(lvl, x0, x1, 1) == x1


def test_eq_ind_function():
    lvl, k = 7, 3
    x, y = rand_elems(lvl, k), rand_elems(lvl, k)
    got = mle.eq_ind(lvl, tower.from_ints(lvl, x), tower.from_ints(lvl, y))
    want = 1
    for i in range(k):
        want = scalar.mul(lvl, want, scalar.mul(lvl, x[i], y[i]) ^ scalar.mul(lvl, x[i] ^ 1, y[i] ^ 1))
    assert tower.to_ints(lvl, got[None, :])[0] == want


def test_fold_middle_matches_scalar():
    """fold_middle vs per-index host dot products (`fold.rs:189-240`)."""
    import random as _r

    from binius_tpu.fields import scalar, tower
    from binius_tpu.math import fold, mle

    rng = _r.Random(53)
    n, k, start = 6, 2, 3
    vals = [rng.getrandbits(128) for _ in range(1 << n)]
    q = [rng.getrandbits(128) for _ in range(k)]
    eq = mle.eq_ind_partial_eval(7, tower.from_ints(7, q))
    _, out = fold.fold_middle(7, tower.from_ints(7, vals), n, 7, eq, k, start)
    got = tower.to_ints(7, out)
    eq_ints = tower.to_ints(7, eq)
    for j in range(1 << (n - k - start)):
        for i in range(1 << start):
            want = 0
            for qi in range(1 << k):
                idx = (j << (start + k)) | (qi << start) | i
                want ^= scalar.mul(7, eq_ints[qi], vals[idx])
            assert got[(j << start) | i] == want


def test_select_row_tower_basis_disjoint_product():
    import random as _r

    from binius_tpu.fields import scalar, tower
    from binius_tpu.protocols.transparent import (DisjointProduct, SelectRow,
                                                  StepDown, TowerBasis)

    rng = _r.Random(54)
    sr = SelectRow(4, 11)
    lvl, data = sr.mle()
    vals = tower.to_ints(lvl, data)
    assert vals == [1 if i == 11 else 0 for i in range(16)]
    # evaluate_scalar agrees with the MLE folded at a random point
    q = [rng.getrandbits(128) for _ in range(4)]
    want = 0
    for i, v in enumerate(vals):
        term = v
        for kk in range(4):
            term = scalar.mul(7, term, q[kk] if (i >> kk) & 1 else q[kk] ^ 1)
        want ^= term
    assert sr.evaluate_scalar(q) == want

    tb = TowerBasis(kappa=3, iota=2)
    lvl, data = tb.mle()
    assert tower.to_ints(lvl, data) == [1 << (v << 2) for v in range(8)]
    q = [rng.getrandbits(128) for _ in range(3)]
    want = 0
    for v in range(8):
        term = 1 << (v << 2)
        for kk in range(3):
            term = scalar.mul(7, term, q[kk] if (v >> kk) & 1 else q[kk] ^ 1)
        want ^= term
    assert tb.evaluate_scalar(q) == want

    dp = DisjointProduct(SelectRow(2, 1), StepDown(3, 5))
    assert dp.n_vars == 5
    lvl, data = dp.mle()
    vals = tower.to_ints(lvl, data)
    for idx in range(32):
        lo, hi = idx & 3, idx >> 2
        assert vals[idx] == (1 if (lo == 1 and hi < 5) else 0)
    q = [rng.getrandbits(128) for _ in range(5)]
    want = SelectRow(2, 1).evaluate_scalar(q[:2])
    want = scalar.mul(7, want, StepDown(3, 5).evaluate_scalar(q[2:]))
    assert dp.evaluate_scalar(q) == want
