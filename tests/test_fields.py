"""Tower field tests: JAX device ops vs scalar ground truth + algebra laws.

Mirrors the reference's field test strategy (packed-vs-scalar consistency,
property tests — SURVEY.md §4, `crates/field/src/tests.rs`).
"""

import random

import numpy as np
import pytest

from binius_tpu.fields import scalar, tower

random.seed(1234)

LEVELS = [0, 1, 2, 3, 4, 5, 6, 7]
N = 64


def rand_ints(level, n=N):
    return [random.getrandbits(scalar.bits(level)) for _ in range(n)]


@pytest.mark.parametrize("level", LEVELS)
def test_roundtrip(level):
    vals = rand_ints(level)
    arr = tower.from_ints(level, vals)
    assert tower.to_ints(level, arr) == vals


@pytest.mark.parametrize("level", LEVELS)
def test_mul_matches_scalar(level):
    a, b = rand_ints(level), rand_ints(level)
    got = tower.to_ints(level, tower.mul(level, tower.from_ints(level, a), tower.from_ints(level, b)))
    want = [scalar.mul(level, x, y) for x, y in zip(a, b)]
    assert got == want


@pytest.mark.parametrize("level", LEVELS)
def test_square_invert(level):
    a = [v or 1 for v in rand_ints(level)]
    arr = tower.from_ints(level, a)
    assert tower.to_ints(level, tower.square(level, arr)) == [scalar.square(level, v) for v in a]
    inv = tower.invert(level, arr)
    assert tower.to_ints(level, tower.mul(level, arr, inv)) == [1] * len(a)


@pytest.mark.parametrize("level", LEVELS)
def test_invert_zero_convention(level):
    z = tower.zeros(level, (3,))
    assert tower.to_ints(level, tower.invert(level, z)) == [0, 0, 0]


@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_mul_alpha(level):
    a = rand_ints(level)
    alpha = 1 << (1 << (level - 1))  # X_level encoding
    got = tower.to_ints(level, tower.mul_alpha(level, tower.from_ints(level, a)))
    want = [scalar.mul(level, v, alpha) for v in a]
    assert got == want


@pytest.mark.parametrize("level", LEVELS)
def test_algebra_laws(level):
    a, b, c = (rand_ints(level, 16) for _ in range(3))
    A, B, C = (tower.from_ints(level, v) for v in (a, b, c))
    m = tower.mul
    # commutativity, associativity, distributivity
    assert tower.to_ints(level, m(level, A, B)) == tower.to_ints(level, m(level, B, A))
    assert tower.to_ints(level, m(level, m(level, A, B), C)) == tower.to_ints(level, m(level, A, m(level, B, C)))
    lhs = m(level, A, tower.add(level, B, C))
    rhs = tower.add(level, m(level, A, B), m(level, A, C))
    assert tower.to_ints(level, lhs) == tower.to_ints(level, rhs)


@pytest.mark.parametrize("sub,lvl", [(0, 3), (3, 5), (3, 7), (5, 6), (5, 7), (6, 7), (4, 6)])
def test_embed_is_homomorphism(sub, lvl):
    a, b = rand_ints(sub, 16), rand_ints(sub, 16)
    A = tower.embed(sub, lvl, tower.from_ints(sub, a))
    B = tower.embed(sub, lvl, tower.from_ints(sub, b))
    got = tower.to_ints(lvl, tower.mul(lvl, A, B))
    want = [scalar.mul(sub, x, y) for x, y in zip(a, b)]
    assert got == want


@pytest.mark.parametrize("sub,lvl", [(0, 5), (3, 5), (3, 7), (5, 7), (6, 7), (2, 4)])
def test_split_join_subfield(sub, lvl):
    a = rand_ints(lvl, 8)
    A = tower.from_ints(lvl, a)
    coeffs = tower.split_to_subfield(lvl, sub, A)
    back = tower.join_from_subfield(lvl, sub, coeffs)
    assert tower.to_ints(lvl, back) == a
    # coefficient values match integer bit-slices
    n = 1 << (lvl - sub)
    sb = 1 << sub
    for i, v in enumerate(a):
        want = [(v >> (j * sb)) & ((1 << sb) - 1) for j in range(n)]
        if sub <= 5:
            got = [int(x) for x in np.asarray(coeffs)[i]]
        else:
            got = tower.to_ints(sub, np.asarray(coeffs)[i])
        assert got == want


def test_pack_unpack_b1():
    packed = tower.from_ints(5, rand_ints(5, 8))  # 8 words = 256 bits
    bits = tower.unpack_b1(packed)
    assert tower.to_ints(5, tower.pack_b1(bits)) == tower.to_ints(5, packed)


@pytest.mark.parametrize("level", [3, 5, 7])
def test_inner_product(level):
    a, b = rand_ints(level, 16), rand_ints(level, 16)
    got = tower.to_ints(level, tower.inner_product(level, tower.from_ints(level, a), tower.from_ints(level, b), axis=0))[0]
    want = 0
    for x, y in zip(a, b):
        want ^= scalar.mul(level, x, y)
    assert got == want


@pytest.mark.parametrize("level", [3, 5, 7])
def test_apply_bitmatrix_matches_mul(level):
    c = random.getrandbits(scalar.bits(level)) or 1
    cols = scalar.mul_matrix(level, c)
    a = rand_ints(level, 16)
    A = tower.from_ints(level, a)
    got = tower.to_ints(level, tower.apply_bitmatrix(level, cols, A))
    want = [scalar.mul(level, c, v) for v in a]
    assert got == want


def test_pow_int():
    a = rand_ints(5, 8)
    A = tower.from_ints(5, a)
    assert tower.to_ints(5, tower.pow_int(5, A, 7)) == [scalar.pow(5, v, 7) for v in a]


def test_native_scalar_matches_python():
    """The C host kernel (native/b128.c) against the pure-Python ground
    truth, all levels, including inverse/pow round trips."""
    import random as _r

    from binius_tpu import native as native_mod
    from binius_tpu.fields import scalar as sc

    if native_mod.get_lib() is None:
        import pytest
        pytest.skip("no C compiler available")
    rng = _r.Random(99)
    ops = sc._make_native_ops()
    n_mul, n_square, n_invert, n_pow = ops
    for level in range(8):
        nb = 1 << level
        for _ in range(200):
            a = rng.getrandbits(nb)
            b = rng.getrandbits(nb)
            assert n_mul(level, a, b) == sc.mul_py(level, a, b)
            assert n_square(level, a) == sc.square_py(level, a)
            if a:
                inv = n_invert(level, a)
                assert inv == sc.invert_py(level, a)
                assert sc.mul_py(level, a, inv) == 1
            e = rng.getrandbits(32)
            assert n_pow(level, a, e) == sc.pow_py(level, a, e)


def test_scale_subfield_matches_mul():
    """scale_subfield == mul(embed(x), y) across (sub_level, level) pairs."""
    import random as _r

    from binius_tpu.fields import scalar as sc
    from binius_tpu.fields import tower as tw

    rng = _r.Random(123)
    for sub in range(0, 7):
        for lvl in range(sub, 8):
            n = 32
            xs = [rng.getrandbits(1 << sub) for _ in range(n)]
            ys = [rng.getrandbits(1 << lvl) for _ in range(n)]
            xd = tw.from_ints(sub, xs)
            yd = tw.from_ints(lvl, ys)
            got = tw.to_ints(lvl, tw.scale_subfield(sub, lvl, xd, yd))
            want = [sc.mul(lvl, x, y) for x, y in zip(xs, ys)]
            assert got == want, (sub, lvl)
