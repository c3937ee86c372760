"""Property-based algebraic-law sweeps over the tower (hypothesis).

The counterpart of the reference's proptest strategy
(`crates/field/src/tests.rs` — `proptest!` blocks over random operand pairs
per field): hypothesis generates operands (with shrinking on failure) and
checks field laws on the SCALAR ground truth plus scalar/device agreement.
Scalar-side checks run many examples cheaply; device cross-checks batch all
examples into one kernel call per law.
"""

import pytest
from hypothesis import given, settings, strategies as st

from binius_tpu.fields import scalar, tower

LEVELS = [0, 3, 4, 5, 6, 7]


def elems(level):
    return st.integers(min_value=0, max_value=(1 << (1 << level)) - 1)


@pytest.mark.parametrize("level", LEVELS)
@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_scalar_field_laws(level, data):
    a = data.draw(elems(level))
    b = data.draw(elems(level))
    c = data.draw(elems(level))
    m, one = scalar.mul, 1
    # multiplicative laws
    assert m(level, a, b) == m(level, b, a)
    assert m(level, m(level, a, b), c) == m(level, a, m(level, b, c))
    assert m(level, a, one) == a
    # distributivity (additive group is XOR)
    assert m(level, a, b ^ c) == m(level, a, b) ^ m(level, a, c)
    # square = self-mul; Frobenius is additive in char 2
    assert scalar.square(level, a) == m(level, a, a)
    assert scalar.square(level, a ^ b) == scalar.square(level, a) ^ scalar.square(level, b)
    # inversion (multiplicative group)
    if a != 0:
        assert m(level, a, scalar.invert(level, a)) == one
    # pow consistency
    assert scalar.pow(level, a, 3) == m(level, a, m(level, a, a))


@pytest.mark.parametrize("level", LEVELS)
@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_device_matches_scalar_properties(level, data):
    n = 8
    a = [data.draw(elems(level)) for _ in range(n)]
    b = [data.draw(elems(level)) for _ in range(n)]
    A, B = tower.from_ints(level, a), tower.from_ints(level, b)
    got = tower.to_ints(level, tower.mul(level, A, B))
    assert got == [scalar.mul(level, x, y) for x, y in zip(a, b)]
    got_sq = tower.to_ints(level, tower.square(level, A))
    assert got_sq == [scalar.square(level, x) for x in a]


@pytest.mark.parametrize("sub,lvl", [(0, 5), (3, 7), (5, 7)])
@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_embedding_homomorphism_property(sub, lvl, data):
    a = data.draw(elems(sub))
    b = data.draw(elems(sub))
    # canonical tower subfield embedding is the identity on ints, and mul
    # commutes with it
    assert scalar.mul(lvl, a, b) == scalar.mul(sub, a, b)
    assert scalar.invert(lvl, a) == scalar.invert(sub, a) if a else True
