"""Bitsliced tower multiplication vs the scalar ground truth
(`fields/bitslice.py`; the byte-sliced-underlier analog)."""

import random

import numpy as np
import pytest

from binius_tpu.fields import bitslice, scalar, tower

random.seed(20817)


@pytest.mark.parametrize("level", [0, 3, 5, 6, 7])
def test_bitslice_roundtrip(level):
    n = 64
    vals = [random.getrandbits(1 << level) for _ in range(n)]
    a = tower.from_ints(level, vals)
    back = bitslice.from_bitsliced(level, bitslice.to_bitsliced(level, a))
    assert tower.to_ints(level, back) == vals


@pytest.mark.parametrize("level", [0, 1, 3, 5, 6, 7])
def test_bitslice_mul(level):
    n = 96
    av = [random.getrandbits(1 << level) for _ in range(n)]
    bv = [random.getrandbits(1 << level) for _ in range(n)]
    a = tower.from_ints(level, av)
    b = tower.from_ints(level, bv)
    got = tower.to_ints(level, bitslice.mul(level, a, b))
    want = [scalar.mul(level, x, y) for x, y in zip(av, bv)]
    assert got == want


@pytest.mark.parametrize("level", [3, 7])
def test_bitslice_square(level):
    n = 32
    av = [random.getrandbits(1 << level) for _ in range(n)]
    a = tower.from_ints(level, av)
    got = tower.to_ints(level, bitslice.square(level, a))
    want = [scalar.mul(level, x, x) for x in av]
    assert got == want
