"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import numpy as np
import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.parallel import sharding

random.seed(131)
LEVEL = 7


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharding.make_mesh(8)


def rand(n):
    return [random.getrandbits(128) for _ in range(n)]


def test_sharded_round_evals_match_host(mesh):
    log_n = 7
    a_vals, b_vals = rand(1 << log_n), rand(1 << log_n)
    a = sharding.shard_multilinear(mesh, tower.from_ints(LEVEL, a_vals))
    b = sharding.shard_multilinear(mesh, tower.from_ints(LEVEL, b_vals))
    fn = sharding.sharded_bivariate_round_evals(mesh, log_n)
    vals = tower.to_ints(LEVEL, np.asarray(jax.device_get(fn(a, b))))
    # host reference at X in {0,1,2}
    for xi, x in enumerate([0, 1, 2]):
        acc = 0
        for j in range(1 << (log_n - 1)):
            av = a_vals[2 * j] ^ scalar.mul(LEVEL, a_vals[2 * j] ^ a_vals[2 * j + 1], x)
            bv = b_vals[2 * j] ^ scalar.mul(LEVEL, b_vals[2 * j] ^ b_vals[2 * j + 1], x)
            acc ^= scalar.mul(LEVEL, av, bv)
        assert vals[xi] == acc


def test_sharded_fold_matches_host(mesh):
    log_n = 7
    vals = rand(1 << log_n)
    r = rand(1)[0]
    data = sharding.shard_multilinear(mesh, tower.from_ints(LEVEL, vals))
    fn = sharding.sharded_fold_low(mesh, log_n)
    out = np.asarray(jax.device_get(fn(data, tower.from_ints(LEVEL, [r])[0])))
    # shard-local fold: shard s holds folded values of its local block
    n_dev = 8
    local = (1 << log_n) // n_dev
    got = tower.to_ints(LEVEL, out)
    for s in range(n_dev):
        for j in range(local // 2):
            g = s * local + 2 * j
            want = vals[g] ^ scalar.mul(LEVEL, vals[g] ^ vals[g + 1], r)
            assert got[s * (local // 2) + j] == want


def test_sharded_xor_sum(mesh):
    vals = rand(64)
    data = sharding.shard_multilinear(mesh, tower.from_ints(LEVEL, vals))
    fn = sharding.sharded_xor_sum(mesh)
    got = tower.to_ints(LEVEL, np.asarray(jax.device_get(fn(data)))[None, :])[0]
    want = 0
    for v in vals:
        want ^= v
    assert got == want
