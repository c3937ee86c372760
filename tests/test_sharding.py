"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import numpy as np
import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.m3.instances import grouped_lookup_exp_instance as \
    _grouped_lookup_exp_instance  # shared with __graft_entry__.dryrun_multichip
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


def _u32_add_instance(log_n=5, seed=7):
    from binius_tpu.m3.builder.table import M3ConstraintSystem
    from binius_tpu.m3.builder.witness import WitnessIndex
    from binius_tpu.m3.gadgets import arith

    rng = random.Random(seed)
    n = 1 << log_n
    m3 = M3ConstraintSystem()
    t = m3.add_table("u32add")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    adder = arith.U32Add.build(t, "add", xin, yin)
    core, omap = m3.compile([log_n])
    wi = WitnessIndex(m3, [log_n])
    tw = wi.table(0)
    xs = [rng.getrandbits(32) for _ in range(n)]
    ys = [rng.getrandbits(32) for _ in range(n)]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    adder.populate(tw, xs, ys)
    return core, wi.to_core_witness(core, omap)


def test_prove_mesh_byte_equality(mesh):
    """SURVEY §4's multi-node acceptance analog: the full constraint-system
    prover produces IDENTICAL proof bytes on 1 device and on the 8-device
    mesh (GSPMD partitioning is semantics-preserving; field ops are exact).
    """
    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.parallel import mesh as mesh_mod

    core, witness = _u32_add_instance()
    proof_local = csp.prove(core, witness, log_inv_rate=1)
    proof_mesh = csp.prove(core, witness, log_inv_rate=1,
                           mesh=mesh_mod.make_mesh(8))
    assert proof_mesh == proof_local
    csp.verify(core, proof_mesh, log_inv_rate=1)


def test_prove_mesh_with_channels_byte_equality(mesh):
    """Mesh equality on a circuit with flushes/channels (GPA phase): column
    `a` pushes into channel 0, its permutation `b` pulls back out; columns
    are 2^12 elements so the element axis genuinely shards 8 ways."""
    from binius_tpu.constraint_system import oracle as om
    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.constraint_system.system import (ConstraintSystem, Flush,
                                                     PULL, PUSH)
    from binius_tpu.parallel import mesh as mesh_mod

    rng = random.Random(3)
    n = 12
    oracles = om.OracleSet()
    a_id = oracles.add_committed(n, 5, "a")
    b_id = oracles.add_committed(n, 5, "b")
    a_vals = [rng.getrandbits(32) for _ in range(1 << n)]
    b_vals = list(a_vals)
    rng.shuffle(b_vals)
    core = ConstraintSystem(
        oracles, [],
        flushes=[Flush(0, PUSH, (a_id,)), Flush(0, PULL, (b_id,))],
        n_channels=1)
    witness = {a_id: (5, tower.from_ints(5, a_vals)),
               b_id: (5, tower.from_ints(5, b_vals))}

    proof_local = csp.prove(core, witness, log_inv_rate=1)
    proof_mesh = csp.prove(core, witness, log_inv_rate=1,
                           mesh=mesh_mod.make_mesh(8))
    assert proof_mesh == proof_local
    csp.verify(core, proof_mesh, log_inv_rate=1)


def test_sharded_ntt_matches_single_device():
    """The explicit shard_map NTT (ppermute cross stages + per-shard coset
    twiddles) must agree elementwise with the single-device packed path."""
    import numpy as np

    from binius_tpu.fields import tower
    from binius_tpu.ntt import sharded_ntt
    from binius_tpu.ntt.additive_ntt import AdditiveNTT, NTTDomain
    from binius_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(23)
    for dl, log_x, log_y, coset, coset_bits, skip, inv in [
            (5, 0, 12, 0, 0, 0, False),
            (5, 2, 10, 0, 0, 1, False),
            (7, 1, 11, 1, 1, 0, False),
            (5, 0, 12, 0, 0, 0, True),
            (7, 0, 12, 0, 0, 2, True),
    ]:
        n = 1 << (log_x + log_y)
        dom = NTTDomain.create(5, log_y + coset_bits)
        ntt = AdditiveNTT(dom)
        if tower.has_limb_dim(dl):
            data = tower.from_numpy(dl, rng.integers(
                0, 2**32, size=(n, 1 << (dl - 5)), dtype=np.uint32))
        else:
            data = tower.from_numpy(dl, rng.integers(
                0, 2**32, size=n, dtype=np.uint32))
        kw = dict(coset=coset, coset_bits=coset_bits, skip_rounds=skip)
        fn = ntt.inverse if inv else ntt.forward
        want = np.asarray(fn(data, dl, (log_x, log_y, 0), **kw))
        mesh = mesh_mod.make_mesh()
        sharded = mesh_mod.put_row_sharded(mesh, dl, data, min_elems=1)
        assert mesh_mod.is_mesh_sharded(sharded)
        got = fn(sharded, dl, (log_x, log_y, 0), **kw)
        m = ntt._sharded(sharded, (log_x, log_y, 0))
        assert m is not None, "sharded dispatch did not engage"
        np.testing.assert_array_equal(want, np.asarray(got))


def test_prove_mesh_grouped_lookup_exp_byte_equality(mesh, monkeypatch):
    """VERDICT r3 #7: a lookups+exp circuit proves mesh-sharded with the
    GROUPED stage-2 path active (group axis unsharded, element axis sharded)
    and bytes identical across {1 device, 8-device mesh} x {grouped,
    per-claim}."""
    from binius_tpu.constraint_system import prove as csp
    from binius_tpu.parallel import mesh as mesh_mod
    from binius_tpu.protocols.sumcheck import prove as sc_prove

    core, witness = _grouped_lookup_exp_instance()
    monkeypatch.setenv("BINIUS_GROUP_CLAIMS", "0")
    proof_ungrouped = csp.prove(core, witness, log_inv_rate=1)

    monkeypatch.setenv("BINIUS_GROUP_CLAIMS", "1")
    spawned = []
    orig = sc_prove.GroupedRegularSumcheckProver

    class Spy(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            spawned.append((self.n_claims, self.spmd))
    monkeypatch.setattr(sc_prove, "GroupedRegularSumcheckProver", Spy)

    proof_grouped = csp.prove(core, witness, log_inv_rate=1)
    assert proof_grouped == proof_ungrouped
    assert any(n >= 2 for n, _ in spawned), "grouped path did not activate"

    spawned.clear()
    proof_mesh = csp.prove(core, witness, log_inv_rate=1,
                           mesh=mesh_mod.make_mesh(8))
    assert proof_mesh == proof_ungrouped
    assert any(n >= 2 for n, _ in spawned), "grouped path inactive under mesh"
    csp.verify(core, proof_mesh, log_inv_rate=1)
