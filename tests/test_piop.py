"""PIOP compiler tests: batch commit + interleaved sumcheck/FRI round-trip."""

import random

import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.protocols import fri as fri_mod
from binius_tpu.protocols import piop
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(21)
LEVEL = 7


def rand_vals(n):
    return [random.getrandbits(128) for _ in range(n)]


def mle_eval_scalar(vals, point):
    cur = list(vals)
    for r in point:
        cur = [cur[2 * i] ^ scalar.mul(LEVEL, cur[2 * i] ^ cur[2 * i + 1], r)
               for i in range(len(cur) // 2)]
    return cur[0]


def inner_product(a, b):
    acc = 0
    for x, y in zip(a, b):
        acc ^= scalar.mul(LEVEL, x, y)
    return acc


def setup():
    commit_meta = piop.CommitMeta((0, 0, 0, 1, 2))  # one 3-var, two 4-var
    params = fri_mod.FRIParams(log_dim=4, log_inv_rate=1, log_batch_size=2,
                               fold_arities=(2, 2), n_test_queries=3)
    assert commit_meta.total_vars == 6 == params.n_fold_rounds
    c0_vals, c1_vals, c2_vals = rand_vals(8), rand_vals(16), rand_vals(16)
    t0_vals, t1_vals = rand_vals(8), rand_vals(16)
    packed = [(tower.from_ints(LEVEL, c0_vals), 3),
              (tower.from_ints(LEVEL, c1_vals), 4),
              (tower.from_ints(LEVEL, c2_vals), 4)]
    transparent_mles = [(tower.from_ints(LEVEL, t0_vals), 3),
                        (tower.from_ints(LEVEL, t1_vals), 4)]
    transparents_v = [(3, lambda pt: mle_eval_scalar(t0_vals, pt)),
                      (4, lambda pt: mle_eval_scalar(t1_vals, pt))]
    claims = [
        piop.PIOPSumcheckClaim(3, 0, 0, inner_product(c0_vals, t0_vals)),
        piop.PIOPSumcheckClaim(4, 1, 1, inner_product(c1_vals, t1_vals)),
        piop.PIOPSumcheckClaim(4, 2, 1, inner_product(c2_vals, t1_vals)),
    ]
    vals = (c0_vals, c1_vals, c2_vals, t0_vals, t1_vals)
    return commit_meta, params, packed, transparent_mles, transparents_v, claims, vals


def run(commit_meta, params, packed, transparent_mles, transparents_v, claims,
        tamper=None):
    pt = ProverTranscript()
    cw, tree, _ = piop.commit(params, commit_meta, packed)
    pt.message().write_bytes(tree.root)
    piop.prove(params, commit_meta, cw, tree, packed, transparent_mles, claims, pt)
    proof = bytearray(pt.finalize())
    if tamper is not None:
        proof[tamper % len(proof)] ^= 1
    vt = VerifierTranscript(bytes(proof))
    com = vt.message().read_bytes(32)
    out = piop.verify(params, commit_meta, com, transparents_v, claims, vt)
    vt.finalize()
    return out


def test_piop_roundtrip():
    commit_meta, params, packed, tm, tv, claims, vals = setup()
    out = run(commit_meta, params, packed, tm, tv, claims)
    # committed evals match direct evaluation at the reduced point
    challenges_rev = list(reversed(out.challenges))
    c0_vals, c1_vals, c2_vals, _, _ = vals
    assert out.committed_evals[0] == mle_eval_scalar(c0_vals, challenges_rev[3:])
    assert out.committed_evals[1] == mle_eval_scalar(c1_vals, challenges_rev[2:])
    assert out.committed_evals[2] == mle_eval_scalar(c2_vals, challenges_rev[2:])


def test_piop_wrong_sum_rejected():
    commit_meta, params, packed, tm, tv, claims, _ = setup()
    bad = [claims[0], piop.PIOPSumcheckClaim(4, 1, 1, claims[1].sum ^ 1), claims[2]]
    pt = ProverTranscript()
    cw, tree, _ = piop.commit(params, commit_meta, packed)
    pt.message().write_bytes(tree.root)
    piop.prove(params, commit_meta, cw, tree, packed, tm, bad, pt)
    vt = VerifierTranscript(pt.finalize())
    com = vt.message().read_bytes(32)
    with pytest.raises(ValueError):
        piop.verify(params, commit_meta, com, tv, bad, vt)


def test_piop_tamper_rejected():
    commit_meta, params, packed, tm, tv, claims, _ = setup()
    rejected = 0
    for pos in [50, 400, 2000]:
        try:
            run(commit_meta, params, packed, tm, tv, claims, tamper=pos)
        except (ValueError, EOFError):
            rejected += 1
    assert rejected == 3


def test_pack_multilinear():
    # level-0 (B1) multilinear with 9 vars -> packed 2-var B128 multilinear
    bits = [random.getrandbits(1) for _ in range(512)]
    data = tower.from_ints(0, bits)
    packed, n = piop.pack_multilinear(0, data, 9)
    assert n == 2
    ints = tower.to_ints(7, packed)
    for j in range(4):
        want = 0
        for i in range(128):
            want |= bits[j * 128 + i] << i
        assert ints[j] == want


def test_evaluate_piecewise_multilinear():
    # glue three pieces (2,2,1 vars) and compare against direct evaluation
    f0, f1, f2 = rand_vals(4), rand_vals(4), rand_vals(2)
    point = rand_vals(4)
    merged = f0 + f1 + f2 + [0] * 6
    want = mle_eval_scalar(merged, point)
    piece_evals = [mle_eval_scalar(f0, point[:2]),
                   mle_eval_scalar(f1, point[:2]),
                   mle_eval_scalar(f2, point[:1])]
    got = piop.evaluate_piecewise_multilinear(point, [0, 1, 2], piece_evals)
    assert got == want
