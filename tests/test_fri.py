"""FRI tests: RS encoding, fold-to-multilinear-eval property, full protocol."""

import random

import numpy as np
import pytest

from binius_tpu.fields import scalar, tower
from binius_tpu.math import mle
from binius_tpu.protocols import fri
from binius_tpu.transcript.transcript import ProverTranscript, VerifierTranscript

random.seed(5)
LEVEL = 7


def rand_vals(n):
    return [random.getrandbits(128) for _ in range(n)]


def make_params(log_dim=4, log_inv_rate=1, log_batch=2, arities=(2, 2), n_q=4):
    return fri.FRIParams(log_dim, log_inv_rate, log_batch, tuple(arities), n_q)


def test_rs_encode_repetition_of_zero_degree():
    # constant message -> codeword is the constant everywhere
    p = make_params(log_dim=0, log_batch=0, arities=())
    msg = tower.from_ints(LEVEL, [7])
    cw = fri.rs_encode(p, msg)
    assert tower.to_ints(LEVEL, cw) == [7, 7]


@pytest.mark.parametrize("log_batch", [0, 2])
def test_full_fold_equals_multilinear_eval(log_batch):
    """Folding the codeword with all challenges yields a repetition codeword
    of MLE(message)(challenges) — the property the PIOP is built on (DP24
    Lemma 3.9)."""
    log_dim = 4
    p = make_params(log_dim=log_dim, log_inv_rate=2, log_batch=log_batch, arities=(),
                    n_q=2)
    n = log_dim + log_batch
    msg_vals = rand_vals(1 << n)
    msg = tower.from_ints(LEVEL, msg_vals)
    cw = fri.rs_encode(p, msg)
    challenges = rand_vals(n)
    folded = fri.fold_interleaved(p.ntt_domain(), cw, challenges,
                                  p.log_code_len, log_batch)
    got = tower.to_ints(LEVEL, folded)
    assert len(got) == 1 << p.log_inv_rate
    _, want_dev = mle.evaluate(LEVEL, msg, n, LEVEL, tower.from_ints(LEVEL, challenges))
    want = tower.to_ints(LEVEL, want_dev[None, :])[0]
    assert all(v == want for v in got), (got, want)


def test_device_fold_matches_scalar_fold():
    p = make_params()
    n = p.log_dim + p.log_batch_size
    msg = tower.from_ints(LEVEL, rand_vals(1 << n))
    cw = fri.rs_encode(p, msg)
    cw_np = fri.codeword_to_numpy(cw)
    challenges = rand_vals(p.log_batch_size + 2)
    folded = fri.fold_interleaved(p.ntt_domain(), cw, challenges,
                                  p.log_code_len, p.log_batch_size)
    got = tower.to_ints(LEVEL, folded)
    # host scalar mirror
    tensor = fri.eq_tensor_scalar_ordered(challenges[:p.log_batch_size])
    cw_ints = [fri.np_elem_to_int(cw_np, i) for i in range(cw_np.shape[0])]
    arity = len(challenges)
    want = []
    for i in range(len(cw_ints) >> arity):
        chunk = cw_ints[i << arity:(i + 1) << arity]
        want.append(fri.fold_interleaved_chunk_scalar(
            p.ntt_domain(), p.log_code_len, p.log_batch_size, i, chunk, tensor,
            challenges[p.log_batch_size:]))
    assert got == want


def run_fri_roundtrip(p, msg_vals, tamper=None):
    msg = tower.from_ints(LEVEL, msg_vals)
    pt = ProverTranscript()
    cw, tree = fri.fri_commit(p, msg)
    pt.message().write_bytes(tree.root)
    folder = fri.FRIFolder(p, cw, tree)
    challenges = []
    commitments = []
    for _ in range(p.n_fold_rounds):
        c = pt.sample_scalar(LEVEL)
        challenges.append(c)
        root = folder.execute_fold_round(c)
        if root is not None:
            pt.message().write_bytes(root)
            commitments.append(root)
    folder.finish_proof(pt)
    proof = bytearray(pt.finalize())
    if tamper is not None:
        proof[tamper] ^= 1
    vt = VerifierTranscript(bytes(proof))
    com = vt.message().read_bytes(32)
    v_challenges = []
    v_commitments = []
    n_commit_rounds = {sum(p.fold_arities[:k + 1]) for k in range(len(p.fold_arities))}
    for r in range(p.n_fold_rounds):
        v_challenges.append(vt.sample_scalar(LEVEL))
        if r + 1 in n_commit_rounds:
            v_commitments.append(vt.message().read_bytes(32))
    verifier = fri.FRIVerifier(p, com, v_commitments, v_challenges)
    final = verifier.verify(vt)
    vt.finalize()
    return final, v_challenges


def test_fri_end_to_end():
    p = make_params()
    n = p.log_dim + p.log_batch_size
    msg_vals = rand_vals(1 << n)
    final, challenges = run_fri_roundtrip(p, msg_vals)
    # final value == MLE(message)(challenges)
    msg = tower.from_ints(LEVEL, msg_vals)
    _, want_dev = mle.evaluate(LEVEL, msg, n, LEVEL, tower.from_ints(LEVEL, challenges))
    assert final == tower.to_ints(LEVEL, want_dev[None, :])[0]


def test_fri_no_oracles():
    p = make_params(log_dim=2, log_batch=1, arities=(), n_q=2)
    msg_vals = rand_vals(1 << 3)
    final, challenges = run_fri_roundtrip(p, msg_vals)
    msg = tower.from_ints(LEVEL, msg_vals)
    _, want_dev = mle.evaluate(LEVEL, msg, 3, LEVEL, tower.from_ints(LEVEL, challenges))
    assert final == tower.to_ints(LEVEL, want_dev[None, :])[0]


def test_fri_tamper_rejected():
    p = make_params()
    msg_vals = rand_vals(1 << (p.log_dim + p.log_batch_size))
    ok = 0
    for pos in [40, 200, 1000]:
        try:
            run_fri_roundtrip(p, msg_vals, tamper=pos)
        except (ValueError, EOFError):
            ok += 1
    assert ok == 3


def test_params_helpers():
    n_q = fri.calculate_n_test_queries(100, 20, 1)
    assert 100 < n_q < 300
    ar = fri.estimate_optimal_arity(24, 32, 16)
    assert 1 <= ar <= 24
    p = fri.FRIParams.choose_with_constant_fold_arity(20, 100, 1, 4)
    assert p.log_dim == 16 and p.log_batch_size == 4
    assert sum(p.fold_arities) < p.n_fold_rounds
    assert p.n_final_challenges == p.n_fold_rounds - sum(p.fold_arities)


def test_device_merkle_commit_matches_host():
    """commit_codeword_device (one-dispatch leaf hash + level reduction from
    uint32 limbs) must agree byte-for-byte with the host tree."""
    import jax
    import numpy as np

    from binius_tpu.merkle.tree import MerkleTree, commit_codeword_device, hash_leaves
    from binius_tpu.protocols.fri import leaf_blobs

    rng = np.random.default_rng(11)
    cw = rng.integers(0, 2**32, size=(1 << 12, 4), dtype=np.uint32)
    for log_coset in (0, 2):
        host = MerkleTree.build(hash_leaves(leaf_blobs(cw, log_coset)))
        dev = commit_codeword_device(jax.numpy.asarray(cw), log_coset)
        assert len(host.layers) == len(dev.layers)
        for a, b in zip(host.layers, dev.layers):
            np.testing.assert_array_equal(a, b)
        assert host.root == dev.root
