"""Front-loaded batched sumcheck (shared *early* challenges).

Mirrors `crates/core/src/protocols/sumcheck/front_loaded.rs` and
`prove/front_loaded.rs`: claims sorted ascending by n_vars all start at round
0; a claim with k variables finishes after round k, at which point its
multilinear evaluations enter the transcript and its batched composite
evaluation is subtracted from the running sum. One batching coefficient per
claim; composite claims inside a claim are mixed by powers of it
(`batch_weighted_value`, `sumcheck/common.rs:287`). Exposes a round-by-round
interface so the PIOP can interleave it with FRI folding.
"""

from __future__ import annotations

from ...fields import scalar
from . import common
from .common import LEVEL


def batch_weighted_value(coeff: int, values: list[int]) -> int:
    """coeff * (v_0 + coeff*v_1 + coeff^2*v_2 + ...) — weight j+1 per value."""
    acc = 0
    for v in reversed(values):
        acc = scalar.mul(LEVEL, acc, coeff) ^ v
    return scalar.mul(LEVEL, coeff, acc)


class FrontLoadedBatchProver:
    """Provers must be sorted ascending by n_vars, order_high folding."""

    def __init__(self, provers: list, transcript):
        assert all(provers[i].n_vars <= provers[i + 1].n_vars for i in range(len(provers) - 1))
        self.provers = list(provers)   # queue front = fewest vars
        self.coeffs = transcript.sample_scalars(LEVEL, len(provers))
        self.round = 0

    def _finish_ready(self, writer) -> None:
        while self.provers and self.provers[0].n_vars == self.round:
            p = self.provers.pop(0)
            self.coeffs.pop(0)
            evals = p.finish()
            writer.write_scalars(LEVEL, evals)

    def send_round_proof(self, transcript) -> None:
        w = transcript.message()
        self._finish_ready(w)
        combined: list[int] = []
        for p, c in zip(self.provers, self.coeffs):
            polys = p.compute_round_polys()
            weights = [c]
            for _ in range(len(polys) - 1):
                weights.append(scalar.mul(LEVEL, weights[-1], c))
            for coeffs_j, wgt in zip(polys, weights):
                combined = common.add_coeffs(combined, common.scale_coeffs(coeffs_j, wgt))
        deg = max((max(cs.composition.degree() for cs in p.claim.composite_sums)
                   if p.claim.composite_sums else 0 for p in self.provers), default=0)
        combined = combined + [0] * (deg + 1 - len(combined))
        w.write_scalars(LEVEL, common.truncate(combined))

    def receive_challenge(self, challenge: int) -> None:
        for p in self.provers:
            p.fold(challenge)
        self.round += 1

    def finish(self, transcript) -> None:
        w = transcript.message()
        self._finish_ready(w)
        assert not self.provers, "all claims must finish by the final round"


class FrontLoadedBatchVerifier:
    """Round-by-round verifier; claims ascending by n_vars."""

    def __init__(self, claims: list, transcript):
        assert all(claims[i].n_vars <= claims[i + 1].n_vars for i in range(len(claims) - 1))
        self.claims = list(claims)
        self.coeffs = transcript.sample_scalars(LEVEL, len(claims))
        s = 0
        for claim, c in zip(self.claims, self.coeffs):
            s ^= batch_weighted_value(c, [cs.sum for cs in claim.composite_sums])
        self.sum = s
        self.round = 0
        self.multilinear_evals: list = []

    def try_finish_claims(self, transcript) -> None:
        while self.claims and self.claims[0].n_vars == self.round:
            claim = self.claims.pop(0)
            coeff = self.coeffs.pop(0)
            evals = transcript.message().read_scalars(LEVEL, claim.n_multilinears)
            self.multilinear_evals.append(evals)
            vals = [cs.composition.evaluate_scalar(LEVEL, evals)
                    for cs in claim.composite_sums]
            self.sum ^= batch_weighted_value(coeff, vals)

    def receive_round_proof(self, transcript) -> None:
        deg = max((max(cs.composition.degree() for cs in c.composite_sums)
                   if c.composite_sums else 0 for c in self.claims), default=0)
        proof_coeffs = transcript.message().read_scalars(LEVEL, deg)
        self._full = common.recover_full(proof_coeffs, self.sum)

    def finish_round(self, challenge: int) -> None:
        self.sum = common.eval_coeffs(self._full, challenge)
        self.round += 1

    def finish(self) -> None:
        if self.claims:
            raise ValueError("unfinished sumcheck claims")
        if self.sum != 0:
            raise ValueError("front-loaded sumcheck final sum is nonzero")
