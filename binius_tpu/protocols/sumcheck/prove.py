"""Sumcheck provers (TPU device kernels + host orchestration).

The round-eval computation is the prover's hot loop (reference:
`crates/hal/src/sumcheck_round_calculation.rs`); here it is one jitted XLA
program per (composition set, shape): split each multilinear into its X=0/X=1
halves, extrapolate to the extra domain points, evaluate the compositions
batch-wise and XOR-reduce. Folding binds one variable per round
(`crates/hal/src/sumcheck_folding.rs`).

Batching follows the front-loaded scheme (`sumcheck/front_loaded.rs:33`):
claims sorted descending by n_vars activate when the remaining round count
equals their n_vars; each activation samples a fresh batching coefficient and
adds coeff * claim into the running sum.
"""

from __future__ import annotations

import dataclasses
import functools

import jax

from ...fields import scalar, tower
from ...math import fold, mle
from ...math.univariate import EvaluationDomain
from . import common
from .common import LEVEL, SumcheckClaim


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 5))
def _round_values_jit(comps: tuple, levels: tuple, n_vars: int, order_high: bool,
                      mls: tuple, points: tuple):
    """Values of each composite round polynomial at each domain point.

    Returns a (n_comps * n_points, 4)-shaped B128 array, row-major by comp.
    """
    halves = []
    for lvl, data in zip(levels, mls):
        e0, e1 = fold.evals_01(lvl, data, n_vars, order_high)
        if lvl < LEVEL:
            e0 = tower.embed(lvl, LEVEL, e0)
            e1 = tower.embed(lvl, LEVEL, e1)
        halves.append((e0, e1))
    out_rows = []
    for comp in comps:
        for x in points:
            if x == 0:
                rows = [h[0] for h in halves]
            elif x == 1:
                rows = [h[1] for h in halves]
            else:
                xc = tower.full(LEVEL, (), x)
                rows = [fold.extrapolate_line(LEVEL, h[0], h[1], xc) for h in halves]
            v = comp.evaluate(LEVEL, rows)
            out_rows.append(tower.xor_reduce(v, axis=0))
    import jax.numpy as jnp
    return jnp.stack(out_rows)


class RegularSumcheckProver:
    """Proves a `SumcheckClaim` over held multilinear witness data.

    multilinears: list of (level, device_array) of matching n_vars.
    `eq_ind_challenges`: if set, multilinear 0 must be the eq-indicator
    expansion of that point; its final eval is recomputed by the verifier
    rather than sent (zerocheck / eq-ind sumcheck convention).
    """

    def __init__(self, claim: SumcheckClaim, multilinears, order_high: bool,
                 eq_ind_challenges: tuple | None = None):
        assert len(multilinears) == claim.n_multilinears
        self.claim = claim
        self.mls = list(multilinears)
        self.order_high = order_high
        self.eq_ind_challenges = eq_ind_challenges
        self.n_remaining = claim.n_vars
        deg = claim.max_individual_degree()
        self.domain = EvaluationDomain.from_subspace(3, deg + 1)

    @property
    def n_vars(self) -> int:
        return self.claim.n_vars

    def compute_round_polys(self) -> list[list[int]]:
        """Round polynomial coefficients (one list per composite claim)."""
        comps = tuple(c.composition.expr for c in self.claim.composite_sums)
        levels = tuple(lvl for lvl, _ in self.mls)
        datas = tuple(d for _, d in self.mls)
        pts = self.domain.points
        vals = _round_values_jit(comps, levels, self.n_remaining, self.order_high,
                                 datas, pts)
        flat = tower.to_ints(LEVEL, vals)
        n_pts = len(pts)
        out = []
        for ci in range(len(comps)):
            values = flat[ci * n_pts:(ci + 1) * n_pts]
            out.append(self.domain.interpolate(LEVEL, values))
        return out

    def fold(self, challenge: int) -> None:
        ch = tower.from_ints(LEVEL, [challenge])[0]
        new = []
        for lvl, data in self.mls:
            if self.order_high:
                olvl, od = fold.fold_high(lvl, data, self.n_remaining, LEVEL, ch)
            else:
                olvl, od = fold.fold_low(lvl, data, self.n_remaining, LEVEL, ch)
            new.append((olvl, od))
        self.mls = new
        self.n_remaining -= 1

    def finish(self) -> list[int]:
        """Multilinear evaluations at the bound point (all rounds folded)."""
        assert self.n_remaining == 0
        out = []
        for lvl, data in self.mls:
            v = tower.to_ints(lvl, data)[0]
            out.append(v)
        return out


@dataclasses.dataclass
class BatchSumcheckOutput:
    challenges: list       # sampled challenges, in round order
    multilinear_evals: list  # per claim: list of evals (eq-ind eval included)


def batch_prove(provers: list, transcript) -> BatchSumcheckOutput:
    """Front-loaded batched sumcheck proving; writes to `transcript`.

    Provers must be sorted descending by n_vars. All provers must share the
    same evaluation order.
    """
    assert all(provers[i].n_vars >= provers[i + 1].n_vars for i in range(len(provers) - 1))
    n_rounds = provers[0].n_vars if provers else 0
    batch_coeffs: list[int] = []
    challenges: list[int] = []
    next_idx = 0
    for rnd in range(n_rounds):
        remaining = n_rounds - rnd
        while next_idx < len(provers) and provers[next_idx].n_vars == remaining:
            batch_coeffs.append(transcript.sample_scalar(LEVEL))
            next_idx += 1
        combined: list[int] = []
        for p, phi in zip(provers[:next_idx], batch_coeffs):
            for coeffs in p.compute_round_polys():
                combined = common.add_coeffs(combined, common.scale_coeffs(coeffs, phi))
        proof_coeffs = common.truncate(combined)
        transcript.message().write_scalars(LEVEL, proof_coeffs)
        challenge = transcript.sample_scalar(LEVEL)
        challenges.append(challenge)
        for p in provers[:next_idx]:
            p.fold(challenge)
    # 0-var claims activate after all rounds
    while next_idx < len(provers) and provers[next_idx].n_vars == 0:
        batch_coeffs.append(transcript.sample_scalar(LEVEL))
        next_idx += 1
    all_evals = []
    for p in provers:
        evals = p.finish()
        send = evals[1:] if p.eq_ind_challenges is not None else evals
        transcript.message().write_scalars(LEVEL, send)
        all_evals.append(evals)
    return BatchSumcheckOutput(challenges, all_evals)


def eq_ind_expansion_multilinear(point: list[int]):
    """(level, data) for the eq-indicator expansion of `point` (var 0 = point[0])."""
    e = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, point))
    return (LEVEL, e)
