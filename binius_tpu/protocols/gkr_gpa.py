"""GKR grand product argument (binary-tree multiplication circuit).

Mirrors `crates/core/src/protocols/gkr_gpa/` (Thaler13 §5.3.1): for each
instance, a product tree over the multilinear's hypercube evaluations; layer
claims walk down the tree via batched eq-indicator sumchecks of
eq(r, y) * L(0, y) * L(1, y), followed by a shared line reduction with a
sampled challenge. Reduces "product of evals = p" claims to evaluation claims
on the underlying multilinears.
"""

from __future__ import annotations

import dataclasses
import functools

import jax

from ..fields import scalar, tower
from ..math.arith import ArithExpr, CompositionPoly
from .sumcheck import prove as sc_prove
from .sumcheck import verify as sc_verify
from .sumcheck.common import LEVEL, CompositeSumClaim, SumcheckClaim


@dataclasses.dataclass(frozen=True)
class GrandProductClaim:
    n_vars: int
    product: int


@dataclasses.dataclass
class GrandProductWitness:
    """layers[k] has 2^k B128 elements; layers[n] = the input multilinear,
    layers[0][0] = the full product. layer_k[i] = layer_{k+1}[2i] * layer_{k+1}[2i+1]."""

    layers: list

    @staticmethod
    def compute(n_vars: int, data) -> "GrandProductWitness":
        layers = [data]
        cur = data
        for k in range(n_vars, 0, -1):
            cur = _pairwise_product(cur, k)
            layers.append(cur)
        layers.reverse()
        return GrandProductWitness(layers)

    @property
    def product(self) -> int:
        return tower.to_ints(LEVEL, self.layers[0])[0]


@functools.partial(jax.jit, static_argnums=1)
def _pairwise_product(data, k: int):
    d = data.reshape(tower.elem_shape(LEVEL, (1 << (k - 1), 2)))
    if tower.has_limb_dim(LEVEL):
        return tower.mul(LEVEL, d[:, 0, :], d[:, 1, :])
    return tower.mul(LEVEL, d[:, 0], d[:, 1])


def _split01(data, k: int):
    """layer_{k} -> (A, B) with A(y) = layer(0, y), B(y) = layer(1, y)
    (LSB split: A = even entries, B = odd)."""
    d = data.reshape(tower.elem_shape(LEVEL, (1 << (k - 1), 2)))
    if tower.has_limb_dim(LEVEL):
        return d[:, 0, :], d[:, 1, :]
    return d[:, 0], d[:, 1]


_PROD_COMP = CompositionPoly(ArithExpr.var(0) * ArithExpr.var(1) * ArithExpr.var(2), 3)


@dataclasses.dataclass
class GPAOutput:
    """Reduced evaluation claims: per instance, (point, eval) on the input."""

    eval_points: list
    evals: list


def batch_prove(claims: list[GrandProductClaim], witnesses: list[GrandProductWitness],
                transcript) -> GPAOutput:
    """Instances sorted descending by n_vars. All instance products must match
    their claims."""
    assert all(claims[i].n_vars >= claims[i + 1].n_vars for i in range(len(claims) - 1))
    max_n = claims[0].n_vars if claims else 0
    # per-instance current layer claim: (point, value)
    points: list[list[int]] = [[] for _ in claims]
    values: list[int] = [c.product for c in claims]
    for k in range(max_n):
        active = [j for j, c in enumerate(claims) if c.n_vars > k]
        sc_claims, provers, eq_points = [], [], []
        for j in active:
            comp = _PROD_COMP
            sc_claims.append(SumcheckClaim(k, 3, (CompositeSumClaim(comp, values[j]),)))
            layer_next = witnesses[j].layers[k + 1]
            a, b = _split01(layer_next, k + 1)
            eq_ml = sc_prove.eq_ind_expansion_multilinear(points[j])
            provers.append(sc_prove.RegularSumcheckProver(
                sc_claims[-1], [eq_ml, (LEVEL, a), (LEVEL, b)], order_high=False,
                eq_ind_challenges=tuple(points[j])))
        out = sc_prove.batch_prove(provers, transcript)
        mu = transcript.sample_scalar(LEVEL)
        pt = sc_verify.claim_point(k, k, out.challenges, False)
        for j, evals in zip(active, out.multilinear_evals):
            _, a_eval, b_eval = evals
            values[j] = a_eval ^ scalar.mul(LEVEL, a_eval ^ b_eval, mu)
            points[j] = [mu, *pt]
    return GPAOutput([list(p) for p in points], list(values))


def batch_verify(claims: list[GrandProductClaim], transcript) -> GPAOutput:
    assert all(claims[i].n_vars >= claims[i + 1].n_vars for i in range(len(claims) - 1))
    max_n = claims[0].n_vars if claims else 0
    points: list[list[int]] = [[] for _ in claims]
    values: list[int] = [c.product for c in claims]
    for k in range(max_n):
        active = [j for j, c in enumerate(claims) if c.n_vars > k]
        sc_claims = [SumcheckClaim(k, 3, (CompositeSumClaim(_PROD_COMP, values[j]),))
                     for j in active]
        eq_pts = [points[j] for j in active]
        ver = sc_verify.batch_verify(sc_claims, transcript, False, eq_pts)
        mu = transcript.sample_scalar(LEVEL)
        pt = sc_verify.claim_point(k, k, ver.challenges, False)
        for j, evals in zip(active, ver.multilinear_evals):
            _, a_eval, b_eval = evals
            values[j] = a_eval ^ scalar.mul(LEVEL, a_eval ^ b_eval, mu)
            points[j] = [mu, *pt]
    return GPAOutput([list(p) for p in points], list(values))
