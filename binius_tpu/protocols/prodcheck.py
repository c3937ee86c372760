"""Product check via the binary-tree GKR multiplication circuit (v3 prover).

Counterpart of `crates/core/src/protocols/prodcheck/` — the module that
*succeeds* `gkr_gpa` in the reference ("a simpler and less flexible verifier
algorithm, … proving using a generic ComputeLayer", `prodcheck/mod.rs:15-18`).
Its core is `ProductCircuitLayers::compute` (`prodcheck/prove.rs:83`): fan-in-2
multiplication gates evaluated layer by layer on the compute layer, pairing
the LO/HI *halves* of each layer (`DevMem::split_half`) — unlike gkr_gpa's
even/odd interleave — and exposing the final product.

TPU-native shape: all `n_vars` tree layers are computed in ONE jit dispatch
(XLA unrolls the halving tree; total work is 2^n mults, a single kernel), and
the claim reduction rides the existing eq-ind sumcheck kernels
(`sumcheck/prove.py`) with a bivariate-product composition.
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


@functools.partial(jax.jit, static_argnums=(1,))
def _tree_layers_jit(evals, log_n: int):
    """All product-tree layers in one dispatch: returns layers of sizes
    2^(log_n-1), …, 2^0 (the last is the product)."""
    outs = []
    cur = evals
    for k in range(log_n, 0, -1):
        half = 1 << (k - 1)
        cur = tower.mul(LEVEL, cur[:half], cur[half:])
        outs.append(cur)
    return tuple(outs)


@dataclasses.dataclass
class ProductCircuitLayers:
    """`layers[i]` has 2^(i+1) elements; `layers[-1]` is the input multilinear
    (matches `ProductCircuitLayers::layers`, `prodcheck/prove.rs:118-123`)."""

    layers: list
    product: int

    @staticmethod
    def compute(evals, n_vars: int) -> "ProductCircuitLayers":
        if (1 << n_vars) != int(evals.shape[0]):
            raise ValueError("input slice must have power of two length")
        if n_vars == 0:
            return ProductCircuitLayers([], tower.to_ints(LEVEL, evals)[0])
        outs = _tree_layers_jit(evals, n_vars)
        product = tower.to_ints(LEVEL, outs[-1])[0]
        layers = list(reversed(outs[:-1])) + [evals]
        return ProductCircuitLayers(layers, product)


@dataclasses.dataclass(frozen=True)
class ProdcheckClaim:
    n_vars: int
    product: int


@dataclasses.dataclass
class ProdcheckOutput:
    """Reduced claim: input multilinear evaluates to `eval` at `eval_point`."""

    eval_point: list
    eval: int


_PROD_COMP = CompositionPoly(ArithExpr.var(0) * ArithExpr.var(1) * ArithExpr.var(2), 3)


def _halves(layer, k: int):
    """layer of 2^(k+1) elements -> (LO, HI) halves: A(y) = L(y, 0),
    B(y) = L(y, 1) with the split on the HIGH variable (split_half)."""
    half = 1 << k
    return layer[:half], layer[half:]


def prove(claim: ProdcheckClaim, layers: ProductCircuitLayers,
          transcript) -> ProdcheckOutput:
    """Reduce the product claim to an evaluation claim on the input
    multilinear, walking the tree output-to-input. Each step proves
    sum_y eq(r, y) * A(y) * B(y) = v, then line-reduces A/B evals with a
    sampled challenge appended at the HIGH position (half split)."""
    point: list[int] = []
    value = claim.product
    for k in range(claim.n_vars):
        a, b = _halves(layers.layers[k], k)
        eq_ml = sc_prove.eq_ind_expansion_multilinear(point)
        sc_claim = SumcheckClaim(k, 3, (CompositeSumClaim(_PROD_COMP, value),))
        prover = sc_prove.RegularSumcheckProver(
            sc_claim, [eq_ml, (LEVEL, a), (LEVEL, b)], order_high=False,
            eq_ind_challenges=tuple(point))
        out = sc_prove.batch_prove([prover], transcript)
        mu = transcript.sample_scalar(LEVEL)
        pt = sc_verify.claim_point(k, k, out.challenges, False)
        _, a_eval, b_eval = out.multilinear_evals[0]
        value = a_eval ^ scalar.mul(LEVEL, a_eval ^ b_eval, mu)
        point = [*pt, mu]
    return ProdcheckOutput(point, value)


def verify(claim: ProdcheckClaim, transcript) -> ProdcheckOutput:
    point: list[int] = []
    value = claim.product
    for k in range(claim.n_vars):
        sc_claim = SumcheckClaim(k, 3, (CompositeSumClaim(_PROD_COMP, value),))
        ver = sc_verify.batch_verify([sc_claim], transcript, False, [point])
        mu = transcript.sample_scalar(LEVEL)
        pt = sc_verify.claim_point(k, k, ver.challenges, False)
        _, a_eval, b_eval = ver.multilinear_evals[0]
        value = a_eval ^ scalar.mul(LEVEL, a_eval ^ b_eval, mu)
        point = [*pt, mu]
    return ProdcheckOutput(point, value)
