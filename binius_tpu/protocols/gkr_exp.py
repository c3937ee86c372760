"""GKR exponentiation: prove a column equals g^(bit-composed exponent).

Mirrors `crates/core/src/protocols/gkr_exp/` (static-generator circuit;
dynamic-base lands later): with bit columns b_0..b_{n-1} (LSB first) and a
public base g, the result column is

    a(x) = g^(sum_k 2^k b_k(x)) = prod_k (1 + b_k(x) * (g^(2^k) + 1)),

a depth-n circuit of pointwise multilinear factors. Evaluation claims on the
result walk down one layer per eq-indicator sumcheck with composition
eq * V * (1 + c_k * b_k), exporting an evaluation claim on each bit column.
"""

from __future__ import annotations

import dataclasses

from ..fields import scalar, tower
from ..math.arith import ArithExpr, CompositionPoly
from .sumcheck import prove as sc_prove
from .sumcheck import verify as sc_verify
from .sumcheck.common import LEVEL, CompositeSumClaim, SumcheckClaim


@dataclasses.dataclass(frozen=True)
class StaticExpClaim:
    """Claim: result (n_vars multilinear) = base^bits with n_bits bit columns.

    `eval_point`/`eval`: an evaluation claim on the result multilinear.
    """

    n_vars: int
    n_bits: int
    base: int
    eval_point: tuple
    eval: int


@dataclasses.dataclass
class StaticExpWitness:
    """layers[k] = V_k evals (V_0 = 1, V_{k+1} = V_k * (1 + b_k (g^{2^k}+1)));
    bits[k] = the bit multilinear data (level 0 uint32 0/1)."""

    layers: list
    bits: list

    @staticmethod
    def compute(n_vars: int, base: int, bit_datas: list) -> "StaticExpWitness":
        v = tower.full(LEVEL, (1 << n_vars,), 1)
        layers = [v]
        g = base
        for bk in bit_datas:
            c = tower.full(LEVEL, (), g ^ 1)
            factor = tower.add(LEVEL, tower.full(LEVEL, (1 << n_vars,), 1),
                               tower.mul(LEVEL, tower.embed(0, LEVEL, bk), c))
            v = tower.mul(LEVEL, v, factor)
            layers.append(v)
            g = scalar.mul(LEVEL, g, g)
        return StaticExpWitness(layers, list(bit_datas))

    @property
    def result(self):
        return self.layers[-1]


# One shared composition for every layer: the layer constant c_k enters as a
# fourth (constant-valued) multilinear so all layers reuse one compiled
# kernel; the verifier checks its claimed eval equals c_k directly.
_LAYER_COMP = None


def _layer_composition() -> CompositionPoly:
    """eq * V * (1 + C * b): vars (eq, V, b, C) with C the constant column."""
    global _LAYER_COMP
    if _LAYER_COMP is None:
        eq, v, b, c = (ArithExpr.var(i) for i in range(4))
        _LAYER_COMP = CompositionPoly(eq * (v * (ArithExpr.const(1) + c * b)), 4)
    return _LAYER_COMP


@dataclasses.dataclass
class ExpOutput:
    bit_claims: list    # per claim: list of (bit_index, point, eval) LSB-first
    final_points: list  # final V_0 point per claim (V_0 == 1 checked)


def batch_prove(claims: list[StaticExpClaim], witnesses: list[StaticExpWitness],
                transcript) -> ExpOutput:
    n_claims = len(claims)
    points = [list(c.eval_point) for c in claims]
    values = [c.eval for c in claims]
    max_bits = max((c.n_bits for c in claims), default=0)
    bit_claims = [[] for _ in claims]
    for k_down in range(max_bits):
        active = [j for j, c in enumerate(claims)
                  if c.n_bits > k_down]
        # process layer index k = n_bits-1-k_down per claim (top layer first)
        sc_claims, provers, cks = [], [], []
        for j in active:
            c = claims[j]
            k = c.n_bits - 1 - k_down
            ck = scalar.pow(LEVEL, c.base, 1 << k) ^ 1
            cks.append(ck)
            sc_claims.append(SumcheckClaim(c.n_vars, 4,
                                           (CompositeSumClaim(_layer_composition(), values[j]),)))
            eq_ml = sc_prove.eq_ind_expansion_multilinear(points[j])
            w = witnesses[j]
            ck_ml = (LEVEL, tower.full(LEVEL, (1 << c.n_vars,), ck))
            provers.append(sc_prove.RegularSumcheckProver(
                sc_claims[-1], [eq_ml, (LEVEL, w.layers[k]), (0, w.bits[k]), ck_ml],
                order_high=False, eq_ind_challenges=tuple(points[j])))
        order = sorted(range(len(active)), key=lambda i: -sc_claims[i].n_vars)
        out = sc_prove.batch_prove([provers[i] for i in order], transcript)
        n_rounds = max(sc.n_vars for sc in sc_claims)
        for oi, evals in zip(order, out.multilinear_evals):
            j = active[oi]
            c = claims[j]
            k = c.n_bits - 1 - k_down
            _, v_eval, b_eval, _ck_eval = evals
            pt = sc_verify.claim_point(n_rounds, c.n_vars, out.challenges, False)
            bit_claims[j].append((k, tuple(pt), b_eval))
            points[j] = list(pt)
            values[j] = v_eval
    return ExpOutput(bit_claims, [list(p) for p in points])


def batch_verify(claims: list[StaticExpClaim], transcript) -> ExpOutput:
    points = [list(c.eval_point) for c in claims]
    values = [c.eval for c in claims]
    max_bits = max((c.n_bits for c in claims), default=0)
    bit_claims = [[] for _ in claims]
    for k_down in range(max_bits):
        active = [j for j, c in enumerate(claims) if c.n_bits > k_down]
        sc_claims, eq_pts, cks = [], [], []
        for j in active:
            c = claims[j]
            k = c.n_bits - 1 - k_down
            ck = scalar.pow(LEVEL, c.base, 1 << k) ^ 1
            cks.append(ck)
            sc_claims.append(SumcheckClaim(c.n_vars, 4,
                                           (CompositeSumClaim(_layer_composition(), values[j]),)))
            eq_pts.append(list(points[j]))
        order = sorted(range(len(active)), key=lambda i: -sc_claims[i].n_vars)
        ver = sc_verify.batch_verify([sc_claims[i] for i in order], transcript, False,
                                     [eq_pts[i] for i in order])
        n_rounds = max(sc.n_vars for sc in sc_claims)
        for oi, evals in zip(order, ver.multilinear_evals):
            j = active[oi]
            c = claims[j]
            k = c.n_bits - 1 - k_down
            _, v_eval, b_eval, ck_eval = evals
            if ck_eval != cks[oi]:
                raise ValueError("exp layer constant evaluation mismatch")
            pt = sc_verify.claim_point(n_rounds, c.n_vars, ver.challenges, False)
            bit_claims[j].append((k, tuple(pt), b_eval))
            points[j] = list(pt)
            values[j] = v_eval
    # V_0 is identically 1
    for j, v in enumerate(values):
        if v != 1:
            raise ValueError(f"exp claim {j}: base layer is not one")
    return ExpOutput(bit_claims, [list(p) for p in points])
