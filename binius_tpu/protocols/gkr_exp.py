"""GKR exponentiation: prove a column equals base^(bit-composed exponent).

Mirrors `crates/core/src/protocols/gkr_exp/` (witness.rs, provers.rs,
compositions.rs, oracles.rs): with bit columns b_0..b_{n-1} (LSB first) and a
base g (public constant or witness multilinear a), the result column is
base^(sum_k 2^k b_k). Evaluation claims on the result walk down one circuit
layer per eq-indicator sumcheck, exporting evaluation claims on the bit
columns (and, for dynamic bases, on the base multilinear at every layer).

Circuits (all in char-2, so 1 - b = 1 + b):
  * static base g (`witness.rs new_with_static_base`): LSB-first
    square-the-base: V_{j+1} = V_j * (1 + b_j (1 + g^{2^j})); layer
    composition eq * V * (1 + b C_j) with C_j = g^{2^j} + 1 entering as a
    constant-valued multilinear (one compiled kernel for all layers). The
    bottom layer V_1 = 1 + b_0 C_0 is linear in b_0, so the final bit claim
    is recovered algebraically (`utils.rs first_layer_inverse`) without a
    sumcheck.
  * dynamic base a (`witness.rs new_with_dynamic_base`): MSB-first
    square-and-multiply: W_{j+1} = W_j^2 * (1 + b_{n-1-j} (1 + a)); layer
    composition eq * W^2 * (1 + b (1 + a)) (`compositions.rs DynamicBase`),
    last layer eq * (1 + b (1 + a)) (`DynamicBaseLastLayer`).

TPU-first: layer witnesses are computed by ONE `lax.scan` kernel per claim
at the base's tower level, and each circuit layer's sumchecks across all
claims run as one rear-loaded batch (`batch_prove.rs` analog).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

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


@dataclasses.dataclass(frozen=True)
class DynamicExpClaim:
    """Claim: result = a^bits where a is a witness multilinear (the dynamic
    base, `common.rs ExpClaim { static_base: None }`)."""

    n_vars: int
    n_bits: int
    eval_point: tuple
    eval: int


def _is_static(claim) -> bool:
    return isinstance(claim, StaticExpClaim)


@functools.partial(jax.jit, static_argnums=(0,))
def _static_layers_jit(level: int, bits_stack, g_stack):
    """V_j layers for the static circuit: bits_stack (n_bits, 2^n) uint32
    0/1, g_stack (n_bits, [limbs]) with g_j = base^(2^j) at `level`.
    Returns (n_bits, 2^n, [limbs]): [V_1, ..., V_n]."""
    n = bits_stack.shape[1]
    one = tower.full(level, (n,), 1)

    def step(v, xs):
        b, g = xs
        factor = tower.select(level, b, jnp.broadcast_to(g, v.shape), one)
        nxt = tower.mul(level, v, factor)
        return nxt, nxt

    _, ys = jax.lax.scan(step, one, (bits_stack, g_stack))
    return ys


@functools.partial(jax.jit, static_argnums=(0,))
def _dynamic_layers_jit(level: int, bits_stack_msb, base):
    """W_j layers for the dynamic circuit: bits_stack_msb (n_bits, 2^n)
    uint32 0/1 MSB FIRST, base (2^n, [limbs]) at `level`.
    Returns (n_bits, 2^n, [limbs]): [W_1, ..., W_n]."""
    n = bits_stack_msb.shape[1]
    one = tower.full(level, (n,), 1)

    def step(w, b):
        factor = tower.select(level, b, base, one)
        nxt = tower.mul(level, tower.square(level, w), factor)
        return nxt, nxt

    _, ys = jax.lax.scan(step, one, bits_stack_msb)
    return ys


@dataclasses.dataclass
class ExpWitness:
    """Layer witnesses of one exponentiation circuit.

    layers[j] = layer j+1 data ((2^n, [limbs]) at `level`); bits LSB-first
    (level-0 uint32 0/1 data); base = (base_level, data) for dynamic bases.
    """

    level: int
    n_vars: int
    layers: object  # stacked (n_bits, 2^n, [limbs]) device array
    bits: list
    base: tuple | None = None

    @property
    def result(self):
        return self.layers[-1]

    def layer(self, j: int):
        """Data of layer j (1-indexed: layer(1) = first circuit layer)."""
        return self.layers[j - 1]

    @staticmethod
    def static(n_vars: int, base: int, bit_datas: list,
               level: int = LEVEL) -> "ExpWitness":
        gs = []
        g = base
        for _ in bit_datas:
            gs.append(g)
            g = scalar.square(level, g)
        g_stack = jnp.stack([tower.full(level, (), gi) for gi in gs], axis=0)
        bits_stack = jnp.stack(bit_datas, axis=0)
        layers = _static_layers_jit(level, bits_stack, g_stack)
        return ExpWitness(level, n_vars, layers, list(bit_datas))

    @staticmethod
    def dynamic(n_vars: int, base: tuple, bit_datas: list,
                level: int = LEVEL) -> "ExpWitness":
        blvl, bdata = base
        if blvl < level:
            bdata = tower.embed(blvl, level, bdata)
        bits_msb = jnp.stack(list(reversed(bit_datas)), axis=0)
        layers = _dynamic_layers_jit(level, bits_msb, bdata)
        return ExpWitness(level, n_vars, layers, list(bit_datas), (level, bdata))


class StaticExpWitness(ExpWitness):
    """Back-compat constructor (round-1 API)."""

    @staticmethod
    def compute(n_vars: int, base: int, bit_datas: list,
                level: int = LEVEL) -> ExpWitness:
        return ExpWitness.static(n_vars, base, bit_datas, level)


# Compositions are shared across layers/claims for kernel reuse: the static
# layer constant C_j enters as a constant-valued multilinear; the verifier
# checks its claimed eval equals C_j directly.
@functools.lru_cache(maxsize=None)
def _static_layer_comp() -> CompositionPoly:
    """eq * V * (1 + C * b): vars (eq, V, b, C)."""
    eq, v, b, c = (ArithExpr.var(i) for i in range(4))
    return CompositionPoly(eq * (v * (ArithExpr.const(1) + c * b)), 4)


@functools.lru_cache(maxsize=None)
def _dynamic_layer_comp() -> CompositionPoly:
    """eq * W^2 * (1 + b * (1 + a)): vars (eq, W, b, a)."""
    eq, w, b, a = (ArithExpr.var(i) for i in range(4))
    return CompositionPoly(eq * (w * w * (ArithExpr.const(1) + b * (ArithExpr.const(1) + a))), 4)


@functools.lru_cache(maxsize=None)
def _dynamic_last_comp() -> CompositionPoly:
    """eq * (1 + b * (1 + a)): vars (eq, b, a)."""
    eq, b, a = (ArithExpr.var(i) for i in range(3))
    return CompositionPoly(eq * (ArithExpr.const(1) + b * (ArithExpr.const(1) + a)), 3)


@dataclasses.dataclass
class ExpOutput:
    bit_claims: list   # per claim: list of (bit_index, point, eval) claims
    base_claims: list  # per claim: list of (point, eval) on the dynamic base


def _layer_no(claim, k_down: int) -> int:
    """Circuit layer processed at walk step k_down (top layer first)."""
    return claim.n_bits - k_down


def _bit_index(claim, layer: int) -> int:
    """Which exponent bit layer `layer` consumes (LSB-first indexing)."""
    if _is_static(claim):
        return layer - 1
    return claim.n_bits - layer


def _static_c(claim, layer: int) -> int:
    return scalar.pow(LEVEL, claim.base, 1 << (layer - 1)) ^ 1


def batch_prove(claims: list, witnesses: list, transcript) -> ExpOutput:
    points = [list(c.eval_point) for c in claims]
    values = [c.eval for c in claims]
    max_bits = max((c.n_bits for c in claims), default=0)
    bit_claims = [[] for _ in claims]
    base_claims = [[] for _ in claims]
    for k_down in range(max_bits):
        active = [j for j, c in enumerate(claims) if c.n_bits > k_down]
        sc_claims, provers, metas = [], [], []
        for j in active:
            c = claims[j]
            w = witnesses[j]
            layer = _layer_no(c, k_down)
            bi = _bit_index(c, layer)
            eq_ml = (LEVEL, _eq_expansion(points[j]))
            if _is_static(c):
                if layer == 1:
                    # linear bottom layer: recover the bit eval directly
                    _static_first_layer(c, points[j], values[j], bit_claims[j])
                    continue
                ck = _static_c(c, layer)
                sc_claim = SumcheckClaim(c.n_vars, 4,
                                         (CompositeSumClaim(_static_layer_comp(), values[j]),))
                ck_ml = (LEVEL, tower.full(LEVEL, (1 << c.n_vars,), ck))
                mls = [eq_ml, (w.level, w.layer(layer - 1)), (0, w.bits[bi]), ck_ml]
            elif layer == 1:
                sc_claim = SumcheckClaim(c.n_vars, 3,
                                         (CompositeSumClaim(_dynamic_last_comp(), values[j]),))
                mls = [eq_ml, (0, w.bits[bi]), w.base]
            else:
                sc_claim = SumcheckClaim(c.n_vars, 4,
                                         (CompositeSumClaim(_dynamic_layer_comp(), values[j]),))
                mls = [eq_ml, (w.level, w.layer(layer - 1)), (0, w.bits[bi]), w.base]
            sc_claims.append(sc_claim)
            metas.append(j)
            provers.append(sc_prove.RegularSumcheckProver(
                sc_claim, mls, order_high=False,
                eq_ind_challenges=tuple(points[j])))
        if not provers:
            continue
        order = sorted(range(len(provers)), key=lambda i: -sc_claims[i].n_vars)
        out = sc_prove.batch_prove([provers[i] for i in order], transcript)
        n_rounds = max(sc.n_vars for sc in sc_claims)
        for oi, evals in zip(order, out.multilinear_evals):
            j = metas[oi]
            _absorb_layer_evals(claims[j], k_down, evals, None,
                                sc_verify.claim_point(n_rounds, sc_claims[oi].n_vars,
                                                      out.challenges, False),
                                points, values, bit_claims, base_claims, j)
    return ExpOutput(bit_claims, base_claims)


def batch_verify(claims: list, transcript) -> ExpOutput:
    points = [list(c.eval_point) for c in claims]
    values = [c.eval for c in claims]
    max_bits = max((c.n_bits for c in claims), default=0)
    bit_claims = [[] for _ in claims]
    base_claims = [[] for _ in claims]
    for k_down in range(max_bits):
        active = [j for j, c in enumerate(claims) if c.n_bits > k_down]
        sc_claims, eq_pts, metas = [], [], []
        for j in active:
            c = claims[j]
            layer = _layer_no(c, k_down)
            if _is_static(c):
                if layer == 1:
                    _static_first_layer(c, points[j], values[j], bit_claims[j])
                    continue
                sc_claim = SumcheckClaim(c.n_vars, 4,
                                         (CompositeSumClaim(_static_layer_comp(), values[j]),))
            elif layer == 1:
                sc_claim = SumcheckClaim(c.n_vars, 3,
                                         (CompositeSumClaim(_dynamic_last_comp(), values[j]),))
            else:
                sc_claim = SumcheckClaim(c.n_vars, 4,
                                         (CompositeSumClaim(_dynamic_layer_comp(), values[j]),))
            sc_claims.append(sc_claim)
            eq_pts.append(list(points[j]))
            metas.append(j)
        if not sc_claims:
            continue
        order = sorted(range(len(sc_claims)), key=lambda i: -sc_claims[i].n_vars)
        ver = sc_verify.batch_verify([sc_claims[i] for i in order], transcript, False,
                                     [eq_pts[i] for i in order])
        n_rounds = max(sc.n_vars for sc in sc_claims)
        for oi, evals in zip(order, ver.multilinear_evals):
            j = metas[oi]
            c = claims[j]
            layer = _layer_no(c, k_down)
            if _is_static(c):
                ck_eval = evals[3]
                if ck_eval != _static_c(c, layer):
                    raise ValueError("exp layer constant evaluation mismatch")
            _absorb_layer_evals(c, k_down, evals, None,
                                sc_verify.claim_point(n_rounds, sc_claims[oi].n_vars,
                                                      ver.challenges, False),
                                points, values, bit_claims, base_claims, j)
    # every walk ends at a linear/last layer; static bottoms checked above,
    # dynamic claims consumed their last layer as a sumcheck. Nothing left.
    return ExpOutput(bit_claims, base_claims)


def _absorb_layer_evals(claim, k_down: int, evals, _unused, pt, points, values,
                        bit_claims, base_claims, j) -> None:
    layer = _layer_no(claim, k_down)
    bi = _bit_index(claim, layer)
    pt = tuple(pt)
    if _is_static(claim):
        _, v_eval, b_eval, _ck = evals
        bit_claims[j].append((bi, pt, b_eval))
        points[j] = list(pt)
        values[j] = v_eval
    elif layer == 1:
        _, b_eval, a_eval = evals
        bit_claims[j].append((bi, pt, b_eval))
        base_claims[j].append((pt, a_eval))
        points[j] = list(pt)
        values[j] = None
    else:
        _, w_eval, b_eval, a_eval = evals
        bit_claims[j].append((bi, pt, b_eval))
        base_claims[j].append((pt, a_eval))
        points[j] = list(pt)
        values[j] = w_eval


def _static_first_layer(claim, point, value, out_bit_claims) -> None:
    """V_1 = 1 + C_0 b_0 is linear: b_0(pt) = (V_1(pt) + 1) / C_0
    (`gkr_exp/utils.rs first_layer_inverse`). No transcript interaction."""
    c0 = _static_c(claim, 1)
    b_eval = scalar.mul(LEVEL, value ^ 1, scalar.invert(LEVEL, c0))
    out_bit_claims.append((0, tuple(point), b_eval))


def _eq_expansion(point: list[int]):
    from ..math import mle
    return mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, point))
