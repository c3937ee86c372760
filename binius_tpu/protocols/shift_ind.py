"""Shift indicator transparent polynomials (DP23 §4.3).

Semantics match `crates/core/src/transparent/shift_ind.rs`:

  * CircularLeft(o):  shifted[i] = f[(i+o) mod 2^b]
  * LogicalLeft(o):   shifted[i] = f[i+o]   (0 when i+o >= 2^b)
  * LogicalRight(o):  shifted[i] = f[i-o]   (0 when i < o)

so shift_ind(x, y) = 1 iff reading f at y contributes to shifted at x.
Both the partial MLE over y (prover side, given a field point x = r) and the
full evaluation at field points (verifier side) are computed by a carry DP
over the offset's bits: the logical-left indicator is the no-carry-out path
of the binary addition y = x + o, logical-right swaps roles, and circular =
LL(o) + LR(2^b - o) (disjoint supports).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import scalar, tower

LEVEL = 7

CIRCULAR_LEFT = "circular_left"
LOGICAL_LEFT = "logical_left"
LOGICAL_RIGHT = "logical_right"


def _ll_transition(o_k: int, xb: int, c: int) -> tuple[int, int]:
    """Boolean transition for y = x + o: given bit of x and carry-in, the
    required y bit and carry-out."""
    y_req = xb ^ o_k ^ c
    c_out = 1 if (xb + o_k + c) >= 2 else 0
    return y_req, c_out


def _ll_eval_scalar(b: int, o: int, x: list[int], y: list[int]) -> int:
    """Evaluate the logical-left(o) indicator at field points x, y (len b)."""
    # S[c] = accumulated weight with carry c
    s = [1, 0]
    one = 1
    for k in range(b):
        o_k = (o >> k) & 1
        ns = [0, 0]
        for c in (0, 1):
            if s[c] == 0:
                continue
            for xb in (0, 1):
                wx = x[k] if xb else x[k] ^ one
                y_req, c_out = _ll_transition(o_k, xb, c)
                wy = y[k] if y_req else y[k] ^ one
                w = scalar.mul(LEVEL, s[c], scalar.mul(LEVEL, wx, wy))
                ns[c_out] ^= w
        s = ns
    return s[0]


def evaluate_scalar(variant: str, b: int, o: int, x: list[int], y: list[int]) -> int:
    """shift_ind(x, y) at field points (verifier side)."""
    if variant == LOGICAL_LEFT:
        return _ll_eval_scalar(b, o, x, y)
    if variant == LOGICAL_RIGHT:
        return _ll_eval_scalar(b, o, y, x)
    if variant == CIRCULAR_LEFT:
        out = _ll_eval_scalar(b, o, x, y)
        out ^= _ll_eval_scalar(b, (1 << b) - o, y, x)
        return out
    raise ValueError(variant)


def _ll_partial_mle(b: int, o: int, x_point):
    """Device MLE over hypercube y of LL(o) indicator at x = x_point
    (list of b B128 ints). Returns a (2^b,) B128 array."""
    s = {0: tower.full(LEVEL, (1,), 1), 1: tower.zeros(LEVEL, (1,))}
    one = tower.full(LEVEL, (), 1)
    for k in range(b):
        o_k = (o >> k) & 1
        xk = x_point[k]
        wx = {1: xk, 0: tower.add(LEVEL, xk, one)}
        # new S'[c'] over (.., y_k): y_k branch chosen by required bit
        contrib = {(0, 0): None, (0, 1): None, (1, 0): None, (1, 1): None}  # (c_out, y_k)
        for c in (0, 1):
            for xb in (0, 1):
                y_req, c_out = _ll_transition(o_k, xb, c)
                term = tower.mul(LEVEL, s[c], wx[xb])
                key = (c_out, y_req)
                contrib[key] = term if contrib[key] is None else tower.add(LEVEL, contrib[key], term)
        ns = {}
        for c_out in (0, 1):
            lo = contrib[(c_out, 0)]
            hi = contrib[(c_out, 1)]
            zero = jnp.zeros_like(s[0])
            lo = zero if lo is None else lo
            hi = zero if hi is None else hi
            ns[c_out] = jnp.concatenate([lo, hi], axis=0)
        s = ns
    return s[0]


def partial_mle(variant: str, b: int, o: int, x_point: list[int]):
    """Device MLE over y of shift_ind(x_point, y); x_point: b B128 ints."""
    xs = [tower.from_ints(LEVEL, [v])[0] for v in x_point]
    if variant == LOGICAL_LEFT:
        return _ll_partial_mle(b, o, xs)
    if variant == LOGICAL_RIGHT:
        return _lr_partial_mle(b, o, xs)
    if variant == CIRCULAR_LEFT:
        a = _ll_partial_mle(b, o, xs)
        c = _lr_partial_mle(b, (1 << b) - o, xs)
        return tower.add(LEVEL, a, c)
    raise ValueError(variant)


def _lr_partial_mle(b: int, o: int, xs):
    """MLE over y of LR-style indicator where the DP matches on x with carry
    from y: LL(o) evaluated as (y, x) swapped -> roles: y is now the 'adder'."""
    s = {0: tower.full(LEVEL, (1,), 1), 1: tower.zeros(LEVEL, (1,))}
    one = tower.full(LEVEL, (), 1)
    for k in range(b):
        o_k = (o >> k) & 1
        xk = xs[k]
        wx = {1: xk, 0: tower.add(LEVEL, xk, one)}
        contrib = {}
        for c in (0, 1):
            for yb in (0, 1):
                x_req, c_out = _ll_transition(o_k, yb, c)
                term = tower.mul(LEVEL, s[c], wx[x_req])
                key = (c_out, yb)
                contrib[key] = term if contrib.get(key) is None else tower.add(LEVEL, contrib[key], term)
        ns = {}
        for c_out in (0, 1):
            lo = contrib.get((c_out, 0))
            hi = contrib.get((c_out, 1))
            zero = jnp.zeros_like(s[0])
            lo = zero if lo is None else lo
            hi = zero if hi is None else hi
            ns[c_out] = jnp.concatenate([lo, hi], axis=0)
        s = ns
    return s[0]


def apply_shift_ints(variant: str, b: int, o: int, vals: list[int]) -> list[int]:
    """Reference shifted-column semantics on raw data (for tests/witness gen).

    Applies the shift within each block of 2^b entries.
    """
    n = len(vals)
    size = 1 << b
    out = [0] * n
    for blk in range(0, n, size):
        for i in range(size):
            if variant == CIRCULAR_LEFT:
                out[blk + i] = vals[blk + (i + o) % size]
            elif variant == LOGICAL_LEFT:
                out[blk + i] = vals[blk + i + o] if i + o < size else 0
            elif variant == LOGICAL_RIGHT:
                out[blk + i] = vals[blk + i - o] if i >= o else 0
    return out
