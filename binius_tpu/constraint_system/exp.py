"""Exponentiation phase of the constraint system (GKR-exp integration).

Mirrors `crates/core/src/constraint_system/exp.rs` + the exp phase of
`prove.rs:236-274` / `verify.rs:121-150`: each `Exp` asserts that a committed
result column equals base^(bit-composed exponent) over LSB-first bit-column
oracles, with the base either a public constant or another oracle (dynamic).

Phase protocol (after commit, before the grand-product phase):
  1. sample `max_n_vars` challenge scalars;
  2. prover writes the result-column evals at the per-exp challenge prefix;
  3. GKR-exp batch reduction (`protocols/gkr_exp.py`) walks the circuits
     down, exporting evalcheck claims on every bit column (and dynamic base);
  4. departure from the reference (deliberate, sounder): the claimed result
     evals are ALSO emitted as evalcheck claims on the committed result
     oracles, binding the committed column to the circuit output. The
     reference leaves that link implicit (`exp.rs make_claims` only ever
     creates circuit claims).

Prover-side witness layers are computed on device by one `lax.scan` kernel
per exp (`protocols/gkr_exp.py ExpWitness`), at the base's tower level.
"""

from __future__ import annotations

import dataclasses

from ..fields import tower
from ..math import mle
from ..protocols import gkr_exp
from ..protocols.sumcheck.common import LEVEL


@dataclasses.dataclass(frozen=True)
class Exp:
    """One exponentiation assertion (`constraint_system/exp.rs:34-39`).

    bits_ids: exponent bit-column oracle ids, little-endian bit order.
    base_const / base_oracle: exactly one set (static vs dynamic base).
    base_level: tower level of the base (= result column level).
    """

    bits_ids: tuple
    exp_result_id: int
    base_level: int
    base_const: int | None = None
    base_oracle: int | None = None

    def __post_init__(self):
        assert (self.base_const is None) != (self.base_oracle is None)
        assert len(self.bits_ids) <= 1 << self.base_level

    def n_vars(self, oracles) -> int:
        return oracles[self.exp_result_id].n_vars

    def tokens(self) -> tuple:
        return ("exp", self.bits_ids, self.exp_result_id, self.base_level,
                self.base_const, self.base_oracle)


def reorder(exponents: list[Exp], oracles) -> list[Exp]:
    """Descending n_vars, static before dynamic (`exp.rs reorder_exponents`:
    dynamic witnesses may consume static results)."""
    return sorted(exponents,
                  key=lambda e: (-e.n_vars(oracles), e.base_const is None))


def max_n_vars(exponents: list[Exp], oracles) -> int:
    return max((e.n_vars(oracles) for e in exponents), default=0)


def make_exp_witnesses(system, witness: dict) -> list:
    """Compute layer witnesses for each exp IN REORDERED ORDER and fill
    `witness[exp_result_id]` (the committed result columns the M3 user never
    fills; `exp.rs make_exp_witnesses`). Returns [ExpWitness]."""
    from . import witness as witness_mod
    out = []
    for e in reorder(system.exponents, system.oracles):
        n = e.n_vars(system.oracles)
        bit_datas = []
        for bid in e.bits_ids:
            lvl, data = witness_mod.materialize(system.oracles, witness, bid)
            assert lvl == 0, "exponent bits must be B1 columns"
            bit_datas.append(data)
        if e.base_oracle is not None:
            witness_mod.materialize(system.oracles, witness, e.base_oracle)
        if e.base_const is not None:
            w = gkr_exp.ExpWitness.static(n, e.base_const, bit_datas,
                                          level=e.base_level)
        else:
            w = gkr_exp.ExpWitness.dynamic(n, tower.resolve_p1(*witness[e.base_oracle]),
                                           bit_datas, level=e.base_level)
        witness[e.exp_result_id] = (e.base_level, w.result)
        out.append(w)
    return out


def _make_claims(exponents, oracles, challenge, evals):
    claims = []
    for e, ev in zip(exponents, evals):
        n = e.n_vars(oracles)
        pt = tuple(challenge[:n])
        if e.base_const is not None:
            claims.append(gkr_exp.StaticExpClaim(n, len(e.bits_ids),
                                                 e.base_const, pt, ev))
        else:
            claims.append(gkr_exp.DynamicExpClaim(n, len(e.bits_ids), pt, ev))
    return claims


def prove_phase(system, witness: dict, exp_witnesses: list, transcript) -> list:
    """Run the exp phase on the prover transcript; returns evalcheck claims.
    `exp_witnesses` must come from `make_exp_witnesses` (reordered order)."""
    exponents = reorder(system.exponents, system.oracles)
    if not exponents:
        return []
    challenge = transcript.sample_scalars(LEVEL, max_n_vars(exponents, system.oracles))
    evals = _result_evals(exponents, system.oracles, witness, challenge)
    transcript.message().write_scalars(LEVEL, evals)
    claims = _make_claims(exponents, system.oracles, challenge, evals)
    out = gkr_exp.batch_prove(claims, exp_witnesses, transcript)
    return _eval_claims(exponents, system.oracles, challenge, evals, out)


def verify_phase(system, transcript) -> list:
    exponents = reorder(system.exponents, system.oracles)
    if not exponents:
        return []
    challenge = transcript.sample_scalars(LEVEL, max_n_vars(exponents, system.oracles))
    evals = transcript.message().read_scalars(LEVEL, len(exponents))
    claims = _make_claims(exponents, system.oracles, challenge, evals)
    out = gkr_exp.batch_verify(claims, transcript)
    return _eval_claims(exponents, system.oracles, challenge, evals, out)


def _eval_claims(exponents, oracles, challenge, evals, out: gkr_exp.ExpOutput):
    from ..protocols.evalcheck import EvalcheckClaim
    ec = []
    for e, ev, bits, bases in zip(exponents, evals, out.bit_claims, out.base_claims):
        n = e.n_vars(oracles)
        # result binding (see module docstring)
        ec.append(EvalcheckClaim(e.exp_result_id, tuple(challenge[:n]), ev))
        for bi, pt, bev in bits:
            ec.append(EvalcheckClaim(e.bits_ids[bi], pt, bev))
        for pt, aev in bases:
            ec.append(EvalcheckClaim(e.base_oracle, pt, aev))
    return ec


def _result_evals(exponents, oracles, witness, challenge) -> list[int]:
    """Batched device evaluation of each result column at its challenge
    prefix (grouped by (level, n_vars): one kernel per group)."""
    import jax.numpy as jnp
    groups: dict = {}
    for i, e in enumerate(exponents):
        lvl, _ = witness[e.exp_result_id]
        groups.setdefault((lvl, e.n_vars(oracles)), []).append(i)
    evals = [0] * len(exponents)
    for (lvl, n), idxs in groups.items():
        eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(challenge[:n])))
        stack = jnp.stack([witness[exponents[i].exp_result_id][1] for i in idxs],
                          axis=0)
        _, out = mle.batched_evaluate_partial_high(lvl, stack, n, eq, 0)
        vals = tower.to_ints(LEVEL, out[:, 0, :])
        for i, v in zip(idxs, vals):
            evals[i] = v
    return evals
