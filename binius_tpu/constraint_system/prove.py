"""Top-level constraint-system prover and verifier.

Mirrors the phase structure of `crates/core/src/constraint_system/prove.rs:74`
and `verify.rs:55` (channels/flushes and GKR-exp phases land in the next
milestones):

  1. setup: observe the constraint-system digest;
  2. commit: pack committed columns, build commit meta + FRI params, RS
     encode + Merkle commit, root -> transcript;
  3. zerocheck over all constraint sets (eq-ind sumcheck reduction);
  4. evalcheck: reduce virtual-oracle claims to committed claims;
  5. ring switch: committed small-field claims -> PIOP sumcheck claims;
  6. PIOP: interleaved sumcheck + FRI opening;
  7. finalize -> proof bytes.
"""

from __future__ import annotations

import dataclasses

from ..math.arith import CompositionPoly
from ..protocols import evalcheck, ring_switch
from ..protocols import fri as fri_mod
from ..protocols import piop
from ..protocols.sumcheck import zerocheck as zc
from ..protocols.sumcheck.common import LEVEL
from ..transcript.transcript import ProverTranscript, VerifierTranscript
from . import oracle as om
from .system import ConstraintSystem

SECURITY_BITS = 100


@dataclasses.dataclass
class CommitLayout:
    """Deterministic ordering of committed oracles for the PIOP batch."""

    oracle_ids: list       # committed oracle ids, ascending by packed n_vars
    packed_n_vars: list
    commit_meta: piop.CommitMeta
    oracle_to_idx: dict

    @staticmethod
    def from_system(system: ConstraintSystem) -> "CommitLayout":
        ids = system.oracles.committed_ids()
        keyed = []
        for oid in ids:
            o = system.oracles[oid]
            packed = o.n_vars + o.tower_level - 7
            assert packed >= 0, "tiny committed columns not yet supported"
            keyed.append((packed, oid))
        keyed.sort()
        ordered = [oid for _, oid in keyed]
        packed_vars = [p for p, _ in keyed]
        max_v = max(packed_vars, default=0)
        counts = [0] * (max_v + 1)
        for p in packed_vars:
            counts[p] += 1
        return CommitLayout(ordered, packed_vars,
                            piop.CommitMeta(tuple(counts)),
                            {oid: i for i, oid in enumerate(ordered)})


def make_fri_params(commit_meta: piop.CommitMeta, log_inv_rate: int) -> fri_mod.FRIParams:
    return piop.make_commit_params(commit_meta, SECURITY_BITS, log_inv_rate)


def _zerocheck_claims(system: ConstraintSystem):
    """(sorted constraint sets desc by n_vars, zerocheck claims)."""
    sets = sorted(system.constraint_sets, key=lambda s: -s.n_vars)
    claims = [zc.ZerocheckClaim(s.n_vars, len(s.oracle_ids),
                                tuple(CompositionPoly(e, len(s.oracle_ids))
                                      for e in s.zero_constraints))
              for s in sets]
    return sets, claims


def _to_evalcheck_claims(sets, ver_or_out, challenges_order_high):
    """Zerocheck outputs -> evalcheck claims on the participating oracles."""
    from ..protocols.sumcheck import verify as sc_verify
    n_rounds = sets[0].n_vars if sets else 0
    out = []
    for s, evals in zip(sets, ver_or_out.multilinear_evals):
        pt = tuple(sc_verify.claim_point(n_rounds, s.n_vars, ver_or_out.challenges,
                                         challenges_order_high))
        for oid, ev in zip(s.oracle_ids, evals[1:]):  # skip eq multilinear
            out.append(evalcheck.EvalcheckClaim(oid, pt, ev))
    return out


def prove(system: ConstraintSystem, witness: dict, log_inv_rate: int = 1) -> bytes:
    """witness: oracle id -> (level, device data) for committed and virtual
    oracles (prover materializes virtual columns during witness generation)."""
    transcript = ProverTranscript()
    transcript.observe().write_bytes(system.digest())

    # --- commit phase ---
    layout = CommitLayout.from_system(system)
    fri_params = make_fri_params(layout.commit_meta, log_inv_rate)
    packed_mles = []
    for oid, packed_vars in zip(layout.oracle_ids, layout.packed_n_vars):
        o = system.oracles[oid]
        level, data = witness[oid]
        assert level == o.tower_level
        packed, pv = piop.pack_multilinear(level, data, o.n_vars)
        assert pv == packed_vars
        packed_mles.append((packed, pv))
    codeword, tree, _ = piop.commit(fri_params, layout.commit_meta, packed_mles)
    transcript.message().write_bytes(tree.root)

    # --- zerocheck phase ---
    sets, claims = _zerocheck_claims(system)
    mls_per_claim = [[witness[oid] for oid in s.oracle_ids] for s in sets]
    zc_out = zc.batch_prove(claims, mls_per_claim, transcript, order_high=False)
    ec_claims = _to_evalcheck_claims(sets, zc_out, False)

    # --- evalcheck phase ---
    committed_claims = evalcheck.prove(system.oracles, witness, ec_claims, transcript)

    # --- ring switch ---
    rs_claims = _ring_switch_claims(system, layout, committed_claims)
    witnesses_by_idx = [witness[oid] for oid in layout.oracle_ids]
    reduced = ring_switch.prove(rs_claims, witnesses_by_idx, transcript)

    # --- PIOP ---
    piop.prove(fri_params, layout.commit_meta, codeword, tree, packed_mles,
               reduced.transparent_mles, reduced.sumcheck_claims, transcript)
    return transcript.finalize()


def _ring_switch_claims(system, layout, committed_claims):
    keyed = []
    for c in committed_claims:
        o = system.oracles[c.oracle_id]
        idx = layout.oracle_to_idx[c.oracle_id]
        packed = layout.packed_n_vars[idx]
        keyed.append((packed, idx, ring_switch.RingSwitchEvalClaim(
            idx, o.tower_level, tuple(c.point), c.eval)))
    keyed.sort(key=lambda t: (t[0], t[1]))
    return [k[2] for k in keyed]


def verify(system: ConstraintSystem, proof: bytes, log_inv_rate: int = 1) -> None:
    transcript = VerifierTranscript(proof)
    transcript.observe().write_bytes(system.digest())

    layout = CommitLayout.from_system(system)
    fri_params = make_fri_params(layout.commit_meta, log_inv_rate)
    commitment = transcript.message().read_bytes(32)

    sets, claims = _zerocheck_claims(system)
    zc_ver = zc.batch_verify(claims, transcript, order_high=False)
    ec_claims = _to_evalcheck_claims(sets, zc_ver, False)

    committed_claims = evalcheck.verify(system.oracles, ec_claims, transcript)

    rs_claims = _ring_switch_claims(system, layout, committed_claims)
    reduced = ring_switch.verify(rs_claims, transcript)

    piop.verify(fri_params, layout.commit_meta, commitment,
                reduced.transparent_mles, reduced.sumcheck_claims, transcript)
    transcript.finalize()
