"""Statement-level M3 prove/verify with prover-chosen table sizes.

Counterpart of the reference's top-level flow (`constraint_system/prove.rs`
+ `verify.rs` driven from `m3`): table row counts are part of the PROOF —
the prover writes them as the first transcript message (`prove.rs:177`), and
the verifier reads them back, instantiates the step-down-masked system for
those sizes, and verifies against it (`verify.rs:390-430`).
"""

from __future__ import annotations

from ...constraint_system import prove as csp


def m3_prove(m3_system, witness_index, boundaries: list = (),
             log_inv_rate: int = 1) -> bytes:
    """Prove an M3 system at the witness index's table sizes."""
    sizes = witness_index.table_sizes
    core, omap = m3_system.compile_sizes(sizes)
    witness = witness_index.to_core_witness(core, omap)
    return csp.prove(core, witness, boundaries, log_inv_rate, table_sizes=sizes)


def m3_verify(m3_system, proof: bytes, boundaries: list = (),
              log_inv_rate: int = 1) -> None:
    """Verify an M3 proof: table sizes come from the proof itself."""
    sizes = csp.peek_table_sizes(proof)
    if len(sizes) != len(m3_system.tables):
        raise ValueError("proof table-size count does not match the system")
    core, _ = m3_system.compile_sizes(sizes)
    csp.verify(core, proof, boundaries, log_inv_rate, table_sizes=sizes)
