"""M3 test utilities.

Mirrors `crates/m3/src/builder/test_utils.rs:69-93`: gadget tests validate
the witness directly (cheap integration test); setting the env flag
BINIUS_M3_TEST_PROVE_VERIFY=1 upgrades them to full prove+verify, as the
reference's CI integration job does.
"""

from __future__ import annotations

import os

from ...constraint_system import prove as csp
from ...constraint_system.system import validate_witness


def validate_system_witness(core_system, witness, boundaries=()) -> None:
    validate_witness(core_system, witness)
    if os.environ.get("BINIUS_M3_TEST_PROVE_VERIFY") == "1":
        proof = csp.prove(core_system, witness, boundaries)
        csp.verify(core_system, proof, boundaries)
