"""Phase-2 protocol checks: lincheck / mulcheck (interface placeholders).

API-shape parity with the reference's explicitly stubbed phase-2 modules
(``cpp-core/src/lincheck.cpp`` / ``mulcheck.cpp`` — empty "Phase 2"
placeholders). The current protocol binds A_z/B_z/C_z only through the
dual-challenge quotient identity; full lincheck (A_z/B_z/C_z consistent with
the committed witness via a sumcheck-style argument) and mulcheck (Hadamard
relation) are the planned phase-2 soundness upgrades. These entry points
define the interface now so callers can feature-gate on availability.
"""

from __future__ import annotations

from typing import Sequence

from ..core.errors import LambdaSnarkError


class NotYetImplementedCheck(LambdaSnarkError):
    """Raised by phase-2 placeholder checks."""


def lincheck_prove(r1cs, witness: Sequence[int], transcript_seed: int):
    """Phase 2: prove A_z/B_z/C_z are the matrix images of the committed z."""
    raise NotYetImplementedCheck(
        "lincheck is a phase-2 feature (reference cpp-core/src/lincheck.cpp "
        "is the same placeholder)"
    )


def mulcheck_prove(r1cs, witness: Sequence[int], transcript_seed: int):
    """Phase 2: prove the Hadamard relation (Az) o (Bz) = Cz directly."""
    raise NotYetImplementedCheck(
        "mulcheck is a phase-2 feature (reference cpp-core/src/mulcheck.cpp "
        "is the same placeholder)"
    )


def available() -> bool:
    return False
