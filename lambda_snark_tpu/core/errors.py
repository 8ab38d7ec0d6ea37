"""Typed error hierarchy for lambda_snark_tpu.

Mirrors the error surface of the reference stack:
- Rust ``Error`` enums (reference ``rust-api/lambda-snark/src/lib.rs:104-125``,
  ``rust-api/lambda-snark-core/src/lib.rs:217-236``)
- C ``LambdaSnarkError`` codes (reference ``cpp-core/include/lambda_snark/types.h:71-79``)
"""

from __future__ import annotations


class LambdaSnarkError(Exception):
    """Base class for all framework errors."""


class InvalidInputError(LambdaSnarkError):
    """Invalid user input (bad parameters, malformed data)."""


class InvalidParamsError(LambdaSnarkError):
    """Parameter validation failure (``Params::validate`` analog)."""


class InvalidWitnessError(LambdaSnarkError):
    """Witness does not satisfy the constraint system.

    Raised where the reference returns
    ``Err("Witness does not satisfy R1CS constraints")``
    (reference ``r1cs.rs:477-481``) or a non-exact vanishing division
    (reference ``r1cs.rs:1052-1057``).
    """


class CommitmentError(LambdaSnarkError):
    """Commitment generation/combination failure (``CoreError::CommitmentFailed``)."""


class InvalidDimensionsError(LambdaSnarkError):
    """Dimension mismatch (``Error::InvalidDimensions`` analog)."""


class SerializationError(LambdaSnarkError):
    """Proof/artifact (de)serialization failure."""


class DomainError(LambdaSnarkError):
    """No valid interpolation domain for the requested (modulus, m) pair."""
