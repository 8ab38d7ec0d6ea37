"""Phase-2 protocol checks: lincheck / mulcheck (committed-witness binding).

The reference ships these as empty placeholders (``cpp-core/src/lincheck.cpp``
/ ``mulcheck.cpp`` — "Phase 2"), leaving a soundness gap it documents itself:
the base proof's A_z/B_z/C_z evaluations are prover-claimed scalars bound
only through the quotient identity, not to any committed witness
(SURVEY.md §3.1; ``lib.rs:788-791``).

This module implements the upgrade the reference planned:

- **lincheck**: the prover commits to the witness vector z (Module-LWE,
  seed-deterministic). The verifier checks the opening re-commits exactly,
  that z's public prefix equals the statement's public inputs (which are
  hashed into the proof's alpha — transcript binding), then recomputes
  A·z/B·z/C·z, interpolates, and evaluates at the proof's own alpha/beta:
  the six claimed evaluations must match. Any witness substitution now
  requires breaking the commitment.
- **mulcheck**: the Hadamard relation (A z) ∘ (B z) = C z checked directly
  on the committed witness.

Scope (documented, matching the rest of the opening layer): the opening
*reveals* z — binding is real, succinctness/ZK are not; this mirrors the
reference's own opening design (``opening.rs:104-115``, witness =
[randomness || coefficients]) and is the stepping stone to proximity-test
openings (ROADMAP #6). Use the base dual-challenge proof alone when z must
stay hidden.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from ..commit import lwe
from ..core import field
from ..core.errors import InvalidInputError, LambdaSnarkError
from ..proof.types import ProofR1CS, _Reader


class NotYetImplementedCheck(LambdaSnarkError):
    """Kept for API compatibility; phase-2 checks are now implemented."""


@dataclasses.dataclass(frozen=True)
class WitnessBinding:
    """Phase-2 attachment: LWE commitment to z plus its revealing opening."""

    commitment_z: lwe.Commitment
    seed: int
    z: tuple  # the revealed witness vector (ints mod q)

    _MAGIC = b"LSTW"  # wire tag

    def to_bytes(self) -> bytes:
        out = [
            self._MAGIC,
            len(self.z).to_bytes(8, "little"),
            b"".join(int(v).to_bytes(8, "little") for v in self.z),
            int(self.seed).to_bytes(8, "little"),
            len(self.commitment_z.words).to_bytes(8, "little"),
            self.commitment_z.to_bytes(),
        ]
        return b"".join(out)

    @staticmethod
    def from_bytes(data: bytes) -> "WitnessBinding":
        if data[:4] != WitnessBinding._MAGIC:
            raise InvalidInputError("bad witness-binding magic")
        r = _Reader(data[4:])
        n = r.u64()
        if n > 1 << 32:
            raise InvalidInputError("witness length out of range")
        z = tuple(r.u64() for _ in range(n))
        seed = r.u64()
        n_words = r.u64()
        comm = lwe.Commitment.from_bytes(r.bytes_(8 * n_words))
        return WitnessBinding(commitment_z=comm, seed=seed, z=z)


def lincheck_prove(
    r1cs, witness: Sequence[int], ctx: lwe.LweContext, seed: int
) -> WitnessBinding:
    """Commit to the witness z for phase-2 binding.

    Replaces the reference placeholder (``cpp-core/src/lincheck.cpp``).
    """
    q = r1cs.modulus
    z = tuple(int(v) % q for v in witness)
    if len(z) != r1cs.n:
        raise InvalidInputError(f"witness length {len(z)} != n = {r1cs.n}")
    commitment, _op = lwe.commit(ctx, list(z), seed)
    return WitnessBinding(commitment_z=commitment, seed=seed, z=z)


def lincheck_verify(
    binding: WitnessBinding,
    proof: ProofR1CS,
    public_inputs: Sequence[int],
    r1cs,
    ctx: lwe.LweContext,
) -> bool:
    """Verify the committed witness generates the proof's A_z/B_z/C_z evals.

    Checks, in order: commitment re-computation (binding), public-input
    prefix (ties z to the transcript that produced alpha/beta), and the six
    evaluation consistencies at the proof's challenges.
    """
    q = r1cs.modulus
    z = [int(v) % q for v in binding.z]
    if len(z) != r1cs.n:
        return False
    # 1. binding: the revealed (z, seed) must recommit exactly
    recommit, _op = lwe.commit(ctx, z, binding.seed)
    if recommit != binding.commitment_z:
        return False
    # 2. statement binding: public prefix of z is the hashed public input
    if [v % q for v in public_inputs] != z[: len(public_inputs)]:
        return False
    # 3. recompute the matrix images and their interpolations
    a_poly, b_poly, c_poly = r1cs.interpolations(z)
    alpha = proof.challenge_alpha.alpha
    beta = proof.challenge_beta.alpha
    checks = (
        (a_poly, proof.a_z_alpha, alpha),
        (b_poly, proof.b_z_alpha, alpha),
        (c_poly, proof.c_z_alpha, alpha),
        (a_poly, proof.a_z_beta, beta),
        (b_poly, proof.b_z_beta, beta),
        (c_poly, proof.c_z_beta, beta),
    )
    for poly_coeffs, claimed, at in checks:
        if r1cs.eval_poly(poly_coeffs, at) != claimed:
            return False
    return True


def mulcheck_verify(binding: WitnessBinding, r1cs) -> bool:
    """Hadamard relation (A z) ∘ (B z) = C z on the committed witness.

    Replaces the reference placeholder (``cpp-core/src/mulcheck.cpp``).
    """
    q = r1cs.modulus
    z = [int(v) % q for v in binding.z]
    if len(z) != r1cs.n:
        return False
    az, bz, cz = r1cs.compute_constraint_evals(z)
    return all(
        field.mul_mod(a, b, q) == c for a, b, c in zip(az, bz, cz)
    )


def prove_r1cs_checked(
    r1cs, witness: Sequence[int], ctx: lwe.LweContext, seed: int
):
    """Base dual-challenge proof + phase-2 witness binding.

    Returns ``(ProofR1CS, WitnessBinding)``. The binding uses an
    independent domain-separated seed (seed ^ tag) so Q-commitment and
    z-commitment randomness never collide.
    """
    from .. import prover

    proof = prover.prove_r1cs(r1cs, witness, ctx, seed, with_opening=True)
    z_seed = (int(seed) ^ 0x4C494E43) & ((1 << 64) - 1)  # "LINC"
    binding = lincheck_prove(r1cs, witness, ctx, z_seed)
    return proof, binding


def verify_r1cs_checked(
    proof: ProofR1CS,
    binding: WitnessBinding,
    public_inputs: Sequence[int],
    r1cs,
    ctx: lwe.LweContext,
) -> bool:
    """Full phase-2 verification: base proof + LWE-bound Q opening +
    lincheck + mulcheck."""
    from .. import verifier

    if not verifier.verify_r1cs_with_context(proof, public_inputs, r1cs, ctx):
        return False
    if not lincheck_verify(binding, proof, public_inputs, r1cs, ctx):
        return False
    return mulcheck_verify(binding, r1cs)


def available() -> bool:
    return True
