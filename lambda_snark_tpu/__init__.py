"""lambda_snark_tpu — a TPU-native lattice-SNARK prover framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ortfero/Lambda-SNARK-R (post-quantum R1CS SNARK with Module-LWE commitments):

- exact field arithmetic over all six reference moduli, with a golden host
  path and limb-decomposed TPU kernels,
- cyclic + negacyclic NTTs (host golden, vectorized JAX, Pallas kernels,
  and a four-step sharded multi-device NTT),
- R1CS + quotient-polynomial pipeline with explicit interpolation domains,
- deterministic seeded Module-LWE commitments over the Goldilocks ring,
- SHA3-256 dual-challenge Fiat-Shamir transcripts (byte-parity with the
  reference), ZK blinding, simulator, and full proof serialization.

Public API mirrors the reference crate surface
(``rust-api/lambda-snark/src/lib.rs``).
"""

from .core.errors import (
    CommitmentError,
    DomainError,
    InvalidDimensionsError,
    InvalidInputError,
    InvalidParamsError,
    InvalidWitnessError,
    LambdaSnarkError,
    SerializationError,
)
from .core.params import (
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
    Params,
    Profile,
    SecurityLevel,
    Witness,
)
from .commit.lwe import Commitment, LweContext, commit, linear_combine, verify_opening
from .proof.polynomial import Polynomial
from .proof.compact import (
    CompactProofR1CS,
    prove_r1cs_compact,
    verify_r1cs_compact,
)
from .proof.succinct import (
    SuccinctProofR1CS,
    prove_r1cs_succinct,
    verify_r1cs_succinct,
)
from .proof.succinct_batch import (
    prove_r1cs_succinct_batch,
    prove_r1cs_succinct_stream,
    prove_r1cs_witness_batch,
)
from .proof.aggregate import (
    AggregatedProofR1CS,
    prove_r1cs_succinct_aggregate,
    verify_r1cs_succinct_aggregate,
)
from .proof.succinct_witness import (
    WitnessProofR1CS,
    prove_r1cs_witness,
    verify_r1cs_witness,
)
from .proof.types import EvalOpening, Proof, ProofR1CS, ProofR1csZk, deserialize_any
from .prover import (
    prove_r1cs,
    prove_r1cs_zk,
    prove_simple,
    prove_zk,
    setup,
    simulate_proof,
)
from .r1cs.circuit import CircuitBuilder
from .r1cs.domain import Domain
from .r1cs.r1cs import R1CS
from .r1cs.sparse import SparseMatrix
from .transcript.challenge import Challenge, derive_dual
from .prover_batched import prove_r1cs_batched, prove_r1cs_stream
from .verifier import (
    verify_r1cs,
    verify_r1cs_with_context,
    verify_r1cs_zk,
    verify_simple,
)

__version__ = "0.8.0"

__all__ = [
    "Challenge",
    "CompactProofR1CS",
    "CircuitBuilder",
    "Commitment",
    "CommitmentError",
    "Domain",
    "DomainError",
    "EvalOpening",
    "InvalidDimensionsError",
    "InvalidInputError",
    "InvalidParamsError",
    "InvalidWitnessError",
    "LEGACY_COMPOSITE_MODULUS",
    "LEGACY_MODULUS",
    "LambdaSnarkError",
    "LweContext",
    "NTT_FRIENDLY_MODULUS",
    "NTT_MODULUS",
    "NTT_PRIMITIVE_ROOT",
    "Params",
    "Polynomial",
    "Profile",
    "Proof",
    "ProofR1CS",
    "ProofR1csZk",
    "R1CS",
    "ROOTS_OF_UNITY_45BIT",
    "SecurityLevel",
    "SerializationError",
    "SparseMatrix",
    "SuccinctProofR1CS",
    "Witness",
    "commit",
    "derive_dual",
    "deserialize_any",
    "linear_combine",
    "prove_r1cs",
    "prove_r1cs_batched",
    "prove_r1cs_stream",
    "prove_r1cs_compact",
    "prove_r1cs_succinct",
    "prove_r1cs_succinct_batch",
    "prove_r1cs_succinct_stream",
    "AggregatedProofR1CS",
    "prove_r1cs_succinct_aggregate",
    "verify_r1cs_succinct_aggregate",
    "WitnessProofR1CS",
    "prove_r1cs_witness",
    "prove_r1cs_witness_batch",
    "verify_r1cs_witness",
    "prove_r1cs_zk",
    "prove_simple",
    "prove_zk",
    "setup",
    "simulate_proof",
    "verify_opening",
    "verify_r1cs",
    "verify_r1cs_compact",
    "verify_r1cs_succinct",
    "verify_r1cs_with_context",
    "verify_r1cs_zk",
    "verify_simple",
]
