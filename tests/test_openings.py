"""Opening proofs and polynomial-commitment binding.

Parity intent with reference suites ``opening_proofs.rs`` (7 tests),
``polynomial_commitment.rs`` (7) and ``lwe_verification.rs`` (7, 6 ignored
because SEAL binding wasn't real) — here the binding checks are REAL:
commitment openings recompute publicly and must match word-for-word.
"""

import dataclasses

import numpy as np
import pytest

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    prove_r1cs,
    prove_simple,
    setup,
    verify_simple,
)
from lambda_snark_tpu.commit.lwe import Commitment
from lambda_snark_tpu.proof.types import EvalOpening
from lambda_snark_tpu.verifier import verify_r1cs, verify_r1cs_with_context

from test_r1cs import mult_gate_r1cs

Q = 17592186044417


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19)))


def test_opening_generate_verify_simple(ctx):
    # simple-API opening: witness = [randomness || coefficients]
    witness = [1, 7, 13, 91]
    public = [1, 91]
    proof = prove_simple(witness, public, ctx, Q, seed=0x1234)
    assert proof.opening.witness[0] == 0x1234
    assert proof.opening.witness[1:] == witness
    assert verify_simple(proof, public, Q)
    # corrupt the witness coefficients -> evaluation check fails
    bad = dataclasses.replace(
        proof,
        opening=EvalOpening(
            evaluation=proof.opening.evaluation,
            witness=[0x1234, 1, 7, 13, 92],
        ),
    )
    assert not verify_simple(bad, public, Q)


def test_opening_evaluation_out_of_field_rejected(ctx):
    witness = [1, 2, 3]
    public = [1]
    proof = prove_simple(witness, public, ctx, Q, seed=1)
    bad = dataclasses.replace(
        proof,
        opening=EvalOpening(evaluation=Q + 5, witness=proof.opening.witness),
    )
    assert not verify_simple(bad, public, Q)


def test_opening_empty_witness_rejected(ctx):
    witness = [1, 2, 3]
    public = [1]
    proof = prove_simple(witness, public, ctx, Q, seed=1)
    bad = dataclasses.replace(
        proof, opening=EvalOpening(evaluation=proof.opening.evaluation)
    )
    assert not verify_simple(bad, public, Q)


def test_r1cs_proof_with_real_binding(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs(r1cs, witness, ctx, seed=9, with_opening=True)
    # plain verification still passes
    assert verify_r1cs(proof, public, r1cs)
    # full binding verification passes
    assert verify_r1cs_with_context(proof, public, r1cs, ctx)


def test_r1cs_binding_rejects_wrong_seed(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs(r1cs, witness, ctx, seed=9, with_opening=True)
    w = list(proof.opening_alpha.witness)
    w[0] = 10  # wrong commitment seed
    bad = dataclasses.replace(
        proof,
        opening_alpha=EvalOpening(proof.opening_alpha.evaluation, w),
        opening_beta=EvalOpening(proof.opening_beta.evaluation, w),
    )
    assert not verify_r1cs_with_context(bad, public, r1cs, ctx)


def test_r1cs_binding_rejects_wrong_polynomial(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs(r1cs, witness, ctx, seed=9, with_opening=True)
    w = list(proof.opening_alpha.witness)
    w[1] = (w[1] + 1) % Q  # tampered Q coefficient
    bad = dataclasses.replace(
        proof,
        opening_alpha=EvalOpening(proof.opening_alpha.evaluation, w),
        opening_beta=EvalOpening(proof.opening_beta.evaluation, w),
    )
    assert not verify_r1cs_with_context(bad, public, r1cs, ctx)


def test_r1cs_binding_requires_opening(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    stub = prove_r1cs(r1cs, witness, ctx, seed=9)  # stub openings
    assert verify_r1cs(stub, public, r1cs)
    assert not verify_r1cs_with_context(stub, public, r1cs, ctx)


def test_commitment_binding_different_messages_distinct(ctx):
    # polynomial_commitment.rs intent: distinct polynomials -> distinct
    # commitments under the same seed (binding evidence)
    from lambda_snark_tpu.commit import lwe

    seen = set()
    for coeffs in ([1, 2, 3], [1, 2, 4], [3, 2, 1], [0, 0, 1]):
        c, _ = lwe.commit(ctx, coeffs, seed=5)
        seen.add(bytes(c.to_bytes()))
    assert len(seen) == 4
