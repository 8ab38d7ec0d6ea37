"""Phase-2 lincheck/mulcheck: committed-witness binding.

The reference leaves these as empty placeholders (cpp-core/src/lincheck.cpp,
mulcheck.cpp); here they are implemented, closing the evaluation-binding gap
(prover-claimed A_z/B_z/C_z scalars now verified against an LWE-committed
witness)."""

import dataclasses

import pytest

from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
from lambda_snark_tpu.proof import checks
from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

Q = 17592186044417


def _mult_circuit():
    """x * y = z with public (1-slot padding convention of the suite): 4 vars."""
    b = CircuitBuilder(Q)
    one = b.alloc_var()  # z0 = 1
    x = b.alloc_var()
    y = b.alloc_var()
    z = b.alloc_var()
    b.set_public_inputs(1)
    b.add_constraint([(x, 1)], [(y, 1)], [(z, 1)])
    # pad to a power-of-two constraint count is not required (sequential domain)
    r1cs = b.build()
    witness = [1, 6, 7, 42]
    return r1cs, witness


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19)))


def test_phase2_roundtrip(ctx):
    r1cs, witness = _mult_circuit()
    proof, binding = checks.prove_r1cs_checked(r1cs, witness, ctx, seed=0xBEEF)
    public = r1cs.public_inputs(witness)
    assert checks.verify_r1cs_checked(proof, binding, public, r1cs, ctx)
    assert checks.lincheck_verify(binding, proof, public, r1cs, ctx)
    assert checks.mulcheck_verify(binding, r1cs)


def test_lincheck_rejects_witness_substitution(ctx):
    """A different witness satisfying nothing cannot stand in for z."""
    r1cs, witness = _mult_circuit()
    proof, binding = checks.prove_r1cs_checked(r1cs, witness, ctx, seed=7)
    public = r1cs.public_inputs(witness)
    tampered = dataclasses.replace(
        binding, z=tuple([1, 6, 7, 43])
    )
    # recommitment fails: z is bound by the commitment
    assert not checks.lincheck_verify(tampered, proof, public, r1cs, ctx)


def test_lincheck_rejects_forged_commitment(ctx):
    """Re-committing a forged z with its own seed still fails: the claimed
    A_z/B_z/C_z evaluations in the proof don't match the forged witness."""
    r1cs, witness = _mult_circuit()
    proof, _ = checks.prove_r1cs_checked(r1cs, witness, ctx, seed=7)
    public = r1cs.public_inputs(witness)
    forged_z = [1, 5, 9, 45]  # satisfies x*y=z but is a different witness
    forged = checks.lincheck_prove(r1cs, forged_z, ctx, seed=99)
    assert not checks.lincheck_verify(forged, proof, public, r1cs, ctx)


def test_lincheck_rejects_public_input_mismatch(ctx):
    r1cs, witness = _mult_circuit()
    proof, binding = checks.prove_r1cs_checked(r1cs, witness, ctx, seed=7)
    assert not checks.lincheck_verify(binding, proof, [2], r1cs, ctx)


def test_mulcheck_rejects_unsatisfying_witness(ctx):
    r1cs, witness = _mult_circuit()
    bad = list(witness)
    bad[3] = 41
    binding = checks.lincheck_prove(r1cs, bad, ctx, seed=3)
    assert not checks.mulcheck_verify(binding, r1cs)


def test_binding_serialization_roundtrip(ctx):
    r1cs, witness = _mult_circuit()
    binding = checks.lincheck_prove(r1cs, witness, ctx, seed=11)
    data = binding.to_bytes()
    back = checks.WitnessBinding.from_bytes(data)
    assert back.z == binding.z
    assert back.seed == binding.seed
    assert back.commitment_z == binding.commitment_z


def test_full_check_fails_on_tampered_eval(ctx):
    r1cs, witness = _mult_circuit()
    proof, binding = checks.prove_r1cs_checked(r1cs, witness, ctx, seed=5)
    public = r1cs.public_inputs(witness)
    bad_proof = dataclasses.replace(
        proof, a_z_alpha=(proof.a_z_alpha + 1) % Q
    )
    assert not checks.verify_r1cs_checked(bad_proof, binding, public, r1cs, ctx)
