"""Compact (digest-bound) proofs: <= 250 bytes, spec-target compliance."""

import dataclasses

import pytest

from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
from lambda_snark_tpu.proof.compact import (
    CompactProofR1CS,
    prove_r1cs_compact,
    verify_r1cs_compact,
)

from test_r1cs import mult_gate_r1cs, multiplication_gates, mult_witness

Q = 17592186044417


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19)))


def test_compact_proof_size_under_spec(ctx):
    # reference spec: proof <= 250 bytes (specification.sdoc:378-381)
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    proof = prove_r1cs_compact(r1cs, witness, ctx, seed=1)
    data = proof.to_bytes()
    assert len(data) <= 250, len(data)
    assert len(data) == 193
    zk = prove_r1cs_compact(r1cs, witness, ctx, seed=1, blinding_seed=2, zk=True)
    assert len(zk.to_bytes()) == 201


def test_compact_prove_verify_roundtrip(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs_compact(r1cs, witness, ctx, seed=1)
    assert verify_r1cs_compact(proof, public, r1cs)
    p2 = CompactProofR1CS.from_bytes(proof.to_bytes())
    assert p2.to_bytes() == proof.to_bytes()
    assert verify_r1cs_compact(p2, public, r1cs)


def test_compact_zk_verify_and_unblind(ctx):
    r1cs = multiplication_gates(3, Q)
    witness = mult_witness(3, Q, seed=4)
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs_compact(r1cs, witness, ctx, seed=3, blinding_seed=5, zk=True)
    assert proof.is_zk
    assert verify_r1cs_compact(proof, public, r1cs)
    bad = dataclasses.replace(
        proof, blinding_factor=(proof.blinding_factor + 1) % Q
    )
    assert not verify_r1cs_compact(bad, public, r1cs)


def test_compact_soundness_negatives(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs_compact(r1cs, witness, ctx, seed=1)
    for field_name in ("q_alpha", "a_z_beta", "c_z_alpha"):
        bad = dataclasses.replace(
            proof, **{field_name: (getattr(proof, field_name) + 1) % Q}
        )
        assert not verify_r1cs_compact(bad, public, r1cs), field_name
    # tampered digest -> challenge mismatch
    bad = dataclasses.replace(
        proof, commitment_digest=bytes(32)
    )
    assert not verify_r1cs_compact(bad, public, r1cs)
    # wrong public inputs
    assert not verify_r1cs_compact(proof, [1, 8], r1cs)


def test_compact_deterministic(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    p1 = prove_r1cs_compact(r1cs, witness, ctx, seed=7)
    p2 = prove_r1cs_compact(r1cs, witness, ctx, seed=7)
    assert p1.to_bytes() == p2.to_bytes()


def test_compact_deserialize_any(ctx):
    from lambda_snark_tpu.proof.types import deserialize_any

    r1cs = mult_gate_r1cs()
    proof = prove_r1cs_compact(r1cs, [1, 7, 13, 91], ctx, seed=1)
    got = deserialize_any(proof.to_bytes())
    assert isinstance(got, CompactProofR1CS)


def test_deserializer_robustness(ctx):
    """Truncated/garbage inputs must raise SerializationError, never crash."""
    from lambda_snark_tpu import SerializationError, deserialize_any

    r1cs = mult_gate_r1cs()
    good = prove_r1cs_compact(r1cs, [1, 7, 13, 91], ctx, seed=1).to_bytes()
    for cut in (0, 1, 8, 9, 20, len(good) - 1):
        with pytest.raises((SerializationError, Exception)):
            p = deserialize_any(good[:cut])
            # a successful short parse must still round-trip identically
            assert p.to_bytes() == good[:cut]
    with pytest.raises(SerializationError):
        deserialize_any(b"LSNKTPU1" + bytes([99]) + good[9:])
    # flipped magic
    with pytest.raises(SerializationError):
        deserialize_any(b"XSNKTPU1" + good[8:])


def test_compact_proof_bound_to_circuit(ctx):
    """v2 transcripts hash the circuit digest: a proof for one circuit must
    reject against a different circuit with identical shape (the v1 /
    reference format inherits this malleability; see SECURITY.md)."""
    from lambda_snark_tpu import SparseMatrix, R1CS

    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    proof = prove_r1cs_compact(r1cs, witness, ctx, seed=1)
    assert verify_r1cs_compact(proof, public, r1cs)
    # same shape, different A matrix
    a2 = SparseMatrix.from_dense([[0, 2, 0, 0]])
    other = R1CS(m=1, n=4, l=2, a=a2, b=r1cs.b, c=r1cs.c, modulus=Q)
    assert not verify_r1cs_compact(proof, public, other)
