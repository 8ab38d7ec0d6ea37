"""Lean certificate regeneration: the reference's committed certificate
data (formal/tests/HealthcareCircuit.lean) must be reproducible from the
circuit built by this framework (ROADMAP #11; SURVEY §7 step 10)."""

import os

import pytest

from lambda_snark_tpu.circuits.healthcare import (
    build_healthcare_circuit,
    high_risk_witness,
)
from lambda_snark_tpu.lean import certificates

REF = "/root/reference/formal/tests/HealthcareCircuit.lean"
Q_LEAN = 2013265921  # the certificate field (healthcare_quotient_dump.rs:10)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference Lean tests not available"
)


@pytest.fixture(scope="module")
def ref_data():
    with open(REF) as f:
        return certificates.parse_reference_circuit(f.read())


@pytest.fixture(scope="module")
def ours():
    r1cs = build_healthcare_circuit(Q_LEAN)
    witness = high_risk_witness(Q_LEAN)
    return r1cs, witness


def test_reference_certificate_matches_our_circuit(ref_data, ours):
    r1cs, witness = ours
    assert ref_data["q"] == r1cs.modulus
    assert ref_data["n_vars"] == r1cs.n
    assert ref_data["n_cons"] == r1cs.m
    assert ref_data["n_pub"] == r1cs.l
    coo = certificates.circuit_coo(r1cs)
    for name in "ABC":
        assert sorted(ref_data[name]) == sorted(coo[name]), name
    assert ref_data["witness"] == [v % Q_LEAN for v in witness]


def test_regenerated_data_roundtrips(ours):
    """Our emitted certificate data parses back to the same circuit."""
    r1cs, witness = ours
    text = certificates.certificate_data_lean(r1cs, witness)
    back = certificates.parse_reference_circuit(text)
    coo = certificates.circuit_coo(r1cs)
    assert back["q"] == r1cs.modulus
    for name in "ABC":
        assert sorted(back[name]) == sorted(coo[name]), name
    assert back["witness"] == [v % r1cs.modulus for v in witness]
    assert back["n_vars"] == r1cs.n and back["n_cons"] == r1cs.m


def test_artifact_emission(tmp_path, ours):
    r1cs, witness = ours
    from lambda_snark_tpu.lean.export import write_artifact

    text = certificates.certificate_data_lean(r1cs, witness)
    path = str(tmp_path / "HealthcareCircuitData.lean")
    write_artifact(path, text)
    assert os.path.getsize(path) > 500
