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


# --- remaining certificate surface (VERDICT round-2 item 6) -----------------

REF_DIR = "/root/reference/formal/tests"


def test_witness_data_certificate_matches_reference_derivations(ours):
    """HealthcareWitnessData.lean defines its vectors by derivation from
    HealthcareCircuit.lean; recompute each derived quantity here and check
    the committed structure is reproducible (residuals zero, omega a
    primitive 10th root, domain = omega^i, public = witness prefix)."""
    r1cs, witness = ours
    with open(os.path.join(REF_DIR, "HealthcareWitnessData.lean")) as f:
        src = f.read()
    # the file wraps exactly these four derived vectors
    for name in (
        "healthcareWitnessVector",
        "healthcarePublicVector",
        "healthcareDomainVector",
        "healthcareConstraintResiduals",
    ):
        assert name in src, name
    # constraint residuals of the honest witness are all zero
    # (healthcareConstraintResiduals_zero)
    residuals = certificates.constraint_residuals(r1cs, witness)
    assert residuals == [0] * r1cs.m
    # healthcareOmega = primitiveRoot(q)^((q-1)/10) is a primitive 10th root
    omega = certificates.healthcare_omega(Q_LEAN, r1cs.m)
    assert pow(omega, r1cs.m, Q_LEAN) == 1
    assert pow(omega, r1cs.m // 2, Q_LEAN) != 1
    assert pow(omega, r1cs.m // 5, Q_LEAN) != 1
    # nVars == nCons == 10 (healthcare_square / vector lengths)
    assert r1cs.m == r1cs.n == 10


def test_witness_data_artifact_roundtrips(ours):
    r1cs, witness = ours
    text = certificates.witness_data_lean(r1cs, witness)
    import re

    vecs = dict(
        re.findall(r"def (\w+) : Vector \w+ [\w.]+ :=\n  ⟨\[([^\]]*)\]", text)
    )
    omega = certificates.healthcare_omega(Q_LEAN, r1cs.m)
    parse = lambda s: [int(v) for v in s.split(",")] if s.strip() else []
    assert parse(vecs["healthcareWitnessVector"]) == [
        v % Q_LEAN for v in witness
    ]
    assert parse(vecs["healthcarePublicVector"]) == [
        v % Q_LEAN for v in witness[: r1cs.l]
    ]
    assert parse(vecs["healthcareDomainVector"]) == [
        pow(omega, i, Q_LEAN) for i in range(r1cs.m)
    ]
    assert parse(vecs["healthcareConstraintResiduals"]) == [0] * r1cs.m


def test_forking_example_certificate():
    """ForkingCertificateExample.lean's trivial circuit: parse the committed
    data, rebuild the same (empty) R1CS in this framework, and confirm the
    constraint identity Az o Bz - Cz = 0 that stub_constraint_zero proves."""
    with open(os.path.join(REF_DIR, "ForkingCertificateExample.lean")) as f:
        src = f.read()
    data = certificates.parse_forking_example(src)
    assert data["q"] == 2
    assert data["n_vars"] == data["n_cons"] == 1 and data["n_pub"] == 0
    assert data["entries"] == []  # all-zero matrices
    assert data["alphas"] == [0, 1]  # the fork point: alpha differs
    # empty matrices => residual zero for every witness over ZMod 2
    from lambda_snark_tpu.r1cs.sparse import SparseMatrix

    empty = SparseMatrix.from_coo(data["n_cons"], data["n_vars"], [])
    for w in ([0], [1]):
        assert empty.mul_vec(w, data["q"]) == [0]
    # regenerated artifact parses back to the same data
    text = certificates.forking_example_data_lean(data)
    back = certificates.parse_forking_example(text + "\nalpha := 0\nalpha := 1")
    assert (back["q"], back["n_vars"], back["n_cons"], back["n_pub"]) == (
        data["q"], data["n_vars"], data["n_cons"], data["n_pub"]
    )


def test_fork_probability_bounds_certificate():
    """Every (q, eps) pair exercised by ForkProbabilityBounds.lean satisfies
    the fork lower-bound inequality 1 >= eps^2/2 - 1/q in exact arithmetic."""
    from fractions import Fraction

    with open(os.path.join(REF_DIR, "ForkProbabilityBounds.lean")) as f:
        src = f.read()
    pairs = certificates.parse_fork_probability_bounds(src)
    # the committed file exercises fields 2, 3 and 5
    assert {q for q, _ in pairs} == {2, 3, 5}
    assert len(pairs) >= 7
    for q, eps in pairs:
        assert 0 < eps <= 1, (q, eps)
        assert certificates.check_fork_success_bound(q, eps), (q, eps)
    # boundary sanity: the bound really can fail for eps > 1 on large fields
    assert not certificates.check_fork_success_bound(1 << 44, Fraction(3, 2))


def test_forking_equations_certificate(ours):
    """HealthcareForkingEquations.lean's data-bearing inputs: the ModuleSIS
    hardness parameters and the square-domain property, both checkable
    against this stack."""
    r1cs, _ = ours
    with open(os.path.join(REF_DIR, "HealthcareForkingEquations.lean")) as f:
        src = f.read()
    data = certificates.parse_forking_equations(src)
    # ModuleSIS_Hard 256 2 12289 1024: ring degree, module rank, the toy
    # Profile-B modulus (docs/spec), norm bound
    assert (data["sis_n"], data["sis_k"], data["sis_q"], data["sis_beta"]) == (
        256, 2, 12289, 1024
    )
    # the modulus is the reference's documented Profile-B toy prime
    from lambda_snark_tpu.core.field import is_prime

    assert is_prime(data["sis_q"])
    assert data["sis_n"] & (data["sis_n"] - 1) == 0  # power-of-2 ring degree
    # healthcare_square: nVars = nCons, which our built circuit satisfies
    assert data["asserts_square_domain"]
    assert r1cs.m == r1cs.n


def test_security_params_certificate_regenerates_and_holds():
    """The committed SecurityParamsData.lean matches the library constants
    (no drift), and every certified inequality holds in exact arithmetic."""
    from lambda_snark_tpu.lean.certificates import security_params_lean
    from lambda_snark_tpu.proof.fri import MAX_AGGREGATE_STATEMENTS, FriParams
    from lambda_snark_tpu.proof.succinct import _MASK_LEN_CAP, _degree_bound
    from lambda_snark_tpu.core.params import (
        HEALTHCARE_DUMP_MODULUS,
        NTT_FRIENDLY_MODULUS,
        NTT_MODULUS,
    )

    src = security_params_lean()
    with open("artifacts/lean/SecurityParamsData.lean") as f:
        assert f.read() == src, "run security_params_lean() and recommit"

    p = FriParams()
    mask_len = 2 * p.num_queries + 8
    assert 80 <= p.log_blowup * p.num_queries
    assert mask_len <= _MASK_LEN_CAP
    d_max = _degree_bound(1 << 13, mask_len)
    assert 8 * MAX_AGGREGATE_STATEMENTS * d_max * (1 << 30) <= NTT_MODULUS
    assert (NTT_MODULUS - 1) % (1 << 32) == 0
    assert (NTT_FRIENDLY_MODULUS - 1) % (1 << 13) == 0
    assert (HEALTHCARE_DUMP_MODULUS - 1) % (1 << 27) == 0
