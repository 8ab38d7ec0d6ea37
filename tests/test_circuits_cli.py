"""Circuit families, Lean artifacts and the CLI."""

import json
import os

import pytest

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    prove_r1cs,
    prove_r1cs_zk,
    setup,
    verify_r1cs,
    verify_r1cs_zk,
)
from lambda_snark_tpu.circuits.examples import (
    multiplication_circuit,
    multiplication_gates_circuit,
    multiplication_gates_witness,
    range_proof_circuit,
    range_proof_witness,
)
from lambda_snark_tpu.circuits.healthcare import (
    build_healthcare_circuit,
    high_risk_witness,
    low_risk_witness,
    make_witness,
)
from lambda_snark_tpu.cli import main as cli_main
from lambda_snark_tpu.core.errors import InvalidInputError, InvalidParamsError
from lambda_snark_tpu.lean import export as lean_export
from lambda_snark_tpu.lean.params_io import SecurityParams, validate_params

Q = 17592186044423


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(128, 2, Q, 3.19)))


# --- circuits ---------------------------------------------------------------


def test_healthcare_circuit_reference_structure():
    r1cs = build_healthcare_circuit(Q)
    assert r1cs.m == 10 and r1cs.n == 10 and r1cs.l == 2
    hw = high_risk_witness(Q)
    lw = low_risk_witness(Q)
    assert r1cs.is_satisfied(hw) and hw[1] == 3
    assert r1cs.is_satisfied(lw) and lw[1] == 1
    # tampered risk score fails
    bad = list(hw)
    bad[1] = 1
    assert not r1cs.is_satisfied(bad)
    # non-boolean flag fails
    bad = list(hw)
    bad[5] = 2
    assert not r1cs.is_satisfied(bad)


def test_healthcare_boundary_thresholds():
    # exactly at the threshold -> flag 0
    w = make_witness(Q, 126, 40, 30)
    r1cs = build_healthcare_circuit(Q)
    assert r1cs.is_satisfied(w) and w[1] == 1


def test_healthcare_end_to_end_zk(ctx):
    r1cs = build_healthcare_circuit(Q)
    w = high_risk_witness(Q)
    proof = prove_r1cs_zk(r1cs, w, ctx, seed=1, blinding_seed=2)
    assert verify_r1cs_zk(proof, r1cs.public_inputs(w), r1cs)


def test_range_proof_circuit(ctx):
    r1cs = range_proof_circuit(Q, bits=8)
    assert r1cs.m == 9  # 8 booleanity + 1 recomposition
    w = range_proof_witness(Q, 200)
    assert r1cs.is_satisfied(w)
    proof = prove_r1cs(r1cs, w, ctx, seed=1)
    assert verify_r1cs(proof, r1cs.public_inputs(w), r1cs)
    with pytest.raises(InvalidInputError):
        range_proof_witness(Q, 256)


def test_multiplication_gates_family():
    r1cs = multiplication_gates_circuit(5, Q)
    w = multiplication_gates_witness(5, Q, seed=3)
    assert r1cs.is_satisfied(w)


# --- lean artifacts ---------------------------------------------------------


def test_lean_vk_term_format():
    r1cs, _ = multiplication_circuit(Q)
    term = lean_export.vk_to_lean(r1cs)
    assert term.startswith(f"⟨1, 4, 2, {Q},")
    assert "SparseMatrix.mk 1 4 [(0, 1, 1)]" in term
    assert term.endswith("⟩")


def test_lean_params_roundtrip_and_validation():
    rec = "{ n := 4096, k := 2, q := 17592186044423, σ := 3.19, λ := 128 }"
    p = SecurityParams.from_lean(rec)
    assert (p.n, p.k, p.q, p.lam) == (4096, 2, 17592186044423, 128)
    validate_params(p)
    # composite modulus rejected (VULN-001)
    bad = SecurityParams(n=4096, k=2, q=17592186044417, sigma=3.19, lam=128)
    with pytest.raises(InvalidParamsError):
        validate_params(bad)
    # 2^44+1's cofactor check from the reference test suite
    with pytest.raises(InvalidParamsError):
        validate_params(SecurityParams(n=4096, k=2, q=17592186044417, sigma=3.19, lam=128))
    with pytest.raises(InvalidParamsError):
        validate_params(SecurityParams(n=1000, k=2, q=17592186044423, sigma=3.19, lam=128))
    with pytest.raises(InvalidParamsError):
        validate_params(SecurityParams(n=4096, k=2, q=17592186044423, sigma=2.0, lam=128))
    with pytest.raises(InvalidParamsError):
        validate_params(SecurityParams(n=4096, k=2, q=17592186044423, sigma=3.19, lam=100))
    # ascii aliases parse too
    p2 = SecurityParams.from_lean(
        "{ n := 64, k := 1, q := 12289, sigma := 3.2, lambda := 128 }"
    )
    assert p2.sigma == 3.2


def test_quotient_dump_json(ctx):
    r1cs = build_healthcare_circuit(Q)
    w = high_risk_witness(Q)
    qc = r1cs.compute_quotient_poly(w)
    dump = json.loads(lean_export.quotient_dump_json(r1cs, w, qc, "hc"))
    assert dump["m"] == 10 and dump["modulus"] == Q
    assert dump["quotient"] == qc


# --- CLI --------------------------------------------------------------------


def test_cli_prove_verify_roundtrip(tmp_path):
    circuit = {
        "m": 1, "n": 4, "l": 2, "modulus": Q,
        "constraints": [{
            "A": [{"row": 0, "col": 1, "value": 1}],
            "B": [{"row": 0, "col": 2, "value": 1}],
            "C": [{"row": 0, "col": 3, "value": 1}],
        }],
    }
    cpath = tmp_path / "circuit.json"
    wpath = tmp_path / "witness.json"
    ppath = tmp_path / "proof.bin"
    cpath.write_text(json.dumps(circuit))
    wpath.write_text("[1, 7, 13, 91]")
    base = ["--ring-degree", "64"]
    rc = cli_main(base + [
        "prove", "--circuit", str(cpath), "--witness", str(wpath),
        "--out", str(ppath),
    ])
    assert rc == 0 and ppath.exists()
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(ppath),
        "--public", "1,7",
    ])
    assert rc == 0
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(ppath),
        "--public", "1,8",
    ])
    assert rc == 1
    # phase-2: committed-witness binding travels alongside the proof
    p2path = tmp_path / "proof2.bin"
    rc = cli_main(base + [
        "prove", "--circuit", str(cpath), "--witness", str(wpath),
        "--phase2", "--out", str(p2path),
    ])
    assert rc == 0 and (tmp_path / "proof2.bin.witness-binding").exists()
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(p2path),
        "--public", "1,7", "--phase2",
    ])
    assert rc == 0


def test_cli_examples_and_validate(tmp_path, capsys):
    base = ["--ring-degree", "64"]
    assert cli_main(base + ["r1cs-example"]) == 0
    assert cli_main(base + ["range-proof-example", "--value", "5", "--bits", "4"]) == 0
    assert cli_main(base + [
        "healthcare-example", "--artifacts", str(tmp_path / "artifacts"),
    ]) == 0
    assert (tmp_path / "artifacts" / "r1cs" / "healthcare.term").exists()
    assert cli_main(base + [
        "validate-params", "--lean",
        "{ n := 64, k := 2, q := 17592186044423, σ := 3.19, λ := 128 }",
    ]) == 0
    assert cli_main(base + [
        "validate-params", "--lean",
        "{ n := 64, k := 2, q := 17592186044417, σ := 3.19, λ := 128 }",
    ]) == 2
    capsys.readouterr()


def test_cli_setup_descriptor(tmp_path):
    out = tmp_path / "ctx.json"
    rc = cli_main([
        "--modulus", "17592186044423", "--ring-degree", "64",
        "setup", "--out", str(out), "--strict",
    ])
    assert rc == 0
    desc = json.loads(out.read_text())
    assert desc["n"] == 64 and desc["q"] == 17592186044423


# --- simple circuit gallery -------------------------------------------------


def test_simple_circuit_gallery():
    from lambda_snark_tpu.circuits.simple import ALL_EXAMPLES

    for name, fn in ALL_EXAMPLES.items():
        r1cs, witness = fn()
        assert r1cs.is_satisfied(witness), name
        # one perturbed witness must fail (skip unconstrained private slots)
        bad = list(witness)
        bad[-1] = (bad[-1] + 1) % r1cs.modulus
        assert not r1cs.is_satisfied(bad), name


def test_phase2_available():
    """Phase-2 lincheck/mulcheck are implemented here (the reference ships
    empty placeholders); full coverage lives in tests/test_checks.py."""
    from lambda_snark_tpu.proof import checks

    assert checks.available()


def test_healthcare_quotient_matches_reference_lean_certificate():
    """The quotient pipeline reproduces the reference's committed Lean golden
    artifact coefficient-for-coefficient (formal/tests/HealthcareQuotient.lean
    healthcareQuotientCoeffs, modulus 2013265921)."""
    q = 2013265921
    r1cs = build_healthcare_circuit(q)
    w = high_risk_witness(q)
    assert r1cs.compute_quotient_poly(w) == [
        536591292, 151123296, 1268815861, 1689701572, 1641423289,
        1200004351, 1233086762, 1322307170, 1694015127,
    ]
