"""Zero-knowledge behavior: simulator indistinguishability + blinding stats.

Parity intent with reference ``tests/zk_simulator.rs:29-90`` (simulator
regression) and ``tests/zk_integration.rs`` — statistical rather than
byte-level: real blinded proofs and simulated proofs must be structurally
identical and their random components spread over the field.
"""

import random
import statistics

import pytest

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    prove_r1cs_zk,
    prove_zk,
    setup,
    simulate_proof,
    verify_r1cs_zk,
    verify_simple,
)
from lambda_snark_tpu.proof.polynomial import Polynomial

from test_r1cs import mult_gate_r1cs

Q = 17592186044417


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19)))


def test_simulated_vs_real_structure(ctx):
    witness = [1, 7, 13, 91]
    public = [1, 91]
    reals = [
        prove_zk(witness, public, ctx, Q, commit_seed=i, blinding_seed=100 + i)
        for i in range(8)
    ]
    sims = [
        simulate_proof(3, public, ctx, Q, commit_seed=50 + i, sim_seed=200 + i)
        for i in range(8)
    ]
    for r, s in zip(reals, sims):
        assert len(r.commitment.words) == len(s.commitment.words)
        assert len(r.opening.witness) == len(s.opening.witness)
        assert verify_simple(r, public, Q)
        assert verify_simple(s, public, Q)


def test_blinded_coefficients_spread(ctx):
    # f'(X) = f(X) + r(X) coefficients should span the field (one-time pad)
    witness = [1, 7, 13, 91]
    coeffs = []
    for seed in range(64):
        r = Polynomial.random_blinding(3, Q, seed=seed)
        f = Polynomial.from_witness(witness, Q)
        coeffs.extend(f.add(r).coeffs)
    # spread: mean near Q/2 within 15%, min/max cover > 80% of the range
    mean = statistics.fmean(coeffs)
    assert abs(mean - Q / 2) < 0.15 * Q
    assert (max(coeffs) - min(coeffs)) > 0.8 * Q


def test_blinding_determinism_and_range():
    # reference polynomial.rs blinding tests: determinism + in-field range
    r1 = Polynomial.random_blinding(5, Q, seed=42)
    r2 = Polynomial.random_blinding(5, Q, seed=42)
    assert r1 == r2
    assert len(r1.coeffs) == 6
    assert all(0 <= c < Q for c in r1.coeffs)
    r3 = Polynomial.random_blinding(5, Q, seed=43)
    assert r1 != r3


def test_zk_r1cs_blinding_factor_distribution(ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    factors = []
    for seed in range(32):
        p = prove_r1cs_zk(r1cs, witness, ctx, seed=seed, blinding_seed=seed)
        assert verify_r1cs_zk(p, r1cs.public_inputs(witness), r1cs)
        factors.append(p.blinding_factor)
    assert len(set(factors)) == len(factors)  # all distinct
    assert (max(factors) - min(factors)) > 0.5 * Q


def test_zk_commitments_differ_per_blinding(ctx):
    # same witness, different blinding -> different commitments (hiding)
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    p1 = prove_r1cs_zk(r1cs, witness, ctx, seed=1, blinding_seed=1)
    p2 = prove_r1cs_zk(r1cs, witness, ctx, seed=1, blinding_seed=2)
    assert p1.commitment_q_prime != p2.commitment_q_prime
