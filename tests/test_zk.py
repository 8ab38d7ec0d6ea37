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


# --- succinct-ZK: simulator + mask-uniformity (VERDICT round-2 item 7) -------
#
# Port of the reference zk_simulator.rs intent to the succinct (FRI-bound)
# layer: a witness-free simulator of the verifier's view, plus chi-square
# distributional tests that the masked codeword positions revealed by real
# proofs are (jointly) uniform — not merely "roots differ".

import numpy as np

from lambda_snark_tpu import prove_r1cs_succinct, setup as _setup
from lambda_snark_tpu.core.params import NTT_MODULUS
from lambda_snark_tpu.proof.fri import FriParams
from lambda_snark_tpu.proof.succinct import (
    simulate_succinct_view,
    succinct_view,
    verify_r1cs_succinct,
)
from lambda_snark_tpu.proof.succinct_batch import prove_r1cs_succinct_batch
from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

GL = NTT_MODULUS
ZK_FAST = FriParams(log_blowup=3, num_queries=8)


def _gl_circuit(m):
    b = CircuitBuilder(GL)
    b.alloc_var()
    xs = b.alloc_vars(m)
    ys = b.alloc_vars(m)
    b.set_public_inputs(1)
    for x, y in zip(xs, ys):
        b.mul_gate(x, x, y)
    return b.build()


def _gl_witness(m, seed=0):
    r = random.Random(seed)
    vals = [r.randrange(GL) for _ in range(m)]
    return [1] + vals + [v * v % GL for v in vals]


@pytest.fixture(scope="module")
def gl_setup():
    r1cs = _gl_circuit(8)
    ctx = _setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, GL, 3.19)))
    return r1cs, ctx


@pytest.fixture(scope="module")
def zk_views(gl_setup):
    """Views of 192 real succinct-ZK proofs: same witness and commit seed,
    varying blinding seed (so every view difference is mask-driven)."""
    r1cs, ctx = gl_setup
    w = _gl_witness(8)
    n = 192
    proofs = prove_r1cs_succinct_batch(
        r1cs, [w] * n, ctx, seeds=[5] * n, zk=True, fri_params=ZK_FAST,
        blinding_seeds=list(range(1000, 1000 + n)), device_lde=False,
    )
    return [succinct_view(p, r1cs) for p in proofs]


def _chi_square_uniform(samples, buckets):
    """Chi-square statistic for uniformity over `buckets` equal bins."""
    n = len(samples)
    counts = np.bincount(
        [int(s) % buckets for s in samples], minlength=buckets
    )
    exp = n / buckets
    return float(((counts - exp) ** 2 / exp).sum())


# df=15: P[chi2 > 45] ~ 8e-5; df=8: P[chi2 > 35] ~ 3e-5 — deterministic
# seeds keep these from flaking.
CHI2_DF15_BOUND = 45.0
CHI2_DF8_BOUND = 35.0


def test_succinct_simulator_structure_matches_real(gl_setup):
    r1cs, ctx = gl_setup
    w = _gl_witness(8)
    real = prove_r1cs_succinct(
        r1cs, w, ctx, seed=5, zk=True, blinding_seed=17, fri_params=ZK_FAST
    )
    assert verify_r1cs_succinct(real, [1], r1cs, min_params=ZK_FAST)
    rv = succinct_view(real, r1cs)
    sv = simulate_succinct_view(r1cs, sim_seed=99, fri_params=ZK_FAST)
    assert len(sv.evals) == len(rv.evals) == 8
    assert len(sv.positions) == len(rv.positions) == ZK_FAST.num_queries
    assert len(sv.leaves) == len(rv.leaves)
    assert all(len(row) == 4 for row in sv.leaves)
    assert all(v < GL for v in sv.evals)


def test_succinct_simulator_deterministic(gl_setup):
    r1cs, _ = gl_setup
    v1 = simulate_succinct_view(r1cs, sim_seed=4242, fri_params=ZK_FAST)
    v2 = simulate_succinct_view(r1cs, sim_seed=4242, fri_params=ZK_FAST)
    assert v1 == v2


def test_succinct_simulator_seeds_differ(gl_setup):
    r1cs, _ = gl_setup
    v1 = simulate_succinct_view(r1cs, sim_seed=1, fri_params=ZK_FAST)
    v2 = simulate_succinct_view(r1cs, sim_seed=2, fri_params=ZK_FAST)
    assert v1.evals != v2.evals
    # sim_seed=None draws fresh randomness (zk_simulator.rs:81-96 contract)
    v3 = simulate_succinct_view(r1cs, fri_params=ZK_FAST)
    v4 = simulate_succinct_view(r1cs, fri_params=ZK_FAST)
    assert v3.evals != v4.evals


def test_succinct_simulator_satisfies_verifier_identity(gl_setup):
    """Simulated views satisfy q * Z_H(x) = a*b - c at alpha, beta and at
    every queried codeword point — the checks a distinguisher could run."""
    from lambda_snark_tpu.proof.fri import coset_offset
    from lambda_snark_tpu.proof.succinct import _check_instance

    r1cs, _ = gl_setup
    sv = simulate_succinct_view(r1cs, sim_seed=7, fri_params=ZK_FAST)
    mask_len = 2 * ZK_FAST.num_queries + 8
    _d, n0, omega_n = _check_instance(r1cs, ZK_FAST, mask_len)
    offset = coset_offset(GL)
    zh = lambda x: (pow(x, r1cs.m, GL) - 1) % GL
    for x, (a, b, c, qv) in (
        (sv.alpha, sv.evals[:4]),
        (sv.beta, sv.evals[4:]),
    ):
        assert qv * zh(x) % GL == (a * b - c) % GL
    half = n0 // 2
    for i0, row in zip(sv.positions, sv.leaves):
        for sel, pos in ((0, i0), (1, i0 + half)):
            x = offset * pow(omega_n, pos, GL) % GL
            a, b, c, qv = (row[k][sel] for k in range(4))
            assert qv * zh(x) % GL == (a * b - c) % GL


def test_real_zk_leaf_single_position_uniform(zk_views):
    """The A~ value opened by the first query is uniform across blinding
    seeds (chi-square, 16 bins)."""
    samples = [v.leaves[0][0][0] for v in zk_views]
    assert len(set(samples)) > len(samples) // 2  # masks actually vary it
    assert _chi_square_uniform(samples, 16) < CHI2_DF15_BOUND


def test_real_zk_leaf_joint_uniformity(zk_views):
    """Pairs of masked positions are JOINTLY uniform: (A~ at query0-lo,
    A~ at query0-hi) and (A~, B~) at the same point, 4x4 buckets."""
    for pair in (
        [(v.leaves[0][0][0], v.leaves[0][0][1]) for v in zk_views],
        [(v.leaves[0][0][0], v.leaves[0][1][0]) for v in zk_views],
    ):
        joint = [(a % 4) * 4 + (b % 4) for a, b in pair]
        assert _chi_square_uniform(joint, 16) < CHI2_DF15_BOUND


def test_real_zk_evals_uniform(zk_views):
    """Masked claimed evaluations at alpha spread uniformly (A~, B~, C~)."""
    for k in range(3):
        samples = [v.evals[k] for v in zk_views]
        assert _chi_square_uniform(samples, 16) < CHI2_DF15_BOUND


def test_real_vs_simulated_two_sample(zk_views, gl_setup):
    """Two-sample chi-square: real masked leaf values vs simulator output
    land in the same (uniform) distribution — 9 bins, homogeneity test."""
    r1cs, _ = gl_setup
    sims = [
        simulate_succinct_view(r1cs, sim_seed=50_000 + i, fri_params=ZK_FAST)
        for i in range(len(zk_views))
    ]
    bins = 9
    real = np.bincount(
        [v.leaves[0][0][0] % bins for v in zk_views], minlength=bins
    )
    sim = np.bincount(
        [v.leaves[0][0][0] % bins for v in sims], minlength=bins
    )
    # chi-square homogeneity over the 2 x bins table
    tot = real + sim
    n_r, n_s = real.sum(), sim.sum()
    stat = 0.0
    for b in range(bins):
        for cnt, n in ((real[b], n_r), (sim[b], n_s)):
            exp = tot[b] * n / (n_r + n_s)
            if exp > 0:
                stat += (cnt - exp) ** 2 / exp
    assert stat < CHI2_DF8_BOUND


def test_plain_succinct_view_is_witness_determined(gl_setup):
    """Negative control: without ZK the revealed view is a deterministic
    function of the witness (so the masks are what provides hiding)."""
    r1cs, ctx = gl_setup
    w = _gl_witness(8)
    p1 = prove_r1cs_succinct(r1cs, w, ctx, seed=5, fri_params=ZK_FAST)
    p2 = prove_r1cs_succinct(r1cs, w, ctx, seed=5, fri_params=ZK_FAST)
    assert succinct_view(p1, r1cs) == succinct_view(p2, r1cs)
    # while ZK with different blinding gives different views on the SAME
    # witness and commit seed
    z1 = prove_r1cs_succinct(
        r1cs, w, ctx, seed=5, zk=True, blinding_seed=1, fri_params=ZK_FAST
    )
    z2 = prove_r1cs_succinct(
        r1cs, w, ctx, seed=5, zk=True, blinding_seed=2, fri_params=ZK_FAST
    )
    assert succinct_view(z1, r1cs) != succinct_view(z2, r1cs)
