"""Integration matrix: domains x proof modes (+ edge cases).

Parity with the reference's ``integration_matrix`` suite (4x4 Lagrange/NTT x
ZK/non-ZK; ``TESTING.md:52-56``) and a selection of its ``edge_cases``
coverage: every supported interpolation domain against plain and ZK proving,
plus degenerate circuit shapes.
"""

import dataclasses
import random

import pytest

from lambda_snark_tpu import (
    CircuitBuilder,
    Domain,
    Params,
    Profile,
    SecurityLevel,
    SparseMatrix,
    R1CS,
    prove_r1cs,
    prove_r1cs_zk,
    setup,
    verify_r1cs,
    verify_r1cs_zk,
)
from lambda_snark_tpu.core.params import (
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    ROOTS_OF_UNITY_45BIT,
)

from test_r1cs import multiplication_gates, mult_witness

CONFIGS = [
    # (label, modulus, m, expected domain kind)
    ("sequential-composite", LEGACY_COMPOSITE_MODULUS, 3, "sequential"),
    ("sequential-prime", LEGACY_MODULUS, 5, "sequential"),
    ("roots-q45", NTT_FRIENDLY_MODULUS, 8, "roots"),
    ("roots-goldilocks", NTT_MODULUS, 8, "roots"),
]


@pytest.fixture(scope="module")
def ctx_cache():
    cache = {}

    def get(q):
        if q not in cache:
            cache[q] = setup(
                Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, q, 3.19)),
                context_seed=1,
            )
        return cache[q]

    return get


@pytest.mark.parametrize("zk", [False, True], ids=["plain", "zk"])
@pytest.mark.parametrize("label,q,m,kind", CONFIGS)
def test_matrix_prove_verify(ctx_cache, label, q, m, kind, zk):
    r1cs = multiplication_gates(m, q)
    assert r1cs.domain.kind == kind, label
    witness = mult_witness(m, q, seed=hash(label) % 1000)
    ctx = ctx_cache(q)
    public = r1cs.public_inputs(witness)
    if zk:
        proof = prove_r1cs_zk(r1cs, witness, ctx, seed=3, blinding_seed=4)
        assert verify_r1cs_zk(proof, public, r1cs), label
        bad = dataclasses.replace(
            proof, q_prime_alpha=(proof.q_prime_alpha + 1) % q
        )
        assert not verify_r1cs_zk(bad, public, r1cs), label
    else:
        proof = prove_r1cs(r1cs, witness, ctx, seed=3)
        assert verify_r1cs(proof, public, r1cs), label
        bad = dataclasses.replace(proof, q_alpha=(proof.q_alpha + 1) % q)
        assert not verify_r1cs(bad, public, r1cs), label


def test_explicit_domain_override(ctx_cache):
    # force the sequential domain on an NTT-capable modulus: both prover and
    # verifier must agree through the explicit knob
    q = NTT_FRIENDLY_MODULUS
    m = 4
    builder_r1cs = multiplication_gates(m, q)
    seq = R1CS(
        m=builder_r1cs.m, n=builder_r1cs.n, l=builder_r1cs.l,
        a=builder_r1cs.a, b=builder_r1cs.b, c=builder_r1cs.c,
        modulus=q, domain=Domain.sequential(m, q),
    )
    witness = mult_witness(m, q, seed=1)
    ctx = ctx_cache(q)
    proof = prove_r1cs(seq, witness, ctx, seed=5)
    assert verify_r1cs(proof, seq.public_inputs(witness), seq)
    # domain mismatch between prover and verifier rejects
    assert not verify_r1cs(proof, builder_r1cs.public_inputs(witness), builder_r1cs)


# --- edge cases -------------------------------------------------------------


def test_edge_single_constraint_single_var(ctx_cache):
    # 1x1 system: z0 * z0 = z0 with z0 = 1
    q = LEGACY_MODULUS
    a = SparseMatrix.from_dense([[1]])
    r1cs = R1CS(m=1, n=1, l=1, a=a, b=a, c=a, modulus=q)
    assert r1cs.is_satisfied([1])
    ctx = ctx_cache(q)
    proof = prove_r1cs(r1cs, [1], ctx, seed=1)
    assert verify_r1cs(proof, [1], r1cs)


def test_edge_zero_witness_values(ctx_cache):
    # constraint 0 * x = 0 holds for any x including zeros
    q = LEGACY_MODULUS
    b = CircuitBuilder(q)
    one = b.alloc_var()
    x = b.alloc_var()
    b.set_public_inputs(1)
    b.add_constraint([], [(x, 1)], [])
    r1cs = b.build()
    assert r1cs.is_satisfied([1, 0])
    assert r1cs.is_satisfied([1, 12345])
    ctx = ctx_cache(q)
    proof = prove_r1cs(r1cs, [1, 0], ctx, seed=2)
    assert verify_r1cs(proof, [1], r1cs)


def test_edge_max_field_values(ctx_cache):
    # witness values at q-1 exercise digit boundaries end-to-end
    q = NTT_FRIENDLY_MODULUS
    b = CircuitBuilder(q)
    one = b.alloc_var()
    x, y, z = b.alloc_vars(3)
    b.set_public_inputs(1)
    b.mul_gate(x, y, z)
    r1cs = b.build()
    xv = q - 1
    yv = q - 2
    zv = (xv * yv) % q
    witness = [1, xv, yv, zv]
    assert r1cs.is_satisfied(witness)
    ctx = ctx_cache(q)
    proof = prove_r1cs(r1cs, witness, ctx, seed=3)
    assert verify_r1cs(proof, [1], r1cs)


def test_edge_duplicate_and_cancelled_terms():
    q = LEGACY_MODULUS
    b = CircuitBuilder(q)
    one = b.alloc_var()
    x = b.alloc_var()
    b.set_public_inputs(1)
    # (x + x - 2x) * 1 = 0  -> coefficients cancel to zero
    b.add_constraint([(x, 1), (x, 1), (x, q - 2)], [(one, 1)], [])
    r1cs = b.build()
    assert r1cs.is_satisfied([1, 777])


def test_edge_public_inputs_equal_n(ctx_cache):
    # every variable public (l = n)
    q = LEGACY_MODULUS
    b = CircuitBuilder(q)
    one = b.alloc_var()
    x, y = b.alloc_vars(2)
    b.set_public_inputs(3)
    b.mul_gate(x, x, y)
    r1cs = b.build()
    witness = [1, 3, 9]
    ctx = ctx_cache(q)
    proof = prove_r1cs(r1cs, witness, ctx, seed=4)
    assert verify_r1cs(proof, witness, r1cs)


def test_edge_large_sequential_domain(ctx_cache):
    # m = 33 (odd, not a power of two) exercises the O(m^2) fallback
    q = LEGACY_MODULUS
    m = 33
    r1cs = multiplication_gates(m, q)
    assert r1cs.domain.kind == "sequential"
    witness = mult_witness(m, q, seed=6)
    ctx = ctx_cache(q)
    proof = prove_r1cs(r1cs, witness, ctx, seed=6)
    assert verify_r1cs(proof, r1cs.public_inputs(witness), r1cs)
