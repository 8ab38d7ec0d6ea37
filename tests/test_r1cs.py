"""R1CS + quotient pipeline + circuit builder (reference r1cs.rs/circuit.rs)."""

import random

import pytest

from lambda_snark_tpu import (
    CircuitBuilder,
    Domain,
    InvalidWitnessError,
    R1CS,
    SparseMatrix,
)
from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    LEGACY_COMPOSITE_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.r1cs import poly

Q = LEGACY_COMPOSITE_MODULUS


def mult_gate_r1cs(modulus=Q):
    # a * b = c with witness [1, a, b, c] (tv-1 structure)
    a = SparseMatrix.from_dense([[0, 1, 0, 0]])
    b = SparseMatrix.from_dense([[0, 0, 1, 0]])
    c = SparseMatrix.from_dense([[0, 0, 0, 1]])
    return R1CS(m=1, n=4, l=2, a=a, b=b, c=c, modulus=modulus)


def multiplication_gates(m, modulus):
    """m independent multiplication gates (zk_overhead bench structure)."""
    n = 1 + 3 * m
    builder = CircuitBuilder(modulus)
    one = builder.alloc_var()
    a_vars = builder.alloc_vars(m)
    b_vars = builder.alloc_vars(m)
    c_vars = builder.alloc_vars(m)
    builder.set_public_inputs(1)
    for i in range(m):
        builder.mul_gate(a_vars[i], b_vars[i], c_vars[i])
    r1cs = builder.build()
    assert r1cs.n == n
    return r1cs


def mult_witness(m, modulus, seed=0):
    rng = random.Random(seed)
    a = [rng.randrange(1, modulus) for _ in range(m)]
    b = [rng.randrange(1, modulus) for _ in range(m)]
    c = [(x * y) % modulus for x, y in zip(a, b)]
    return [1] + a + b + c


def test_sparse_matrix_basics():
    mat = SparseMatrix.from_dense([[0, 1, 0, 0], [0, 0, 1, 0]])
    assert mat.mul_vec([1, 7, 13, 91], 1000) == [7, 13]
    assert mat.get(0, 1) == 1 and mat.get(0, 0) == 0
    assert mat.nnz() == 2
    # from_map round-trips
    m2 = SparseMatrix.from_map(2, 4, {(0, 1): 1, (1, 2): 1})
    assert m2 == mat


def test_is_satisfied():
    r1cs = mult_gate_r1cs()
    assert r1cs.is_satisfied([1, 7, 13, 91])
    assert not r1cs.is_satisfied([1, 7, 13, 90])


def test_public_inputs_prefix():
    r1cs = mult_gate_r1cs()
    assert r1cs.public_inputs([1, 7, 13, 91]) == [1, 7]


def test_constraint_evals():
    r1cs = mult_gate_r1cs()
    az, bz, cz = r1cs.compute_constraint_evals([1, 7, 13, 91])
    assert (az, bz, cz) == ([7], [13], [91])


def test_quotient_identity_sequential():
    # Q * Z_H == A_z * B_z - C_z at random points (reference r1cs.rs:1329-1454)
    r1cs = multiplication_gates(3, Q)
    witness = mult_witness(3, Q, seed=1)
    assert r1cs.is_satisfied(witness)
    q_coeffs = r1cs.compute_quotient_poly(witness)
    a_poly, b_poly, c_poly = r1cs.interpolations(witness)
    rng = random.Random(2)
    for _ in range(10):
        x = rng.randrange(Q)
        lhs = field.mul_mod(
            poly.poly_eval(q_coeffs, x, Q), r1cs.eval_vanishing(x), Q
        )
        rhs = field.sub_mod(
            field.mul_mod(
                poly.poly_eval(a_poly, x, Q), poly.poly_eval(b_poly, x, Q), Q
            ),
            poly.poly_eval(c_poly, x, Q),
            Q,
        )
        assert lhs == rhs


@pytest.mark.parametrize("modulus", [NTT_FRIENDLY_MODULUS, NTT_MODULUS])
def test_quotient_identity_roots_domain(modulus):
    m = 4
    r1cs = multiplication_gates(m, modulus)
    assert r1cs.domain.kind == "roots"
    witness = mult_witness(m, modulus, seed=3)
    q_coeffs = r1cs.compute_quotient_poly(witness)
    a_poly, b_poly, c_poly = r1cs.interpolations(witness)
    rng = random.Random(4)
    for _ in range(10):
        x = rng.randrange(modulus)
        lhs = field.mul_mod(
            poly.poly_eval(q_coeffs, x, modulus), r1cs.eval_vanishing(x), modulus
        )
        rhs = field.sub_mod(
            field.mul_mod(
                poly.poly_eval(a_poly, x, modulus),
                poly.poly_eval(b_poly, x, modulus),
                modulus,
            ),
            poly.poly_eval(c_poly, x, modulus),
            modulus,
        )
        assert lhs == rhs


def test_quotient_rejects_bad_witness():
    r1cs = mult_gate_r1cs()
    with pytest.raises(InvalidWitnessError):
        r1cs.compute_quotient_poly([1, 7, 13, 90])


def test_domain_selection():
    assert Domain.select(5, Q).kind == "sequential"
    assert Domain.select(8, NTT_FRIENDLY_MODULUS).kind == "roots"
    assert Domain.select(6, NTT_FRIENDLY_MODULUS).kind == "sequential"  # not in table
    assert Domain.select(1 << 20, NTT_MODULUS).kind == "roots"
    assert Domain.select(16384, NTT_FRIENDLY_MODULUS).kind == "sequential"


def test_circuit_builder_duplicate_terms_accumulate():
    # duplicate (var, coeff) terms must sum mod q (reference circuit.rs:262-330)
    builder = CircuitBuilder(Q)
    one = builder.alloc_var()
    x = builder.alloc_var()
    builder.set_public_inputs(1)
    builder.add_constraint([(x, 2), (x, 3)], [(one, 1)], [(x, 5)])
    r1cs = builder.build()
    assert r1cs.a.get(0, x) == 5
    assert r1cs.is_satisfied([1, 123])


def test_circuit_builder_range_proof_style():
    # 4-bit range proof: booleanity + weighted sum (reference main.rs:387-599)
    bits = 4
    value = 11
    builder = CircuitBuilder(Q)
    one = builder.alloc_var()
    v = builder.alloc_var()
    builder.set_public_inputs(2)
    bit_vars = builder.alloc_vars(bits)
    for b in bit_vars:
        # b * b = b
        builder.add_constraint([(b, 1)], [(b, 1)], [(b, 1)])
    # sum 2^i b_i = v
    builder.add_constraint(
        [(b, 1 << i) for i, b in enumerate(bit_vars)], [(one, 1)], [(v, 1)]
    )
    r1cs = builder.build()
    witness = [1, value] + [(value >> i) & 1 for i in range(bits)]
    assert r1cs.is_satisfied(witness)
    bad = [1, value] + [1, 1, 1, 1]  # bits sum to 15 != 11
    assert not r1cs.is_satisfied(bad)


def test_tv2_negative_coefficients():
    # tv-2 plaquette: B row has -1 coefficients; encode as q-1
    builder = CircuitBuilder(Q)
    one = builder.alloc_var()
    thetas = builder.alloc_vars(4)
    builder.set_public_inputs(1)
    builder.add_constraint(
        [(one, 1)],
        [(thetas[0], 1), (thetas[1], 1), (thetas[2], Q - 1), (thetas[3], Q - 1)],
        [],
    )
    r1cs = builder.build()
    assert r1cs.is_satisfied([1, 314, 628, 471, 471])
    assert not r1cs.is_satisfied([1, 314, 628, 471, 470])


def test_quotient_odd_coset_equals_longdiv():
    """The O(m log m) host quotient equals the long-division oracle exactly."""
    for modulus in (NTT_FRIENDLY_MODULUS, NTT_MODULUS):
        r1cs = multiplication_gates(8, modulus)
        assert r1cs.domain.kind == "roots"
        w = mult_witness(8, modulus, seed=7)
        fast = r1cs.compute_quotient_poly(w)
        slow = r1cs.compute_quotient_poly_longdiv(w)
        assert fast == slow, modulus
