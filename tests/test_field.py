"""Golden field arithmetic: semantics of reference arith.rs + constants."""

import random

import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)

ALL_MODULI = [
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    2013265921,
    12289,
]

M = LEGACY_COMPOSITE_MODULUS  # matches arith.rs test constants


def test_add_mod_wraps_correctly():
    # mirrors reference arith.rs test_add_mod_wraps_correctly
    assert field.add_mod(M - 5, 10, M) == 5
    assert field.add_mod(12345, 67890, M) == (12345 + 67890) % M


def test_sub_mod_wraps_correctly():
    assert field.sub_mod(3, 5, M) == M - 2
    assert field.sub_mod(987654321, 123456789, M) == (987654321 - 123456789) % M


def test_mul_mod_matches_reference():
    a, b = M - 12345, 67890
    assert field.mul_mod(a, b, M) == (a * b) % M


def test_degenerate_modulus_returns_zero():
    # reference arith.rs: every op returns 0 when modulus <= 1
    for op in (field.mul_mod, field.add_mod, field.sub_mod):
        assert op(5, 7, 1) == 0
        assert op(5, 7, 0) == 0
    assert field.mod_pow(5, 7, 1) == 0
    assert field.mod_inverse(5, 1) is None


def test_mod_pow_random():
    rng = random.Random(42)
    for q in ALL_MODULI:
        for _ in range(50):
            b = rng.randrange(q)
            e = rng.randrange(1 << 64)
            assert field.mod_pow(b, e, q) == pow(b, e, q)


def test_mod_inverse_prime_and_composite():
    rng = random.Random(7)
    for q in [LEGACY_MODULUS, NTT_FRIENDLY_MODULUS, NTT_MODULUS, 2013265921]:
        for _ in range(30):
            a = rng.randrange(1, q)
            inv = field.mod_inverse(a, q)
            assert inv is not None
            assert (a * inv) % q == 1
    # composite legacy field: 17 is a factor => not invertible
    assert field.mod_inverse(17, LEGACY_COMPOSITE_MODULUS) is None
    # but coprime elements are invertible via the Euclid fallback
    inv3 = field.mod_inverse(3, LEGACY_COMPOSITE_MODULUS)
    assert inv3 is not None and (3 * inv3) % LEGACY_COMPOSITE_MODULUS == 1
    assert field.mod_inverse(0, M) is None


def test_miller_rabin_vuln001():
    # reference lean_params.rs:305-316 — composite 2^44+1 must be rejected
    assert not field.is_prime(LEGACY_COMPOSITE_MODULUS)
    assert field.is_prime(LEGACY_MODULUS)
    assert field.is_prime(NTT_FRIENDLY_MODULUS)
    assert field.is_prime(NTT_MODULUS)
    assert field.is_prime(2013265921)
    assert field.is_prime(12289)
    assert LEGACY_COMPOSITE_MODULUS == 17 * 1034834473201


def test_goldilocks_primitive_root():
    # omega = NTT_PRIMITIVE_ROOT has order exactly 2^32 mod Goldilocks
    assert pow(NTT_PRIMITIVE_ROOT, 1 << 32, NTT_MODULUS) == 1
    assert pow(NTT_PRIMITIVE_ROOT, 1 << 31, NTT_MODULUS) != 1
    # derivable from generator 7: 7^((q-1)/2^32)
    assert NTT_PRIMITIVE_ROOT == pow(7, (NTT_MODULUS - 1) >> 32, NTT_MODULUS)


@pytest.mark.parametrize("m,omega", sorted(ROOTS_OF_UNITY_45BIT.items()))
def test_45bit_roots_table(m, omega):
    q = NTT_FRIENDLY_MODULUS
    # primitive m-th root: omega^m == 1, omega^(m/2) == -1
    assert pow(omega, m, q) == 1
    assert pow(omega, m // 2, q) == q - 1
    # derivable from generator 3
    assert omega == pow(pow(3, (q - 1) // 8192, q), 8192 // m, q)


def test_horner_eval():
    # polynomial.rs doc example: f(X)=1+7X+13X^2+91X^3, f(2)=795
    assert field.horner_eval([1, 7, 13, 91], 2, M) == 795
    assert field.horner_eval([], 5, M) == 0
    assert field.horner_eval([2, 3, 1], 2, 97) == 12
