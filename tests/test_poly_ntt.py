"""Host polynomial algebra + golden NTT (reference ntt.rs / r1cs.rs parity)."""

import random

import numpy as np
import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.core.errors import InvalidWitnessError
from lambda_snark_tpu.ops.goldilocks_np import (
    GOLDILOCKS,
    gl_add,
    gl_mul,
    gl_sub,
    goldilocks_ntt,
)
from lambda_snark_tpu.r1cs import poly
from lambda_snark_tpu.r1cs.domain import Domain


def _rand_vec(rng, n, q):
    return [rng.randrange(q) for _ in range(n)]


# --- goldilocks numpy ops vs python ints ------------------------------------


def test_gl_ops_random_vs_python():
    rng = random.Random(1)
    p = GOLDILOCKS
    special = [0, 1, p - 1, p - 2, 2**32, 2**32 - 1, 2**63, p // 2]
    vals_a = special + [rng.randrange(p) for _ in range(500)]
    vals_b = special[::-1] + [rng.randrange(p) for _ in range(500)]
    a = np.array(vals_a, dtype=np.uint64)
    b = np.array(vals_b, dtype=np.uint64)
    want_mul = np.array([(x * y) % p for x, y in zip(vals_a, vals_b)], dtype=np.uint64)
    want_add = np.array([(x + y) % p for x, y in zip(vals_a, vals_b)], dtype=np.uint64)
    want_sub = np.array([(x - y) % p for x, y in zip(vals_a, vals_b)], dtype=np.uint64)
    assert np.array_equal(gl_mul(a, b), want_mul)
    assert np.array_equal(gl_add(a, b), want_add)
    assert np.array_equal(gl_sub(a, b), want_sub)


# --- cyclic NTT roundtrips (reference ntt.rs tests: m = 2..2^10) ------------


@pytest.mark.parametrize("m", [2, 4, 8, 16, 64, 256, 1024])
def test_ntt_roundtrip_goldilocks(m):
    rng = random.Random(m)
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    coeffs = _rand_vec(rng, m, q)
    evals = poly.ntt_forward(coeffs, q, omega)
    back = poly.ntt_inverse(evals, q, omega)
    assert back == coeffs


@pytest.mark.parametrize("m", [4, 16, 128, 1024, 8192])
def test_ntt_roundtrip_45bit(m):
    rng = random.Random(m)
    q = NTT_FRIENDLY_MODULUS
    omega = ROOTS_OF_UNITY_45BIT[m]
    coeffs = _rand_vec(rng, m, q)
    evals = poly.ntt_forward(coeffs, q, omega)
    assert poly.ntt_inverse(evals, q, omega) == coeffs


def test_ntt_forward_is_evaluation():
    # NTT output j equals f(omega^j) — the linchpin of the roots domain
    q = NTT_MODULUS
    m = 8
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    rng = random.Random(3)
    coeffs = _rand_vec(rng, m, q)
    evals = poly.ntt_forward(coeffs, q, omega)
    for j in range(m):
        x = field.mod_pow(omega, j, q)
        assert evals[j] == field.horner_eval(coeffs, x, q)


def test_ntt_linearity():
    q = NTT_MODULUS
    m = 16
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    rng = random.Random(4)
    a = _rand_vec(rng, m, q)
    b = _rand_vec(rng, m, q)
    ab = [field.add_mod(x, y, q) for x, y in zip(a, b)]
    na, nb, nab = (poly.ntt_forward(v, q, omega) for v in (a, b, ab))
    assert nab == [field.add_mod(x, y, q) for x, y in zip(na, nb)]


def test_numpy_goldilocks_ntt_matches_golden():
    m = 64
    rng = random.Random(9)
    coeffs = _rand_vec(rng, m, GOLDILOCKS)
    ntt = goldilocks_ntt(m)
    got = ntt.forward(np.array(coeffs, dtype=np.uint64))
    omega = ntt.omega
    want = poly.ntt_forward(coeffs, GOLDILOCKS, omega)
    assert list(map(int, got)) == want
    back = ntt.inverse(got)
    assert list(map(int, back)) == coeffs


def test_negacyclic_mul_is_mod_xn_plus_1():
    n = 8
    rng = random.Random(11)
    p = GOLDILOCKS
    a = _rand_vec(rng, n, p)
    b = _rand_vec(rng, n, p)
    ntt = goldilocks_ntt(n)
    got = list(map(int, ntt.negacyclic_mul(np.array(a, np.uint64), np.array(b, np.uint64))))
    # schoolbook negacyclic convolution
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            term = (a[i] * b[j]) % p
            if k >= n:
                want[k - n] = (want[k - n] - term) % p
            else:
                want[k] = (want[k] + term) % p
    assert got == want


# --- interpolation & quotient helpers ---------------------------------------


def test_sequential_interpolation_matches_points():
    q = 17592186044417
    rng = random.Random(5)
    m = 7
    evals = _rand_vec(rng, m, q)
    dom = Domain.sequential(m, q)
    coeffs = poly.lagrange_interpolate(evals, dom)
    for i in range(m):
        assert poly.poly_eval(coeffs, i, q) == evals[i]


def test_roots_interpolation_equals_intt():
    # iNTT and O(m^2) Lagrange over the omega domain agree (uniqueness)
    q = NTT_FRIENDLY_MODULUS
    m = 8
    omega = ROOTS_OF_UNITY_45BIT[m]
    dom = Domain.roots(m, q, omega)
    rng = random.Random(6)
    evals = _rand_vec(rng, m, q)
    via_intt = poly.lagrange_interpolate(evals, dom)
    via_basis = poly._lagrange_generic(evals, dom.points(), q)
    assert via_intt == via_basis
    for j, x in enumerate(dom.points()):
        assert poly.poly_eval(via_intt, x, q) == evals[j]


def test_vanishing_poly_and_eval_agree():
    for dom in [
        Domain.sequential(5, 17592186044423),
        Domain.roots(8, NTT_FRIENDLY_MODULUS, ROOTS_OF_UNITY_45BIT[8]),
        Domain.select(16, NTT_MODULUS),
    ]:
        zpoly = dom.vanishing_poly()
        rng = random.Random(dom.m)
        for _ in range(10):
            x = rng.randrange(dom.modulus)
            assert poly.poly_eval(zpoly, x, dom.modulus) == dom.eval_vanishing(x)
        # Z_H vanishes on every domain point
        for pt in dom.points():
            assert dom.eval_vanishing(pt) == 0


def test_vanishing_poly_reference_values():
    # reference r1cs.rs test_vanishing_poly: Z_1 = [0,1] = X; Z_2 = X(X-1)
    q = 17592186044423
    assert Domain.sequential(1, q).vanishing_poly() == [0, 1]
    z2 = Domain.sequential(2, q).vanishing_poly()
    assert z2 == [0, q - 1, 1]  # X^2 - X


@pytest.mark.parametrize(
    "dom",
    [
        Domain.sequential(4, 17592186044423),
        Domain.roots(4, NTT_FRIENDLY_MODULUS, ROOTS_OF_UNITY_45BIT[4]),
        Domain.select(8, NTT_MODULUS),
    ],
)
def test_poly_div_vanishing_exact_and_inexact(dom):
    q = dom.modulus
    rng = random.Random(dom.m + 1)
    quotient = _rand_vec(rng, dom.m - 1, q)
    numerator = poly.poly_mul(quotient, dom.vanishing_poly(), q)
    got = poly.poly_div_vanishing(numerator, dom)
    assert got == poly._trim(list(quotient))
    bad = list(numerator)
    bad[0] = (bad[0] + 1) % q
    with pytest.raises(InvalidWitnessError):
        poly.poly_div_vanishing(bad, dom)


def test_poly_ops_reference_semantics():
    q = 97
    # trailing zeros trimmed on sub/add (reference r1cs.rs:893-899)
    assert poly.poly_sub([1, 2, 3], [0, 1, 3], q) == [1, 1]
    assert poly.poly_add([1, 2], [96, 95], q) == [0]
    assert poly.poly_mul([1, 1], [96, 1], q) == [96, 0, 1]  # (X+1)(X-1) = X^2-1
    assert poly.poly_mul_scalar([1, 2, 3], 10, q) == [10, 20, 30]
