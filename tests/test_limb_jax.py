"""Device (JAX/CPU) digit arithmetic + NTT vs golden host paths."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.ops import modarith
from lambda_snark_tpu.ops.limb import from_limbs, modulus_ctx, to_limbs
from lambda_snark_tpu.ops import ntt_jax
from lambda_snark_tpu.r1cs import poly

MODULI = [
    LEGACY_COMPOSITE_MODULUS,
    LEGACY_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    2013265921,
    12289,
]


def _boundary_and_random(q, count, seed):
    rng = random.Random(seed)
    special = [0, 1, 2, q - 1, q - 2, q // 2, q // 2 + 1]
    special = [s % q for s in special]
    vals = special + [rng.randrange(q) for _ in range(count - len(special))]
    return vals


@pytest.mark.parametrize("q", MODULI)
def test_limb_roundtrip(q):
    ctx = modulus_ctx(q)
    vals = _boundary_and_random(q, 100, q % 997)
    planes = to_limbs(np.array(vals, dtype=object), ctx.d)
    back = from_limbs(planes)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("q", MODULI)
def test_mod_ops_bit_exact(q):
    ctx = modulus_ctx(q)
    a_vals = _boundary_and_random(q, 300, q % 1009)
    b_vals = list(reversed(_boundary_and_random(q, 300, q % 1013)))
    a = jnp.asarray(to_limbs(np.array(a_vals, dtype=object), ctx.d))
    b = jnp.asarray(to_limbs(np.array(b_vals, dtype=object), ctx.d))

    got_mul = from_limbs(np.asarray(modarith.mul_mod_jit(ctx, a, b)))
    got_add = from_limbs(np.asarray(modarith.add_mod_jit(ctx, a, b)))
    got_sub = from_limbs(np.asarray(modarith.sub_mod_jit(ctx, a, b)))
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        assert int(got_mul[i]) == field.mul_mod(x, y, q), (q, x, y)
        assert int(got_add[i]) == field.add_mod(x, y, q)
        assert int(got_sub[i]) == field.sub_mod(x, y, q)


def test_mul_mod_const():
    q = NTT_FRIENDLY_MODULUS
    ctx = modulus_ctx(q)
    vals = _boundary_and_random(q, 64, 3)
    c = 981206394875
    from lambda_snark_tpu.ops.limb import int_to_digits

    a = jnp.asarray(to_limbs(np.array(vals, dtype=object), ctx.d))
    got = from_limbs(np.asarray(modarith.mul_mod_const(ctx, a, int_to_digits(c, ctx.d))))
    for i, x in enumerate(vals):
        assert int(got[i]) == field.mul_mod(x, c, q)


@pytest.mark.parametrize(
    "q,omega_fn,m",
    [
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 8),
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 256),
        (NTT_MODULUS, lambda m: field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, NTT_MODULUS), 64),
        (NTT_MODULUS, lambda m: field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, NTT_MODULUS), 1024),
        (2013265921, lambda m: pow(31, (2013265921 - 1) // m, 2013265921), 128),
    ],
)
def test_ntt_jax_vs_golden(q, omega_fn, m):
    omega = omega_fn(m)
    plan = ntt_jax.ntt_plan(m, q, omega)
    rng = random.Random(m * 7 + 1)
    coeffs = [rng.randrange(q) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array(coeffs, dtype=object), plan.ctx.d))
    got_fwd = from_limbs(np.asarray(ntt_jax.ntt_forward_jit(plan, x)))
    want_fwd = poly.ntt_forward(coeffs, q, omega)
    assert [int(v) for v in got_fwd] == want_fwd
    got_inv = from_limbs(np.asarray(ntt_jax.ntt_inverse_jit(plan, jnp.asarray(
        to_limbs(np.array(want_fwd, dtype=object), plan.ctx.d)))))
    assert [int(v) for v in got_inv] == coeffs


def test_ntt_jax_batched():
    q = NTT_FRIENDLY_MODULUS
    m = 16
    omega = ROOTS_OF_UNITY_45BIT[m]
    plan = ntt_jax.ntt_plan(m, q, omega)
    rng = random.Random(5)
    batch = [[rng.randrange(q) for _ in range(m)] for _ in range(4)]
    x = jnp.asarray(to_limbs(np.array(batch, dtype=object), plan.ctx.d))
    got = np.asarray(ntt_jax.ntt_forward_jit(plan, x))
    for bi in range(4):
        want = poly.ntt_forward(batch[bi], q, omega)
        assert [int(v) for v in from_limbs(got[:, bi])] == want


def test_negacyclic_mul_vs_schoolbook():
    q = NTT_FRIENDLY_MODULUS
    n = 16  # needs 2n | 2^13: psi = sqrt(omega_16) = omega_32
    psi = ROOTS_OF_UNITY_45BIT[2 * n]
    omega = field.mul_mod(psi, psi, q)  # psi^2 (a primitive n-th root)
    plan = ntt_jax.ntt_plan(n, q, omega, negacyclic_psi=psi)
    rng = random.Random(8)
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    xa = jnp.asarray(to_limbs(np.array(a, dtype=object), plan.ctx.d))
    xb = jnp.asarray(to_limbs(np.array(b, dtype=object), plan.ctx.d))
    got = [int(v) for v in from_limbs(np.asarray(ntt_jax.negacyclic_mul(plan, xa, xb)))]
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            term = (a[i] * b[j]) % q
            if k >= n:
                want[k - n] = (want[k - n] - term) % q
            else:
                want[k] = (want[k] + term) % q
    assert got == want


def test_goldilocks_negacyclic_matches_numpy_host():
    from lambda_snark_tpu.ops.goldilocks_np import goldilocks_ntt

    n = 32
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n, q)
    psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n), q)
    plan = ntt_jax.ntt_plan(n, q, omega, negacyclic_psi=psi)
    host = goldilocks_ntt(n)
    rng = random.Random(10)
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    b = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    want = [int(v) for v in host.negacyclic_mul(a, b)]
    xa = jnp.asarray(to_limbs(a, plan.ctx.d))
    xb = jnp.asarray(to_limbs(b, plan.ctx.d))
    got = [int(v) for v in from_limbs(np.asarray(ntt_jax.negacyclic_mul(plan, xa, xb)))]
    assert got == want


def test_q45_solinas_stress():
    """Adversarial boundary products through the q45 Solinas reduction."""
    q = NTT_FRIENDLY_MODULUS
    ctx = modulus_ctx(q)
    rng = random.Random(123)
    specials = [0, 1, 2, q - 1, q - 2, ((1 << 44) - 1) % q, 0xFFFF,
                (q - 1) // 2, (q + 1) // 2, (1 << 32) - 1, 1 << 32]
    cases = [(a % q, b % q) for a in specials for b in specials]
    cases += [(rng.randrange(q), rng.randrange(q)) for _ in range(3000)]
    a = jnp.asarray(to_limbs(np.array([x for x, _ in cases], dtype=object), 3))
    b = jnp.asarray(to_limbs(np.array([y for _, y in cases], dtype=object), 3))
    got = from_limbs(np.asarray(modarith.mul_mod_jit(ctx, a, b)))
    for i, (x, y) in enumerate(cases):
        assert int(got[i]) == (x * y) % q, (x, y)
