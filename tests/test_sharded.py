"""Sharded four-step NTT on a virtual 8-device CPU mesh: bit-exactness.

The multi-device story the reference lacks (SURVEY.md section 4.2): sharded
vs single-device outputs must agree exactly at every m.
"""

import random

import jax
import numpy as np
import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.ops.limb import from_limbs, to_limbs, modulus_ctx
from lambda_snark_tpu.parallel.mesh import ring_mesh
from lambda_snark_tpu.parallel.ntt_sharded import ShardedNtt
from lambda_snark_tpu.r1cs import poly


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return ring_mesh(8)


def _planes(vals, q):
    ctx = modulus_ctx(q)
    return to_limbs(np.array(vals, dtype=object), ctx.d)


@pytest.mark.parametrize(
    "q,omega_fn,m",
    [
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 1024),
        (NTT_MODULUS,
         lambda m: field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, NTT_MODULUS),
         4096),
    ],
)
def test_sharded_forward_bit_exact(mesh8, q, omega_fn, m):
    omega = omega_fn(m)
    sh = ShardedNtt(m, q, omega, mesh8)
    rng = random.Random(m)
    coeffs = [rng.randrange(q) for _ in range(m)]
    x = sh.coeff_to_device(_planes(coeffs, q))
    f = sh.forward(x)
    got = [int(v) for v in from_limbs(sh.eval_layout_to_natural(f))]
    want = poly.ntt_forward(coeffs, q, omega)
    assert got == want


def test_sharded_roundtrip_and_pointwise(mesh8):
    q = NTT_FRIENDLY_MODULUS
    m = 1024
    omega = ROOTS_OF_UNITY_45BIT[m]
    sh = ShardedNtt(m, q, omega, mesh8)
    rng = random.Random(3)
    a = [rng.randrange(q) for _ in range(m)]
    b = [rng.randrange(q) for _ in range(m)]
    xa = sh.coeff_to_device(_planes(a, q))
    xb = sh.coeff_to_device(_planes(b, q))
    fa = sh.forward(xa)
    fb = sh.forward(xb)
    # roundtrip
    back = [int(v) for v in from_limbs(sh.coeff_from_device(np.asarray(sh.inverse(fa))))]
    assert back == a
    # cyclic convolution via pointwise product in eval layout
    fc = sh.pointwise_mul(fa, fb)
    got = [int(v) for v in from_limbs(sh.coeff_from_device(np.asarray(sh.inverse(fc))))]
    want = [0] * m
    # schoolbook cyclic convolution mod (X^m - 1)
    for i in range(0, m, 37):  # spot-check a subset of coefficients cheaply
        pass
    # full check via golden NTT instead (O(m log m))
    fa_g = poly.ntt_forward(a, q, omega)
    fb_g = poly.ntt_forward(b, q, omega)
    prod = [field.mul_mod(x, y, q) for x, y in zip(fa_g, fb_g)]
    want = poly.ntt_inverse(prod, q, omega)
    assert got == want


def test_sharded_batched_layout_independent(mesh8):
    # different device counts must give identical results (determinism of
    # integer reductions; SURVEY section 7 hard parts)
    q = NTT_MODULUS
    m = 1024
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    rng = random.Random(11)
    coeffs = [rng.randrange(q) for _ in range(m)]
    outs = []
    for n_dev in (2, 4, 8):
        sh = ShardedNtt(m, q, omega, ring_mesh(n_dev))
        x = sh.coeff_to_device(_planes(coeffs, q))
        f = sh.forward(x)
        outs.append([int(v) for v in from_limbs(sh.eval_layout_to_natural(f))])
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == poly.ntt_forward(coeffs, q, omega)
