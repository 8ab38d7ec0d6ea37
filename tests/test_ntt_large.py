"""Four-step NTT vs golden host NTT (bit-exactness + roundtrip)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.ops import ntt_large
from lambda_snark_tpu.ops.limb import from_limbs, to_limbs
from lambda_snark_tpu.r1cs import poly


def _goldilocks_omega(m):
    return field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, NTT_MODULUS)


@pytest.mark.parametrize(
    "q,omega_fn,m",
    [
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 64),
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 512),
        (NTT_MODULUS, _goldilocks_omega, 256),
    ],
)
def test_four_step_vs_golden(q, omega_fn, m):
    omega = omega_fn(m)
    fsp = ntt_large.four_step_plan(m, q, omega)
    rng = random.Random(m)
    coeffs = [rng.randrange(q) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array(coeffs, dtype=object), fsp.plan_r.ctx.d))
    got = [int(v) for v in from_limbs(np.asarray(ntt_large.ntt_forward_large(fsp, x)))]
    want = poly.ntt_forward(coeffs, q, omega)
    assert got == want


def test_four_step_roundtrip_large():
    q = NTT_MODULUS
    m = 4096
    omega = _goldilocks_omega(m)
    fsp = ntt_large.four_step_plan(m, q, omega)
    rng = random.Random(99)
    coeffs = [rng.randrange(q) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array(coeffs, dtype=object), fsp.plan_r.ctx.d))
    evals = ntt_large.ntt_forward_large(fsp, x)
    back = [int(v) for v in from_limbs(np.asarray(ntt_large.ntt_inverse_large(fsp, evals)))]
    assert back == coeffs


def test_four_step_batched():
    q = NTT_FRIENDLY_MODULUS
    m = 64
    omega = ROOTS_OF_UNITY_45BIT[m]
    fsp = ntt_large.four_step_plan(m, q, omega)
    rng = random.Random(7)
    batch = [[rng.randrange(q) for _ in range(m)] for _ in range(3)]
    x = jnp.asarray(to_limbs(np.array(batch, dtype=object), fsp.plan_r.ctx.d))
    got = np.asarray(ntt_large.ntt_forward_large(fsp, x))
    for bi in range(3):
        want = poly.ntt_forward(batch[bi], q, omega)
        assert [int(v) for v in from_limbs(got[:, bi])] == want
