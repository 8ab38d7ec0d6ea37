"""Pallas NTT kernel (interpret mode on CPU) vs golden host NTT."""

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
from lambda_snark_tpu.ops import ntt_pallas
from lambda_snark_tpu.ops.limb import from_limbs, to_limbs
from lambda_snark_tpu.r1cs import poly


@pytest.mark.parametrize(
    "q,omega_fn,s_len",
    [
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 8),
        (NTT_FRIENDLY_MODULUS, lambda m: ROOTS_OF_UNITY_45BIT[m], 256),
        (NTT_MODULUS,
         lambda m: field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, NTT_MODULUS),
         128),
    ],
)
def test_pallas_ntt_vs_golden(q, omega_fn, s_len):
    omega = omega_fn(s_len)
    pp = ntt_pallas.pallas_ntt_plan(s_len, q, omega)
    rng = random.Random(s_len)
    batch = 4
    data = [[rng.randrange(q) for _ in range(s_len)] for _ in range(batch)]
    x = jnp.asarray(to_limbs(np.array(data, dtype=object), pp.plan.ctx.d))
    got = np.asarray(ntt_pallas.ntt_forward_pallas(pp, x))
    for bi in range(batch):
        want = poly.ntt_forward(data[bi], q, omega)
        assert [int(v) for v in from_limbs(got[:, bi])] == want, bi


def test_pallas_ntt_roundtrip():
    q = NTT_FRIENDLY_MODULUS
    s_len = 64
    omega = ROOTS_OF_UNITY_45BIT[s_len]
    pp = ntt_pallas.pallas_ntt_plan(s_len, q, omega)
    rng = random.Random(5)
    data = [[rng.randrange(q) for _ in range(s_len)] for _ in range(2)]
    x = jnp.asarray(to_limbs(np.array(data, dtype=object), pp.plan.ctx.d))
    f = ntt_pallas.ntt_forward_pallas(pp, x)
    back = np.asarray(ntt_pallas.ntt_inverse_pallas(pp, f))
    for bi in range(2):
        assert [int(v) for v in from_limbs(back[:, bi])] == data[bi]
