"""MXU int8-matmul NTT vs golden host NTT (bit-exactness)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from lambda_snark_tpu.ops import ntt_mxu
from lambda_snark_tpu.ops.limb import from_limbs, to_limbs
from lambda_snark_tpu.r1cs import poly

P = NTT_MODULUS


def _omega(m):
    return field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, P)


def test_subdigit_extraction_roundtrip():
    rng = random.Random(1)
    vals = [rng.randrange(P) for _ in range(64)] + [0, 1, P - 1]
    planes = jnp.asarray(to_limbs(np.array([vals], dtype=object), 4))
    subs = ntt_mxu._extract_subdigits(planes)
    for idx, v in enumerate(vals):
        got = sum(int(subs[t][0, idx]) << (7 * t) for t in range(ntt_mxu._T))
        assert got == v, idx


@pytest.mark.parametrize("b", [8, 32, 128])
def test_dft_matmul_leaf_vs_golden(b):
    omega = _omega(b)
    plan = ntt_mxu.DftMatmulPlan.create(b, omega)
    rng = random.Random(b)
    rows = 3
    data = [[rng.randrange(P) for _ in range(b)] for _ in range(rows)]
    x = jnp.asarray(to_limbs(np.array(data, dtype=object), 4))
    got = np.asarray(ntt_mxu.dft_matmul_apply(plan, x))
    for r in range(rows):
        want = poly.ntt_forward(data[r], P, omega)
        assert [int(v) for v in from_limbs(got[:, r])] == want, r


@pytest.mark.parametrize("m", [256, 4096])
def test_mxu_four_step_vs_golden(m):
    plan = ntt_mxu.mxu_ntt_plan(m, leaf_size=64)
    rng = random.Random(m)
    data = [rng.randrange(P) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array([data], dtype=object), 4))
    got = np.asarray(ntt_mxu.ntt_forward_mxu(plan, x))
    want = poly.ntt_forward(data, P, _omega(m))
    assert [int(v) for v in from_limbs(got[:, 0])] == want


def test_mxu_boundary_values():
    b = 16
    plan = ntt_mxu.DftMatmulPlan.create(b, _omega(b))
    data = [P - 1] * b
    x = jnp.asarray(to_limbs(np.array([data], dtype=object), 4))
    got = [int(v) for v in from_limbs(np.asarray(ntt_mxu.dft_matmul_apply(plan, x))[:, 0])]
    want = poly.ntt_forward(data, P, _omega(b))
    assert got == want
