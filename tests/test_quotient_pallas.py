"""Fused Pallas quotient kernel vs the XLA pipeline (bit-exactness).

Small m only on CPU (interpret-mode compile cost); the production shape is
exercised on the real TPU by scripts/exp_prove_batch.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.ops import modarith
from lambda_snark_tpu.ops.limb import modulus_ctx
from lambda_snark_tpu.ops.quotient_pallas import QuotientPlan, quotient_batch_fused
from lambda_snark_tpu.pipeline import ProvePlan, field_plan_for, quotient_batch

Q = NTT_FRIENDLY_MODULUS


def _rand_mul_instance(m: int, batch: int, seed: int):
    """Random a,b evals and c = a*b (valid) as (3, B, m) digit planes."""
    ctx = modulus_ctx(Q)
    rng = np.random.default_rng(seed)
    planes = lambda: rng.integers(0, 1 << 16, size=(3, batch, m),
                                  dtype=np.uint32)
    a = planes()
    a[2] %= ctx.q_digits[-1]
    b = planes()
    b[2] %= ctx.q_digits[-1]
    a, b = jnp.asarray(a), jnp.asarray(b)
    c = jax.jit(lambda x, y: modarith.mul_mod(ctx, x, y))(a, b)
    return a, b, c


@pytest.mark.parametrize("m,batch", [(64, 4), (256, 2)])
def test_fused_quotient_vs_pipeline(m, batch):
    psi = ROOTS_OF_UNITY_45BIT[2 * m]
    qp = QuotientPlan.create(m, Q, psi)
    plan = field_plan_for(m, Q)

    a, b, c = _rand_mul_instance(m, batch, seed=m)
    from lambda_snark_tpu.ops.ntt_jax import ntt_inverse

    class _PP:  # minimal stand-in with the fields quotient_batch reads
        pass

    pp = _PP()
    pp.plan = plan
    import lambda_snark_tpu.core.field as field
    from lambda_snark_tpu.ops.limb import int_to_digits

    pp.neg_half_inv_digits = tuple(
        int_to_digits(field.mod_inverse(Q - 2, Q), plan.ctx.d)
    )
    want = [np.asarray(x) for x in quotient_batch(pp, a, b, c)]
    got = [np.asarray(x) for x in quotient_batch_fused(qp, a, b, c)]
    for w, g, name in zip(want, got, ["q", "a", "b", "c", "valid"]):
        assert (w == g).all(), name


def test_fused_quotient_detects_invalid(seed=3):
    m, batch = 64, 2
    psi = ROOTS_OF_UNITY_45BIT[2 * m]
    qp = QuotientPlan.create(m, Q, psi)
    a, b, c = _rand_mul_instance(m, batch, seed)
    c = c.at[0, 1, 0].set((int(c[0, 1, 0]) + 1) % (1 << 16))
    *_rest, valid = quotient_batch_fused(qp, a, b, c)
    valid = np.asarray(valid)
    assert valid[0] and not valid[1]
