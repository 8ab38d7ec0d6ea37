"""q45 MXU quotient pipeline vs the butterfly pipeline (bit-exactness).

Small m only on CPU (interpret-mode compiles are minutes at production
tiles); the production shape runs on the real TPU via
scripts/exp_prove_parts.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.ops import modarith, ntt_mxu_q45
from lambda_snark_tpu.ops.limb import from_limbs, modulus_ctx, to_limbs
from lambda_snark_tpu.r1cs import poly

Q = NTT_FRIENDLY_MODULUS


def test_pack_roundtrip_and_recombine_bound():
    import random

    rng = random.Random(0)
    vals = [rng.randrange(Q) for _ in range(128)] + [0, 1, Q - 1]
    x3 = jnp.asarray(to_limbs(np.array([vals], dtype=object), 3))
    back = np.asarray(
        ntt_mxu_q45.unpack_q45_jnp(ntt_mxu_q45.pack_q45_jnp(x3))
    )
    assert (back == np.asarray(x3)).all()


def test_fourstep_forward_vs_golden():
    m = 64
    omega = ROOTS_OF_UNITY_45BIT[m]
    plan = ntt_mxu_q45.Q45MxuPlan.create(m, omega)
    import random

    rng = random.Random(m)
    data = [[rng.randrange(Q) for _ in range(m)] for _ in range(2)]
    x3 = jnp.asarray(to_limbs(np.array(data, dtype=object), 3))
    x2 = ntt_mxu_q45.pack_q45_jnp(x3)
    got2 = jax.jit(
        lambda v: ntt_mxu_q45.fourstep_apply(plan, v), static_argnums=()
    )(x2)
    got = np.asarray(ntt_mxu_q45.unpack_q45_jnp(got2))
    for r in range(2):
        want = poly.ntt_forward(data[r], Q, omega)
        assert [int(v) for v in from_limbs(got[:, r])] == want, r


def test_quotient_mxu_vs_pipeline():
    from lambda_snark_tpu.pipeline import field_plan_for, quotient_batch
    from lambda_snark_tpu.ops.limb import int_to_digits

    m, batch = 64, 2
    psi = ROOTS_OF_UNITY_45BIT[2 * m]
    qp = ntt_mxu_q45.q45_quotient_plan(m, psi)
    ctx = modulus_ctx(Q)
    rng = np.random.default_rng(7)
    planes = lambda: rng.integers(0, 1 << 16, size=(3, batch, m),
                                  dtype=np.uint32)
    a = planes()
    a[2] %= ctx.q_digits[-1]
    b = planes()
    b[2] %= ctx.q_digits[-1]
    a, b = jnp.asarray(a), jnp.asarray(b)
    c = jax.jit(lambda x, y: modarith.mul_mod(ctx, x, y))(a, b)

    class _PP:
        pass

    pp = _PP()
    pp.plan = field_plan_for(m, Q)
    pp.neg_half_inv_digits = tuple(
        int_to_digits(field.mod_inverse(Q - 2, Q), 3)
    )
    pp.fused = False
    pp.qplan = None
    want = [np.asarray(x) for x in quotient_batch(pp, a, b, c)]
    got = [np.asarray(x) for x in ntt_mxu_q45.quotient_batch_mxu(qp, a, b, c)]
    for w, g, name in zip(want, got, ["q", "a", "b", "c", "valid"]):
        assert (w == g).all(), name


def test_quotient_mxu_detects_invalid():
    m, batch = 64, 2
    psi = ROOTS_OF_UNITY_45BIT[2 * m]
    qp = ntt_mxu_q45.q45_quotient_plan(m, psi)
    ctx = modulus_ctx(Q)
    rng = np.random.default_rng(9)
    planes = lambda: rng.integers(0, 1 << 16, size=(3, batch, m),
                                  dtype=np.uint32)
    a = planes()
    a[2] %= ctx.q_digits[-1]
    b = planes()
    b[2] %= ctx.q_digits[-1]
    a, b = jnp.asarray(a), jnp.asarray(b)
    c = jax.jit(lambda x, y: modarith.mul_mod(ctx, x, y))(a, b)
    c = c.at[0, 1, 3].set((int(c[0, 1, 3]) + 1) % (1 << 16))
    *_r, valid = ntt_mxu_q45.quotient_batch_mxu(qp, a, b, c)
    valid = np.asarray(valid)
    assert valid[0] and not valid[1]


def test_balanced_extraction_exact_q45():
    """Balanced base-256 digits of packed q45 words encode values exactly."""
    import random

    rng = random.Random(7)
    vals = [rng.randrange(Q) for _ in range(125)] + [0, 1, Q - 1]
    x3 = jnp.asarray(to_limbs(np.array([vals], dtype=object), 3))
    x2 = ntt_mxu_q45.pack_q45_jnp(x3)
    subs = ntt_mxu_q45._extract_balanced_q45(x2)
    for idx, v in enumerate(vals):
        got = sum(
            int(subs[t][0, idx]) << (8 * t) for t in range(ntt_mxu_q45._TB)
        )
        assert got == v, (idx, v, got)


def test_balanced_w_digits_exact_q45():
    import random

    rng = random.Random(8)
    vals = np.array(
        [[rng.randrange(Q) for _ in range(10)] + [0, 1, Q - 1]], dtype=object
    )
    subs = ntt_mxu_q45._subdigit_planes_balanced_host(vals)
    for idx in range(vals.shape[1]):
        got = sum(
            int(subs[t, 0, idx]) << (8 * t) for t in range(ntt_mxu_q45._TB)
        )
        assert got == int(vals[0, idx])


def test_fourstep_balanced_matches_7bit():
    """Balanced (6x6 matmul) and 7-bit (7x7) q45 leaves are bit-identical,
    including the fused twist/twiddle/untwist tables (quotient plan)."""
    import random

    m = 64
    psi = field.mod_pow(3, (Q - 1) // (2 * m), Q)
    qp = ntt_mxu_q45.q45_quotient_plan(m, psi)
    rng = random.Random(9)
    ctx3 = modulus_ctx(Q)

    def planes(seed):
        r = random.Random(seed)
        data = [[r.randrange(Q) for _ in range(m)] for _ in range(2)]
        return jnp.asarray(to_limbs(np.array(data, dtype=object), 3))

    a_e, b_e = planes(1), planes(2)
    c_e = jax.jit(lambda a, b: modarith.mul_mod(ctx3, a, b))(a_e, b_e)
    out_bal = ntt_mxu_q45.quotient_batch_mxu(qp, a_e, b_e, c_e, True)
    out_7 = ntt_mxu_q45.quotient_batch_mxu(qp, a_e, b_e, c_e, False)
    for g, w in zip(out_bal, out_7):
        assert (np.asarray(g) == np.asarray(w)).all()
