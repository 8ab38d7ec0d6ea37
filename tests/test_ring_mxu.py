"""MXU ring commitment vs the butterfly device commitment (bit-exactness).

Small n only on CPU (interpret compiles); production shape runs on the
real TPU via scripts/exp_prove_parts.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu import Params, Profile, SecurityLevel
from lambda_snark_tpu.commit.lwe import LweContext
from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext, commit_batch
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
from lambda_snark_tpu.ops.limb import to_limbs
from lambda_snark_tpu.ops.ring_mxu import RingMxuPlan, commit_batch_mxu

Q = NTT_FRIENDLY_MODULUS
N = 64


@pytest.fixture(scope="module")
def setup_ctx():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=N, k=2, q=Q, sigma=3.19)
    )
    host = LweContext(params, context_seed=3)
    dctx = DeviceCommitContext.from_host(host)
    plan = RingMxuPlan.create(host)
    return host, dctx, plan


def test_commit_mxu_bit_identical(setup_ctx):
    host, dctx, plan = setup_ctx
    rng = np.random.default_rng(0)
    batch = 4
    msgs = rng.integers(0, Q, size=(batch, N), dtype=np.uint64)
    msg_planes = jnp.asarray(to_limbs(msgs.astype(object), 4))
    key = jax.random.PRNGKey(11)
    want_c, want_s, want_e = commit_batch(dctx, msg_planes, key)
    got_c, got_s, got_e = commit_batch_mxu(plan, dctx, msg_planes, key)
    assert (np.asarray(got_s) == np.asarray(want_s)).all()
    assert (np.asarray(got_e) == np.asarray(want_e)).all()
    assert (np.asarray(got_c) == np.asarray(want_c)).all()


def test_commit_mxu_deterministic(setup_ctx):
    host, dctx, plan = setup_ctx
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, Q, size=(2, N), dtype=np.uint64)
    msg_planes = jnp.asarray(to_limbs(msgs.astype(object), 4))
    key = jax.random.PRNGKey(5)
    c1, _, _ = commit_batch_mxu(plan, dctx, msg_planes, key)
    c2, _, _ = commit_batch_mxu(plan, dctx, msg_planes, key)
    assert (np.asarray(c1) == np.asarray(c2)).all()


def test_commit_mxu_balanced_matches_7bit(setup_ctx):
    """Balanced base-256 and 7-bit leaf pipelines give identical
    commitments (production routes to balanced)."""
    host, dctx, plan = setup_ctx
    rng = np.random.default_rng(5)
    batch = 2
    msgs = rng.integers(0, Q, size=(batch, N), dtype=np.uint64)
    msg_planes = jnp.asarray(to_limbs(msgs.astype(object), 4))
    key = jax.random.PRNGKey(17)
    c_bal, s_bal, e_bal = commit_batch_mxu(plan, dctx, msg_planes, key, True)
    c_7, s_7, e_7 = commit_batch_mxu(plan, dctx, msg_planes, key, False)
    assert (np.asarray(c_bal) == np.asarray(c_7)).all()
    assert (np.asarray(s_bal) == np.asarray(s_7)).all()
    assert (np.asarray(e_bal) == np.asarray(e_7)).all()
