"""Fused Pallas ring-commitment kernel vs host golden commitment math."""

import numpy as np
import pytest

import jax.numpy as jnp

from lambda_snark_tpu import Params, Profile, SecurityLevel
from lambda_snark_tpu.commit.lwe import LweContext, RING_MODULUS
from lambda_snark_tpu.ops.goldilocks_np import gl_add, gl_mul, goldilocks_ntt
from lambda_snark_tpu.ops.limb import from_limbs_u64, to_limbs
from lambda_snark_tpu.ops.ring_pallas import RingCommitPlan, fused_commit

Q = 17592186044417


@pytest.fixture(scope="module")
def host_ctx():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=32, k=2, q=Q, sigma=3.19)
    )
    return LweContext(params, context_seed=4)


def test_fused_commit_matches_host(host_ctx):
    n, k = host_ctx.n, host_ctx.k
    batch = 4
    rng = np.random.default_rng(7)
    # small signed randomness mapped into the ring
    s_signed = rng.integers(-12, 13, size=(k, batch, n)).astype(np.int64)
    e_signed = rng.integers(-12, 13, size=(batch, n)).astype(np.int64)
    msg = rng.integers(0, Q, size=(batch, n), dtype=np.uint64)

    def to_ring(v):
        out = v.astype(np.int64).astype(np.uint64)
        return np.where(v < 0, out + np.uint64(RING_MODULUS), out)

    # host expected: c = sum A_j * s_j + e + m via the numpy golden path
    ntt = goldilocks_ntt(n)
    expected = []
    for b in range(batch):
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            s_hat = ntt.forward_negacyclic(to_ring(s_signed[j, b]))
            acc = gl_add(acc, gl_mul(host_ctx.a_hat[j], s_hat))
        c = ntt.inverse_negacyclic(acc)
        c = gl_add(c, to_ring(e_signed[b]))
        c = gl_add(c, msg[b])
        expected.append(c)
    expected = np.stack(expected)

    plan = RingCommitPlan.create(host_ctx)

    def pack(u64_arr):
        obj = np.empty(u64_arr.shape, dtype=object)
        flat_src = u64_arr.reshape(-1)
        flat_dst = obj.reshape(-1)
        for i in range(flat_src.shape[0]):
            flat_dst[i] = int(flat_src[i])
        return jnp.asarray(to_limbs(obj, 4))

    s_planes = jnp.stack([pack(to_ring(s_signed[j])) for j in range(k)])
    e_planes = pack(to_ring(e_signed))
    m_planes = pack(msg)
    got = from_limbs_u64(np.asarray(fused_commit(plan, s_planes, e_planes, m_planes)))
    assert np.array_equal(got, expected)


def test_fused_commit_batch_tiling(host_ctx):
    # batch larger than one tile exercises the grid path
    n, k = host_ctx.n, host_ctx.k
    batch = 16
    rng = np.random.default_rng(9)
    zeros_s = jnp.asarray(
        np.zeros((k, 4, batch, n), dtype=np.uint32)
    )
    zeros_e = jnp.asarray(np.zeros((4, batch, n), dtype=np.uint32))
    msg = rng.integers(0, Q, size=(batch, n), dtype=np.uint64)
    obj = np.empty(msg.shape, dtype=object)
    for i in range(batch):
        for j2 in range(n):
            obj[i, j2] = int(msg[i, j2])
    m_planes = jnp.asarray(to_limbs(obj, 4))
    # with s = e = 0 the commitment equals the message exactly
    got = from_limbs_u64(np.asarray(fused_commit(plan := RingCommitPlan.create(host_ctx), zeros_s, zeros_e, m_planes)))
    assert np.array_equal(got, msg)
