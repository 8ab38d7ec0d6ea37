"""Sharded (dp x sp) prove step vs single-device pipeline on a CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu import Params, Profile, SecurityLevel
from lambda_snark_tpu.commit.lwe import LweContext, RING_MODULUS
from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
from lambda_snark_tpu.ops.goldilocks_np import gl_add, gl_mul, goldilocks_ntt
from lambda_snark_tpu.ops.limb import from_limbs, from_limbs_u64, to_limbs
from lambda_snark_tpu.parallel.mesh import make_mesh
from lambda_snark_tpu.parallel.pipeline_sharded import ShardedProver
from lambda_snark_tpu.pipeline import ProvePlan, quotient_batch_jit

from test_r1cs import multiplication_gates, mult_witness

Q = NTT_FRIENDLY_MODULUS
M = 64  # = ring degree for the sharded path


@pytest.fixture(scope="module")
def host_ctx():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=M, k=2, q=Q, sigma=3.19)
    )
    return LweContext(params, context_seed=5)


@pytest.fixture(scope="module")
def setup(host_ctx):
    mesh = make_mesh([2, 4], ["dp", "sp"])
    sp = ShardedProver(M, Q, host_ctx, mesh)
    r1cs = multiplication_gates(M, Q)
    witnesses = [mult_witness(M, Q, seed=s) for s in range(4)]
    evs = [r1cs.compute_constraint_evals(w) for w in witnesses]
    d = sp.fq_ctx.d
    stack = lambda idx: to_limbs(np.array([e[idx] for e in evs], dtype=object), d)
    a_e, b_e, c_e = stack(0), stack(1), stack(2)
    out = sp.run(a_e, b_e, c_e, seed=17)
    return sp, r1cs, witnesses, (a_e, b_e, c_e), out, host_ctx


def test_sharded_quotient_matches_single_device(setup, host_ctx):
    sp, r1cs, witnesses, (a_e, b_e, c_e), out, _ = setup
    q_pl, a_pl, b_pl, c_pl, c_ring, s_sgn, e_sgn, valid = out
    assert np.asarray(valid).all()
    # single-device reference
    dctx = DeviceCommitContext.from_host(host_ctx)
    pp = ProvePlan.create(M, Q, dctx)
    q1, a1, b1, c1, v1 = quotient_batch_jit(
        pp, jnp.asarray(a_e), jnp.asarray(b_e), jnp.asarray(c_e)
    )
    got_q = sp.coeff_layout_to_flat(np.asarray(q_pl))
    assert np.array_equal(got_q, np.asarray(q1))
    got_a = sp.coeff_layout_to_flat(np.asarray(a_pl))
    assert np.array_equal(got_a, np.asarray(a1))


def test_sharded_commitment_opens(setup, host_ctx):
    """Recompute c = sum A_j s_j + e + m on host from returned randomness."""
    sp, r1cs, witnesses, _, out, _ = setup
    q_pl, _, _, _, c_ring, s_sgn, e_sgn, valid = out
    n = host_ctx.n
    ntt = goldilocks_ntt(n)
    q_flat = sp.coeff_layout_to_flat(np.asarray(q_pl))  # (D, B, m)
    c_flat = sp.coeff_layout_to_flat(np.asarray(c_ring))
    s = np.asarray(s_sgn)  # (k, B, rows, C) -> flatten coefficient order
    e = np.asarray(e_sgn)
    b = q_flat.shape[1]
    k = host_ctx.k
    s_flat = s.reshape(k, b, n)
    e_flat = e.reshape(b, n)

    def signed_to_ring(v):
        v = v.astype(np.int64)
        out = v.astype(np.uint64)
        return np.where(v < 0, out + np.uint64(RING_MODULUS), out)

    for i in range(b):
        msg = from_limbs_u64(q_flat[:, i])  # field values < q < p
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            a_coeffs = ntt.inverse_negacyclic(host_ctx.a_hat[j])
            prod = ntt.negacyclic_mul(a_coeffs, signed_to_ring(s_flat[j, i]))
            acc = gl_add(acc, prod)
        acc = gl_add(acc, signed_to_ring(e_flat[i]))
        acc = gl_add(acc, msg)
        got = from_limbs_u64(c_flat[:, i])
        assert np.array_equal(acc, got), f"commitment {i} mismatch"


def test_sharded_mesh_size_independent(host_ctx):
    """Results identical across mesh shapes (1x2 vs 2x4 vs 1x8)."""
    r1cs = multiplication_gates(M, Q)
    witnesses = [mult_witness(M, Q, seed=9), mult_witness(M, Q, seed=10)]
    evs = [r1cs.compute_constraint_evals(w) for w in witnesses]
    outs = []
    for shape in ([1, 2], [2, 2], [1, 4]):
        mesh = make_mesh(shape, ["dp", "sp"])
        sp = ShardedProver(M, Q, host_ctx, mesh)
        d = sp.fq_ctx.d
        stack = lambda idx: to_limbs(
            np.array([e[idx] for e in evs], dtype=object), d
        )
        out = sp.run(stack(0), stack(1), stack(2), seed=3)
        outs.append(sp.coeff_layout_to_flat(np.asarray(out[0])))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])


def test_commitment_mesh_invariant(setup, host_ctx):
    """Counter-mode randomness makes the commitment bytes independent of
    the mesh shape: the (2, 4) run equals a (1, 1) single-device-mesh run
    AND the unsharded `prove_stage_batch` pipeline bit-for-bit."""
    sp, r1cs, witnesses, (a_e, b_e, c_e), out, _ = setup
    c_24 = sp.coeff_layout_to_flat(np.asarray(out[4]))
    mesh1 = make_mesh([1, 1], ["dp", "sp"])
    sp1 = ShardedProver(M, Q, host_ctx, mesh1)
    out1 = sp1.run(a_e, b_e, c_e, seed=17)
    c_11 = sp1.coeff_layout_to_flat(np.asarray(out1[4]))
    assert np.array_equal(c_24, c_11)
    # unsharded single-device pipeline with the same key derivation
    from lambda_snark_tpu.pipeline import prove_stage_batch_jit

    dctx = DeviceCommitContext.from_host(host_ctx)
    pp = ProvePlan.create(M, Q, dctx)
    key = jax.random.PRNGKey(17 & 0x7FFFFFFF)
    _q, _a, _b, _c, c_single, _v = prove_stage_batch_jit(
        pp, jnp.asarray(a_e), jnp.asarray(b_e), jnp.asarray(c_e), key
    )
    assert np.array_equal(c_24, np.asarray(c_single))
