"""Module-LWE commitment: determinism, binding, homomorphism, Gaussian CDT.

Parity intent with reference C++ GTest suites (``cpp-core/tests/
test_commitment.cpp:32-134``: binding, opening-matches-message, homomorphic
linear combination) plus the determinism the SEAL stack could not provide.
"""

import numpy as np
import pytest

from lambda_snark_tpu import Params, Profile, SecurityLevel
from lambda_snark_tpu.commit import lwe
from lambda_snark_tpu.ops import gaussian
from lambda_snark_tpu.ops.goldilocks_np import GOLDILOCKS
from lambda_snark_tpu.utils.chacha import ChaCha20Rng

Q = 17592186044417  # tv field modulus


@pytest.fixture(scope="module")
def ctx():
    # small ring for test speed; production profile is n=4096, k=2
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=256, k=2, q=Q, sigma=3.19)
    )
    return lwe.LweContext(params, context_seed=7)


def test_commit_deterministic(ctx):
    msg = [1, 7, 13, 91]
    c1, o1 = lwe.commit(ctx, msg, seed=0x1234)
    c2, o2 = lwe.commit(ctx, msg, seed=0x1234)
    assert c1 == c2
    assert np.array_equal(o1.s, o2.s) and np.array_equal(o1.e, o2.e)


def test_commit_seed_sensitivity(ctx):
    msg = [1, 7, 13, 91]
    c1, _ = lwe.commit(ctx, msg, seed=1)
    c2, _ = lwe.commit(ctx, msg, seed=2)
    assert c1 != c2


def test_commit_message_sensitivity(ctx):
    c1, _ = lwe.commit(ctx, [1, 7, 13, 91], seed=1)
    c2, _ = lwe.commit(ctx, [1, 7, 13, 92], seed=1)
    assert c1 != c2


def test_opening_verifies(ctx):
    msg = [5, 4, 3, 2, 1]
    c, op = lwe.commit(ctx, msg, seed=99)
    assert lwe.verify_opening(ctx, c, op)


def test_opening_wrong_message_rejected(ctx):
    c, op = lwe.commit(ctx, [5, 4, 3], seed=99)
    bad_msg = op.message.copy()
    bad_msg[0] = (int(bad_msg[0]) + 1) % lwe.RING_MODULUS
    bad = lwe.Opening(message=bad_msg, s=op.s, e=op.e, norm_bound=op.norm_bound)
    assert not lwe.verify_opening(ctx, c, bad)


def test_opening_oversized_randomness_rejected(ctx):
    c, op = lwe.commit(ctx, [1, 2, 3], seed=5)
    big_e = op.e.copy()
    big_e[0] = op.norm_bound + 1
    bad = lwe.Opening(message=op.message, s=op.s, e=big_e, norm_bound=op.norm_bound)
    assert not bad.norm_ok()
    assert not lwe.verify_opening(ctx, c, bad)


def test_linear_combine_homomorphic(ctx):
    m1, m2 = [1, 2, 3], [10, 20, 30]
    c1, o1 = lwe.commit(ctx, m1, seed=11)
    c2, o2 = lwe.commit(ctx, m2, seed=22)
    combined, op = lwe.linear_combine(ctx, [c1, c2], [2, 3], openings=[o1, o2])
    # combined commitment opens to 2*m1 + 3*m2 with combined randomness
    assert lwe.verify_opening(ctx, combined, op)
    expect = [(2 * a + 3 * b) % lwe.RING_MODULUS for a, b in zip(m1, m2)]
    assert [int(x) for x in op.message[:3]] == expect


def test_message_embedding_reduces_mod_field_q(ctx):
    # reference Commitment::new reduces mod field q first (commitment.rs:31-45)
    c1, _ = lwe.commit(ctx, [Q + 5], seed=1)
    c2, _ = lwe.commit(ctx, [5], seed=1)
    assert c1 == c2


def test_commitment_serialization_roundtrip(ctx):
    c, _ = lwe.commit(ctx, [1, 2, 3], seed=42)
    data = c.to_bytes()
    c2 = lwe.Commitment.from_bytes(data)
    assert c == c2  # closes the reference's Deserialize gap (commitment.rs:123-135)


def test_context_seed_changes_matrix():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=64, k=1, q=Q, sigma=3.19)
    )
    ctx1 = lwe.LweContext(params, context_seed=1)
    ctx2 = lwe.LweContext(params, context_seed=2)
    assert not np.array_equal(ctx1.a_hat, ctx2.a_hat)


# --- Gaussian sampler -------------------------------------------------------


def test_cdf_construction_shape():
    cdf = gaussian.build_cdf(3.19)
    # bound = ceil(12 * 3.19) = 39 -> 40 entries; last saturates at 2^64-1
    assert len(cdf) == 40
    assert int(cdf[-1]) == (1 << 64) - 1
    assert all(int(cdf[i]) <= int(cdf[i + 1]) for i in range(len(cdf) - 1))


def test_cdf_minimum_support():
    cdf = gaussian.build_cdf(0.5)
    assert len(cdf) >= 9  # bound floor of 8 (utils.cpp:35-37)


def test_sampler_scalar_vs_vectorized():
    cdf = gaussian.build_cdf(3.19)
    r1 = ChaCha20Rng.from_u64(99)
    r2 = ChaCha20Rng.from_u64(99)
    a = gaussian.sample_signed(r1, cdf, 500)
    b = gaussian.sample_signed_vectorized(r2, cdf, 500)
    assert np.array_equal(a, b)


def test_sampler_statistics():
    cdf = gaussian.build_cdf(3.19)
    rng = ChaCha20Rng.from_u64(12345)
    samples = gaussian.sample_signed_vectorized(rng, cdf, 4000)
    assert abs(float(samples.mean())) < 0.3
    std = float(samples.std())
    assert 2.7 < std < 3.7  # sigma = 3.19 within tolerance
    assert int(np.abs(samples).max()) <= 39


def test_sampler_zero_never_negative():
    cdf = gaussian.build_cdf(3.19)
    rng = ChaCha20Rng.from_u64(4)
    samples = gaussian.sample_signed_vectorized(rng, cdf, 2000)
    # two's-complement-free check: no "-0" possible with ints; distribution
    # must contain both signs
    assert (samples > 0).any() and (samples < 0).any()


def test_randomness_batch_matches_per_seed(ctx):
    """Vectorized multi-key randomness is draw-for-draw identical to the
    scalar per-seed derivation (the in-graph fused commit depends on it)."""
    from lambda_snark_tpu.commit.lwe import randomness_batch

    seeds = [0, 5, 17, (1 << 64) - 1]
    ss, es = randomness_batch(ctx, seeds)
    for i, seed in enumerate(seeds):
        s1, e1 = ctx._randomness(seed)
        assert (ss[i] == s1).all(), seed
        assert (es[i] == e1).all(), seed


def test_commit_in_graph_matches_host():
    """The fused in-graph device commit is bit-identical to the host
    ChaCha-suite commit_batch (exact ring arithmetic on the same draws)."""
    import jax
    import jax.numpy as jnp

    from lambda_snark_tpu import Params, Profile, SecurityLevel
    from lambda_snark_tpu.commit import lwe
    from lambda_snark_tpu.commit.lwe_jax import (
        a_hat_planes_for,
        commit_in_graph,
        goldilocks_ring_plan,
    )
    from lambda_snark_tpu.core.params import NTT_MODULUS
    from lambda_snark_tpu.ops.limb import from_limbs_u64, u64_to_limbs

    n, k, s_count = 128, 2, 3
    gctx = lwe.LweContext(
        Params(
            SecurityLevel.BITS128, Profile.ring_b(n, k, NTT_MODULUS, 3.19)
        ),
        context_seed=3,
    )
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, NTT_MODULUS, size=(s_count, n), dtype=np.uint64)
    seeds = [5, 17, 99]
    want, _ = lwe.commit_batch(gctx, [msgs[i] for i in range(s_count)], seeds)
    ss, es = lwe.randomness_batch(gctx, seeds)
    plan = goldilocks_ring_plan(n)
    ah = a_hat_planes_for(gctx)
    c_planes = jax.jit(
        lambda m4, s8, e8: commit_in_graph(plan, ah, m4, s8, e8)
    )(
        jnp.asarray(u64_to_limbs(msgs, 4)),
        jnp.asarray(ss.astype(np.int8)),
        jnp.asarray(es.astype(np.int8)),
    )
    got = from_limbs_u64(np.asarray(c_planes))
    for i in range(s_count):
        assert (got[i] == want[i].words).all(), i


def test_in_graph_chacha_sampling_matches_host():
    """Device-generated ChaCha randomness streams (keys-only upload) are
    draw-for-draw identical to the host suite's ``randomness_batch``."""
    import jax
    import jax.numpy as jnp

    from lambda_snark_tpu import Params, Profile, SecurityLevel
    from lambda_snark_tpu.commit.lwe import (
        LweContext,
        _signed_to_ring,
        randomness_batch,
        randomness_keys,
    )
    from lambda_snark_tpu.core.params import NTT_MODULUS
    from lambda_snark_tpu.ops import sampler_jax
    from lambda_snark_tpu.ops.limb import from_limbs_u64, modulus_ctx

    n, k = 128, 2
    gctx = LweContext(
        Params(
            SecurityLevel.BITS128, Profile.ring_b(n, k, NTT_MODULUS, 3.19)
        ),
        context_seed=3,
    )
    seeds = [5, 17, (1 << 64) - 1]
    keys = randomness_keys(gctx, seeds)
    cdf_hi, cdf_lo = sampler_jax.cdf_split(gctx.cdf)
    mctx = modulus_ctx(NTT_MODULUS)
    sp, ep = jax.jit(
        lambda kw: sampler_jax.sample_chacha_planes_in_graph(
            kw, k, n, cdf_hi, cdf_lo, mctx
        )
    )(jnp.asarray(keys))
    ss, es = randomness_batch(gctx, seeds)
    assert (from_limbs_u64(np.asarray(sp)) == _signed_to_ring(ss)).all()
    assert (from_limbs_u64(np.asarray(ep)) == _signed_to_ring(es)).all()
