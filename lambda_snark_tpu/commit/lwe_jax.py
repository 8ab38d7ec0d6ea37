"""Batched device (JAX/TPU) Module-LWE commitments over the Goldilocks ring.

Device counterpart of ``commit.lwe``: c = sum_j A_j * s_j + e + m in
R = Z_p[X]/(X^n + 1), computed entirely on digit planes with the negacyclic
NTT. Ring products happen in the NTT domain against the precomputed
A-hat planes; per-commitment randomness comes from the device ("threefry")
suite of ``ops.sampler_jax``.

Batching: messages (B, n) -> commitments (B, n); everything vectorizes over
the batch axis natively (transform axis is trailing). The sharded variant
lives in ``parallel.commit_sharded``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from ..ops import modarith, sampler_jax
from ..ops.limb import to_limbs
from ..ops.ntt_jax import (
    NttPlan,
    ntt_forward_negacyclic,
    ntt_inverse_negacyclic,
    ntt_plan,
)
from .lwe import LweContext


def goldilocks_ring_plan(n: int) -> NttPlan:
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n, NTT_MODULUS)
    psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n), NTT_MODULUS)
    return ntt_plan(n, NTT_MODULUS, omega, negacyclic_psi=psi)


@dataclasses.dataclass(frozen=True, eq=False)
class DeviceCommitContext:
    """Device-staged commitment context (A-hat planes + CDT table)."""

    n: int
    k: int
    sigma: float
    plan: NttPlan
    a_hat_planes: np.ndarray  # (k, D, n) uint32 — NTT-domain A rows
    cdf_hi: np.ndarray
    cdf_lo: np.ndarray

    @staticmethod
    def from_host(ctx: LweContext) -> "DeviceCommitContext":
        plan = goldilocks_ring_plan(ctx.n)
        d = plan.ctx.d
        a_hat = np.stack([to_limbs(ctx.a_hat[j], d) for j in range(ctx.k)])
        cdf_hi, cdf_lo = sampler_jax.cdf_split(ctx.cdf)
        return DeviceCommitContext(
            n=ctx.n,
            k=ctx.k,
            sigma=ctx.sigma,
            plan=plan,
            a_hat_planes=a_hat,
            cdf_hi=cdf_hi,
            cdf_lo=cdf_lo,
        )


def commit_batch(dctx: DeviceCommitContext, messages_planes, key: jax.Array):
    """Commit to a batch of messages.

    messages_planes: (D, B, n) canonical Z_p digit planes (already embedded).
    Returns (commitment planes (D, B, n), s_signed (k, B, n), e_signed (B, n)).
    """
    ctx = dctx.plan.ctx
    b = messages_planes.shape[1]
    n = dctx.n
    # mesh-invariant counter-mode draws: the sample for (stream, statement,
    # position) is independent of batching/sharding, so these bytes match
    # the sharded prover's on every mesh shape
    b_idx = jnp.arange(b, dtype=jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.uint32)
    acc = None
    s_signed = []
    for j in range(dctx.k):
        s_planes, s_sgn = sampler_jax.sample_planes_global(
            key, j, b_idx, pos, dctx.cdf_hi, dctx.cdf_lo, ctx
        )
        s_signed.append(s_sgn)
        s_hat = ntt_forward_negacyclic(dctx.plan, s_planes)
        a_hat_j = jnp.asarray(dctx.a_hat_planes[j])[:, None, :]  # (D, 1, n)
        term = modarith.mul_mod(ctx, a_hat_j, s_hat)
        acc = term if acc is None else modarith.add_mod(ctx, acc, term)
    c = ntt_inverse_negacyclic(dctx.plan, acc)
    e_planes, e_sgn = sampler_jax.sample_planes_global(
        key, dctx.k, b_idx, pos, dctx.cdf_hi, dctx.cdf_lo, ctx
    )
    c = modarith.add_mod(ctx, c, e_planes)
    c = modarith.add_mod(ctx, c, messages_planes)
    return c, jnp.stack(s_signed), e_sgn


commit_batch_jit = jax.jit(commit_batch, static_argnums=(0,))


def embed_messages(dctx: DeviceCommitContext, messages: np.ndarray, q_field: int):
    """Host: (B, len) integer messages -> (D, B, n) canonical Z_p planes."""
    b, length = messages.shape
    assert length <= dctx.n
    out = np.zeros((b, dctx.n), dtype=object)
    for i in range(b):
        for j in range(length):
            out[i, j] = int(messages[i, j]) % q_field
    return jnp.asarray(to_limbs(out, dctx.plan.ctx.d))


# --- in-graph ChaCha-parity commitment (fused into larger device programs) ----


def a_hat_planes_for(ctx: LweContext) -> np.ndarray:
    """(k, D, n) uint32 NTT-domain A rows for in-graph commits."""
    plan = goldilocks_ring_plan(ctx.n)
    return np.stack([to_limbs(ctx.a_hat[j], plan.ctx.d) for j in range(ctx.k)])


from ..ops.limb import modulus_ctx as _modulus_ctx

_GL_CTX = _modulus_ctx(NTT_MODULUS)


def ring_planes_from_signed(v8):
    """int8 signed Gaussian draws (..., n) -> (D, ..., n) digit planes of the
    canonical Z_p embedding (magnitudes fit digit 0; negatives are p - |v|)."""
    mag = jnp.abs(v8.astype(jnp.int32)).astype(jnp.uint32)
    zero = jnp.zeros_like(mag)
    pos = jnp.stack([mag, zero, zero, zero])
    neg = modarith.sub_mod(_GL_CTX, jnp.stack([zero] * 4), pos)
    return jnp.where((v8 >= 0)[None], pos, neg)


def commit_in_graph(ring_plan: NttPlan, a_hat_planes, msg_planes, s8, e8):
    """Traceable commitment c = sum_j A_j s_j + e + m on digit planes.

    msg_planes: (D, S, n) canonical message planes (zero-padded to the ring
    degree by the caller). s8: (S, k, n) int8 signed draws; e8: (S, n).
    Exact mod-p arithmetic -> c is bit-identical to ``lwe.commit_batch``
    (any correct negacyclic NTT computes the same ring product).
    Returns (D, S, n) planes of c.
    """
    s_ring = ring_planes_from_signed(s8)  # (D, S, k, n)
    e_ring = ring_planes_from_signed(e8)  # (D, S, n)
    return commit_in_graph_planes(
        ring_plan, a_hat_planes, msg_planes, s_ring, e_ring
    )


def commit_in_graph_chacha(
    ring_plan: NttPlan, a_hat_planes, msg_planes, key_words, k: int,
    cdf_hi, cdf_lo,
):
    """``commit_in_graph`` with the ChaCha host-parity randomness ALSO
    generated in-graph (``sampler_jax.sample_chacha_planes_in_graph``) —
    the dispatch's only randomness input is the (S, 8) uint32 key words."""
    from ..ops import sampler_jax

    s_ring, e_ring = sampler_jax.sample_chacha_planes_in_graph(
        key_words, k, ring_plan.m, cdf_hi, cdf_lo, ring_plan.ctx
    )
    return commit_in_graph_planes(
        ring_plan, a_hat_planes, msg_planes, s_ring, e_ring
    )


def commit_in_graph_planes(ring_plan: NttPlan, a_hat_planes, msg_planes,
                           s_ring, e_ring):
    ctx = ring_plan.ctx
    s_hat = ntt_forward_negacyclic(ring_plan, s_ring)
    # a_hat_planes (k, D, n) -> (D, 1, k, n): broadcast over the S axis
    a_b = jnp.moveaxis(jnp.asarray(a_hat_planes), 0, 1)[:, None]
    prod = modarith.mul_mod(ctx, a_b, s_hat)
    acc = prod[:, :, 0]
    for j in range(1, prod.shape[2]):
        acc = modarith.add_mod(ctx, acc, prod[:, :, j])
    c = ntt_inverse_negacyclic(ring_plan, acc)
    c = modarith.add_mod(ctx, c, e_ring)
    return modarith.add_mod(ctx, c, msg_planes)
