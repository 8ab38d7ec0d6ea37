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
    keys = jax.random.split(key, dctx.k + 1)
    acc = None
    s_signed = []
    for j in range(dctx.k):
        s_planes, s_sgn = sampler_jax.sample_planes(
            keys[j], (b, n), dctx.cdf_hi, dctx.cdf_lo, ctx
        )
        s_signed.append(s_sgn)
        s_hat = ntt_forward_negacyclic(dctx.plan, s_planes)
        a_hat_j = jnp.asarray(dctx.a_hat_planes[j])[:, None, :]  # (D, 1, n)
        term = modarith.mul_mod(ctx, a_hat_j, s_hat)
        acc = term if acc is None else modarith.add_mod(ctx, acc, term)
    c = ntt_inverse_negacyclic(dctx.plan, acc)
    e_planes, e_sgn = sampler_jax.sample_planes(
        keys[-1], (b, n), dctx.cdf_hi, dctx.cdf_lo, ctx
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
