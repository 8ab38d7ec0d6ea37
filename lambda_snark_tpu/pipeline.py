"""Batched device proving pipeline (single chip).

The heavy stage of ``prove_r1cs`` for roots-domain circuits, fully on device
and batched over proofs:

    inputs:  a/b/c constraint evaluations (B, m) on the NTT domain
    outputs: quotient coefficients Q (B, m), commitment words (B, n),
             per-proof validity flags

Quotient without polynomial division (coset trick): with H the m-th roots
and Z_H = X^m - 1, evaluate N = A*B - C on the *odd* 2m-th roots
(psi * omega^t, psi = omega_2m): there X^m = -1, so Z_H = -2 identically and

    Q(psi w^t) = N(psi w^t) * (-2)^{-1}.

Evaluations of any degree-<m polynomial on the odd coset are exactly its
negacyclic NTT, so the whole pipeline is: iNTT (interpolate) ->
negacyclic NTT -> pointwise -> scale -> inverse negacyclic NTT. deg Q <= m-2
< m, hence Q is recovered exactly; validity (exact division) is equivalent to
the residual a.b - c vanishing on the even coset, which is checked from the
inputs directly. Bit-exact with the host ``compute_quotient_poly`` on the
roots domain (``tests/test_pipeline.py``).

Host glue (transcripts, Horner evaluations at alpha/beta) stays in
``prover_batched.py`` — SHA3 is inherently host-side, exactly like the
reference's Rust-side transcript around the C++ kernels.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import field
from .core.errors import DomainError
from .core.params import NTT_FRIENDLY_MODULUS, ROOTS_OF_UNITY_45BIT
from .ops import modarith
from .ops.limb import int_to_digits
from .ops.ntt_jax import (
    NttPlan,
    ntt_forward_negacyclic,
    ntt_inverse,
    ntt_inverse_negacyclic,
    ntt_plan,
)
from .commit.lwe_jax import DeviceCommitContext, commit_batch


def field_plan_for(m: int, q: int) -> NttPlan:
    """Field-domain plan with both cyclic root (omega_m) and psi = omega_2m."""
    if q == NTT_FRIENDLY_MODULUS:
        if 2 * m not in ROOTS_OF_UNITY_45BIT:
            raise DomainError(f"no 2m-th root for m={m} over q={q}")
        psi = ROOTS_OF_UNITY_45BIT[2 * m]
        omega = ROOTS_OF_UNITY_45BIT[m]
        # use psi^2 as omega to guarantee psi^2 == omega exactly
        omega = field.mul_mod(psi, psi, q)
        return ntt_plan(m, q, omega, negacyclic_psi=psi)
    from .core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT

    if q == NTT_MODULUS:
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
        psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * m), q)
        return ntt_plan(m, q, omega, negacyclic_psi=psi)
    raise DomainError(f"no NTT-friendly structure for modulus {q}")


@dataclasses.dataclass(frozen=True, eq=False)
class ProvePlan:
    """Static plan for the batched device prove stage.

    ``fused=True`` (default) routes the quotient chain through the
    single-kernel Pallas path (``ops.quotient_pallas``) — bit-exact with
    the XLA stage pipeline, one VMEM-resident kernel per batch tile.
    """

    m: int
    q: int
    plan: NttPlan
    dctx: DeviceCommitContext
    neg_half_inv_digits: tuple  # digits of (-2)^{-1} mod q
    qplan: object = None  # ops.quotient_pallas.QuotientPlan
    qplan_mxu: object = None  # ops.ntt_mxu_q45.Q45QuotientPlan (q45 only)
    rplan_mxu: object = None  # ops.ring_mxu.RingMxuPlan (MXU commitment)
    fused: bool = True

    @staticmethod
    def create(m: int, q: int, dctx: DeviceCommitContext,
               fused: bool = True) -> "ProvePlan":
        from .ops.quotient_pallas import QuotientPlan

        plan = field_plan_for(m, q)
        inv = field.mod_inverse(q - 2, q)  # (-2)^{-1}
        if q == NTT_FRIENDLY_MODULUS:
            psi = ROOTS_OF_UNITY_45BIT[2 * m]
        else:
            from .core.params import NTT_PRIMITIVE_ROOT

            psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * m), q)
        qplan_mxu = None
        if q == NTT_FRIENDLY_MODULUS and m >= 4:
            from .ops.ntt_mxu_q45 import q45_quotient_plan

            qplan_mxu = q45_quotient_plan(m, psi)
        from .ops.ring_mxu import RingMxuPlan

        rplan_mxu = RingMxuPlan.from_device_ctx(dctx) if dctx.n >= 4 else None
        return ProvePlan(
            m=m,
            q=q,
            plan=plan,
            dctx=dctx,
            neg_half_inv_digits=tuple(int_to_digits(inv, plan.ctx.d)),
            qplan=QuotientPlan.create(m, q, psi),
            qplan_mxu=qplan_mxu,
            rplan_mxu=rplan_mxu,
            fused=fused,
        )


def quotient_batch(pp: ProvePlan, a_evals, b_evals, c_evals):
    """(D, B, m) NTT-domain evals -> (Q, A_z, B_z, C_z coeffs, valid (B,)).

    Also returns the interpolated constraint polynomials (the prover needs
    their evaluations at alpha/beta; reference ``lib.rs:769-785``).
    """
    # Kernel routing, same-process TPU measurements at m=4096
    # (scripts/exp_prove_batch.py, exp_prove_parts.py):
    # - q45 MXU quotient (int8 systolic-array DFT leaves, Solinas
    #   recombination in VMEM): 2.51 ms/batch at B=256 vs 4.86 ms for the
    #   Pallas butterfly chain and 5.39 ms for XLA — preferred at B >= 64.
    # - The Pallas butterfly chain wins over XLA only at large batches
    #   (34.4k vs 28.8k proofs/s at B=256) and loses at small ones (20.7k
    #   vs 31.0k at B=16): grid tiles run sequentially on the single
    #   TensorCore. XLA keeps small batches. Routing is static at trace
    #   time (batch is a static shape).
    if getattr(pp, "fused", False) and a_evals.shape[1] >= 64:
        if getattr(pp, "qplan_mxu", None) is not None:
            from .ops.ntt_mxu_q45 import quotient_batch_mxu

            return quotient_batch_mxu(pp.qplan_mxu, a_evals, b_evals, c_evals)
        if pp.qplan is not None:
            from .ops.quotient_pallas import quotient_batch_fused

            return quotient_batch_fused(pp.qplan, a_evals, b_evals, c_evals)
    ctx = pp.plan.ctx
    # interpolate to coefficients
    a_poly = ntt_inverse(pp.plan, a_evals)
    b_poly = ntt_inverse(pp.plan, b_evals)
    c_poly = ntt_inverse(pp.plan, c_evals)
    # odd-coset evaluations (negacyclic NTT)
    a_odd = ntt_forward_negacyclic(pp.plan, a_poly)
    b_odd = ntt_forward_negacyclic(pp.plan, b_poly)
    c_odd = ntt_forward_negacyclic(pp.plan, c_poly)
    n_odd = modarith.sub_mod(ctx, modarith.mul_mod(ctx, a_odd, b_odd), c_odd)
    q_odd = modarith.mul_mod_const(ctx, n_odd, pp.neg_half_inv_digits)
    q_coeffs = ntt_inverse_negacyclic(pp.plan, q_odd)
    # validity: residual a.b - c must vanish on the even coset (the inputs)
    residual = modarith.sub_mod(
        ctx, modarith.mul_mod(ctx, a_evals, b_evals), c_evals
    )
    valid = jnp.all(residual == 0, axis=(0, 2))
    return q_coeffs, a_poly, b_poly, c_poly, valid


def _field_planes_to_ring(pp: ProvePlan, planes):
    """(Dq, B, m) field planes -> (Dp, B, n) Goldilocks ring planes.

    Field values < q < p share the 16-bit digit base, so embedding =
    zero-extend the digit axis and zero-pad coefficients m -> n.
    """
    dq = planes.shape[0]
    dp = pp.dctx.plan.ctx.d
    b = planes.shape[1]
    out = planes
    if dp > dq:
        pad = jnp.zeros((dp - dq,) + planes.shape[1:], dtype=jnp.uint32)
        out = jnp.concatenate([out, pad], axis=0)
    length = out.shape[-1]
    if pp.dctx.n > length:
        padn = jnp.zeros((dp, b, pp.dctx.n - length), dtype=jnp.uint32)
        out = jnp.concatenate([out, padn], axis=-1)
    return out


def prove_stage_batch(pp: ProvePlan, a_evals, b_evals, c_evals, key):
    """Full device stage: quotient + commitment.

    Returns (q_coeffs, a_poly, b_poly, c_poly (D, B, m),
             commitment planes (Dp, B, n), valid (B,)).
    """
    q_coeffs, a_poly, b_poly, c_poly, valid = quotient_batch(
        pp, a_evals, b_evals, c_evals
    )
    msg_planes = _field_planes_to_ring(pp, q_coeffs)
    c_planes, _s, _e = _commit(pp, msg_planes, key)
    return q_coeffs, a_poly, b_poly, c_poly, c_planes, valid


def _commit(pp: ProvePlan, msg_planes, key):
    """Commitment kernel routing: the MXU ring chain measured 0.51 ms vs
    2.65 ms for the butterfly path at n=4096 B=256 (same run, bit-exact —
    scripts/exp_prove_parts.py); route like the quotient (batch >= 64)."""
    if (
        getattr(pp, "fused", False)
        and getattr(pp, "rplan_mxu", None) is not None
        and msg_planes.shape[1] >= 64
    ):
        from .ops.ring_mxu import commit_batch_mxu

        return commit_batch_mxu(pp.rplan_mxu, pp.dctx, msg_planes, key)
    return commit_batch(pp.dctx, msg_planes, key)


def prove_stage_batch_zk(pp: ProvePlan, a_evals, b_evals, c_evals, blind_planes, key):
    """ZK device stage: commit to Q' = Q + r * Z_H (roots domain Z_H = X^m - 1).

    blind_planes: (D, B) per-proof blinding factors r (mod q). Q' has degree
    m, so the ring degree must satisfy n >= m + 1. Returns the same tuple as
    ``prove_stage_batch`` with the commitment over Q'.
    """
    assert pp.dctx.n >= pp.m + 1, "ZK blinding needs ring degree n >= m + 1"
    ctx = pp.plan.ctx
    q_coeffs, a_poly, b_poly, c_poly, valid = quotient_batch(
        pp, a_evals, b_evals, c_evals
    )
    r = blind_planes[..., None]  # (D, B, 1)
    # Q'(X) = Q(X) - r + r X^m   (Z_H = X^m - 1)
    q0 = modarith.sub_mod(ctx, q_coeffs[..., :1], r)
    q_blinded = jnp.concatenate([q0, q_coeffs[..., 1:], r], axis=-1)  # m+1
    msg_planes = _field_planes_to_ring(pp, q_blinded)
    c_planes, _s, _e = _commit(pp, msg_planes, key)
    return q_coeffs, a_poly, b_poly, c_poly, c_planes, valid


prove_stage_batch_zk_jit = jax.jit(prove_stage_batch_zk, static_argnums=(0,))


prove_stage_batch_jit = jax.jit(prove_stage_batch, static_argnums=(0,))
quotient_batch_jit = jax.jit(quotient_batch, static_argnums=(0,))
