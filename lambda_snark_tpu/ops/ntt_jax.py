"""Vectorized JAX NTT over digit planes (cyclic + negacyclic).

Radix-2 DIT Cooley-Tukey with host-precomputed twiddle planes; bit-exact
with the golden host NTT (``r1cs.poly.ntt_forward`` — reference
``ntt.rs:117-201``) for every supported modulus. The transform axis is the
trailing axis, so an (D, batch, m) layout maps batches x elements onto TPU
sublanes x lanes. Stages unroll at trace time (static m); XLA fuses each
stage's butterfly into a couple of fused elementwise kernels.

The negacyclic (X^n + 1) variant psi-twists coefficients before/after the
cyclic transform — the contract of SEAL's Harvey NTT that the reference's
C++ kernel exposes (``cpp-core/src/ntt.cpp:76-119``).

For the Pallas single-kernel version (all stages VMEM-resident) see
``ops.ntt_pallas``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field
from . import modarith
from .limb import ModulusCtx, int_to_digits, modulus_ctx, to_limbs


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash for jit static args
class NttPlan:
    """Host-precomputed constants for a fixed (m, q, omega) transform."""

    m: int
    q: int
    omega: int
    ctx: ModulusCtx
    rev: np.ndarray  # bit-reversal gather indices
    stage_tw: tuple  # per-stage (D, half) uint32 twiddle planes, forward
    stage_tw_inv: tuple  # same for omega^-1
    n_inv_digits: tuple  # digits of m^-1 mod q
    psi_tw: Optional[np.ndarray] = None  # (D, m) psi^i planes (negacyclic)
    psi_inv_tw: Optional[np.ndarray] = None  # (D, m) n^-1 * psi^-i planes

    @staticmethod
    def create(m: int, q: int, omega: int, negacyclic_psi: Optional[int] = None):
        assert m & (m - 1) == 0 and m >= 2
        ctx = modulus_ctx(q)
        log_m = m.bit_length() - 1

        def stage_planes(base: int):
            stages = []
            for s in range(1, log_m + 1):
                span = 1 << s
                half = span >> 1
                wm = field.mod_pow(base, m // span, q)
                tw = []
                acc = 1
                for _ in range(half):
                    tw.append(acc)
                    acc = field.mul_mod(acc, wm, q)
                stages.append(to_limbs(np.array(tw, dtype=object), ctx.d))
            return tuple(stages)

        omega_inv = field.mod_inverse(omega, q)
        n_inv = field.mod_inverse(m, q)
        psi_tw = psi_inv_tw = None
        if negacyclic_psi is not None:
            psi = negacyclic_psi
            psi_inv = field.mod_inverse(psi, q)
            pows = []
            inv_pows = []
            acc, acc_i = 1, n_inv
            for _ in range(m):
                pows.append(acc)
                inv_pows.append(acc_i)
                acc = field.mul_mod(acc, psi, q)
                acc_i = field.mul_mod(acc_i, psi_inv, q)
            psi_tw = to_limbs(np.array(pows, dtype=object), ctx.d)
            psi_inv_tw = to_limbs(np.array(inv_pows, dtype=object), ctx.d)
        return NttPlan(
            m=m,
            q=q,
            omega=omega,
            ctx=ctx,
            rev=_bit_reverse_indices(m),
            stage_tw=stage_planes(omega),
            stage_tw_inv=stage_planes(omega_inv),
            n_inv_digits=tuple(int_to_digits(n_inv, ctx.d)),
            psi_tw=psi_tw,
            psi_inv_tw=psi_inv_tw,
        )


_PLAN_CACHE: dict = {}


def ntt_plan(m: int, q: int, omega: int, negacyclic_psi: Optional[int] = None) -> NttPlan:
    key = (m, q, omega, negacyclic_psi)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = NttPlan.create(m, q, omega, negacyclic_psi)
    return _PLAN_CACHE[key]


def _transform(plan: NttPlan, x, stage_tw) -> jnp.ndarray:
    """Core butterflies. x: (D, ..., m) planes."""
    ctx = plan.ctx
    m = plan.m
    lead = x.shape[1:-1]
    x = jnp.take(x, jnp.asarray(plan.rev), axis=-1)
    log_m = m.bit_length() - 1
    for s in range(1, log_m + 1):
        span = 1 << s
        half = span >> 1
        x = x.reshape(x.shape[:1] + lead + (m // span, span))
        u = x[..., :half]
        v = x[..., half:]
        tw = jnp.asarray(stage_tw[s - 1])  # (D, half)
        bshape = (ctx.d,) + (1,) * (len(lead) + 1) + (half,)
        t = modarith.mul_mod(ctx, v, jnp.reshape(tw, bshape))
        # one fusion cut per stage: u and t each feed two consumers, so
        # XLA:CPU would re-execute every earlier stage per butterfly output
        # (2^log2(m)-fold blowup of both compile and run time); no-op on TPU
        x = modarith.cpu_fusion_barrier(
            jnp.concatenate(
                [modarith.add_mod(ctx, u, t), modarith.sub_mod(ctx, u, t)],
                axis=-1,
            )
        )
    return x.reshape(x.shape[:1] + lead + (m,))


def ntt_forward(plan: NttPlan, x) -> jnp.ndarray:
    """Cyclic forward NTT on (D, ..., m) digit planes."""
    return _transform(plan, x, plan.stage_tw)


def ntt_inverse(plan: NttPlan, x) -> jnp.ndarray:
    """Cyclic inverse NTT: forward with omega^-1, then scale by m^-1."""
    out = _transform(plan, x, plan.stage_tw_inv)
    return modarith.mul_mod_const(plan.ctx, out, plan.n_inv_digits)


def _broadcast_tw(plan: NttPlan, tw: np.ndarray, x) -> jnp.ndarray:
    bshape = (plan.ctx.d,) + (1,) * (x.ndim - 2) + (plan.m,)
    return jnp.reshape(jnp.asarray(tw), bshape)


def ntt_forward_negacyclic(plan: NttPlan, x) -> jnp.ndarray:
    """Negacyclic forward: psi-twist then cyclic forward."""
    assert plan.psi_tw is not None, "plan lacks negacyclic psi"
    twisted = modarith.mul_mod(plan.ctx, x, _broadcast_tw(plan, plan.psi_tw, x))
    return _transform(plan, twisted, plan.stage_tw)


def ntt_inverse_negacyclic(plan: NttPlan, x) -> jnp.ndarray:
    """Negacyclic inverse: cyclic inverse (scale folded into psi^-i twist)."""
    assert plan.psi_inv_tw is not None
    out = _transform(plan, x, plan.stage_tw_inv)
    return modarith.mul_mod(plan.ctx, out, _broadcast_tw(plan, plan.psi_inv_tw, out))


def pointwise_mul(plan: NttPlan, a, b) -> jnp.ndarray:
    """Pointwise product in the evaluation domain (``ntt_mul_pointwise``)."""
    return modarith.mul_mod(plan.ctx, a, b)


@functools.partial(jax.jit, static_argnums=(0,))
def negacyclic_mul(plan: NttPlan, a, b) -> jnp.ndarray:
    """a * b mod (X^m + 1, q) on digit planes."""
    fa = ntt_forward_negacyclic(plan, a)
    fb = ntt_forward_negacyclic(plan, b)
    return ntt_inverse_negacyclic(plan, pointwise_mul(plan, fa, fb))


# Jitted entry points (plan is a static arg; plans are cached by ntt_plan so
# identity-hashing does not recompile across calls).
ntt_forward_jit = jax.jit(ntt_forward, static_argnums=(0,))
ntt_inverse_jit = jax.jit(ntt_inverse, static_argnums=(0,))
ntt_forward_negacyclic_jit = jax.jit(ntt_forward_negacyclic, static_argnums=(0,))
ntt_inverse_negacyclic_jit = jax.jit(ntt_inverse_negacyclic, static_argnums=(0,))
