"""Fused Pallas ring-commitment kernel.

Computes the whole Module-LWE ring computation

    c = iNTT( sum_j A_hat_j o NTT(psi-twist(s_j)) ) * psi_inv/n + e + m

in ONE kernel invocation per batch tile, everything VMEM-resident:

- forward transforms are decimation-in-frequency (natural input ->
  bit-reversed output), the inverse is decimation-in-time (bit-reversed
  input -> natural output), so the pointwise product happens in bit-reversed
  order and **no permutation/gather exists anywhere** — A_hat is simply
  stored bit-reversed,
- psi-twist / psi-inverse-with-1/n fold into elementwise table multiplies at
  the kernel edges,
- HBM traffic collapses to one read of (s, e, m, tables) and one write of c
  (the XLA path materializes every butterfly stage of 3k+3 transforms).

Bit-exact vs the unfused device commitment (``commit.lwe_jax.commit_batch``)
for identical randomness (tests/test_ring_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from . import modarith
from .limb import modulus_ctx, to_limbs

P = NTT_MODULUS
_CTX = modulus_ctx(P)
_D = 4


def _pow_table(base: int, count: int, scale: int = 1,
               q: int = P, d: int = _D) -> np.ndarray:
    vals = np.empty(count, dtype=object)
    acc = scale % q
    for i in range(count):
        vals[i] = acc
        acc = field.mul_mod(acc, base, q)
    return to_limbs(vals, d)


def _dif_stage_tables(n: int, omega: int, q: int = P, d: int = _D) -> np.ndarray:
    """(log_n, D, n) DIF twiddles: stage with span 2*half applies
    w_vec[idx] = omega^((idx mod half) * (n / (2 half)))."""
    log_n = n.bit_length() - 1
    out = np.empty((log_n, d, n), dtype=np.uint32)
    idx_stage = 0
    half = n >> 1
    while half >= 1:
        wm = field.mod_pow(omega, n // (2 * half), q)
        pows = np.empty(half, dtype=object)
        acc = 1
        for j in range(half):
            pows[j] = acc
            acc = field.mul_mod(acc, wm, q)
        full = np.empty(n, dtype=object)
        for idx in range(n):
            full[idx] = pows[idx & (half - 1)]
        out[idx_stage] = to_limbs(full, d)
        idx_stage += 1
        half >>= 1
    return out


def _dit_stage_tables(n: int, omega: int, q: int = P, d: int = _D) -> np.ndarray:
    """(log_n, D, n) DIT twiddles (the ntt_pallas layout): stage s (half =
    2^s) applies w_vec[idx] = omega^((idx mod half) * (n / 2^(s+1)))."""
    log_n = n.bit_length() - 1
    out = np.empty((log_n, d, n), dtype=np.uint32)
    for s in range(log_n):
        half = 1 << s
        span = half << 1
        wm = field.mod_pow(omega, n // span, q)
        pows = np.empty(half, dtype=object)
        acc = 1
        for j in range(half):
            pows[j] = acc
            acc = field.mul_mod(acc, wm, q)
        full = np.empty(n, dtype=object)
        for idx in range(n):
            full[idx] = pows[idx & (half - 1)]
        out[s] = to_limbs(full, d)
    return out


def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


@dataclasses.dataclass(frozen=True, eq=False)
class RingCommitPlan:
    n: int
    k: int
    psi_tw: np.ndarray          # (D, n) psi^i (natural order)
    psi_inv_n_tw: np.ndarray    # (D, n) psi^-i / n (natural order)
    dif_fwd: np.ndarray         # (log_n, D, n) forward DIF twiddles
    dit_inv: np.ndarray         # (log_n, D, n) inverse DIT twiddles
    a_hat_rev: np.ndarray       # (k, D, n) A_hat in bit-reversed NTT order

    @staticmethod
    def create(host_ctx) -> "RingCommitPlan":
        n, k = host_ctx.n, host_ctx.k
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n, P)
        omega_inv = field.mod_inverse(omega, P)
        psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n), P)
        psi_inv = field.mod_inverse(psi, P)
        n_inv = field.mod_inverse(n, P)
        rev = _bitrev(n)
        a_hat = np.stack([to_limbs(host_ctx.a_hat[j], _D) for j in range(k)])
        return RingCommitPlan(
            n=n,
            k=k,
            psi_tw=_pow_table(psi, n),
            psi_inv_n_tw=_pow_table(psi_inv, n, scale=n_inv),
            dif_fwd=_dif_stage_tables(n, omega),
            dit_inv=_dit_stage_tables(n, omega_inv),
            a_hat_rev=a_hat[:, :, rev],
        )


def _dif_forward(ctx, x, tw_ref, iota, n):
    """In-kernel DIF: natural -> bit-reversed. x: (D, TB, n)."""
    log_n = n.bit_length() - 1
    for s in range(log_n):
        half = n >> (s + 1)
        upper = (iota & jnp.uint32(half)) != 0
        w = tw_ref[s]
        p = jnp.where(
            upper[None, :, :],
            pltpu.roll(x, half, axis=2),
            pltpu.roll(x, n - half, axis=2),
        )
        # lower: u + v ; upper: (u - v) * w   (p holds the partner: v at
        # lower lanes, u at upper lanes)
        diff = modarith.sub_mod(ctx, p, x)  # at upper lanes: u - v
        x = jnp.where(
            upper[None, :, :],
            modarith.mul_mod(ctx, w[:, None, :], diff),
            modarith.add_mod(ctx, x, p),
        )
    return x


def _dit_inverse(ctx, x, tw_ref, iota, n):
    """In-kernel DIT: bit-reversed -> natural (no 1/n scaling here)."""
    log_n = n.bit_length() - 1
    for s in range(log_n):
        half = 1 << s
        upper = (iota & jnp.uint32(half)) != 0
        w = tw_ref[s]
        p = jnp.where(
            upper[None, :, :],
            pltpu.roll(x, half, axis=2),
            pltpu.roll(x, n - half, axis=2),
        )
        v = jnp.where(upper[None, :, :], x, p)
        wv = modarith.mul_mod(ctx, w[:, None, :], v)
        x = jnp.where(
            upper[None, :, :],
            modarith.sub_mod(ctx, p, wv),
            modarith.add_mod(ctx, x, wv),
        )
    return x


def _fused_kernel(plan: RingCommitPlan, s_ref, e_ref, m_ref, ahat_ref,
                  psi_ref, psiinv_ref, diff_ref, diti_ref, o_ref):
    ctx = _CTX
    n = plan.n
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
    psi = psi_ref[:]  # (D, n)
    psi_inv = psiinv_ref[:]
    acc = None
    for j in range(plan.k):
        x = s_ref[j]  # (D, TB, n)
        x = modarith.mul_mod(ctx, psi[:, None, :], x)  # twist
        x = _dif_forward(ctx, x, diff_ref, iota, n)  # bit-rev NTT domain
        x = modarith.mul_mod(ctx, ahat_ref[j][:, None, :], x)
        acc = x if acc is None else modarith.add_mod(ctx, acc, x)
    y = _dit_inverse(ctx, acc, diti_ref, iota, n)
    y = modarith.mul_mod(ctx, psi_inv[:, None, :], y)  # untwist + 1/n
    y = modarith.add_mod(ctx, y, e_ref[:])
    o_ref[:] = modarith.add_mod(ctx, y, m_ref[:])


def _pick_tile(b: int, n: int) -> int:
    """Batch-rows per tile: Mosaic needs the second-to-last block dim
    divisible by 8 (or equal to the full dim), so tiles are >= 8 whenever the
    batch allows; the VMEM budget caps growth for large n."""
    if b < 8:
        return b  # full-dimension exemption
    budget = max((512 * 1024) // (_D * n * 4), 8)
    tile = 8
    while tile * 2 <= b and tile * 2 <= budget and b % (tile * 2) == 0:
        tile *= 2
    return tile


@functools.partial(jax.jit, static_argnums=(0,))
def fused_commit(plan: RingCommitPlan, s_planes, e_planes, m_planes):
    """Fused ring commitment from explicit randomness planes.

    s_planes: (k, D, B, n); e/m_planes: (D, B, n); all canonical mod p.
    Returns commitment planes (D, B, n).
    """
    k, d, b, n = s_planes.shape
    tile = _pick_tile(b, n)
    interpret = jax.default_backend() != "tpu"
    mem = pl.ANY if interpret else pltpu.VMEM
    log_n = n.bit_length() - 1
    kernel = functools.partial(_fused_kernel, plan)
    return pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((k, d, tile, n), lambda i: (0, 0, i, 0), memory_space=mem),
            pl.BlockSpec((d, tile, n), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((d, tile, n), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((k, d, n), lambda i: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((log_n, d, n), lambda i: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((log_n, d, n), lambda i: (0, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((d, tile, n), lambda i: (0, i, 0), memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((d, b, n), jnp.uint32),
        interpret=interpret,
    )(
        s_planes, e_planes, m_planes,
        jnp.asarray(plan.a_hat_rev), jnp.asarray(plan.psi_tw),
        jnp.asarray(plan.psi_inv_n_tw), jnp.asarray(plan.dif_fwd),
        jnp.asarray(plan.dit_inv),
    )
