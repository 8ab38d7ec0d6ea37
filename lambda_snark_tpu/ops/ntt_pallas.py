"""Pallas TPU kernel: batched VMEM-resident NTT on digit planes.

The XLA-fused butterfly pipeline (``ops.ntt_jax``) materializes every stage
to HBM (~2 x log m full-array passes). This kernel keeps a (D, TB, S) tile
resident in VMEM across *all* log2(S) stages: one HBM read + one write per
tile — the memory-bound speed-of-light for the transform.

Formulation (no reshapes/concats inside the kernel — lane-friendly):
bit-reversal is pre-applied outside (one XLA gather); each DIT stage uses a
roll-based partner exchange

    p    = where(upper, roll(x, +half), roll(x, -half))   # partner values
    v    = where(upper, x, p)                              # the pair's v
    wv   = w_vec * v                                       # one mulmod/elem
    newx = where(upper, p - wv, x + wv)

with w_vec[idx] = omega_span^(idx mod half) (full-length per-stage table) and
``upper = (idx & half) != 0``. Rolls never wrap across a butterfly block, so
the cyclic semantics are exact.

Inverse transforms run the same kernel with inverse-omega tables and fold the
1/S scale into a final elementwise multiply. Compiled natively on TPU;
interpret mode on CPU keeps the tests hermetic.
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
from . import modarith
from .limb import to_limbs
from .ntt_jax import NttPlan, ntt_plan


def _full_stage_tables(plan: NttPlan, inverse: bool) -> np.ndarray:
    """(log_s, D, S) tables: w_vec[s, :, idx] = omega_span^(idx mod half)."""
    s_len = plan.m
    q = plan.q
    d = plan.ctx.d
    log_s = s_len.bit_length() - 1
    base = field.mod_inverse(plan.omega, q) if inverse else plan.omega
    out = np.empty((log_s, d, s_len), dtype=np.uint32)
    for s in range(1, log_s + 1):
        span = 1 << s
        half = span >> 1
        wm = field.mod_pow(base, s_len // span, q)
        pows = np.empty(half, dtype=object)
        acc = 1
        for j in range(half):
            pows[j] = acc
            acc = field.mul_mod(acc, wm, q)
        full = np.empty(s_len, dtype=object)
        for idx in range(s_len):
            full[idx] = pows[idx & (half - 1)]
        out[s - 1] = to_limbs(full, d)
    return out


@dataclasses.dataclass(frozen=True, eq=False)
class PallasNttPlan:
    plan: NttPlan
    tw_fwd: np.ndarray  # (log_s, D, S)
    tw_inv: np.ndarray
    rev: np.ndarray

    @staticmethod
    def create(s_len: int, q: int, omega: int) -> "PallasNttPlan":
        plan = ntt_plan(s_len, q, omega)
        return PallasNttPlan(
            plan=plan,
            tw_fwd=_full_stage_tables(plan, inverse=False),
            tw_inv=_full_stage_tables(plan, inverse=True),
            rev=plan.rev,
        )


_PLAN_CACHE: dict = {}


def pallas_ntt_plan(s_len: int, q: int, omega: int) -> PallasNttPlan:
    key = (s_len, q, omega)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = PallasNttPlan.create(s_len, q, omega)
    return _PLAN_CACHE[key]


def _kernel_body(pp: PallasNttPlan, x_ref, tw_ref, o_ref):
    ctx = pp.plan.ctx
    s_len = pp.plan.m
    log_s = s_len.bit_length() - 1
    x = x_ref[:]  # (D, TB, S)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, s_len), 1)
    for s in range(log_s):
        half = 1 << s
        upper = (iota & jnp.uint32(half)) != 0  # (1, S)
        w = tw_ref[s]  # (D, S)
        p = jnp.where(
            upper[None, :, :],
            pltpu.roll(x, half, axis=2),
            pltpu.roll(x, s_len - half, axis=2),  # cyclic -half
        )
        v = jnp.where(upper[None, :, :], x, p)
        wv = modarith.mul_mod(ctx, w[:, None, :], v)
        newx = jnp.where(
            upper[None, :, :],
            modarith.sub_mod(ctx, p, wv),
            modarith.add_mod(ctx, x, wv),
        )
        x = newx
    o_ref[:] = x


def _run_kernel(pp: PallasNttPlan, x, tw, tile_b: int):
    d, b, s_len = x.shape
    assert b % tile_b == 0, f"batch {b} must divide tile {tile_b}"
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel_body, pp)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((d, tile_b, s_len), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tw.shape[0], d, s_len), lambda i: (0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, tile_b, s_len), lambda i: (0, i, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, tw)


def _pick_tile(b: int, s_len: int, d: int) -> int:
    """Largest power-of-two tile with ~<= 512 KB per buffer.

    The kernel body keeps ~6 live tile-sized arrays (x, p, v, wv, newx plus
    digit temporaries) in scoped VMEM on top of double-buffered I/O blocks;
    a 2 MB tile blows the 16 MB scoped-vmem limit (observed on v5e).
    """
    budget = (512 * 1024) // (d * s_len * 4)
    tile = 1
    while tile * 2 <= b and tile * 2 <= max(budget, 1) and b % (tile * 2) == 0:
        tile *= 2
    return tile


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_forward_pallas(pp: PallasNttPlan, x) -> jnp.ndarray:
    """Batched cyclic forward NTT. x: (D, B, S) digit planes."""
    xb = jnp.take(x, jnp.asarray(pp.rev), axis=-1)
    tile = _pick_tile(x.shape[1], x.shape[2], x.shape[0])
    return _run_kernel(pp, xb, jnp.asarray(pp.tw_fwd), tile)


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_inverse_pallas(pp: PallasNttPlan, x) -> jnp.ndarray:
    """Batched cyclic inverse NTT (with 1/S scaling)."""
    xb = jnp.take(x, jnp.asarray(pp.rev), axis=-1)
    tile = _pick_tile(x.shape[1], x.shape[2], x.shape[0])
    out = _run_kernel(pp, xb, jnp.asarray(pp.tw_inv), tile)
    return modarith.mul_mod_const(pp.plan.ctx, out, pp.plan.n_inv_digits)
