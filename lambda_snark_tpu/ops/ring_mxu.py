"""MXU Goldilocks ring commitment: the Module-LWE chain on the systolic array.

Counterpart of ``ops.ring_pallas`` (VPU butterflies) built on ``ntt_mxu``'s
packed int8-matmul machinery: every negacyclic transform of

    c = iNTT( sum_j A_hat_j o NTT(psi-twist(s_j)) ) o psi_inv/n + e + m

runs as two four-step DFT leaf kernels with ALL elementwise factors fused
into per-leaf tables:

    forward(s_j):  r-phase leaf [tin = psi^(h*c+b), tout = omega^(h*b)]
                   c-phase leaf [tout = A_hat_j[h + r*g]]
    inverse(acc):  r-phase leaf [tout = omega^(-h*b)]
                   c-phase leaf [tout = psi^-(h+r*g) / n]

so one commitment costs 2(k+1) leaf passes plus two fused XLA elementwise
passes (the k-term accumulation and the +e +m epilogue). Elements travel
as packed 2-word Goldilocks (``ntt_mxu.pack_planes_jnp``). Bit-exact vs
``commit.lwe_jax.commit_batch`` for identical randomness
(tests/test_ring_mxu.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from . import modarith, sampler_jax
from .limb import modulus_ctx, to_limbs
from .ntt_mxu import (
    _LANE,
    _T,
    _buckets,
    _buckets_bal,
    _extract_balanced_packed,
    _extract_subdigits_packed,
    _recombine_goldilocks,
    _recombine_goldilocks_bal,
    DftMatmulPlan,
    pack_planes_jnp,
    unpack_planes_jnp,
)

P = NTT_MODULUS
_CTX = modulus_ctx(P)
_D = 4


def _pack_host(x4: np.ndarray) -> np.ndarray:
    return np.stack([x4[0] | (x4[1] << 16), x4[2] | (x4[3] << 16)])


def _row_pattern_table(fn, lanes_n: int, rows_period: int,
                       reps: int) -> np.ndarray:
    """Lane-packed (2, period, reps*lanes_n) table for an A_t layout where
    rows iterate a `rows_period`-periodic index b and lanes hold h of count
    lanes_n; fn(h, b) gives the field value."""
    reps = max(reps, 1)
    period = math.lcm(rows_period, reps) // reps
    vals = np.empty((period, reps * lanes_n), dtype=object)
    for j in range(period):
        for s in range(reps):
            b_idx = (j * reps + s) % rows_period
            for h in range(lanes_n):
                vals[j, s * lanes_n + h] = fn(h, b_idx)
    return _pack_host(to_limbs(vals, _D))


# --- leaf kernels with optional input/output tables ---------------------------


def _leaf_math(x2, w, tin2, tout2, balanced):
    """The ring leaf computation as a pure row-parallel function."""
    if tin2 is not None:
        x4 = modarith.cpu_fusion_barrier(modarith.mul_mod(
            _CTX, unpack_planes_jnp(x2), unpack_planes_jnp(tin2)
        ))
        x2 = pack_planes_jnp(x4)
        if balanced:
            subs = _extract_balanced_packed(x2)
        else:
            subs = _extract_subdigits(x4)
    else:
        subs = (_extract_balanced_packed(x2) if balanced
                else _extract_subdigits_packed(x2))
    subs = modarith.cpu_fusion_barrier(subs)
    if balanced:
        acc = _recombine_goldilocks_bal(_buckets_bal(subs, w))
    else:
        acc = _recombine_goldilocks(_buckets(subs, w))
    if tout2 is not None:
        acc = modarith.mul_mod(_CTX, acc, unpack_planes_jnp(tout2))
    return pack_planes_jnp(acc)


def _leaf_body(x_ref, w_ref, o_ref, tin_ref=None, tout_ref=None,
               balanced=False):
    o_ref[:] = _leaf_math(
        x_ref[:], w_ref[:],
        tin_ref[:] if tin_ref is not None else None,
        tout_ref[:] if tout_ref is not None else None,
        balanced,
    )


def _extract_subdigits(x4) -> List:
    """(4, M, B) digit planes -> T x (M, B) int8 7-bit subdigit planes."""
    subs = []
    for t in range(_T):
        p_bit = 7 * t
        j0 = p_bit >> 4
        o = p_bit & 15
        v = x4[j0] >> o
        if o + 7 > 16 and j0 + 1 < _D:
            v = v | (x4[j0 + 1] << (16 - o))
        subs.append((v & 0x7F).astype(jnp.int8))
    return subs


def _k_plain(x_ref, w_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref)


def _k_tout(x_ref, w_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tout_ref=tout_ref)


def _k_tin_tout(x_ref, w_ref, tin_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, tout_ref=tout_ref)


def _k_plain_bal(x_ref, w_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, balanced=True)


def _k_tout_bal(x_ref, w_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tout_ref=tout_ref, balanced=True)


def _k_tin_tout_bal(x_ref, w_ref, tin_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, tout_ref=tout_ref,
               balanced=True)


def _pick_tile(rows: int) -> int:
    tile = 1
    while tile * 2 <= min(rows, 512) and rows % (tile * 2) == 0:
        tile *= 2
    return tile


def _table_operand(tab: np.ndarray, tile: int, mem):
    period = tab.shape[1]
    if period % tile == 0:
        n_blocks = period // tile
        spec = pl.BlockSpec((2, tile, _LANE), lambda i: (0, i % n_blocks, 0),
                            memory_space=mem)
        return spec, jnp.asarray(tab)
    assert tile % period == 0, (tile, period)
    tiled = np.tile(tab, (1, tile // period, 1))
    spec = pl.BlockSpec((2, tile, _LANE), lambda i: (0, 0, 0),
                        memory_space=mem)
    return spec, jnp.asarray(tiled)


# Production representation: balanced base-256 digits (64 int8 matmuls per
# leaf) vs 7-bit unsigned (100) — see ntt_mxu.PACKED_BALANCED.
PACKED_BALANCED = True


def _leaf_apply(leaf: DftMatmulPlan, x2, tin: Optional[np.ndarray],
                tout: Optional[np.ndarray],
                balanced: Optional[bool] = None) -> jnp.ndarray:
    if balanced is None:
        balanced = PACKED_BALANCED
    w_np = leaf.w_subs_bal if balanced else leaf.w_subs_packed
    assert w_np is not None
    t_dim = w_np.shape[0]
    _two, m_rows, b = x2.shape
    reps = _LANE // b
    if reps > 1:
        assert m_rows % reps == 0
        x2 = x2.reshape(2, m_rows // reps, _LANE)
    rows = x2.shape[1]
    tile = _pick_tile(rows)
    w = jnp.asarray(w_np)
    if jax.default_backend() != "tpu":
        # CPU: plain-XLA kernel math (see ntt_mxu._leaf_packed rationale)
        def full(tab):
            if tab is None:
                return None
            period = tab.shape[1]
            assert rows % period == 0, (rows, period)
            return jnp.asarray(np.tile(tab, (1, rows // period, 1)))

        out = _leaf_math(x2, w, full(tin), full(tout), balanced)
        if reps > 1:
            out = out.reshape(2, m_rows, b)
        return out
    mem = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((2, tile, _LANE), lambda i: (0, i, 0), memory_space=mem),
        pl.BlockSpec((t_dim, _LANE, _LANE), lambda i: (0, 0, 0),
                     memory_space=mem),
    ]
    operands = [x2, w]
    if tin is not None:
        kernel = _k_tin_tout_bal if balanced else _k_tin_tout
        assert tout is not None, "tin currently always pairs with tout"
    elif tout is not None:
        kernel = _k_tout_bal if balanced else _k_tout
    else:
        kernel = _k_plain_bal if balanced else _k_plain
    for tab in (tin, tout):
        if tab is not None:
            spec, op = _table_operand(tab, tile, mem)
            in_specs.append(spec)
            operands.append(op)
    out = pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, tile, _LANE), lambda i: (0, i, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(*operands)
    if reps > 1:
        out = out.reshape(2, m_rows, b)
    return out


# --- commitment plan -----------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class RingMxuPlan:
    """Four-step negacyclic commitment plan for ring degree n = r*c."""

    n: int
    k: int
    r: int
    c: int
    leaf_fr: DftMatmulPlan  # forward r-phase (omega^c)
    leaf_fc: DftMatmulPlan  # forward c-phase (omega^r)
    leaf_ir: DftMatmulPlan  # inverse r-phase
    leaf_ic: DftMatmulPlan  # inverse c-phase
    twist: np.ndarray       # tin for forward r-phase: psi^(h*c+b)
    tw_f: np.ndarray        # tout forward r-phase: omega^(h*b)
    a_hat_tabs: tuple       # k x tout forward c-phase: A_hat_j[h + r*g]
    tw_i: np.ndarray        # tout inverse r-phase: omega^-(h*b)
    untwist_n: np.ndarray   # tout inverse c-phase: psi^-(h+r*g) / n

    @staticmethod
    def from_device_ctx(dctx) -> "RingMxuPlan":
        """Build from a DeviceCommitContext (A-hat recovered from planes)."""
        from .limb import from_limbs_u64

        class _Host:
            n = dctx.n
            k = dctx.k
            a_hat = [
                from_limbs_u64(dctx.a_hat_planes[j]) for j in range(dctx.k)
            ]

        return RingMxuPlan.create(_Host)

    @staticmethod
    def create(host_ctx) -> "RingMxuPlan":
        n, k = host_ctx.n, host_ctx.k
        assert n & (n - 1) == 0 and n >= 4
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n, P)
        psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n), P)
        omega_inv = field.mod_inverse(omega, P)
        psi_inv = field.mod_inverse(psi, P)
        n_inv = field.mod_inverse(n, P)
        r = 1 << ((n.bit_length() - 1) // 2)
        c = n // r
        assert r <= _LANE and c <= _LANE
        reps_r = _LANE // r
        reps_c = _LANE // c
        leaf_fr = DftMatmulPlan.create(r, field.mod_pow(omega, c, P))
        leaf_fc = DftMatmulPlan.create(c, field.mod_pow(omega, r, P))
        leaf_ir = DftMatmulPlan.create(r, field.mod_pow(omega_inv, c, P))
        leaf_ic = DftMatmulPlan.create(c, field.mod_pow(omega_inv, r, P))
        twist = _row_pattern_table(
            lambda h, b: field.mod_pow(psi, h * c + b, P), r, c, reps_r
        )
        tw_f = _row_pattern_table(
            lambda h, b: field.mod_pow(omega, h * b, P), r, c, reps_r
        )
        tw_i = _row_pattern_table(
            lambda h, b: field.mod_pow(omega_inv, h * b, P), r, c, reps_r
        )
        untwist_n = _row_pattern_table(
            lambda g, h: field.mul_mod(
                field.mod_pow(psi_inv, h + r * g, P), n_inv, P
            ),
            c, r, reps_c,
        )
        a_hat_tabs = tuple(
            _row_pattern_table(
                lambda g, h, j=j: int(host_ctx.a_hat[j][h + r * g]),
                c, r, reps_c,
            )
            for j in range(k)
        )
        return RingMxuPlan(
            n=n, k=k, r=r, c=c,
            leaf_fr=leaf_fr, leaf_fc=leaf_fc,
            leaf_ir=leaf_ir, leaf_ic=leaf_ic,
            twist=twist, tw_f=tw_f, a_hat_tabs=a_hat_tabs,
            tw_i=tw_i, untwist_n=untwist_n,
        )


def _fourstep(plan: RingMxuPlan, x2, leaf_r, leaf_c, tin_r, tout_r, tout_c,
              balanced: Optional[bool] = None):
    r, c = plan.r, plan.c
    m_rows = x2.shape[1]
    X = x2.reshape(2, m_rows, r, c)
    Xt = jnp.swapaxes(X, 2, 3).reshape(2, m_rows * c, r)
    A_t = _leaf_apply(leaf_r, Xt, tin_r, tout_r, balanced)
    A = jnp.swapaxes(A_t.reshape(2, m_rows, c, r), 2, 3)
    F = _leaf_apply(leaf_c, A.reshape(2, m_rows * r, c), None, tout_c,
                    balanced)
    F = F.reshape(2, m_rows, r, c)
    return jnp.swapaxes(F, 2, 3).reshape(2, m_rows, plan.n)


@functools.partial(jax.jit, static_argnums=(0, 3))
def ring_chain_mxu(plan: RingMxuPlan, s2_stack, msg_e2,
                   balanced: Optional[bool] = None):
    """The deterministic ring math given packed randomness.

    s2_stack: (k, 2, B, n) packed twisted-domain inputs s_j (canonical Z_p);
    msg_e2: (2, B, n) packed (e + m) epilogue term.
    Returns packed commitment (2, B, n).
    """
    acc4 = None
    for j in range(plan.k):
        t2 = _fourstep(
            plan, s2_stack[j], plan.leaf_fr, plan.leaf_fc,
            plan.twist, plan.tw_f, plan.a_hat_tabs[j], balanced,
        )
        t4 = unpack_planes_jnp(t2)
        acc4 = t4 if acc4 is None else modarith.add_mod(_CTX, acc4, t4)
    acc2 = pack_planes_jnp(acc4)
    c2 = _fourstep(
        plan, acc2, plan.leaf_ir, plan.leaf_ic,
        None, plan.tw_i, plan.untwist_n, balanced,
    )
    c4 = modarith.add_mod(
        _CTX, unpack_planes_jnp(c2), unpack_planes_jnp(msg_e2)
    )
    return pack_planes_jnp(c4)


def commit_batch_mxu(plan: RingMxuPlan, dctx, messages_planes, key,
                     balanced: Optional[bool] = None):
    """Drop-in MXU replacement for ``commit.lwe_jax.commit_batch``:
    identical randomness (same keys/sampler), identical outputs.

    messages_planes: (D, B, n) canonical digit planes. Returns
    (commitment planes (D, B, n), s_signed (k, B, n), e_signed (B, n)).
    """
    ctx = dctx.plan.ctx
    b = messages_planes.shape[1]
    n = dctx.n
    # mesh-invariant counter-mode draws (identical to lwe_jax.commit_batch)
    b_idx = jnp.arange(b, dtype=jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.uint32)
    s2 = []
    s_signed = []
    for j in range(dctx.k):
        s_planes, s_sgn = sampler_jax.sample_planes_global(
            key, j, b_idx, pos, dctx.cdf_hi, dctx.cdf_lo, ctx
        )
        s_signed.append(s_sgn)
        s2.append(pack_planes_jnp(s_planes))
    e_planes, e_sgn = sampler_jax.sample_planes_global(
        key, dctx.k, b_idx, pos, dctx.cdf_hi, dctx.cdf_lo, ctx
    )
    msg_e = modarith.add_mod(ctx, e_planes, messages_planes)
    c2 = ring_chain_mxu(plan, jnp.stack(s2), pack_planes_jnp(msg_e), balanced)
    return unpack_planes_jnp(c2), jnp.stack(s_signed), e_sgn
