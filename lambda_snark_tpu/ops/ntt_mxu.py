"""MXU (systolic-array) NTT: radix-B DFT steps as int8 matmuls.

The butterfly NTTs (``ntt_jax`` / ``ntt_pallas``) are VPU-bound: ~20 stages
x ~140 uint32 ops per element at m = 2^20. This path moves the O(B)
multiply-accumulate work of each radix-B DFT level onto the MXU:

1. field elements (base-2^16 digit planes) split into T = 10 subdigits of
   7 bits — int8-exact operands,
2. the radix-B DFT y = x @ W (W[i,j] = omega^(i*j)) becomes T x T int8
   matmuls P_(t,u) = X_t @ W_u with int32 accumulation
   (bucket sums <= 10 * 128 * 127^2 ~ 2^24.3 < 2^31: exact),
3. buckets G_v = sum_(t+u=v) P_(t,u) recombine as sum_v G_v 2^(7v), folded
   mod Goldilocks with the 2^64 = 2^32 - 1 / 2^96 = -1 identities — no
   per-element wide division, just digit adds and a handful of mod-p
   add/subs.

Large transforms use the four-step recursion with matmul-DFT leaves
(m = 2^20 -> 128 x (128 x 64)), twiddles between levels as ordinary digit
mulmods. Only the Goldilocks modulus is supported (the 45-bit modulus tops
out at m = 2^13 where butterflies are already cheap).

Bit-exact vs the golden host NTT (tests/test_ntt_mxu.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from . import modarith
from .limb import modulus_ctx

P = NTT_MODULUS
_T = 10  # 7-bit subdigits covering 64 bits
_CTX = modulus_ctx(P)
_D = 4


def _subdigit_planes_host(values: np.ndarray) -> np.ndarray:
    """Host: object array of field elements -> (T, ...) int8 subdigits."""
    out = np.empty((_T,) + values.shape, dtype=np.int8)
    flat = values.reshape(-1)
    buf = np.empty((_T, flat.shape[0]), dtype=np.int8)
    for idx, v in enumerate(flat):
        v = int(v)
        for t in range(_T):
            buf[t, idx] = (v >> (7 * t)) & 0x7F
    return buf.reshape((_T,) + values.shape)


def _extract_subdigits(x) -> List:
    """Device: (D, M, B) uint32 digit planes -> list of T (M, B) int8 planes."""
    subs = []
    for t in range(_T):
        p_bit = 7 * t
        j0 = p_bit >> 4
        o = p_bit & 15
        v = x[j0] >> o
        if o + 7 > 16 and j0 + 1 < _D:
            v = v | (x[j0 + 1] << (16 - o))
        subs.append((v & 0x7F).astype(jnp.int8))
    return subs


def _recombine_goldilocks(buckets: List) -> jnp.ndarray:
    """Fold G_v * 2^(7v) sums (int32, < 2^25) into canonical digit planes."""
    n_cols = 11
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols:
            return
        cols[j] = val if cols[j] is None else cols[j] + val

    for v, g in enumerate(buckets):
        gu = g.astype(jnp.uint32)
        c0 = gu & 0xFFFF
        c1 = gu >> 16  # < 2^9
        p_bit = 7 * v
        j0 = p_bit >> 4
        o = p_bit & 15
        full = c0 << o  # < 2^31
        acc(j0, full & 0xFFFF)
        acc(j0 + 1, full >> 16)
        full2 = c1 << o  # < 2^25
        acc(j0 + 1, full2 & 0xFFFF)
        acc(j0 + 2, full2 >> 16)
    zero = jnp.zeros_like(buckets[0].astype(jnp.uint32))
    cols = [c if c is not None else zero for c in cols]
    # carry-propagate to 16-bit digits (11 digits + top carry < 2^16)
    digits = []
    carry = zero
    for j in range(n_cols + 1):
        tot = (cols[j] if j < n_cols else zero) + carry
        digits.append(tot & 0xFFFF)
        carry = tot >> 16
    # group into 32-bit words w_i, weight 2^(32 i) mod p cycles
    #   1, 2^32, 2^32 - 1, -1, -2^32, 1 - 2^32
    def planes2(lo16, hi16):
        return jnp.stack([lo16, hi16, zero, zero])

    def planes_shift32(lo16, hi16):
        raw = jnp.stack([zero, zero, lo16, hi16])
        # value < 2^64: one conditional subtract of p canonicalizes
        ql = [jnp.uint32(d) for d in _CTX.q_digits]
        r = modarith._cond_sub([raw[i] for i in range(4)], ql)
        return jnp.stack(r)

    w = [
        (digits[2 * i], digits[2 * i + 1] if 2 * i + 1 < len(digits) else zero)
        for i in range(6)
    ]
    acc_planes = planes2(*w[0])
    acc_planes = modarith.add_mod(_CTX, acc_planes, planes_shift32(*w[1]))
    t2 = modarith.sub_mod(_CTX, planes_shift32(*w[2]), planes2(*w[2]))
    acc_planes = modarith.add_mod(_CTX, acc_planes, t2)
    zero_planes = jnp.stack([zero] * 4)
    acc_planes = modarith.sub_mod(
        _CTX, acc_planes, planes2(*w[3])
    )
    acc_planes = modarith.sub_mod(_CTX, acc_planes, planes_shift32(*w[4]))
    t5 = modarith.sub_mod(_CTX, planes2(*w[5]), planes_shift32(*w[5]))
    acc_planes = modarith.add_mod(_CTX, acc_planes, t5)
    return acc_planes


@dataclasses.dataclass(frozen=True, eq=False)
class DftMatmulPlan:
    """Radix-B DFT as subdigit matmuls: W[i, j] = omega^(i j)."""

    b: int
    omega: int
    w_subs: np.ndarray  # (T, B, B) int8

    @staticmethod
    def create(b: int, omega: int) -> "DftMatmulPlan":
        w = np.empty((b, b), dtype=object)
        for i in range(b):
            acc = 1
            step = field.mod_pow(omega, i, P)
            for j in range(b):
                w[i, j] = acc
                acc = field.mul_mod(acc, step, P)
        return DftMatmulPlan(b=b, omega=omega, w_subs=_subdigit_planes_host(w))


def dft_matmul_apply(plan: DftMatmulPlan, x) -> jnp.ndarray:
    """(D, M, B) planes -> (D, M, B) DFT along the last axis."""
    xs = _extract_subdigits(x)  # T x (M, B) int8
    ws = jnp.asarray(plan.w_subs)  # (T, B, B) int8
    buckets = []
    for v in range(2 * _T - 1):
        g = None
        for t in range(_T):
            u = v - t
            if 0 <= u < _T:
                p_tu = lax.dot_general(
                    xs[t], ws[u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                g = p_tu if g is None else g + p_tu
        buckets.append(g)
    return _recombine_goldilocks(buckets)


# --- recursive four-step with matmul leaves ---------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class MxuNttPlan:
    m: int
    omega: int
    leaf: Optional[DftMatmulPlan]  # set when m <= leaf size
    r: int = 0
    c: int = 0
    plan_r: Optional["MxuNttPlan"] = None
    plan_c: Optional["MxuNttPlan"] = None
    tw: Optional[np.ndarray] = None  # (D, R, C) twiddles omega^(h*b)

    @staticmethod
    def create(m: int, omega: int, leaf_size: int = 128) -> "MxuNttPlan":
        assert m & (m - 1) == 0
        if m <= leaf_size:
            return MxuNttPlan(m=m, omega=omega, leaf=DftMatmulPlan.create(m, omega))
        r = min(leaf_size, 1 << ((m.bit_length() - 1) // 2))
        c = m // r
        omega_r = field.mod_pow(omega, c, P)
        omega_c = field.mod_pow(omega, r, P)
        from .ntt_large import _twiddle_matrix

        return MxuNttPlan(
            m=m,
            omega=omega,
            leaf=None,
            r=r,
            c=c,
            plan_r=MxuNttPlan.create(r, omega_r, leaf_size),
            plan_c=MxuNttPlan.create(c, omega_c, leaf_size),
            tw=_twiddle_matrix(r, c, omega, P, _D),
        )


_MXU_CACHE: dict = {}


def mxu_ntt_plan(m: int, omega: Optional[int] = None, leaf_size: int = 128) -> MxuNttPlan:
    if omega is None:
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, P)
    key = (m, omega, leaf_size)
    if key not in _MXU_CACHE:
        _MXU_CACHE[key] = MxuNttPlan.create(m, omega, leaf_size)
    return _MXU_CACHE[key]


def _apply(plan: MxuNttPlan, x) -> jnp.ndarray:
    """x: (D, M, m) -> DFT along last axis (natural order in and out)."""
    if plan.leaf is not None:
        d, mm, b = x.shape
        return dft_matmul_apply(plan.leaf, x)
    r, c = plan.r, plan.c
    d = x.shape[0]
    m_rows = x.shape[1]
    X = x.reshape(d, m_rows, r, c)
    # step 1: R-point DFTs along R (move R last, flatten rows*C)
    Xt = jnp.swapaxes(X, 2, 3).reshape(d, m_rows * c, r)
    A_t = _apply(plan.plan_r, Xt).reshape(d, m_rows, c, r)
    A = jnp.swapaxes(A_t, 2, 3)  # (D, M, R, C): A[h, b]
    # step 2: twiddle omega^(h*b)
    tw = jnp.asarray(plan.tw)[:, None]  # (D, 1, R, C)
    T_ = modarith.mul_mod(_CTX, A, tw)
    # step 3: C-point DFTs along rows
    F = _apply(plan.plan_c, T_.reshape(d, m_rows * r, c)).reshape(d, m_rows, r, c)
    # step 4: out[h + R*g] = F[h, g]
    out = jnp.swapaxes(F, 2, 3)
    return out.reshape(d, m_rows, plan.m)


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_forward_mxu(plan: MxuNttPlan, x) -> jnp.ndarray:
    """Batched forward NTT on (D, M, m) Goldilocks digit planes."""
    return _apply(plan, x)
