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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from . import modarith
from .limb import modulus_ctx

P = NTT_MODULUS
_T = 10  # 7-bit subdigits covering 64 bits
_TB = 8  # balanced 8-bit subdigits covering 64 bits (production packed path)
_CTX = modulus_ctx(P)
_D = 4

# Balanced base-256 representability bounds for 8 int8 digits in [-128, 127]:
# max = 127 * (2^64-1)/255, min = -128 * (2^64-1)/255. Any residue mod P has a
# representative in [min, max]: use w itself when w <= _MAXB, else w - P
# (|w - P| <= P - _MAXB <= -min, checked in tests).
_MAXB = 127 * ((1 << 64) - 1) // 255
_MINB = -128 * ((1 << 64) - 1) // 255
assert P - _MAXB <= -_MINB


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


def _subdigit_planes_balanced_host(values: np.ndarray) -> np.ndarray:
    """Host: object array of residues mod p -> (8, ...) balanced int8 digits.

    Each residue w gets the representative w (when w <= _MAXB) or w - p,
    then an exact balanced base-256 expansion with digits in [-128, 127].
    """
    out = np.empty((_TB,) + values.shape, dtype=np.int8)
    flat = values.reshape(-1)
    buf = np.empty((_TB, flat.shape[0]), dtype=np.int8)
    for idx, w in enumerate(flat):
        v = int(w)
        if v > _MAXB:
            v -= P
        for t in range(_TB):
            d = ((v + 128) % 256) - 128
            buf[t, idx] = d
            v = (v - d) >> 8
        assert v == 0
    return buf.reshape((_TB,) + values.shape)


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


#: bias making the digit-level weight fold non-negative, pre-reduced mod p:
#: 2^17 per 16-bit column (covers the two subtracted digits) + 8 for the
#: e4-fold column (e4 < 8)
_FOLD_BIAS = (
    ((1 << 17) * (1 + (1 << 16) + (1 << 32) + (1 << 48)) + 8)
    % 18446744069414584321
)
_FOLD_BIAS_DIGITS = tuple((_FOLD_BIAS >> (16 * j)) & 0xFFFF for j in range(4))


def _fold_columns_goldilocks(cols: List, zero) -> jnp.ndarray:
    """16-bit column accumulators (uint32) -> canonical digit planes.

    Carry-propagates the columns to 16-bit digits d_0..d_11, then folds
    the digit weights 2^(16 j) mod p DIRECTLY at digit level
    (2^64 = 2^32 - 1, 2^96 = -1, ...):

        col_0 = d0 - d4 - d6 + d10        col_2 = d2 + d4 - d8  - d10
        col_1 = d1 - d5 - d7 + d11        col_3 = d3 + d5 - d9  - d11

    with a +2^17 bias per column keeping everything unsigned; the top
    carries re-fold (e4 < 8 at 2^64, then a single binary carry), one
    conditional subtract canonicalizes, and the constant total bias is
    subtracted mod p once. ~40% fewer VPU ops than the previous
    word-level add_mod/sub_mod chain — this epilogue is the packed NTT's
    binding resource (BENCH_NOTES roofline).
    """
    while cols and cols[-1] is None:  # skip trailing empty columns
        cols = cols[:-1]
    n_cols = len(cols)
    cols = [c if c is not None else zero for c in cols]
    cols = modarith.cpu_fusion_barrier(cols)
    d = []
    carry = zero
    for j in range(n_cols + 1):
        tot = (cols[j] if j < n_cols else zero) + carry
        d.append(tot & 0xFFFF)
        carry = tot >> 16
    while len(d) < 12:
        d.append(zero)
    d = modarith.cpu_fusion_barrier(d)

    bias = jnp.uint32(1 << 17)
    c0 = d[0] + d[10] + bias - d[4] - d[6]
    c1 = d[1] + d[11] + bias - d[5] - d[7]
    c2 = d[2] + d[4] + bias - d[8] - d[10]
    c3 = d[3] + d[5] + bias - d[9] - d[11]
    e = []
    carry = zero
    for c in (c0, c1, c2, c3):
        tot = c + carry
        e.append(tot & 0xFFFF)
        carry = tot >> 16
    e4 = carry  # < 8: sum c_j 2^(16 j) < 2^18 * 2^49
    # fold e4 * 2^64 = e4 * (2^32 - 1): +e4 at 2^32, -e4 at 2^0 (bias 8)
    f0 = e[0] + jnp.uint32(8) - e4
    f2 = e[2] + e4
    g = []
    carry = zero
    for c in (f0, e[1], f2, e[3]):
        tot = c + carry
        g.append(tot & 0xFFFF)
        carry = tot >> 16
    g4 = carry  # binary: inputs <= 2^16 + 9
    # low64 < 2^64 = p + (2^32 - 1): ONE conditional subtract canonicalizes
    ql = modarith._const_digits(_CTX.q_digits)
    r = modarith._cond_sub(g, ql)
    # fold g4 * 2^64 = g4 * (2^32 - 1) with a modular add of the masked
    # constant (digits of 2^32 - 1 are [0xFFFF, 0xFFFF, 0, 0])
    gm = g4 * jnp.uint32(0xFFFF)
    acc_planes = modarith.add_mod(
        _CTX, jnp.stack(r), jnp.stack([gm, gm, zero, zero])
    )
    bias_planes = jnp.stack(
        [zero + jnp.uint32(v) for v in _FOLD_BIAS_DIGITS]
    )
    return modarith.cpu_fusion_barrier(
        modarith.sub_mod(_CTX, acc_planes, bias_planes)
    )


def _recombine_goldilocks(buckets: List) -> jnp.ndarray:
    """Fold G_v * 2^(7v) sums (int32, < 2^25) into canonical digit planes.

    Each bucket lands in exactly TWO 16-bit columns via the exact split
    gu * 2^o = (gu mod 2^(16-o)) * 2^o + (gu >> (16-o)) * 2^16 — the
    column accumulators are u32 and the fold's carry chain absorbs values
    above 16 bits, so no per-bucket c0/c1 pre-split is needed (the
    epilogues are the VPU-bound 83% of a leaf level; see BENCH_NOTES
    roofline)."""
    buckets = modarith.cpu_fusion_barrier(buckets)
    n_cols = 11
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols:
            return
        cols[j] = val if cols[j] is None else cols[j] + val

    for v, g in enumerate(buckets):
        gu = g.astype(jnp.uint32)  # < 2^25
        p_bit = 7 * v
        j0 = p_bit >> 4
        o = p_bit & 15
        if o == 0:
            acc(j0, gu & 0xFFFF)
            acc(j0 + 1, gu >> 16)  # < 2^9
        else:
            acc(j0, (gu & ((1 << (16 - o)) - 1)) << o)  # < 2^16
            acc(j0 + 1, gu >> (16 - o))  # < 2^(o+9)
    zero = jnp.zeros_like(buckets[0].astype(jnp.uint32))
    return _fold_columns_goldilocks(cols, zero)


# bias constant for the balanced recombination: sum_v 2^24 * 2^(8v) mod p
_BAL_BIAS = 1 << 24
_BAL_BIAS_CONST = sum(_BAL_BIAS << (8 * v) for v in range(2 * _TB - 1)) % P


def _recombine_goldilocks_bal(buckets: List) -> jnp.ndarray:
    """Fold signed balanced-digit buckets G_v * 2^(8v) into canonical planes.

    Buckets are int32 in [-2^24, 2^24] (<= 8 (t,u) pairs x 128 rows x 128^2
    per product); adding the bias 2^24 makes every bucket non-negative
    (<= 2^25) so the unsigned column machinery applies; the constant total
    bias sum_v 2^24 * 2^(8v) is subtracted mod p at the end.
    """
    buckets = modarith.cpu_fusion_barrier(buckets)
    n_cols = 11
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols:
            return
        cols[j] = val if cols[j] is None else cols[j] + val

    for v, g in enumerate(buckets):
        gu = (g + jnp.int32(_BAL_BIAS)).astype(jnp.uint32)  # [0, 2^25]
        p_bit = 8 * v
        j0 = p_bit >> 4
        o = p_bit & 15  # 0 or 8
        # exact two-column split (see _recombine_goldilocks)
        if o == 0:
            acc(j0, gu & 0xFFFF)
            acc(j0 + 1, gu >> 16)  # <= 2^9
        else:
            acc(j0, (gu & 0xFF) << 8)  # < 2^16
            acc(j0 + 1, gu >> 8)  # <= 2^17
    zero = jnp.zeros_like(buckets[0].astype(jnp.uint32))
    acc_planes = _fold_columns_goldilocks(cols, zero)
    bias_planes = jnp.stack(
        [zero + jnp.uint32((_BAL_BIAS_CONST >> (16 * j)) & 0xFFFF)
         for j in range(_D)]
    )
    return modarith.sub_mod(_CTX, acc_planes, bias_planes)


_LANE = 128  # MXU/VPU lane width: packed DFT matrices are (T, 128, 128)


@dataclasses.dataclass(frozen=True, eq=False)
class DftMatmulPlan:
    """Radix-B DFT as subdigit matmuls: W[i, j] = omega^(i j).

    ``w_subs_packed`` is the 128-lane form used by the fused Pallas kernel:
    for B < 128 it is a block-diagonal stack of 128/B copies of W, so
    128/B independent B-point DFTs run per matmul row-block with full MXU
    tiles (the zero blocks are free relative to the HBM savings).
    """

    b: int
    omega: int
    w_subs: np.ndarray  # (T, B, B) int8
    w_subs_packed: Optional[np.ndarray]  # (T, 128, 128) int8 or None
    w_subs_bal: Optional[np.ndarray] = None  # (8, 128, 128) balanced int8

    @staticmethod
    def create(b: int, omega: int) -> "DftMatmulPlan":
        w = np.empty((b, b), dtype=object)
        for i in range(b):
            acc = 1
            step = field.mod_pow(omega, i, P)
            for j in range(b):
                w[i, j] = acc
                acc = field.mul_mod(acc, step, P)
        subs = _subdigit_planes_host(w)
        subs_bal = _subdigit_planes_balanced_host(w)

        def lane_pack(s):
            t_dim = s.shape[0]
            if b == _LANE:
                return s
            if b < _LANE and _LANE % b == 0:
                reps = _LANE // b
                out = np.zeros((t_dim, _LANE, _LANE), dtype=np.int8)
                for r_i in range(reps):
                    out[:, r_i * b:(r_i + 1) * b, r_i * b:(r_i + 1) * b] = s
                return out
            return None

        return DftMatmulPlan(b=b, omega=omega, w_subs=subs,
                             w_subs_packed=lane_pack(subs),
                             w_subs_bal=lane_pack(subs_bal))


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


# --- fused Pallas leaf: buckets + recombination resident in VMEM ------------


def _leaf_kernel(x_ref, w_ref, o_ref):
    """One row-tile of the radix-B DFT, fully fused.

    x_ref: (D, TM, 128) uint32 digit planes; w_ref: (T, 128, 128) int8
    packed DFT matrix; o_ref: (D, TM, 128) canonical digit planes.

    The XLA path (``dft_matmul_apply``) materializes the 19 int32 bucket
    matrices to HBM between the matmuls and the recombination (~75 MB of
    traffic per level at m=2^20 — BENCH_NOTES.md "MXU experiment"); here a
    bucket lives only as a VMEM accumulator between its T int8 matmuls and
    its fold into the digit columns.
    """
    x = x_ref[:]
    subs = _extract_subdigits(x)  # T x (TM, 128) int8
    o_ref[:] = _recombine_goldilocks(_buckets(subs, w_ref))


def _pick_leaf_tile(m_rows: int) -> int:
    """Largest power-of-two row tile <= 512 dividing m_rows (>= 32 for int8
    sublane tiling; the VMEM live set at 512 rows is ~6 MB)."""
    tile = 1
    while tile * 2 <= min(m_rows, 512) and m_rows % (tile * 2) == 0:
        tile *= 2
    return tile


def dft_matmul_apply_pallas(plan: DftMatmulPlan, x) -> jnp.ndarray:
    """(D, M, B) planes -> (D, M, B) DFT along the last axis, fused kernel.

    B <= 128 leaves run as lane-packed (D, M*B/128, 128) tiles against the
    block-diagonal ``w_subs_packed`` matrix.
    """
    assert plan.w_subs_packed is not None, f"no packed form for B={plan.b}"
    d, m_rows, b = x.shape
    reps = _LANE // b
    if reps > 1:
        assert m_rows % reps == 0, (m_rows, b)
        x = x.reshape(d, m_rows // reps, _LANE)
    rows = x.shape[1]
    tile = _pick_leaf_tile(rows)
    w = jnp.asarray(plan.w_subs_packed)
    if jax.default_backend() != "tpu":
        # CPU: plain-XLA kernel math (see _leaf_packed for rationale)
        out = _recombine_goldilocks(_buckets(_extract_subdigits(x), w))
    else:
        out = pl.pallas_call(
            _leaf_kernel,
            grid=(rows // tile,),
            in_specs=[
                pl.BlockSpec((d, tile, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, _LANE, _LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((d, tile, _LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, w)
    if reps > 1:
        out = out.reshape(d, m_rows, b)
    return out


# --- packed (2 x uint32 words) fused pipeline -------------------------------
#
# The 4 x 16-bit digit-plane representation spends 16 bytes of HBM per
# 8-byte Goldilocks element; at m = 2^20 every kernel pass is HBM-bound, so
# the packed pipeline stores elements as 2 uint32 words (lo, hi), expands to
# digits only inside VMEM, and additionally fuses each level's twiddle
# multiply into the producing leaf kernel — between levels XLA only moves
# packed words (transposes), no elementwise passes remain.


def pack_planes_jnp(x4):
    """(4, ...) digit planes -> (2, ...) packed words (in-trace, one pass)."""
    w0 = x4[0] | (x4[1] << 16)
    w1 = x4[2] | (x4[3] << 16)
    return jnp.stack([w0, w1])


def unpack_planes_jnp(x2):
    """(2, ...) packed words -> (4, ...) digit planes."""
    return jnp.stack(
        [x2[0] & 0xFFFF, x2[0] >> 16, x2[1] & 0xFFFF, x2[1] >> 16]
    )


def _extract_subdigits_packed(x2) -> List:
    """(2, M, B) packed words -> T x (M, B) int8 7-bit subdigit planes."""
    subs = []
    for t in range(_T):
        p_bit = 7 * t
        j0 = p_bit >> 5
        o = p_bit & 31
        v = x2[j0] >> o
        if o + 7 > 32 and j0 + 1 < 2:
            v = v | (x2[j0 + 1] << (32 - o))
        subs.append((v & 0x7F).astype(jnp.int8))
    return subs


def _extract_balanced_packed(x2) -> List:
    """(2, M, B) packed canonical words -> 8 x (M, B) balanced int8 digits.

    When X > _MAXB the digits encode X - p instead: Y = X + (2^32 - 1) is
    computed with a wrapping 64-bit add (no overflow: X < p), and the
    balanced byte expansion of Y with its final carry-out dropped equals
    Y - 2^64 = X - p exactly (the carry-out is guaranteed 1 there, and
    guaranteed 0 when X <= _MAXB). No carry matmul plane is needed.

    The balanced bytes themselves come from the BIAS trick, not a serial
    carry scan: the unique digits d_t in [-128, 127] with
    Y = sum d_t 256^t (mod 2^64) are byte_t(Y + 0x8080..80 mod 2^64) - 128,
    and the -128 is a free int8 reinterpretation of byte XOR 0x80. One
    64-bit constant add replaces the 8-step dependent carry chain the
    round-4 roofline flagged (digit-set-of-256 uniqueness makes this
    provably identical to the scan; pinned bit-exact in test_ntt_mxu).
    """
    lo, hi = x2[0], x2[1]
    maxb_hi = jnp.uint32(_MAXB >> 32)
    maxb_lo = jnp.uint32(_MAXB & 0xFFFFFFFF)
    cond = (hi > maxb_hi) | ((hi == maxb_hi) & (lo > maxb_lo))
    condu = cond.astype(jnp.uint32)
    lo_f = lo + condu * jnp.uint32(0xFFFFFFFF)  # wraps iff lo >= 1
    hi_f = hi + (condu & (lo_f < lo).astype(jnp.uint32))
    b8 = jnp.uint32(0x80808080)
    lo_b = lo_f + b8  # wrapping: dropped carries ARE the bias semantics
    hi_b = hi_f + b8 + (lo_b < lo_f).astype(jnp.uint32)
    x80 = jnp.uint32(0x80)
    subs = []
    for t in range(_TB):
        word = lo_b if t < 4 else hi_b
        sh = 8 * (t & 3)
        byte = (word >> sh) & 0xFF if sh < 24 else word >> 24
        subs.append((byte ^ x80).astype(jnp.int8))
    return subs


def _leaf_math_packed(x2, w, tw2, balanced):
    """The packed leaf computation as a pure row-parallel function.

    x2 (2, rows, 128) packed words, w (T, 128, 128) int8 DFT matrix,
    tw2 (2, rows, 128) packed twiddles or None. The Pallas kernels apply
    this per VMEM tile; the CPU path applies it to the whole array (the
    math is independent of the tiling).
    """
    if balanced:
        subs = modarith.cpu_fusion_barrier(_extract_balanced_packed(x2))
        acc = _recombine_goldilocks_bal(_buckets_bal(subs, w))
    else:
        subs = modarith.cpu_fusion_barrier(_extract_subdigits_packed(x2))
        acc = _recombine_goldilocks(_buckets(subs, w))
    if tw2 is not None:
        acc = modarith.mul_mod(_CTX, acc, unpack_planes_jnp(tw2))
    return pack_planes_jnp(acc)


def _leaf_kernel_packed(x_ref, w_ref, o_ref):
    o_ref[:] = _leaf_math_packed(x_ref[:], w_ref[:], None, False)


def _leaf_kernel_packed_bal(x_ref, w_ref, o_ref):
    o_ref[:] = _leaf_math_packed(x_ref[:], w_ref[:], None, True)


def _leaf_kernel_packed_tw_bal(x_ref, w_ref, tw_ref, o_ref):
    o_ref[:] = _leaf_math_packed(x_ref[:], w_ref[:], tw_ref[:], True)


def _leaf_kernel_packed_tw(x_ref, w_ref, tw_ref, o_ref):
    o_ref[:] = _leaf_math_packed(x_ref[:], w_ref[:], tw_ref[:], False)


def _buckets(subs: List, w_ref) -> List:
    out = []
    for v in range(2 * _T - 1):
        g = None
        for t in range(_T):
            u = v - t
            if 0 <= u < _T:
                p_tu = lax.dot_general(
                    subs[t], w_ref[u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                g = p_tu if g is None else g + p_tu
        out.append(g)
    return out


def _buckets_bal(subs: List, w_ref) -> List:
    """8x8 balanced-digit products: 64 int8 matmuls vs the 100 of the 7-bit
    path — the leaf is MXU-op-bound at m = 2^20, so this is the win."""
    out = []
    for v in range(2 * _TB - 1):
        g = None
        for t in range(_TB):
            u = v - t
            if 0 <= u < _TB:
                p_tu = lax.dot_general(
                    subs[t], w_ref[u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                g = p_tu if g is None else g + p_tu
        out.append(g)
    return out


def _packed_twiddle_host(tw4: np.ndarray, r: int, c: int, reps: int) -> np.ndarray:
    """(D, R, C) twiddle planes -> packed A_t-layout pattern.

    A_t rows iterate (row, b) with b fastest; lane h of row (row, b) needs
    tw[h, b]. With lane packing (reps rows per 128-lane row) the pattern is
    (2, c // reps, 128): packed[:, j, s*r + h] = tw[:, h, (j*reps + s)].
    Pattern period along rows is c // reps.
    """
    d = tw4.shape[0]
    assert c % reps == 0
    period = c // reps
    out4 = np.empty((d, period, reps * r), dtype=np.uint32)
    for j in range(period):
        for s in range(reps):
            b = j * reps + s
            out4[:, j, s * r:(s + 1) * r] = tw4[:, :, b]
    w0 = out4[0] | (out4[1] << 16)
    w1 = out4[2] | (out4[3] << 16)
    return np.stack([w0, w1])


# Production representation for the packed leaf kernels: balanced base-256
# digits (8x8 = 64 int8 matmuls) vs 7-bit unsigned (10x10 = 100). Module
# flag so experiments can A/B the two in one process.
PACKED_BALANCED = True


def _leaf_packed(plan: DftMatmulPlan, x2, tw2: Optional[np.ndarray],
                 balanced: Optional[bool] = None):
    """(2, M, B) packed -> packed DFT (optionally x per-element twiddle).

    tw2: packed A_t-layout twiddle pattern (2, period, 128) or None.
    """
    if balanced is None:
        balanced = PACKED_BALANCED
    w_np = plan.w_subs_bal if balanced else plan.w_subs_packed
    assert w_np is not None, f"no packed form for B={plan.b}"
    t_dim = w_np.shape[0]
    _two, m_rows, b = x2.shape
    reps = _LANE // b
    if reps > 1:
        assert m_rows % reps == 0, (m_rows, b)
        x2 = x2.reshape(2, m_rows // reps, _LANE)
    rows = x2.shape[1]
    tile = _pick_leaf_tile(rows)
    w = jnp.asarray(w_np)
    if jax.default_backend() != "tpu":
        # CPU: run the kernel math as plain XLA on the whole array —
        # interpret-mode Pallas compiles are pathologically slow and the
        # math is independent of the VMEM tiling (table patterns tile to
        # all rows). The real Mosaic kernel is validated on the TPU by
        # scripts/exp_balanced.py / exp_mxu_fused.py.
        full_tw = None
        if tw2 is not None:
            period = tw2.shape[1]
            assert rows % period == 0, (rows, period)
            full_tw = jnp.asarray(np.tile(tw2, (1, rows // period, 1)))
        out = _leaf_math_packed(x2, w, full_tw, balanced)
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
    kernel = _leaf_kernel_packed_bal if balanced else _leaf_kernel_packed
    if tw2 is not None:
        period = tw2.shape[1]
        if period % tile == 0:
            n_blocks = period // tile
            in_specs.append(
                pl.BlockSpec((2, tile, _LANE),
                             lambda i: (0, i % n_blocks, 0),
                             memory_space=mem)
            )
            operands.append(jnp.asarray(tw2))
        else:
            # period < tile: pre-tile the pattern host-side to `tile` rows
            assert tile % period == 0, (tile, period)
            tiled = np.tile(tw2, (1, tile // period, 1))
            in_specs.append(
                pl.BlockSpec((2, tile, _LANE), lambda i: (0, 0, 0),
                             memory_space=mem)
            )
            operands.append(jnp.asarray(tiled))
        kernel = _leaf_kernel_packed_tw_bal if balanced else _leaf_kernel_packed_tw
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
    tw_packed: Optional[np.ndarray] = None  # (2, C//reps, 128) A_t layout

    @staticmethod
    def create(m: int, omega: int, leaf_size: int = 128,
               scale: int = 1) -> "MxuNttPlan":
        """``scale`` is folded into the top-level twiddle matrix (every
        element passes through it exactly once) — the packed inverse NTT
        gets its 1/m normalization for free. Requires m > leaf_size when
        scale != 1."""
        assert m & (m - 1) == 0
        if m <= leaf_size:
            assert scale == 1, "scale folding needs a twiddle level"
            return MxuNttPlan(m=m, omega=omega, leaf=DftMatmulPlan.create(m, omega))
        r = min(leaf_size, 1 << ((m.bit_length() - 1) // 2))
        c = m // r
        omega_r = field.mod_pow(omega, c, P)
        omega_c = field.mod_pow(omega, r, P)
        from .ntt_large import _twiddle_matrix

        tw = _twiddle_matrix(r, c, omega, P, _D)
        if scale != 1:
            from .limb import from_limbs, to_limbs

            vals = from_limbs(tw)
            flat = vals.reshape(-1)
            for i in range(flat.shape[0]):
                flat[i] = field.mul_mod(int(flat[i]), scale, P)
            tw = to_limbs(vals, _D)
        reps = _LANE // min(r, _LANE)
        tw_packed = (
            _packed_twiddle_host(tw, r, c, reps) if c % max(reps, 1) == 0
            else None
        )
        return MxuNttPlan(
            m=m,
            omega=omega,
            leaf=None,
            r=r,
            c=c,
            plan_r=MxuNttPlan.create(r, omega_r, leaf_size),
            plan_c=MxuNttPlan.create(c, omega_c, leaf_size),
            tw=tw,
            tw_packed=tw_packed,
        )


_MXU_CACHE: dict = {}


def mxu_ntt_plan(m: int, omega: Optional[int] = None, leaf_size: int = 128) -> MxuNttPlan:
    if omega is None:
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, P)
    key = (m, omega, leaf_size, 1)
    if key not in _MXU_CACHE:
        _MXU_CACHE[key] = MxuNttPlan.create(m, omega, leaf_size)
    return _MXU_CACHE[key]


def mxu_intt_plan(m: int, omega: Optional[int] = None, leaf_size: int = 128) -> MxuNttPlan:
    """Inverse-NTT plan: inverse root, 1/m folded into the top twiddle."""
    if omega is None:
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, P)
    key = (m, omega, leaf_size, -1)
    if key not in _MXU_CACHE:
        _MXU_CACHE[key] = MxuNttPlan.create(
            m, field.mod_inverse(omega, P), leaf_size,
            scale=field.mod_inverse(m, P),
        )
    return _MXU_CACHE[key]


def _apply(plan: MxuNttPlan, x, fused: bool) -> jnp.ndarray:
    """x: (D, M, m) -> DFT along last axis (natural order in and out)."""
    if plan.leaf is not None:
        if fused and plan.leaf.w_subs_packed is not None:
            return dft_matmul_apply_pallas(plan.leaf, x)
        return dft_matmul_apply(plan.leaf, x)
    r, c = plan.r, plan.c
    d = x.shape[0]
    m_rows = x.shape[1]
    X = x.reshape(d, m_rows, r, c)
    # step 1: R-point DFTs along R (move R last, flatten rows*C)
    Xt = jnp.swapaxes(X, 2, 3).reshape(d, m_rows * c, r)
    A_t = _apply(plan.plan_r, Xt, fused).reshape(d, m_rows, c, r)
    A = jnp.swapaxes(A_t, 2, 3)  # (D, M, R, C): A[h, b]
    # step 2: twiddle omega^(h*b)
    tw = jnp.asarray(plan.tw)[:, None]  # (D, 1, R, C)
    T_ = modarith.mul_mod(_CTX, A, tw)
    # step 3: C-point DFTs along rows
    F = _apply(plan.plan_c, T_.reshape(d, m_rows * r, c), fused)
    F = F.reshape(d, m_rows, r, c)
    # step 4: out[h + R*g] = F[h, g]
    out = jnp.swapaxes(F, 2, 3)
    return out.reshape(d, m_rows, plan.m)


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt_forward_mxu(plan: MxuNttPlan, x, fused: bool = False) -> jnp.ndarray:
    """Batched forward NTT on (D, M, m) Goldilocks digit planes.

    ``fused=True`` runs each DFT leaf as the VMEM-resident Pallas kernel
    (buckets + recombination on-chip); ``False`` keeps the pure-XLA path.
    """
    return _apply(plan, x, fused)


def _apply_packed(plan: MxuNttPlan, x2,
                  balanced: Optional[bool] = None) -> jnp.ndarray:
    """Packed pipeline: x2 (2, M, m) words -> DFT, twiddles fused in-leaf."""
    if plan.leaf is not None:
        return _leaf_packed(plan.leaf, x2, None, balanced)
    r, c = plan.r, plan.c
    m_rows = x2.shape[1]
    assert plan.plan_r.leaf is not None and plan.tw_packed is not None
    X = x2.reshape(2, m_rows, r, c)
    Xt = jnp.swapaxes(X, 2, 3).reshape(2, m_rows * c, r)
    # step 1 + step 2 in one kernel: R-point DFT leaf with the level's
    # twiddle omega^(h*b) applied in A_t layout before writeback
    A_t = _leaf_packed(plan.plan_r.leaf, Xt, plan.tw_packed, balanced)
    A = jnp.swapaxes(A_t.reshape(2, m_rows, c, r), 2, 3)
    # step 3: C-point DFTs along rows (recursive, twiddles fused inside)
    F = _apply_packed(plan.plan_c, A.reshape(2, m_rows * r, c), balanced)
    F = F.reshape(2, m_rows, r, c)
    # step 4: out[h + R*g] = F[h, g]
    return jnp.swapaxes(F, 2, 3).reshape(2, m_rows, plan.m)


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt_forward_mxu_packed(plan: MxuNttPlan, x2,
                           balanced: Optional[bool] = None) -> jnp.ndarray:
    """Forward NTT on packed (2, M, m) uint32 words (lo, hi) — the
    production representation: half the HBM bytes of digit planes, all
    elementwise work fused into the DFT leaf kernels."""
    return _apply_packed(plan, x2, balanced)
