"""MXU (systolic-array) NTT over the 45-bit prime q = 17592169062401.

The production quotient chain (``pipeline.quotient_batch``) is VPU-bound:
7 butterfly transforms x log2(m) stages of digit mulmods per batch. This
module moves the transform FLOPs onto the MXU, mirroring ``ntt_mxu``'s
packed Goldilocks pipeline but cheaper in every dimension q45 allows:

- elements travel as 2 uint32 words (w0 = d0 | d1<<16, w1 = d2; 45 bits),
- T = 7 subdigits of 7 bits (vs 10 for 64-bit Goldilocks): the radix-B DFT
  level costs T^2 = 49 int8 matmuls (vs 100) with exact int32 bucket sums
  (B * 7 * 127^2 < 2^24),
- bucket recombination folds mod q with the Solinas identity
  2^44 = 16982015 (three folds + two conditional subtracts — the same
  chain as ``modarith._mul_mod_q45``), entirely in VMEM,
- the four-step twiddles, the negacyclic psi-twist (input side of the
  forward transform), the psi-untwist, the 1/m scale and the quotient's
  (-2)^{-1} all fold into per-leaf elementwise tables — between leaf
  kernels XLA only moves packed words.

Bit-exact vs the butterfly path (tests/test_ntt_mxu_q45.py).
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
from ..core.params import NTT_FRIENDLY_MODULUS
from . import modarith
from .limb import modulus_ctx, to_limbs

Q = NTT_FRIENDLY_MODULUS
_CTX = modulus_ctx(Q)
_D = 3
_T = 7  # 7-bit subdigits covering 49 >= 45 bits
_TB = 6  # balanced 8-bit subdigits covering 48 >= 45 bits (production)
_LANE = 128

# Balanced base-256 representability for 6 int8 digits: max = 127*(2^48-1)/255
# >> 2^44 > q, so every residue (data and W side) encodes directly — no
# representative shift and no carry-out is ever needed (top byte of a < 2^44
# value is < 2^4, so the balancing carry cannot escape).
_MAXB6 = 127 * ((1 << 48) - 1) // 255
assert Q < _MAXB6


# --- packing -----------------------------------------------------------------


def pack_q45_jnp(x3):
    """(3, ...) digit planes -> (2, ...) packed words."""
    return jnp.stack([x3[0] | (x3[1] << 16), x3[2]])


def unpack_q45_jnp(x2):
    """(2, ...) packed words -> (3, ...) digit planes."""
    return jnp.stack([x2[0] & 0xFFFF, x2[0] >> 16, x2[1]])


def _pack_host(x3: np.ndarray) -> np.ndarray:
    return np.stack([x3[0] | (x3[1] << 16), x3[2]])


# --- subdigits + Solinas recombination ---------------------------------------


def _extract_subdigits(digits) -> List:
    """(3, M, B) digit planes -> T x (M, B) int8 7-bit subdigit planes."""
    subs = []
    for t in range(_T):
        p_bit = 7 * t
        j0 = p_bit >> 4
        o = p_bit & 15
        v = digits[j0] >> o
        if o + 7 > 16 and j0 + 1 < _D:
            v = v | (digits[j0 + 1] << (16 - o))
        subs.append((v & 0x7F).astype(jnp.int8))
    return subs


def _extract_balanced_q45(x2) -> List:
    """(2, M, B) packed canonical words -> 6 x (M, B) balanced int8 digits.

    Word layout: w0 = bits 0..31, w1 = bits 32..47. Values < q < 2^44, so
    the balanced base-256 chain never produces a final carry (top byte +
    carry < 17 < 128).
    """
    subs = []
    carry = jnp.zeros_like(x2[0])
    for t in range(_TB):
        word = x2[0] if t < 4 else x2[1]
        u = (word >> (8 * (t & 3))) & 0xFF
        s = u + carry  # <= 256
        carry = (s >= 128).astype(jnp.uint32)
        d = s.astype(jnp.int32) - (carry << 8).astype(jnp.int32)
        subs.append(d.astype(jnp.int8))
    return subs


def _recombine_q45(buckets: List) -> jnp.ndarray:
    """Fold sum_v G_v 2^(7v) (G_v int32 < 2^24, v <= 12 -> value < 2^97)
    into canonical (3, ...) digit planes via three Solinas folds."""
    buckets = modarith.cpu_fusion_barrier(buckets)
    n_cols = 7  # ceil(97 / 16) + headroom for carries
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols or val is None:
            return
        cols[j] = val if cols[j] is None else cols[j] + val

    for v, g in enumerate(buckets):
        gu = g.astype(jnp.uint32)  # < 2^24
        p_bit = 7 * v
        j0 = p_bit >> 4
        o = p_bit & 15
        # exact two-column split: gu*2^o = (gu mod 2^(16-o))*2^o +
        # (gu >> (16-o))*2^16; u32 columns + the carry chain absorb >16-bit
        # values (the recombination epilogues are the VPU bound)
        if o == 0:
            acc(j0, gu & 0xFFFF)
            acc(j0 + 1, gu >> 16)
        else:
            acc(j0, (gu & ((1 << (16 - o)) - 1)) << o)
            acc(j0 + 1, gu >> (16 - o))
    zero = jnp.zeros_like(buckets[0].astype(jnp.uint32))
    cols = [c if c is not None else zero for c in cols]
    cols = modarith.cpu_fusion_barrier(cols)
    digits = []
    carry = zero
    for j in range(n_cols + 1):
        tot = (cols[j] if j < n_cols else zero) + carry
        digits.append(tot & 0xFFFF)
        carry = tot >> 16
    digits = modarith.cpu_fusion_barrier(digits)
    # value < 2^97: fold 97 -> 78 -> 59 -> < 2^45, two conditional subtracts
    r = modarith._fold_q45(digits, 97)
    r = modarith._fold_q45(r, 78)
    r = modarith._fold_q45(r, 59)
    q_ext = modarith._const_digits(
        (Q & 0xFFFF, (Q >> 16) & 0xFFFF, (Q >> 32) & 0xFFFF, 0)
    )
    while len(r) < 4:
        r.append(zero)
    r = modarith._cond_sub(r[:4], q_ext)
    r = modarith._cond_sub(r, q_ext)
    return modarith.cpu_fusion_barrier(jnp.stack(r[:3]))


# bias constant for the balanced recombination: sum_v 2^24 * 2^(8v) mod q
_BAL_BIAS = 1 << 24
_BAL_BIAS_CONST = sum(_BAL_BIAS << (8 * v) for v in range(2 * _TB - 1)) % Q


def _recombine_q45_bal(buckets: List) -> jnp.ndarray:
    """Fold signed balanced buckets G_v * 2^(8v) into canonical digit planes.

    Buckets are int32 in [-2^23.6, 2^23.6] (<= 6 (t,u) pairs x 128 rows x
    128^2); bias 2^24 makes them non-negative (< 2^25), the biased total
    (< 2^106) folds with four Solinas passes, and the constant bias sum is
    subtracted mod q at the end.
    """
    buckets = modarith.cpu_fusion_barrier(buckets)
    n_cols = 8  # max p_bit 80 -> columns to 80/16 + 2
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols or val is None:
            return
        cols[j] = val if cols[j] is None else cols[j] + val

    for v, g in enumerate(buckets):
        gu = (g + jnp.int32(_BAL_BIAS)).astype(jnp.uint32)  # < 2^25
        p_bit = 8 * v
        j0 = p_bit >> 4
        o = p_bit & 15  # 0 or 8
        # exact two-column split (see _recombine_q45)
        if o == 0:
            acc(j0, gu & 0xFFFF)
            acc(j0 + 1, gu >> 16)
        else:
            acc(j0, (gu & 0xFF) << 8)
            acc(j0 + 1, gu >> 8)  # <= 2^17
    zero = jnp.zeros_like(buckets[0].astype(jnp.uint32))
    cols = [c if c is not None else zero for c in cols]
    cols = modarith.cpu_fusion_barrier(cols)
    digits = []
    carry = zero
    for j in range(n_cols + 1):
        tot = (cols[j] if j < n_cols else zero) + carry
        digits.append(tot & 0xFFFF)
        carry = tot >> 16
    digits = modarith.cpu_fusion_barrier(digits)
    # biased value < 2^25 * 2^80 * 256/255 < 2^106
    r = modarith._fold_q45(digits, 106)  # -> < 2^88
    r = modarith._fold_q45(r, 88)        # -> < 2^70
    r = modarith._fold_q45(r, 70)        # -> < 2^52
    r = modarith._fold_q45(r, 52)        # -> < 2^45
    q_ext = modarith._const_digits(
        (Q & 0xFFFF, (Q >> 16) & 0xFFFF, (Q >> 32) & 0xFFFF, 0)
    )
    while len(r) < 4:
        r.append(zero)
    r = modarith._cond_sub(r[:4], q_ext)
    r = modarith._cond_sub(r, q_ext)
    acc_planes = jnp.stack(r[:3])
    bias_planes = jnp.stack(
        [zero + jnp.uint32((_BAL_BIAS_CONST >> (16 * j)) & 0xFFFF)
         for j in range(_D)]
    )
    return modarith.cpu_fusion_barrier(
        modarith.sub_mod(_CTX, acc_planes, bias_planes)
    )


# --- DFT leaf plans -----------------------------------------------------------


def _subdigit_planes_balanced_host(values: np.ndarray) -> np.ndarray:
    """Host: residues mod q (< 2^44) -> (6, ...) balanced int8 digits."""
    flat = values.reshape(-1)
    buf = np.empty((_TB, flat.shape[0]), dtype=np.int8)
    for idx, w in enumerate(flat):
        v = int(w)
        for t in range(_TB):
            d = ((v + 128) % 256) - 128
            buf[t, idx] = d
            v = (v - d) >> 8
        assert v == 0
    return buf.reshape((_TB,) + values.shape)


def _subdigit_planes_host(values: np.ndarray) -> np.ndarray:
    out = np.empty((_T,) + values.shape, dtype=np.int8)
    flat = values.reshape(-1)
    buf = np.empty((_T, flat.shape[0]), dtype=np.int8)
    for idx, v in enumerate(flat):
        v = int(v)
        for t in range(_T):
            buf[t, idx] = (v >> (7 * t)) & 0x7F
    return buf.reshape((_T,) + values.shape)


@dataclasses.dataclass(frozen=True, eq=False)
class Q45Leaf:
    b: int
    omega: int
    w_subs_packed: np.ndarray  # (T, 128, 128) int8, block-diagonal for b<128
    w_subs_bal: Optional[np.ndarray] = None  # (6, 128, 128) balanced int8

    @staticmethod
    def create(b: int, omega: int) -> "Q45Leaf":
        w = np.empty((b, b), dtype=object)
        for i in range(b):
            acc = 1
            step = field.mod_pow(omega, i, Q)
            for j in range(b):
                w[i, j] = acc
                acc = field.mul_mod(acc, step, Q)
        subs = _subdigit_planes_host(w)
        subs_bal = _subdigit_planes_balanced_host(w)

        def lane_pack(s):
            t_dim = s.shape[0]
            if b == _LANE:
                return s
            assert _LANE % b == 0
            reps = _LANE // b
            packed = np.zeros((t_dim, _LANE, _LANE), dtype=np.int8)
            for r_i in range(reps):
                packed[:, r_i * b:(r_i + 1) * b, r_i * b:(r_i + 1) * b] = s
            return packed

        return Q45Leaf(b=b, omega=omega, w_subs_packed=lane_pack(subs),
                       w_subs_bal=lane_pack(subs_bal))


def _buckets_t(subs: List, w_ref, t_count: int) -> List:
    out = []
    for v in range(2 * t_count - 1):
        g = None
        for t in range(t_count):
            u = v - t
            if 0 <= u < t_count:
                p_tu = lax.dot_general(
                    subs[t], w_ref[u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                g = p_tu if g is None else g + p_tu
        out.append(g)
    return out


def _buckets(subs: List, w_ref) -> List:
    return _buckets_t(subs, w_ref, _T)


# Leaf kernel variants: optional input-table multiply (natural-layout twist)
# and output-table multiply (four-step twiddle / untwist / scales).


def _leaf_math(x2, w, tin2, tout2, balanced):
    """The q45 leaf computation as a pure row-parallel function.

    x2 (2, rows, 128) packed words; w (T, 128, 128) int8; tin2/tout2
    packed table arrays matching x2's rows, or None.
    """
    if balanced and tin2 is None:
        subs = modarith.cpu_fusion_barrier(_extract_balanced_q45(x2))
        acc = _recombine_q45_bal(_buckets_t(subs, w, _TB))
    else:
        x = unpack_q45_jnp(x2)
        if tin2 is not None:
            x = modarith.cpu_fusion_barrier(
                modarith.mul_mod(_CTX, x, unpack_q45_jnp(tin2))
            )
        if balanced:
            subs = modarith.cpu_fusion_barrier(
                _extract_balanced_q45(pack_q45_jnp(x))
            )
            acc = _recombine_q45_bal(_buckets_t(subs, w, _TB))
        else:
            subs = modarith.cpu_fusion_barrier(_extract_subdigits(x))
            acc = _recombine_q45(_buckets(subs, w))
    if tout2 is not None:
        acc = modarith.mul_mod(_CTX, acc, unpack_q45_jnp(tout2))
    return pack_q45_jnp(acc)


def _leaf_body(x_ref, w_ref, o_ref, tin_ref=None, tout_ref=None,
               balanced=False):
    o_ref[:] = _leaf_math(
        x_ref[:], w_ref[:],
        tin_ref[:] if tin_ref is not None else None,
        tout_ref[:] if tout_ref is not None else None,
        balanced,
    )


def _k_plain(x_ref, w_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref)


def _k_tout(x_ref, w_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tout_ref=tout_ref)


def _k_tin(x_ref, w_ref, tin_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref)


def _k_tin_tout(x_ref, w_ref, tin_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, tout_ref=tout_ref)


def _k_plain_bal(x_ref, w_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, balanced=True)


def _k_tout_bal(x_ref, w_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tout_ref=tout_ref, balanced=True)


def _k_tin_bal(x_ref, w_ref, tin_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, balanced=True)


def _k_tin_tout_bal(x_ref, w_ref, tin_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, tout_ref=tout_ref,
               balanced=True)


def _pick_tile(rows: int) -> int:
    tile = 1
    while tile * 2 <= min(rows, 512) and rows % (tile * 2) == 0:
        tile *= 2
    return tile


def _table_spec_and_operand(tab: np.ndarray, tile: int, mem):
    """Packed row-pattern table (2, period, 128) -> (BlockSpec, operand).

    period % tile == 0: slice blocks cyclically; else pre-tile host-side.
    """
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


# Production representation for the q45 leaf kernels: balanced base-256
# digits (6x6 = 36 int8 matmuls) vs 7-bit unsigned (7x7 = 49).
PACKED_BALANCED = True


def _leaf_apply(leaf: Q45Leaf, x2, tin: Optional[np.ndarray],
                tout: Optional[np.ndarray],
                balanced: Optional[bool] = None) -> jnp.ndarray:
    """(2, M, B) packed -> packed DFT along the last axis, with optional
    natural-layout input twist and output twiddle row-pattern tables
    (both already lane-packed, shape (2, period, 128))."""
    if balanced is None:
        balanced = PACKED_BALANCED
    w_np = leaf.w_subs_bal if balanced else leaf.w_subs_packed
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
        # CPU: plain-XLA kernel math — interpret-mode Pallas compiles are
        # pathologically slow; the math is tiling-independent (tables tile
        # to all rows). Real-kernel validation: scripts/exp_balanced.py.
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
    if tin is not None and tout is not None:
        kernel = _k_tin_tout_bal if balanced else _k_tin_tout
    elif tin is not None:
        kernel = _k_tin_bal if balanced else _k_tin
    elif tout is not None:
        kernel = _k_tout_bal if balanced else _k_tout
    else:
        kernel = _k_plain_bal if balanced else _k_plain
    for tab in (tin, tout):
        if tab is not None:
            spec, op = _table_spec_and_operand(tab, tile, mem)
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


# --- four-step transform plans -------------------------------------------------


def _row_pattern_table(fn, r: int, c: int, reps: int) -> np.ndarray:
    """Build a lane-packed (2, period, reps*r) table for the A_t layout:
    rows iterate (row, b) with b fastest (period c), lanes hold h; fn(h, b)
    gives the field value. reps = lane-packing factor of the r-point leaf;
    the packed row pattern repeats every lcm(c, reps)/reps packed rows."""
    import math

    reps = max(reps, 1)
    period = math.lcm(c, reps) // reps
    vals = np.empty((period, reps * r), dtype=object)
    for j in range(period):
        for s in range(reps):
            b_idx = (j * reps + s) % c
            for h in range(r):
                vals[j, s * r + h] = fn(h, b_idx)
    return _pack_host(to_limbs(vals, _D))


@dataclasses.dataclass(frozen=True, eq=False)
class Q45MxuPlan:
    """Four-step m = r*c (single level; quotient sizes m <= 2^13 need one).

    ``twist``/``untwist`` hold the negacyclic psi tables when requested:
    twist multiplies the INPUT of the r-phase leaf (factor psi^(h*c+b));
    untwist multiplies the OUTPUT of the c-phase leaf (factor
    psi^-(h + r*g) * scale). ``tw`` is the standard four-step twiddle
    omega^(h*b) * scale on the r-phase output.
    """

    m: int
    r: int
    c: int
    leaf_r: Q45Leaf
    leaf_c: Q45Leaf
    tw: np.ndarray
    twist: Optional[np.ndarray]
    untwist: Optional[np.ndarray]

    @staticmethod
    def create(m: int, omega: int, scale: int = 1,
               psi_in: Optional[int] = None,
               psi_out_scale: Optional[tuple] = None) -> "Q45MxuPlan":
        """psi_in: input twist base (forward negacyclic).
        psi_out_scale: (psi_inv, extra_scale) output untwist (inverse
        negacyclic); ``scale`` multiplies the four-step twiddle (1/m etc.).
        """
        assert m & (m - 1) == 0 and m >= 4
        r = 1 << ((m.bit_length() - 1) // 2)
        c = m // r
        assert r <= _LANE and c <= _LANE
        omega_r = field.mod_pow(omega, c, Q)
        omega_c = field.mod_pow(omega, r, Q)
        leaf_r = Q45Leaf.create(r, omega_r)
        leaf_c = Q45Leaf.create(c, omega_c)
        reps_r = _LANE // r
        reps_c = _LANE // c

        def tw_fn(h, b):
            return field.mul_mod(field.mod_pow(omega, h * b, Q), scale, Q)

        tw = _row_pattern_table(tw_fn, r, c, reps_r)
        twist = None
        if psi_in is not None:
            def twist_fn(h, b):
                return field.mod_pow(psi_in, h * c + b, Q)

            twist = _row_pattern_table(twist_fn, r, c, reps_r)
        untwist = None
        if psi_out_scale is not None:
            psi_inv, extra = psi_out_scale

            def untw_fn(h, g):
                # c-phase A_t layout: rows iterate (row, h), lanes hold g;
                # output element index is h + r*g
                return field.mul_mod(
                    field.mod_pow(psi_inv, h + r * g, Q), extra, Q
                )

            # rows iterate (row, h) with h fastest -> pattern period r,
            # lanes hold g (c of them, lane-packed by reps_c)
            untwist = _row_pattern_table(
                lambda g, h: untw_fn(h, g), c, r, reps_c
            )
        return Q45MxuPlan(m=m, r=r, c=c, leaf_r=leaf_r, leaf_c=leaf_c,
                          tw=tw, twist=twist, untwist=untwist)


def fourstep_apply(plan: Q45MxuPlan, x2,
                   balanced: Optional[bool] = None) -> jnp.ndarray:
    """x2: (2, M, m) packed -> DFT along the last axis (natural in/out),
    with the plan's fused twist/twiddle/untwist tables."""
    r, c = plan.r, plan.c
    m_rows = x2.shape[1]
    X = x2.reshape(2, m_rows, r, c)
    Xt = jnp.swapaxes(X, 2, 3).reshape(2, m_rows * c, r)
    # r-phase leaf: optional input twist (natural layout), four-step twiddle
    # (x scale) on the output
    A_t = _leaf_apply(plan.leaf_r, Xt, plan.twist, plan.tw, balanced)
    A = jnp.swapaxes(A_t.reshape(2, m_rows, c, r), 2, 3)
    # c-phase leaf: optional output untwist
    F = _leaf_apply(plan.leaf_c, A.reshape(2, m_rows * r, c), None,
                    plan.untwist, balanced)
    F = F.reshape(2, m_rows, r, c)
    return jnp.swapaxes(F, 2, 3).reshape(2, m_rows, plan.m)


# --- the quotient chain --------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class Q45QuotientPlan:
    """Everything the odd-coset quotient needs as three fused four-steps:

    iNTT (scale 1/m) -> [x3 inputs, poly outputs kept] -> forward with
    psi-twist fused on the input leaf -> pointwise (A.B - C) -> inverse
    with psi-untwist and (1/m)(-2)^{-1} fused on the output leaf.
    """

    m: int
    intt: Q45MxuPlan
    fwd_twisted: Q45MxuPlan
    inv_untwisted: Q45MxuPlan

    @staticmethod
    def create(m: int, psi: int) -> "Q45QuotientPlan":
        omega = field.mul_mod(psi, psi, Q)
        omega_inv = field.mod_inverse(omega, Q)
        psi_inv = field.mod_inverse(psi, Q)
        m_inv = field.mod_inverse(m, Q)
        neg_half_inv = field.mod_inverse(Q - 2, Q)
        return Q45QuotientPlan(
            m=m,
            intt=Q45MxuPlan.create(m, omega_inv, scale=m_inv),
            fwd_twisted=Q45MxuPlan.create(m, omega, psi_in=psi),
            inv_untwisted=Q45MxuPlan.create(
                m, omega_inv,
                psi_out_scale=(psi_inv,
                               field.mul_mod(m_inv, neg_half_inv, Q)),
            ),
        )


_QP_CACHE: dict = {}


def q45_quotient_plan(m: int, psi: int) -> Q45QuotientPlan:
    key = (m, psi)
    if key not in _QP_CACHE:
        _QP_CACHE[key] = Q45QuotientPlan.create(m, psi)
    return _QP_CACHE[key]


def _mul_sub_packed(a2, b2, c2):
    """packed (a*b - c) mod q, one fused XLA pass."""
    a = unpack_q45_jnp(a2)
    b = unpack_q45_jnp(b2)
    c = unpack_q45_jnp(c2)
    return pack_q45_jnp(
        modarith.sub_mod(_CTX, modarith.mul_mod(_CTX, a, b), c)
    )


@functools.partial(jax.jit, static_argnums=(0, 4))
def quotient_batch_mxu(qp: Q45QuotientPlan, a_evals, b_evals, c_evals,
                       balanced: Optional[bool] = None):
    """Drop-in MXU replacement for ``pipeline.quotient_batch``: (3, B, m)
    natural-order digit planes in, (q, a_poly, b_poly, c_poly, valid) out.
    """
    a2 = pack_q45_jnp(a_evals)
    b2 = pack_q45_jnp(b_evals)
    c2 = pack_q45_jnp(c_evals)
    a_poly2 = fourstep_apply(qp.intt, a2, balanced)
    b_poly2 = fourstep_apply(qp.intt, b2, balanced)
    c_poly2 = fourstep_apply(qp.intt, c2, balanced)
    a_odd = fourstep_apply(qp.fwd_twisted, a_poly2, balanced)
    b_odd = fourstep_apply(qp.fwd_twisted, b_poly2, balanced)
    c_odd = fourstep_apply(qp.fwd_twisted, c_poly2, balanced)
    n_odd = _mul_sub_packed(a_odd, b_odd, c_odd)
    q2 = fourstep_apply(qp.inv_untwisted, n_odd, balanced)
    residual = modarith.sub_mod(
        _CTX, modarith.mul_mod(_CTX, a_evals, b_evals), c_evals
    )
    valid = jnp.all(residual == 0, axis=(0, 2))
    return (
        unpack_q45_jnp(q2),
        unpack_q45_jnp(a_poly2),
        unpack_q45_jnp(b_poly2),
        unpack_q45_jnp(c_poly2),
        valid,
    )
