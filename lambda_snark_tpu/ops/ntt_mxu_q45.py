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
_LANE = 128


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


def _recombine_q45(buckets: List) -> jnp.ndarray:
    """Fold sum_v G_v 2^(7v) (G_v int32 < 2^24, v <= 12 -> value < 2^97)
    into canonical (3, ...) digit planes via three Solinas folds."""
    n_cols = 7  # ceil(97 / 16) + headroom for carries
    cols = [None] * n_cols

    def acc(j, val):
        if j >= n_cols or val is None:
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
    digits = []
    carry = zero
    for j in range(n_cols + 1):
        tot = (cols[j] if j < n_cols else zero) + carry
        digits.append(tot & 0xFFFF)
        carry = tot >> 16
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
    return jnp.stack(r[:3])


# --- DFT leaf plans -----------------------------------------------------------


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
        if b == _LANE:
            packed = subs
        else:
            assert _LANE % b == 0
            reps = _LANE // b
            packed = np.zeros((_T, _LANE, _LANE), dtype=np.int8)
            for r_i in range(reps):
                packed[:, r_i * b:(r_i + 1) * b, r_i * b:(r_i + 1) * b] = subs
        return Q45Leaf(b=b, omega=omega, w_subs_packed=packed)


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


# Leaf kernel variants: optional input-table multiply (natural-layout twist)
# and output-table multiply (four-step twiddle / untwist / scales).


def _leaf_body(x_ref, w_ref, o_ref, tin_ref=None, tout_ref=None):
    x = unpack_q45_jnp(x_ref[:])
    if tin_ref is not None:
        x = modarith.mul_mod(_CTX, x, unpack_q45_jnp(tin_ref[:]))
    subs = _extract_subdigits(x)
    acc = _recombine_q45(_buckets(subs, w_ref))
    if tout_ref is not None:
        acc = modarith.mul_mod(_CTX, acc, unpack_q45_jnp(tout_ref[:]))
    o_ref[:] = pack_q45_jnp(acc)


def _k_plain(x_ref, w_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref)


def _k_tout(x_ref, w_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tout_ref=tout_ref)


def _k_tin(x_ref, w_ref, tin_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref)


def _k_tin_tout(x_ref, w_ref, tin_ref, tout_ref, o_ref):
    _leaf_body(x_ref, w_ref, o_ref, tin_ref=tin_ref, tout_ref=tout_ref)


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


def _leaf_apply(leaf: Q45Leaf, x2, tin: Optional[np.ndarray],
                tout: Optional[np.ndarray]) -> jnp.ndarray:
    """(2, M, B) packed -> packed DFT along the last axis, with optional
    natural-layout input twist and output twiddle row-pattern tables
    (both already lane-packed, shape (2, period, 128))."""
    _two, m_rows, b = x2.shape
    reps = _LANE // b
    if reps > 1:
        assert m_rows % reps == 0
        x2 = x2.reshape(2, m_rows // reps, _LANE)
    rows = x2.shape[1]
    tile = _pick_tile(rows)
    interpret = jax.default_backend() != "tpu"
    mem = pl.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec((2, tile, _LANE), lambda i: (0, i, 0), memory_space=mem),
        pl.BlockSpec((_T, _LANE, _LANE), lambda i: (0, 0, 0),
                     memory_space=mem),
    ]
    operands = [x2, jnp.asarray(leaf.w_subs_packed)]
    if tin is not None and tout is not None:
        kernel = _k_tin_tout
    elif tin is not None:
        kernel = _k_tin
    elif tout is not None:
        kernel = _k_tout
    else:
        kernel = _k_plain
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
        interpret=interpret,
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


def fourstep_apply(plan: Q45MxuPlan, x2) -> jnp.ndarray:
    """x2: (2, M, m) packed -> DFT along the last axis (natural in/out),
    with the plan's fused twist/twiddle/untwist tables."""
    r, c = plan.r, plan.c
    m_rows = x2.shape[1]
    X = x2.reshape(2, m_rows, r, c)
    Xt = jnp.swapaxes(X, 2, 3).reshape(2, m_rows * c, r)
    # r-phase leaf: optional input twist (natural layout), four-step twiddle
    # (x scale) on the output
    A_t = _leaf_apply(plan.leaf_r, Xt, plan.twist, plan.tw)
    A = jnp.swapaxes(A_t.reshape(2, m_rows, c, r), 2, 3)
    # c-phase leaf: optional output untwist
    F = _leaf_apply(plan.leaf_c, A.reshape(2, m_rows * r, c), None,
                    plan.untwist)
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


@functools.partial(jax.jit, static_argnums=(0,))
def quotient_batch_mxu(qp: Q45QuotientPlan, a_evals, b_evals, c_evals):
    """Drop-in MXU replacement for ``pipeline.quotient_batch``: (3, B, m)
    natural-order digit planes in, (q, a_poly, b_poly, c_poly, valid) out.
    """
    a2 = pack_q45_jnp(a_evals)
    b2 = pack_q45_jnp(b_evals)
    c2 = pack_q45_jnp(c_evals)
    a_poly2 = fourstep_apply(qp.intt, a2)
    b_poly2 = fourstep_apply(qp.intt, b2)
    c_poly2 = fourstep_apply(qp.intt, c2)
    a_odd = fourstep_apply(qp.fwd_twisted, a_poly2)
    b_odd = fourstep_apply(qp.fwd_twisted, b_poly2)
    c_odd = fourstep_apply(qp.fwd_twisted, c_poly2)
    n_odd = _mul_sub_packed(a_odd, b_odd, c_odd)
    q2 = fourstep_apply(qp.inv_untwisted, n_odd)
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
