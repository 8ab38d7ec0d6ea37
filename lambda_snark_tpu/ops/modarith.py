"""JAX digit-plane modular arithmetic (uint32, TPU-native).

Operates on stacked digit planes of shape (D, ...) as defined in
``ops.limb``; every function is pure jnp on uint32 and traces into a handful
of VPU ops, so it works identically in plain jitted code and inside Pallas
kernel bodies. Semantics contract: ``core.field`` (bit-exact, tested in
``tests/test_limb_jax.py``).

Reduction is Barrett (HAC 14.42) with base 2^16; all bounds are static:
digit products < 2^32, column sums < 2^20, carries < 2^5.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .limb import BASE_BITS, MASK, ModulusCtx

# Plain Python ints: jnp ops with int operands keep uint32 dtype, and module-
# level jnp scalars would be captured closure constants, which Pallas kernel
# bodies reject.
_MASK = MASK
_SHIFT = BASE_BITS
_ONE = 1
_B31 = 31


def _zero():
    return jnp.uint32(0)


def cpu_fusion_barrier(x):
    """Cut XLA fusion on the CPU backend only (pytree-preserving no-op on TPU).

    XLA:CPU duplicates producer fusions into every consumer without a
    recompute budget, so deep digit-arithmetic chains (subdigit extraction
    -> bucket matmuls -> recombination -> mulmod) re-execute upstream work
    per use and run ~1000x slow (measured: a 129 s leaf drops to ms with
    barriers). On TPU — including inside real Pallas kernels — fusion is
    what we want, so this is identity there.
    """
    import jax
    from jax import lax

    if jax.default_backend() == "tpu":
        return x
    return lax.optimization_barrier(x)


def _unstack(x) -> List:
    return [x[i] for i in range(x.shape[0])]


def _const_digits(digits: Sequence[int]) -> List:
    return [jnp.uint32(d) for d in digits]


def _carry_propagate(cols: List, out_digits: int):
    """Columns (each < 2^31) -> normalized 16-bit digits + final carry."""
    digits = []
    carry = _zero()
    for k in range(out_digits):
        tot = (cols[k] if k < len(cols) else _zero()) + carry
        digits.append(tot & _MASK)
        carry = tot >> _SHIFT
    return digits, carry


def _digit_add(a: List, b: List):
    """Digit-wise add with carry chain; returns (digits, carry)."""
    n = max(len(a), len(b))
    cols = [
        (a[i] if i < len(a) else _zero()) + (b[i] if i < len(b) else _zero())
        for i in range(n)
    ]
    return _carry_propagate(cols, n)


def _digit_sub(a: List, b: List):
    """a - b with borrow chain; returns (digits, borrow) in uint32."""
    n = max(len(a), len(b))
    digits = []
    borrow = _zero()
    for i in range(n):
        ai = a[i] if i < len(a) else _zero()
        bi = b[i] if i < len(b) else _zero()
        diff = ai - bi - borrow  # wraps mod 2^32; digits < 2^16 so bit 31 flags
        borrow = diff >> _B31
        digits.append(diff & _MASK)
    return digits, borrow


def _digit_mul(a: List, b: List, out_digits: int | None = None) -> List:
    """Schoolbook digit multiply with lo/hi column accumulation."""
    na, nb = len(a), len(b)
    total = na + nb
    if out_digits is None:
        out_digits = total
    ncols = min(out_digits, total)
    cols = [None] * (ncols + 1)
    for i in range(na):
        for j in range(nb):
            k = i + j
            if k >= ncols + 1:
                continue
            p = a[i] * b[j]
            if k < ncols:
                lo = p & _MASK
                cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < ncols + 1:
                hi = p >> _SHIFT
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    cols = [c if c is not None else _zero() for c in cols[:ncols]]
    digits, _ = _carry_propagate(cols, out_digits)
    return digits


def _select(cond, a: List, b: List) -> List:
    """Per-element digit select: cond ? a : b (cond uint32 0/1 array)."""
    c = cond.astype(jnp.bool_)
    return [jnp.where(c, x, y) for x, y in zip(a, b)]


def _cond_sub(r: List, q_ext: List) -> List:
    """r >= q ? r - q : r (one round)."""
    t, borrow = _digit_sub(r, q_ext)
    return _select(borrow == 0, t, r)


def add_mod(ctx: ModulusCtx, a, b):
    """(a + b) mod q on (D, ...) planes."""
    al, bl = _unstack(a), _unstack(b)
    s, carry = _digit_add(al, bl)
    t, borrow = _digit_sub(s, _const_digits(ctx.q_digits))
    out = _select((carry == 1) | (borrow == 0), t, s)
    return jnp.stack(out)


def sub_mod(ctx: ModulusCtx, a, b):
    """(a - b) mod q on (D, ...) planes."""
    al, bl = _unstack(a), _unstack(b)
    t, borrow = _digit_sub(al, bl)
    t_plus_q, _ = _digit_add(t, _const_digits(ctx.q_digits))
    out = _select(borrow == 1, t_plus_q, t)
    return jnp.stack(out)


_GOLDILOCKS = 18446744069414584321  # 2^64 - 2^32 + 1
_EPS_DIGITS = (0xFFFF, 0xFFFF, 0, 0)  # 2^32 - 1 = 2^64 mod p


def _mul_mod_goldilocks(al: List, bl: List) -> List:
    """Specialized p = 2^64 - 2^32 + 1 reduction (2^64 = 2^32 - 1, 2^96 = -1).

    Product t0..t7 (base-2^16 digits) folds as
        value = lo + hi_lo*(2^32 - 1) - hi_hi
              = lo + [0,0,t4,t5] - [t4,t5,0,0] - [t6,t7,0,0]   (mod p)
    with each wraparound of the 4-digit accumulator worth +/- eps
    (eps = 2^32 - 1). Roughly 3x fewer uint32 ops than generic Barrett.
    """
    t = _digit_mul(al, bl, out_digits=8)
    lo = t[0:4]
    s_add = [_zero(), _zero(), t[4], t[5]]
    d1 = [t[4], t[5], _zero(), _zero()]
    d2 = [t[6], t[7], _zero(), _zero()]
    eps = _const_digits(_EPS_DIGITS)
    # r = lo + S  (carry => +eps; the +eps re-add cannot carry again because
    # lo + S < 2^65 so the wrapped value is < 2^64 - 2^33 + eps < 2^64)
    r, carry = _digit_add(lo, s_add)
    r_adj, _ = _digit_add(r, eps)
    r = _select(carry == 1, r_adj, r)
    # r -= D1 (borrow => -eps; wrapped value >= 2^64 - 2^32 > eps, no chain)
    r2, borrow = _digit_sub(r, d1)
    r2_adj, _ = _digit_sub(r2, eps)
    r = _select(borrow == 1, r2_adj, r2)
    # r -= D2 (same)
    r3, borrow = _digit_sub(r, d2)
    r3_adj, _ = _digit_sub(r3, eps)
    r = _select(borrow == 1, r3_adj, r3)
    # canonicalize: r < 2^64 < 2p, one conditional subtract of p suffices
    q_d = _const_digits((1, 0, 0xFFFF, 0xFFFF))  # p digits
    r = _cond_sub(r, q_d)
    return r


_Q45 = 17592169062401  # 2^44 - 16982015 (the 45-bit NTT-friendly prime)
_Q45_C = (1 << 44) - _Q45  # 16982015 < 2^25: digits (8191, 259)


def _mul_c45(xl: List, out_digits: int) -> List:
    """x * 16982015 as digits (x given as digit list)."""
    return _digit_mul(xl, _const_digits((8191, 259)), out_digits=out_digits)


def _fold_q45(digits: List, in_bits: int) -> List:
    """One 2^44 = c (mod q) fold: value < 2^in_bits -> x_lo + x_hi * c.

    x_lo = low 44 bits (digits 0,1 + low 12 bits of digit 2);
    x_hi = value >> 44 (in_bits - 44 bits).
    """
    hi_digits_needed = (in_bits - 44 + 15) // 16
    x_hi = []
    for t in range(hi_digits_needed):
        bit = 44 + 16 * t
        j0 = bit >> 4
        o = bit & 15
        v = (digits[j0] >> o) if j0 < len(digits) else _zero()
        if o > 0 and j0 + 1 < len(digits):
            v = v | (digits[j0 + 1] << (16 - o))
        x_hi.append(v & _MASK)
    x_lo = [digits[0], digits[1], digits[2] & 0x0FFF]
    prod_bits = (in_bits - 44) + 25
    prod = _mul_c45(x_hi, out_digits=(prod_bits + 15) // 16)
    out_bits = max(45, prod_bits) + 1
    s, carry = _digit_add(x_lo, prod)
    if (out_bits + 15) // 16 > len(s):
        s.append(carry)
    return s


def _mul_mod_q45(al: List, bl: List) -> List:
    """Solinas-style reduction for q = 2^44 - c, c = 16982015 < 2^25.

    t < 2^90 -> fold to < 2^72 -> < 2^54 -> < 2^46, then <= 2 conditional
    subtracts. ~40% fewer digit multiplies than generic Barrett (D=3).
    """
    t = _digit_mul(al, bl, out_digits=6)  # < 2^90
    r = _fold_q45(t, 90)   # < 2^46 + 2^71 ~ 2^72
    r = _fold_q45(r, 72)   # < 2^44 + 2^53 ~ 2^54
    r = _fold_q45(r, 54)   # < 2^44 + 2^35 < 2^45
    q_digits = ((_Q45 >> 0) & 0xFFFF, (_Q45 >> 16) & 0xFFFF, (_Q45 >> 32) & 0xFFFF, 0)
    q_ext = _const_digits(q_digits)
    while len(r) < 4:
        r.append(_zero())
    r = r[:4]
    r = _cond_sub(r, q_ext)  # r < 2^45 < 3q: two subtracts canonicalize
    r = _cond_sub(r, q_ext)
    return r[:3]


def _mul_mod_digits(ctx: ModulusCtx, al: List, bl: List) -> List:
    if ctx.q == _GOLDILOCKS:
        return _mul_mod_goldilocks(al, bl)
    if ctx.q == _Q45:
        return _mul_mod_q45(al, bl)
    d = ctx.d
    # full 2D-digit product
    t = _digit_mul(al, bl, out_digits=2 * d)
    # Barrett: q1 = floor(x / b^(d-1))  (d+1 digits)
    q1 = t[d - 1 : 2 * d]
    mu = _const_digits(ctx.mu_digits)
    q2 = _digit_mul(q1, mu)  # 2d+2 digits
    q3 = q2[d + 1 :]  # d+1 digits
    q3q = _digit_mul(q3, _const_digits(ctx.q_digits_ext), out_digits=d + 1)
    r, _ = _digit_sub(t[: d + 1], q3q)  # mod b^(d+1), borrow discarded
    q_ext = _const_digits(ctx.q_digits_ext)
    r = _cond_sub(r, q_ext)
    r = _cond_sub(r, q_ext)
    return r[:d]


def mul_mod(ctx: ModulusCtx, a, b):
    """(a * b) mod q on (D, ...) planes (Barrett).

    The result is a CPU fusion root: a mulmod's digit DAG consumes each
    input plane several times, so composed chains re-execute their whole
    producer graph multiplicatively on XLA:CPU (measured: a 9-transform
    m=64 quotient chain ran 120 s; with per-op barriers, milliseconds).
    No-op on TPU.
    """
    out = _mul_mod_digits(ctx, _unstack(a), _unstack(b))
    return cpu_fusion_barrier(jnp.stack(out))


def mul_mod_const(ctx: ModulusCtx, a, const_digits: Sequence[int]):
    """a * c mod q with a per-call constant c (twiddle factors etc.)."""
    out = _mul_mod_digits(ctx, _unstack(a), _const_digits(const_digits))
    return cpu_fusion_barrier(jnp.stack(out))


def reduce_mod(ctx: ModulusCtx, a):
    """Canonicalize planes holding values < 2^(16 D) into [0, q)."""
    al = _unstack(a)
    q_d = _const_digits(ctx.q_digits)
    out = _cond_sub(al, q_d)
    out = _cond_sub(out, q_d)
    return jnp.stack(out)


def zeros_like_planes(ctx: ModulusCtx, shape) -> jnp.ndarray:
    return jnp.zeros((ctx.d,) + tuple(shape), dtype=jnp.uint32)


# Jitted entry points (ctx is static: frozen dataclass of ints/tuples).
import jax as _jax

add_mod_jit = _jax.jit(add_mod, static_argnums=(0,))
sub_mod_jit = _jax.jit(sub_mod, static_argnums=(0,))
mul_mod_jit = _jax.jit(mul_mod, static_argnums=(0,))
