"""Four-step (Bailey) NTT for large transforms.

Decomposes an m-point NTT (m = R * C, both powers of two) into:

    1. R-point NTTs along columns        (root omega^C, order R)
    2. twiddle multiply by omega^(h*b)
    3. C-point NTTs along rows           (root omega^R, order C)
    4. transposed read-out: out[h + R*g] = F[h, g]

This is the classic scheme for both (a) bounding XLA graph size for huge m
(the jitted graph contains two *small* unrolled transforms instead of log2(m)
full-width stages) and (b) distributing the transform: on a device mesh the
column/row phases are local and the single transpose becomes an all_to_all
(``parallel.ntt_sharded``), exactly the design SURVEY.md section 5 calls for
in place of the reference's single-thread scale-up (``r1cs.rs:527-547``).

Bit-exact with the golden host NTT: the four-step output is the same
evaluation vector f(omega^j) in natural order.
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
from .limb import int_to_digits, modulus_ctx, to_limbs
from .ntt_jax import NttPlan, ntt_plan


def _twiddle_matrix(r: int, c: int, base: int, q: int, d: int) -> np.ndarray:
    """(D, r, c) planes of omega^(h*b) for h < r, b < c."""
    rows = []
    for h in range(r):
        w = field.mod_pow(base, h, q)
        acc = 1
        row = np.empty(c, dtype=object)
        for b in range(c):
            row[b] = acc
            acc = field.mul_mod(acc, w, q)
        rows.append(row)
    mat = np.stack(rows)  # (r, c) objects
    return to_limbs(mat, d)


@dataclasses.dataclass(frozen=True, eq=False)
class FourStepPlan:
    m: int
    r: int
    c: int
    q: int
    omega: int
    plan_r: NttPlan  # root omega^C (order R)
    plan_c: NttPlan  # root omega^R (order C)
    tw: np.ndarray  # (D, R, C) twiddles omega^(h*b)
    inverse: "Optional[FourStepPlan]" = None
    n_inv_digits: Optional[tuple] = None

    @staticmethod
    def create(m: int, q: int, omega: int, r: Optional[int] = None,
               _build_inverse: bool = True) -> "FourStepPlan":
        assert m & (m - 1) == 0
        if r is None:
            r = 1 << ((m.bit_length() - 1) // 2)
        c = m // r
        assert r * c == m and r >= 2 and c >= 2
        ctx = modulus_ctx(q)
        omega_r = field.mod_pow(omega, c, q)
        omega_c = field.mod_pow(omega, r, q)
        inv = None
        n_inv_digits = None
        if _build_inverse:
            omega_inv = field.mod_inverse(omega, q)
            inv = FourStepPlan.create(m, q, omega_inv, r=r, _build_inverse=False)
            n_inv_digits = tuple(int_to_digits(field.mod_inverse(m, q), ctx.d))
        return FourStepPlan(
            m=m,
            r=r,
            c=c,
            q=q,
            omega=omega,
            plan_r=ntt_plan(r, q, omega_r),
            plan_c=ntt_plan(c, q, omega_c),
            tw=_twiddle_matrix(r, c, omega, q, ctx.d),
            inverse=inv,
            n_inv_digits=n_inv_digits,
        )


_FS_CACHE: dict = {}


def four_step_plan(m: int, q: int, omega: int, r: Optional[int] = None) -> FourStepPlan:
    key = (m, q, omega, r)
    if key not in _FS_CACHE:
        _FS_CACHE[key] = FourStepPlan.create(m, q, omega, r=r)
    return _FS_CACHE[key]


def _forward(fsp: FourStepPlan, x) -> jnp.ndarray:
    """x: (D, ..., m) -> evaluations (D, ..., m) in natural order."""
    from .ntt_jax import ntt_forward  # local import to avoid cycle at module load

    d = x.shape[0]
    lead = x.shape[1:-1]
    X = x.reshape(x.shape[:-1] + (fsp.r, fsp.c))
    # step 1: R-point NTTs along the R axis (move R last)
    Xt = jnp.swapaxes(X, -1, -2)  # (D, ..., C, R)
    A_t = ntt_forward(fsp.plan_r, Xt)
    A = jnp.swapaxes(A_t, -1, -2)  # (D, ..., R, C); A[h, b]
    # step 2: twiddle omega^(h*b)
    tw = jnp.asarray(fsp.tw).reshape((d,) + (1,) * len(lead) + (fsp.r, fsp.c))
    T = modarith.mul_mod(fsp.plan_r.ctx, A, tw)
    # step 3: C-point NTTs along rows
    F = ntt_forward(fsp.plan_c, T)  # (D, ..., R=h, C=g)
    # step 4: out[h + R*g] = F[h, g] -> flatten (g, h)
    out = jnp.swapaxes(F, -1, -2)
    return out.reshape(x.shape[:-1] + (fsp.m,))


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_forward_large(fsp: FourStepPlan, x) -> jnp.ndarray:
    return _forward(fsp, x)


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_inverse_large(fsp: FourStepPlan, x) -> jnp.ndarray:
    assert fsp.inverse is not None, "plan built without inverse"
    out = _forward(fsp.inverse, x)
    return modarith.mul_mod_const(fsp.plan_r.ctx, out, fsp.n_inv_digits)
