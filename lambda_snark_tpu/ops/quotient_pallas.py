"""Fused Pallas quotient kernel: the whole batched prove-stage field math
in one VMEM-resident kernel per batch tile.

``pipeline.quotient_batch`` chains 7 transforms + pointwise stages through
XLA (3 iNTTs, 3 negacyclic forward NTTs, pointwise, 1 negacyclic inverse);
at production shapes (m = 4096, batch ~16) the arrays are small enough that
the stage is op-dispatch bound, not HBM bound — so the win is doing the
entire chain per tile inside one kernel:

    a/b/c evals (natural) --DIF(w^-1)--> m*poly (bit-rev)
        twist_rev = psi^j / m at rev(j)  --o--> twisted poly (bit-rev)
        --DIT(w)--> odd-coset evals (natural)
    n_odd = a_odd o b_odd - c_odd
    --DIF(w^-1)--> (bit-rev)  --o untwist_rev = psi^-j/(m*(-2)) at rev(j)-->
        Q coefficients (bit-rev)

All permutations vanish through DIF/DIT pairing (tables stored pre-permuted;
the classic SEAL/Harvey trick the reference's C++ kernel also relies on —
``ntt.cpp:84-104``); outputs come back bit-reversed and the wrapper applies
one XLA gather each. Validity (exact division) is checked from the inputs
directly (even-coset residual). Bit-exact vs ``pipeline.quotient_batch``
(tests/test_quotient_pallas.py).
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
from .limb import int_to_digits, modulus_ctx
from .ring_pallas import (
    _bitrev,
    _dif_forward,
    _dif_stage_tables,
    _dit_inverse,
    _dit_stage_tables,
    _pow_table,
)


@dataclasses.dataclass(frozen=True, eq=False)
class QuotientPlan:
    m: int
    q: int
    d: int
    rev: np.ndarray             # bit-reversal permutation (self-inverse)
    dif_inv: np.ndarray         # (log_m, D, m) DIF twiddles, omega^-1
    dit_fwd: np.ndarray         # (log_m, D, m) DIT twiddles, omega
    twist_rev: np.ndarray       # (D, m) psi^j / m at rev(j)
    untwist_rev: np.ndarray     # (D, m) psi^-j / (m * (-2)) at rev(j)
    inv_m_digits: tuple

    @staticmethod
    def create(m: int, q: int, psi: int) -> "QuotientPlan":
        """psi = a primitive 2m-th root of unity mod q; omega = psi^2
        (exactly the pairing ``pipeline.field_plan_for`` uses)."""
        d = modulus_ctx(q).d
        omega = field.mul_mod(psi, psi, q)
        omega_inv = field.mod_inverse(omega, q)
        psi_inv = field.mod_inverse(psi, q)
        m_inv = field.mod_inverse(m, q)
        neg_half_inv = field.mod_inverse(q - 2, q)  # (-2)^{-1}
        rev = _bitrev(m)
        twist = _pow_table(psi, m, scale=m_inv, q=q, d=d)
        untwist = _pow_table(
            psi_inv, m, scale=field.mul_mod(m_inv, neg_half_inv, q), q=q, d=d
        )
        return QuotientPlan(
            m=m,
            q=q,
            d=d,
            rev=rev,
            dif_inv=_dif_stage_tables(m, omega_inv, q=q, d=d),
            dit_fwd=_dit_stage_tables(m, omega, q=q, d=d),
            twist_rev=twist[:, rev],
            untwist_rev=untwist[:, rev],
            inv_m_digits=tuple(int_to_digits(m_inv, d)),
        )


def _quotient_kernel(qp: QuotientPlan, a_ref, b_ref, c_ref,
                     difi_ref, ditf_ref, tw_ref, untw_ref,
                     q_ref, ap_ref, bp_ref, cp_ref):
    ctx = modulus_ctx(qp.q)
    m = qp.m
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, m), 1)
    tw = tw_ref[:]       # (D, m)
    untw = untw_ref[:]

    def to_odd(x_ref, poly_ref):
        y = _dif_forward(ctx, x_ref[:], difi_ref, iota, m)  # m*poly, bit-rev
        poly_ref[:] = modarith.mul_mod_const(ctx, y, qp.inv_m_digits)
        t = modarith.mul_mod(ctx, tw[:, None, :], y)  # twist(poly), bit-rev
        return _dit_inverse(ctx, t, ditf_ref, iota, m)  # odd evals, natural

    a_odd = to_odd(a_ref, ap_ref)
    b_odd = to_odd(b_ref, bp_ref)
    c_odd = to_odd(c_ref, cp_ref)
    n_odd = modarith.sub_mod(
        ctx, modarith.mul_mod(ctx, a_odd, b_odd), c_odd
    )
    z = _dif_forward(ctx, n_odd, difi_ref, iota, m)  # bit-rev
    q_ref[:] = modarith.mul_mod(ctx, untw[:, None, :], z)


def _pick_tile(b: int, m: int, d: int) -> int:
    if b < 8:
        return b
    budget = max((512 * 1024) // (d * m * 4), 8)
    tile = 8
    while tile * 2 <= b and tile * 2 <= budget and b % (tile * 2) == 0:
        tile *= 2
    return tile


@functools.partial(jax.jit, static_argnums=(0,))
def quotient_batch_fused(qp: QuotientPlan, a_evals, b_evals, c_evals):
    """Fused device quotient: (D, B, m) natural-order evals ->
    (q_coeffs, a_poly, b_poly, c_poly (D, B, m) natural, valid (B,)).

    Drop-in bit-exact replacement for ``pipeline.quotient_batch``.
    """
    d, b, m = a_evals.shape
    tile = _pick_tile(b, m, d)
    interpret = jax.default_backend() != "tpu"
    mem = pl.ANY if interpret else pltpu.VMEM
    log_m = m.bit_length() - 1
    kernel = functools.partial(_quotient_kernel, qp)
    tile_spec = pl.BlockSpec((d, tile, m), lambda i: (0, i, 0),
                             memory_space=mem)
    table_spec = pl.BlockSpec((log_m, d, m), lambda i: (0, 0, 0),
                              memory_space=mem)
    vec_spec = pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=mem)
    shape = jax.ShapeDtypeStruct((d, b, m), jnp.uint32)
    q_rev, a_rev, b_rev, c_rev = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[tile_spec, tile_spec, tile_spec,
                  table_spec, table_spec, vec_spec, vec_spec],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=(shape, shape, shape, shape),
        interpret=interpret,
    )(
        a_evals, b_evals, c_evals,
        jnp.asarray(qp.dif_inv), jnp.asarray(qp.dit_fwd),
        jnp.asarray(qp.twist_rev), jnp.asarray(qp.untwist_rev),
    )
    rev = jnp.asarray(qp.rev)
    ctx = modulus_ctx(qp.q)
    residual = modarith.sub_mod(
        ctx, modarith.mul_mod(ctx, a_evals, b_evals), c_evals
    )
    valid = jnp.all(residual == 0, axis=(0, 2))
    take = lambda x: jnp.take(x, rev, axis=-1)
    return take(q_rev), take(a_rev), take(b_rev), take(c_rev), valid
