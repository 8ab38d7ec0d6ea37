"""Sharded batched proving step over a (dp, sp) device mesh.

The multi-chip "training step" of this framework: proof batches shard over
``dp`` (data parallel), polynomial/ring coefficients over ``sp`` (the
sequence-parallel analog; SURVEY.md section 5). One jitted ``shard_map``
computes, per device:

    inputs  a/b/c evals (eval layout, dp x sp sharded)
    1. sharded inverse field-NTT        -> A_z/B_z/C_z coefficients
    2. psi-twist + sharded forward NTT  -> odd-coset evaluations
    3. pointwise (A.B - C) * (-2)^-1    -> quotient odd-evals
    4. sharded inverse + psi-untwist    -> Q coefficients
    5. validity: residual nonzero count -> lax.psum over 'sp'
    6. Module-LWE commitment: per-shard Gaussian (s, e), sharded
       negacyclic ring NTT, pointwise with sharded A-hat, inverse
    outputs Q, A_z/B_z/C_z, commitment words, (s, e), validity flags

Collective budget per step: 2 all_to_alls per sharded transform (10
transforms) + 1 psum — all riding ICI within the mesh. Requires the
quotient length m to equal the ring degree n (the production q45 profile:
m = n = 4096); smaller test shapes use m = n accordingly.

Bit-exactness: Q and the interpolated polynomials are asserted equal to the
single-device pipeline on a virtual CPU mesh; the commitment is re-verified
host-side from the returned (s, e) randomness (tests/test_pipeline_sharded.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import field
from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from ..commit.lwe import LweContext
from ..commit.lwe_jax import DeviceCommitContext
from ..ops import modarith, sampler_jax
from ..ops.limb import int_to_digits, modulus_ctx, to_limbs
from ..ops.ntt_jax import ntt_forward, ntt_inverse
from ..ops.ntt_large import FourStepPlan, four_step_plan
from ..pipeline import field_plan_for


def _a2a(x, ax):
    """all_to_all on element axes of (D, B, rows, C) local planes."""
    return lax.all_to_all(x, ax, split_axis=3, concat_axis=2, tiled=True)


def _fwd_local(fsp: FourStepPlan, x, tw_local, ax):
    """(D, B, R/N, C) coeff layout -> (D, B, R/N, C) eval layout."""
    ctx = fsp.plan_r.ctx
    col_t = jnp.swapaxes(_a2a(x, ax), 2, 3)  # (D, B, C/N, R)
    a_t = ntt_forward(fsp.plan_r, col_t)
    t_t = modarith.mul_mod(ctx, a_t, tw_local[:, None])
    rows_t = jnp.swapaxes(_a2a(t_t, ax), 2, 3)  # (D, B, R/N, C)
    return ntt_forward(fsp.plan_c, rows_t)


def _inv_local(fsp: FourStepPlan, f, tw_inv_local, ax):
    """(D, B, R/N, C) eval layout -> (D, B, R/N, C) coeff layout."""
    ctx = fsp.plan_r.ctx
    t = ntt_inverse(fsp.plan_c, f)
    t_t = jnp.swapaxes(_a2a(t, ax), 2, 3)
    a_t = modarith.mul_mod(ctx, t_t, tw_inv_local[:, None])
    x_t = ntt_inverse(fsp.plan_r, a_t)
    return jnp.swapaxes(_a2a(x_t, ax), 2, 3)


def _powers_planes(base: int, count: int, q: int, d: int) -> np.ndarray:
    vals = np.empty(count, dtype=object)
    acc = 1
    for i in range(count):
        vals[i] = acc
        acc = field.mul_mod(acc, base, q)
    return to_limbs(vals, d)


class ShardedProver:
    """Batched sharded prove step bound to a (dp, sp) mesh."""

    def __init__(self, m: int, q: int, host_ctx: LweContext, mesh: Mesh,
                 dp_axis: str = "dp", sp_axis: str = "sp") -> None:
        assert m == host_ctx.n, (
            f"sharded path requires m == ring degree (m={m}, n={host_ctx.n})"
        )
        self.m = m
        self.q = q
        self.host_ctx = host_ctx
        self.mesh = mesh
        self.dp = dp_axis
        self.sp = sp_axis
        n_sp = mesh.shape[sp_axis]

        # field-domain plans (cyclic four-step + negacyclic twists)
        fplan = field_plan_for(m, q)
        self.fq_ctx = fplan.ctx
        self.fsp_f = four_step_plan(m, q, fplan.omega)
        r, c = self.fsp_f.r, self.fsp_f.c
        assert r % n_sp == 0 and c % n_sp == 0
        psi = None
        # recover psi from the plan tables: psi = plan psi (host value)
        # field_plan_for built plan with negacyclic_psi; recompute here:
        from ..core.params import NTT_FRIENDLY_MODULUS, ROOTS_OF_UNITY_45BIT

        if q == NTT_FRIENDLY_MODULUS:
            psi = ROOTS_OF_UNITY_45BIT[2 * m]
        elif q == NTT_MODULUS:
            psi = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * m), q)
        assert psi is not None and field.mul_mod(psi, psi, q) == self.fsp_f.omega
        d_f = self.fq_ctx.d
        self.psi_f = _powers_planes(psi, m, q, d_f).reshape(d_f, r, c)
        self.psi_f_inv = _powers_planes(
            field.mod_inverse(psi, q), m, q, d_f
        ).reshape(d_f, r, c)
        self.tw_f = np.swapaxes(np.asarray(self.fsp_f.tw), 1, 2).copy()
        self.tw_f_inv = np.swapaxes(np.asarray(self.fsp_f.inverse.tw), 1, 2).copy()

        # ring-domain plans (Goldilocks)
        self.dctx = DeviceCommitContext.from_host(host_ctx)
        p = NTT_MODULUS
        self.p_ctx = modulus_ctx(p)
        n = host_ctx.n
        omega_r = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n, p)
        psi_r = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n), p)
        self.fsp_r = four_step_plan(n, p, omega_r)
        rr, rc = self.fsp_r.r, self.fsp_r.c
        assert rr % n_sp == 0 and rc % n_sp == 0
        d_p = self.p_ctx.d
        self.psi_r = _powers_planes(psi_r, n, p, d_p).reshape(d_p, rr, rc)
        self.psi_r_inv = _powers_planes(
            field.mod_inverse(psi_r, p), n, p, d_p
        ).reshape(d_p, rr, rc)
        self.tw_r = np.swapaxes(np.asarray(self.fsp_r.tw), 1, 2).copy()
        self.tw_r_inv = np.swapaxes(np.asarray(self.fsp_r.inverse.tw), 1, 2).copy()

        # A-hat in *sharded eval layout*: natural order -> (D, R, C) with
        # F[h, g] = A_hat[h + R*g]
        k = host_ctx.k
        a_hat_nat = np.stack(
            [to_limbs(host_ctx.a_hat[j], d_p) for j in range(k)]
        )  # (k, D, n)
        a_hat_eval = np.swapaxes(
            a_hat_nat.reshape(k, d_p, rc, rr), 2, 3
        ).copy()  # (k, D, R, C)
        self.a_hat_eval = a_hat_eval
        self.k = k
        self.cdf_hi, self.cdf_lo = self.dctx.cdf_hi, self.dctx.cdf_lo
        self.neg_half_inv = tuple(
            int_to_digits(field.mod_inverse(q - 2, q), d_f)
        )

        self._build_step()

    # -- device step ---------------------------------------------------------

    def _build_step(self):
        mesh = self.mesh
        dp, sp = self.dp, self.sp
        fsp_f, fsp_r = self.fsp_f, self.fsp_r
        fq_ctx, p_ctx = self.fq_ctx, self.p_ctx
        neg_half_inv = self.neg_half_inv
        k = self.k
        cdf_hi = jnp.asarray(self.cdf_hi)
        cdf_lo = jnp.asarray(self.cdf_lo)
        d_f, d_p = fq_ctx.d, p_ctx.d

        spec_bat = P(None, dp, sp, None)  # (D, B, rows, C)
        spec_tab = P(None, sp, None)  # (D, rows, C) tables
        spec_tw = P(None, sp, None)  # transposed twiddles (D, C, R): C sharded
        spec_ahat = P(None, None, sp, None)  # (k, D, R, C)
        spec_valid = P(dp, None)

        def step(a_e, b_e, c_e, tw_f, tw_f_inv, psi_f, psi_f_inv,
                 tw_r, tw_r_inv, psi_r, psi_r_inv, a_hat, key):
            sp_idx = lax.axis_index(sp)
            dp_idx = lax.axis_index(dp)
            # 1. interpolate (sharded inverse field NTT)
            a_poly = _inv_local(fsp_f, a_e, tw_f_inv, sp)
            b_poly = _inv_local(fsp_f, b_e, tw_f_inv, sp)
            c_poly = _inv_local(fsp_f, c_e, tw_f_inv, sp)
            # 2. odd-coset evals: psi-twist + sharded forward
            def neg_fwd(x):
                tw = psi_f[:, None]
                return _fwd_local(fsp_f, modarith.mul_mod(fq_ctx, x, tw), tw_f, sp)

            a_odd = neg_fwd(a_poly)
            b_odd = neg_fwd(b_poly)
            c_odd = neg_fwd(c_poly)
            # 3. quotient odd-evals
            n_odd = modarith.sub_mod(
                fq_ctx, modarith.mul_mod(fq_ctx, a_odd, b_odd), c_odd
            )
            q_odd = modarith.mul_mod_const(fq_ctx, n_odd, neg_half_inv)
            # 4. back to coefficients + untwist
            q_coeffs = modarith.mul_mod(
                fq_ctx, _inv_local(fsp_f, q_odd, tw_f_inv, sp), psi_f_inv[:, None]
            )
            # 5. validity: residual on the even coset, psum over sp
            residual = modarith.sub_mod(
                fq_ctx, modarith.mul_mod(fq_ctx, a_e, b_e), c_e
            )
            nonzero = jnp.sum(
                (residual != 0).astype(jnp.int32), axis=(0, 2, 3)
            )
            nonzero = lax.psum(nonzero, sp)
            valid = (nonzero == 0)[:, None]
            # 6. commitment: embed Q into the ring (digit-extend), commit
            pad = jnp.zeros((d_p - d_f,) + q_coeffs.shape[1:], dtype=jnp.uint32)
            msg = jnp.concatenate([q_coeffs, pad], axis=0)
            b_local = msg.shape[1]
            rows_local = msg.shape[2]
            cc = msg.shape[3]
            # mesh-invariant counter-mode randomness: the draw for
            # (stream, GLOBAL statement, GLOBAL coefficient) is independent
            # of (dp, sp), so commitment bytes equal the single-device
            # prover's on every mesh shape (test_pipeline_sharded.py)
            b_idx = (
                dp_idx * jnp.uint32(b_local)
                + jnp.arange(b_local, dtype=jnp.uint32)
            )
            pos = (
                sp_idx * jnp.uint32(rows_local * cc)
                + jnp.arange(rows_local * cc, dtype=jnp.uint32)
            ).reshape(rows_local, cc)
            acc = None
            s_sgn_all = []
            for j in range(k):
                s_planes, s_sgn = sampler_jax.sample_planes_global(
                    key[0], j, b_idx, pos, cdf_hi, cdf_lo, p_ctx
                )
                s_sgn_all.append(s_sgn)
                s_tw = modarith.mul_mod(p_ctx, s_planes, psi_r[:, None])
                s_hat = _fwd_local(fsp_r, s_tw, tw_r, sp)
                term = modarith.mul_mod(p_ctx, a_hat[j][:, None], s_hat)
                acc = term if acc is None else modarith.add_mod(p_ctx, acc, term)
            c_ring = modarith.mul_mod(
                p_ctx, _inv_local(fsp_r, acc, tw_r_inv, sp), psi_r_inv[:, None]
            )
            e_planes, e_sgn = sampler_jax.sample_planes_global(
                key[0], k, b_idx, pos, cdf_hi, cdf_lo, p_ctx
            )
            c_ring = modarith.add_mod(p_ctx, c_ring, e_planes)
            c_ring = modarith.add_mod(p_ctx, c_ring, msg)
            return (
                q_coeffs, a_poly, b_poly, c_poly, c_ring,
                jnp.stack(s_sgn_all), e_sgn, valid,
            )

        wrapped = shard_map(
            step,
            mesh=mesh,
            in_specs=(
                spec_bat, spec_bat, spec_bat,
                spec_tw, spec_tw, spec_tab, spec_tab,
                spec_tw, spec_tw, spec_tab, spec_tab,
                spec_ahat, P(None),
            ),
            out_specs=(
                spec_bat, spec_bat, spec_bat, spec_bat, spec_bat,
                P(None, dp, sp, None), P(dp, sp, None), spec_valid,
            ),
        )
        self._step = jax.jit(wrapped)

    # -- host-facing API -----------------------------------------------------

    def _put(self, arr, spec):
        return jax.device_put(jnp.asarray(arr), NamedSharding(self.mesh, spec))

    def natural_to_eval_layout(self, evals_planes: np.ndarray) -> np.ndarray:
        """Host: (D, B, m) natural-order evals -> (D, B, R, C) eval layout."""
        d, b, m = evals_planes.shape
        r, c = self.fsp_f.r, self.fsp_f.c
        return np.swapaxes(evals_planes.reshape(d, b, c, r), 2, 3).copy()

    def coeff_layout_to_flat(self, planes: np.ndarray) -> np.ndarray:
        d = planes.shape[0]
        b = planes.shape[1]
        return np.asarray(planes).reshape(d, b, self.m)

    def run(self, a_evals, b_evals, c_evals, seed: int):
        """a/b/c: (D, B, m) natural-order eval planes (host numpy)."""
        dp, sp = self.dp, self.sp
        spec_bat = P(None, dp, sp, None)
        spec_tab = P(None, sp, None)
        spec_tw = P(None, sp, None)
        spec_ahat = P(None, None, sp, None)
        args = (
            self._put(self.natural_to_eval_layout(a_evals), spec_bat),
            self._put(self.natural_to_eval_layout(b_evals), spec_bat),
            self._put(self.natural_to_eval_layout(c_evals), spec_bat),
            self._put(self.tw_f, spec_tw),
            self._put(self.tw_f_inv, spec_tw),
            self._put(self.psi_f, spec_tab),
            self._put(self.psi_f_inv, spec_tab),
            self._put(self.tw_r, spec_tw),
            self._put(self.tw_r_inv, spec_tw),
            self._put(self.psi_r, spec_tab),
            self._put(self.psi_r_inv, spec_tab),
            self._put(self.a_hat_eval, spec_ahat),
            self._put(
                jax.random.PRNGKey(seed & 0x7FFFFFFF)[None], P(None, None)
            ),
        )
        return self._step(*args)
