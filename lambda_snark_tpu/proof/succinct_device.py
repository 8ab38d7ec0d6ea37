"""Device front-end for batched succinct proving (Goldilocks).

Moves the host-side field math of ``succinct_batch._gl_batch_frontend``
(vectorized-NumPy interpolation, odd-coset quotient, offset twist and
Reed-Solomon padding — ~2 s at 16 statements of m = 2^13) onto the
accelerator as ONE jitted dispatch, feeding the device-resident FRI pipeline
(``proof/fri_device.py``) without any host round-trip of codeword data:

    (az, bz, cz) constraint evals --> [device] iNTT interpolation
        --> negacyclic forward (psi odd coset, Z_H === -2 there)
        --> quotient Q_hat = (A.B - C) / (-2), untwist
        --> pad to n0, multiply by offset powers, four-step forward NTT
    --> LDE codeword planes (stay on device), Q coefficients (host pull for
        the lattice commitment), polynomial planes (device, for evaluation)

A second tiny dispatch evaluates all four committed polynomials at the dual
Fiat-Shamir challenges (the polynomials never visit the host).

Bit-exactness: every stage is exact modular arithmetic on the same values as
the host path (``succinct._gl_quotient_and_interpolations`` mirrors
``r1cs/r1cs.py::_quotient_odd_coset``; reference semantics
``r1cs.rs:474-503``), so proof bytes are identical — pinned in
tests/test_succinct_batch.py.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from ..ops import modarith, ntt_jax
from ..ops.goldilocks_np import gl_inv, gl_pow
from ..ops.limb import from_limbs_u64, int_to_digits, modulus_ctx, u64_to_limbs
from ..ops.ntt_large import _forward as _four_step_forward
from ..ops.ntt_large import four_step_plan
from .fri import _gl_powers, root_of_order

P = NTT_MODULUS
_CTX = modulus_ctx(P)
_D = 4


def _plan_m(m: int) -> ntt_jax.NttPlan:
    """Cyclic+negacyclic plan matching ``goldilocks_np.GoldilocksNtt(m)``
    (same 2^32 primitive-root ladder, psi^2 = omega)."""
    omega = gl_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m)
    psi = gl_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * m))
    return ntt_jax.ntt_plan(m, P, omega, negacyclic_psi=psi)


_QF_CACHE: dict = {}


def _quotient_lde_fn(s: int, m: int, n0: int, offset: int,
                     commit_shape=None):
    """``commit_shape = (ring_n, k)`` additionally fuses the Module-LWE
    commitment of Q into the same dispatch (in-graph ChaCha-parity commit;
    the quotient never visits the host)."""
    key = (s, m, n0, offset, commit_shape)
    if key in _QF_CACHE:
        return _QF_CACHE[key]
    import jax
    import jax.numpy as jnp

    plan = _plan_m(m)
    fsp = four_step_plan(n0, P, root_of_order(P, n0))
    neg_half_inv = tuple(int_to_digits(gl_inv(P - 2), _D))
    tw = u64_to_limbs(_gl_powers(offset, n0), _D)  # (4, n0) offset powers
    if commit_shape is not None:
        from ..commit.lwe_jax import goldilocks_ring_plan

        ring_n, _k = commit_shape
        ring_plan = goldilocks_ring_plan(ring_n)

    def fn(abc_words, a_hat_planes=None, key_words=None, cdf_hi=None,
           cdf_lo=None):
        # abc_words: (2, S, 3, m) packed u64 words (lo32, hi32) of az/bz/cz
        # — half the upload bytes of digit planes; expand in-graph
        from . import fri_device

        m16 = jnp.uint32(0xFFFF)
        s16 = jnp.uint32(16)
        lo, hi = abc_words[0], abc_words[1]
        abc_planes = jnp.stack(
            [lo & m16, lo >> s16, hi & m16, hi >> s16]
        )
        polys = ntt_jax.ntt_inverse(plan, abc_planes)  # A_z/B_z/C_z coeffs
        odd = ntt_jax.ntt_forward_negacyclic(plan, polys)  # psi*<omega> coset
        a_odd, b_odd, c_odd = odd[:, :, 0], odd[:, :, 1], odd[:, :, 2]
        # Z_H === -2 on the odd coset: Q_hat = (A.B - C) / (-2)
        q_odd = modarith.mul_mod_const(
            _CTX,
            modarith.sub_mod(
                _CTX, modarith.mul_mod(_CTX, a_odd, b_odd), c_odd
            ),
            neg_half_inv,
        )
        # inverse + psi^-i untwist (n^-1 folded into the twist table)
        q_poly = ntt_jax.ntt_inverse_negacyclic(plan, q_odd)  # (4, S, m)
        all_polys = jnp.concatenate(
            [polys, q_poly[:, :, None, :]], axis=2
        )  # (4, S, 4, m): A, B, C, Q
        padded = jnp.zeros((_D, s, 4, n0), dtype=jnp.uint32)
        padded = padded.at[..., :m].set(all_polys)
        twisted = modarith.mul_mod(
            _CTX, padded, jnp.asarray(tw)[:, None, None, :]
        )
        lde = _four_step_forward(fsp, twisted.reshape(_D, s * 4, n0))
        # Merkle digest levels in the SAME dispatch (no extra barrier):
        # ONE interleaved tree per statement (wire-v3 group leaves)
        levels = fri_device._tree_levels_in_graph_groups(
            lde.reshape(_D, s, 4, n0), looped=True
        )
        if commit_shape is None:
            return lde, q_poly, all_polys, tuple(levels)
        from ..commit.lwe_jax import commit_in_graph_chacha

        msg = jnp.zeros((_D, s, ring_n), dtype=jnp.uint32)
        msg = msg.at[..., :m].set(q_poly)
        c = commit_in_graph_chacha(
            ring_plan, a_hat_planes, msg, key_words, _k, cdf_hi, cdf_lo
        )
        # ONE host pull for everything the transcript needs: the packed
        # c words (2, S, ring_n) and the S group-tree root words (8, S)
        c_words = jnp.stack(
            [c[0] | (c[1] << 16), c[2] | (c[3] << 16)]
        )
        host_pack = jnp.concatenate(
            [c_words.reshape(-1), levels[-1][..., 0].reshape(-1)]
        )
        return lde, host_pack, all_polys, tuple(levels)

    jitted = jax.jit(fn)
    _QF_CACHE[key] = jitted
    return jitted


def quotient_lde_device(
    az: np.ndarray, bz: np.ndarray, cz: np.ndarray, n0: int, offset: int,
    commit_ctx=None, seeds=None, defer_pull: bool = False,
) -> Tuple[object, np.ndarray, object]:
    """az/bz/cz: (S, m) uint64 canonical constraint evaluations.

    Returns ``(lde_planes, q_or_commits, polys_dev, forest)``:
    - ``lde_planes``: device (4, 4*S, n0) codeword planes in statement-major
      (A, B, C, Q) order — the exact layout ``lde_batch_device_planes``
      produced for ``fri_device.commit_planes_dev``,
    - ``q_or_commits``: without ``commit_ctx``, the host (S, m) uint64
      quotient coefficients (for a host lattice commitment). With
      ``commit_ctx`` (an ``LweContext``) + ``seeds``, the Module-LWE
      commitment is FUSED into the same dispatch (randomness from the
      ChaCha host-parity suite, ring products on device) and this is the
      list of ``Commitment``s instead — the quotient never visits the host
      and the pull halves (c words instead of q digit planes),
    - ``polys_dev``: device (4, S, 4, m) coefficient planes for
      ``eval_device``,
    - ``forest``: DevForest of the S interleaved-group Merkle trees (one
      per statement; levels computed in the same dispatch).
    """
    import jax.numpy as jnp

    from . import fri_device

    s, m = az.shape
    abc = np.stack([az, bz, cz], axis=1)  # (S, 3, m)
    words = jnp.asarray(
        np.stack(
            [
                (abc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (abc >> np.uint64(32)).astype(np.uint32),
            ]
        )
    )
    if commit_ctx is None:
        lde, q_poly_planes, polys_dev, levels = _quotient_lde_fn(
            s, m, n0, offset
        )(words)
        q_poly = from_limbs_u64(np.asarray(q_poly_planes))
        return lde, q_poly, polys_dev, fri_device.forest_from_levels(levels)

    from ..commit import lwe as lwe_mod
    from ..commit.lwe_jax import a_hat_planes_for
    from ..ops import sampler_jax

    keys = lwe_mod.randomness_keys(commit_ctx, list(seeds))
    cdf_hi, cdf_lo = sampler_jax.cdf_split(commit_ctx.cdf)
    fn = _quotient_lde_fn(
        s, m, n0, offset, commit_shape=(commit_ctx.n, commit_ctx.k)
    )
    lde, host_pack, polys_dev, levels = fn(
        words,
        jnp.asarray(a_hat_planes_for(commit_ctx)),
        jnp.asarray(keys),
        jnp.asarray(cdf_hi),
        jnp.asarray(cdf_lo),
    )
    deferred = (host_pack, s, commit_ctx.n, levels)
    if defer_pull:
        # pipelined callers pull later (overlapping other chunks' compute)
        return lde, deferred, polys_dev, None
    commitments, forest = finish_quotient_lde(deferred)
    return lde, commitments, polys_dev, forest


def finish_quotient_lde(deferred):
    """Pull the packed (c words ‖ root words) array and build the host
    Commitments + DevForest for a ``defer_pull=True`` dispatch."""
    from ..commit import lwe as lwe_mod
    from . import fri_device

    host_pack, s, n_ring, levels = deferred
    hp = np.asarray(host_pack)  # one pull: c words + root words
    cw = hp[: 2 * s * n_ring].reshape(2, s, n_ring)
    root_words = hp[2 * s * n_ring:].reshape(8, s)
    c_u64 = cw[0].astype(np.uint64) | (cw[1].astype(np.uint64) << np.uint64(32))
    commitments = [lwe_mod.Commitment(c_u64[i]) for i in range(s)]
    forest = fri_device.forest_from_levels(levels, root_words=root_words)
    return commitments, forest


_EVAL_CACHE: dict = {}


def _eval_fn(s: int, m: int):
    key = (s, m)
    if key in _EVAL_CACHE:
        return _EVAL_CACHE[key]
    import jax
    import jax.numpy as jnp

    def fn(polys, x4):  # polys (4, S, 4, m); x4 (4, S, 2) challenge planes
        # cpu_fusion_barrier per ladder/reduction step: each `pows`/`terms`
        # feeds two consumers, so XLA:CPU would re-execute the whole
        # upstream digit chain per tree level (~m-fold blowup; a m=2^6
        # eval ran >5 min). No-op on TPU.
        pows = jnp.zeros((_D, s, 2, 1), dtype=jnp.uint32).at[0].set(1)
        cur = x4[:, :, :, None]
        step = 1
        while step < m:
            k = min(step, m - step)
            nxt = modarith.mul_mod(_CTX, pows[..., :k], cur)
            pows = modarith.cpu_fusion_barrier(
                jnp.concatenate([pows, nxt], axis=-1)
            )
            if 2 * step < m:
                cur = modarith.cpu_fusion_barrier(
                    modarith.mul_mod(_CTX, cur, cur)
                )
            step <<= 1
        terms = modarith.mul_mod(
            _CTX, polys[:, :, :, None, :], pows[:, :, None, :, :]
        )  # (4, S, 4, 2, m)
        while terms.shape[-1] > 1:
            terms = modarith.cpu_fusion_barrier(
                modarith.add_mod(_CTX, terms[..., 0::2], terms[..., 1::2])
            )
        return terms[..., 0]  # (4, S, 4, 2)

    jitted = jax.jit(fn)
    _EVAL_CACHE[key] = jitted
    return jitted


def eval_device(polys_dev, alphas: np.ndarray, betas: np.ndarray) -> np.ndarray:
    """Evaluate the committed polynomials at the dual challenges on device.

    Returns (S, 8) uint64 in the wire order (A,B,C,Q at alpha then beta) —
    value-identical to ``succinct_batch._gl_eval_batch`` (exact mod
    arithmetic; summation order cannot change the result).
    """
    _four, s, _k, m = polys_dev.shape
    pts = np.stack([alphas, betas], axis=1)  # (S, 2)
    x4 = u64_to_limbs(pts, _D)
    import jax.numpy as jnp

    out = _eval_fn(s, m)(polys_dev, jnp.asarray(x4))  # (4, S, 4, 2)
    vals = from_limbs_u64(np.asarray(out))  # (S, 4, 2)
    evals = np.empty((s, 8), dtype=np.uint64)
    evals[:, 0:4] = vals[:, :, 0]
    evals[:, 4:8] = vals[:, :, 1]
    return evals
