"""Device-side vectorized discrete Gaussian sampler (CDT, counter-based PRNG).

Consumes the same CDT table as the host sampler (``ops.gaussian`` —
construction per reference ``cpp-core/src/utils.cpp:23-100``): per sample,
one uniform u64 selects the magnitude (count of CDF entries strictly below
u), an independent bit selects the sign, zero is never negated.

Randomness suites:
- host suite ("chacha"): ChaCha20 keyed from the commit seed — used for
  host-side commitments and reproducible artifacts,
- device suite ("threefry"): ``jax.random`` bits — used for the batched
  device path. Both are deterministic given the seed; the suite is part of
  the commitment context (see ``commit.lwe_jax``).

u64 values are handled as (hi, lo) uint32 pairs — no 64-bit types on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import modarith
from .limb import ModulusCtx


def cdf_split(cdf: np.ndarray):
    """Host: u64 CDF table -> (hi, lo) uint32 arrays."""
    hi = (cdf >> np.uint64(32)).astype(np.uint32)
    lo = (cdf & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


def magnitudes_from_bits(u_hi, u_lo, cdf_hi, cdf_lo):
    """Count CDF entries strictly below u (lexicographic u64 compare).

    u_*: (...,) uint32; cdf_*: (T,) uint32 constants. Returns (...) int32.
    """
    uh = u_hi[..., None]
    ul = u_lo[..., None]
    less = (cdf_hi[None, :] < uh) | ((cdf_hi[None, :] == uh) & (cdf_lo[None, :] < ul))
    return less.sum(axis=-1).astype(jnp.int32)


def sample_planes(
    key: jax.Array,
    shape,
    cdf_hi: np.ndarray,
    cdf_lo: np.ndarray,
    ctx: ModulusCtx,
):
    """Sample ``shape`` Gaussian values embedded into Z_q digit planes.

    Returns (planes (D, *shape) uint32, signed magnitudes (int32, *shape)).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    u_hi = jax.random.bits(k1, shape, dtype=jnp.uint32)
    u_lo = jax.random.bits(k2, shape, dtype=jnp.uint32)
    sign = jax.random.bits(k3, shape, dtype=jnp.uint32) & jnp.uint32(1)
    mags = magnitudes_from_bits(u_hi, u_lo, jnp.asarray(cdf_hi), jnp.asarray(cdf_lo))
    # magnitude planes: digit 0 = mag (< 2^16), rest zero
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    mag_planes = jnp.stack([mags.astype(jnp.uint32)] + [zero] * (ctx.d - 1))
    neg_planes = modarith.sub_mod(ctx, jnp.stack([zero] * ctx.d), mag_planes)
    flip = ((sign == 1) & (mags != 0))[None, ...]
    planes = jnp.where(flip, neg_planes, mag_planes)
    signed = jnp.where((sign == 1) & (mags != 0), -mags, mags)
    return planes, signed


def _signed_to_planes(mags, sign, shape, ctx: ModulusCtx):
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    mag_planes = jnp.stack([mags.astype(jnp.uint32)] + [zero] * (ctx.d - 1))
    neg_planes = modarith.sub_mod(ctx, jnp.stack([zero] * ctx.d), mag_planes)
    flip = ((sign == 1) & (mags != 0))[None, ...]
    planes = jnp.where(flip, neg_planes, mag_planes)
    signed = jnp.where((sign == 1) & (mags != 0), -mags, mags)
    return planes, signed


def sample_planes_global(
    key: jax.Array,
    stream: int,
    b_global,
    positions,
    cdf_hi: np.ndarray,
    cdf_lo: np.ndarray,
    ctx: ModulusCtx,
):
    """Mesh-invariant counter-mode sampling.

    The draw for (stream j, statement b, ring position t) depends ONLY on
    (key, j, b, t) — never on how statements or coefficients are sharded —
    so commitment bytes are identical on a single chip and on every
    (dp, sp) mesh shape (the deterministic-artifacts invariant extended to
    the device suite; asserted in tests/test_pipeline_sharded.py).

    b_global: (B,) int32 global statement indices. positions: int32 array
    of any shape (global coefficient positions). Returns
    (planes (D, B, *positions.shape) uint32, signed (int32, same)).
    """
    pos_flat = positions.reshape(-1)
    kj = jax.random.fold_in(key, stream)
    kb = jax.vmap(lambda bi: jax.random.fold_in(kj, bi))(b_global)

    def per_statement(kb1):
        kt = jax.vmap(lambda t: jax.random.fold_in(kb1, t))(pos_flat)
        return jax.vmap(lambda kk: jax.random.bits(kk, (3,), jnp.uint32))(kt)

    bits = jax.vmap(per_statement)(kb)  # (B, L, 3)
    shape = (b_global.shape[0],) + positions.shape
    u_hi = bits[..., 0].reshape(shape)
    u_lo = bits[..., 1].reshape(shape)
    sign = (bits[..., 2] & jnp.uint32(1)).reshape(shape)
    mags = magnitudes_from_bits(
        u_hi, u_lo, jnp.asarray(cdf_hi), jnp.asarray(cdf_lo)
    )
    return _signed_to_planes(mags, sign, shape, ctx)
