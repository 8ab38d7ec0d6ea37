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


# --- in-graph ChaCha host-parity suite ---------------------------------------
#
# The host commitment suite draws its Gaussian randomness from per-seed
# ChaCha20 streams (``utils.chacha``). Here the SAME streams generate on
# device — the dispatch uploads only the 32-byte keys — with draw-for-draw
# parity (pinned in tests/test_commitment.py): ChaCha20 is pure uint32
# arithmetic, ideal VPU work.


def _chacha_quarter(x, a, b, c, d):
    x[a] = x[a] + x[b]
    x[d] = x[d] ^ x[a]
    x[d] = (x[d] << jnp.uint32(16)) | (x[d] >> jnp.uint32(16))
    x[c] = x[c] + x[d]
    x[b] = x[b] ^ x[c]
    x[b] = (x[b] << jnp.uint32(12)) | (x[b] >> jnp.uint32(20))
    x[a] = x[a] + x[b]
    x[d] = x[d] ^ x[a]
    x[d] = (x[d] << jnp.uint32(8)) | (x[d] >> jnp.uint32(24))
    x[c] = x[c] + x[d]
    x[b] = x[b] ^ x[c]
    x[b] = (x[b] << jnp.uint32(7)) | (x[b] >> jnp.uint32(25))


def chacha20_blocks_in_graph(key_words, nblocks: int):
    """ChaCha20 keystream blocks on device (DJB variant, zero nonce,
    counters 0..nblocks-1 — the ``ChaCha20Rng`` stream layout).

    key_words: (S, 8) uint32. Returns (S, nblocks, 16) uint32, row (s, b)
    identical to ``utils.chacha.chacha20_block(key_s, b, [0, 0])``.
    """
    s = key_words.shape[0]
    ctr = jnp.arange(nblocks, dtype=jnp.uint32)
    state = [None] * 16
    consts = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
    zero = jnp.zeros((s, nblocks), dtype=jnp.uint32)
    for i in range(4):
        state[i] = zero + jnp.uint32(consts[i])
    for i in range(8):
        state[4 + i] = jnp.broadcast_to(
            key_words[:, i, None], (s, nblocks)
        )
    state[12] = jnp.broadcast_to(ctr[None, :], (s, nblocks))
    state[13] = zero  # 64-bit counter high word (streams stay < 2^32 blocks)
    state[14] = zero
    state[15] = zero
    x = list(state)
    for _ in range(10):
        _chacha_quarter(x, 0, 4, 8, 12)
        _chacha_quarter(x, 1, 5, 9, 13)
        _chacha_quarter(x, 2, 6, 10, 14)
        _chacha_quarter(x, 3, 7, 11, 15)
        _chacha_quarter(x, 0, 5, 10, 15)
        _chacha_quarter(x, 1, 6, 11, 12)
        _chacha_quarter(x, 2, 7, 8, 13)
        _chacha_quarter(x, 3, 4, 9, 14)
        # XLA:CPU re-executes producer fusions per consumer; every state
        # word here feeds several downstream ops, so the unrolled 20-round
        # DAG blows up combinatorially on the CPU backend (a fused m=2^6
        # commit ran >6 min). Cut fusion once per double round (no-op on
        # TPU, where this chain is exactly what we want fused).
        x = list(modarith.cpu_fusion_barrier(tuple(x)))
    words = [xi + si for xi, si in zip(x, state)]
    return jnp.stack(words, axis=-1)  # (S, nblocks, 16)


def sample_chacha_planes_in_graph(
    key_words, k: int, n: int, cdf_hi, cdf_lo, ctx: ModulusCtx
):
    """The (s_1..s_k, e) Gaussian draws of ``lwe.randomness_batch`` computed
    in-graph: per statement, one ChaCha20 stream supplies (k+1) rows of 2n
    u64 draws (value, sign interleaved) exactly like the host suite.

    Returns (s_planes (D, S, k, n), e_planes (D, S, n)) — canonical Z_p
    digit planes, bit-identical to the host ``_randomness`` embedding.
    """
    s = key_words.shape[0]
    total_words = (k + 1) * 4 * n
    assert total_words % 16 == 0
    blocks = chacha20_blocks_in_graph(key_words, total_words // 16)
    w = blocks.reshape(s, k + 1, 4 * n)
    # u64 draw j = words[2j] | words[2j+1] << 32; draws alternate
    # (value, sign): value j -> words (4j, 4j+1); sign j -> word 4j+2 bit 0
    u_lo = w[..., 0::4]
    u_hi = w[..., 1::4]
    sign = w[..., 2::4] & jnp.uint32(1)
    mags = magnitudes_from_bits(
        u_hi, u_lo, jnp.asarray(cdf_hi), jnp.asarray(cdf_lo)
    )  # (S, k+1, n)
    planes, _signed = _signed_to_planes(mags, sign, (s, k + 1, n), ctx)
    return planes[:, :, :k], planes[:, :, k]
