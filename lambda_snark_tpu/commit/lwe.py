"""Deterministic Module-LWE commitments over the Goldilocks ring.

Replaces the reference's SEAL-BFV "commitment by encryption"
(``cpp-core/src/commitment.cpp:31-278``) with an explicit, seed-deterministic
Module-LWE construction — the north-star design the reference could not give
(SEAL ignores the seed and draws fresh encryption randomness,
``commitment.cpp:142``):

    R   = Z_p[X] / (X^n + 1),  p = Goldilocks 2^64 - 2^32 + 1
    A_j = SHAKE256("LSNARK-TPU/A" || ctx_seed || j) expanded mod p, j < k
    s_j, e  <- discrete Gaussian(sigma) derived from the commit seed
    c   = sum_j A_j * s_j + e + m         (all in R)

Design notes:
- The ring modulus p is *independent* of the field modulus q, exactly as the
  reference's SEAL context uses its own coefficient/plain modulus rather than
  the user q (``commitment.cpp:108-111``; SURVEY section 3.4 note). Unlike
  SEAL's 20-bit batching plain modulus, Goldilocks embeds every reference
  field element injectively (q < p for all six reference moduli), so the
  commitment binds the full message.
- Commitment words are the n coefficients of c (canonical u64), hashed into
  the Fiat-Shamir transcript exactly like the reference hashes SEAL blob
  words (``challenge.rs:119-125``).
- Opening = (message, seed) or explicit (message, s, e) with an infinity-norm
  bound; verification recomputes c. This replaces the reference's stubbed
  openings (``lib.rs:788-791``) with a real check while keeping the verifier
  equations unchanged.
- ``linear_combine`` is homomorphic over R (coefficients taken mod p),
  mirroring ``lwe_linear_combine`` (``commitment.cpp:234-276``).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import List, Optional, Sequence

import numpy as np

from ..core.errors import CommitmentError, InvalidInputError
from ..core.params import Params
from ..ops import gaussian
from ..ops.goldilocks_np import GOLDILOCKS, gl_add, gl_mul, goldilocks_ntt
from ..utils.chacha import ChaCha20Rng

RING_MODULUS = GOLDILOCKS

_DOMAIN_A = b"LSNARK-TPU/A/v1"
_DOMAIN_RAND = b"LSNARK-TPU/rand/v1"

#: Infinity-norm acceptance bound for fresh Gaussian openings, matching the
#: sampler's tail cutoff (ceil(12 sigma); ``utils.cpp:23``).
def _fresh_norm_bound(sigma: float) -> int:
    import math

    return max(8, math.ceil(gaussian.TAIL_CUTOFF * sigma))


def _shake_words_mod_p(tag: bytes, seed_bytes: bytes, count: int) -> np.ndarray:
    """Uniform words mod p via SHAKE256 with rejection sampling.

    One XOF stream (SHAKE output is a prefix-consistent byte stream): read
    consecutive LE u64 words, reject w >= p (p > 2^63 so the acceptance rate
    is 1 - ~2^-32), stop after ``count`` accepted words. The native C++
    implementation (``native/src/commitment.cpp``) consumes the identical
    stream, giving bit-identical expanded matrices.
    """
    xof = hashlib.shake_256(tag + seed_bytes)
    out = np.empty(count, dtype=np.uint64)
    filled = 0
    length = 8 * count + 64
    offset = 0
    stream = xof.digest(length)
    while filled < count:
        if offset + 8 > len(stream):
            length *= 2
            stream = xof.digest(length)  # prefix-consistent re-squeeze
        w = int.from_bytes(stream[offset : offset + 8], "little")
        offset += 8
        if w < RING_MODULUS:
            out[filled] = w
            filled += 1
    return out


class LweContext:
    """Public commitment context: ring parameters + expanded matrix A.

    Analog of ``lwe_context_create`` (``commitment.cpp:102-132``) minus the
    secret key — this construction is publicly verifiable, openings carry the
    randomness instead of requiring decryption.
    """

    def __init__(self, params: Params, context_seed: int = 0) -> None:
        params.validate()
        profile = params.profile
        if profile.kind != "ring_b":
            raise InvalidInputError("LweContext requires a RingB profile")
        self.params = params
        self.n = profile.n
        self.k = profile.k
        self.q = profile.q  # field modulus (message space pre-reduction)
        self.sigma = profile.sigma
        self.context_seed = context_seed
        self.ntt = goldilocks_ntt(self.n)
        seed_bytes = context_seed.to_bytes(8, "little")
        # A_j in NTT (negacyclic evaluation) domain, shape (k, n)
        self.a_hat = np.stack(
            [
                self.ntt.forward_negacyclic(
                    _shake_words_mod_p(
                        _DOMAIN_A, seed_bytes + j.to_bytes(8, "little"), self.n
                    )
                )
                for j in range(self.k)
            ]
        )
        self.cdf = gaussian.build_cdf(self.sigma)

    @property
    def modulus(self) -> int:
        return self.q

    def _randomness(self, seed: int):
        """Derive (s, e) from the commit seed: shape (k, n) and (n,)."""
        key = hashlib.sha3_256(
            _DOMAIN_RAND
            + self.context_seed.to_bytes(8, "little")
            + (seed & ((1 << 64) - 1)).to_bytes(8, "little")
        ).digest()
        rng = ChaCha20Rng(key)
        s = np.stack(
            [
                gaussian.sample_signed_vectorized(rng, self.cdf, self.n)
                for _ in range(self.k)
            ]
        )
        e = gaussian.sample_signed_vectorized(rng, self.cdf, self.n)
        return s, e


def _signed_to_ring(v: np.ndarray) -> np.ndarray:
    """Map small signed int64 values into canonical Z_p."""
    neg = v < 0
    out = v.astype(np.int64).astype(np.uint64)
    return np.where(neg, out + np.uint64(RING_MODULUS), v.astype(np.uint64))


@dataclasses.dataclass(frozen=True)
class Opening:
    """Commitment opening: message (mod p) + randomness (s, e) as signed ints.

    ``seed`` is carried when the randomness is seed-derived, enabling the
    compact (message, seed) wire form.
    """

    message: np.ndarray  # (n,) uint64, canonical mod p
    s: np.ndarray  # (k, n) int64
    e: np.ndarray  # (n,) int64
    norm_bound: int
    seed: Optional[int] = None

    def norm_ok(self) -> bool:
        return (
            int(np.abs(self.s).max(initial=0)) <= self.norm_bound
            and int(np.abs(self.e).max(initial=0)) <= self.norm_bound
        )


class Commitment:
    """A ring element c with canonical u64 coefficient words."""

    __slots__ = ("words",)

    def __init__(self, words: np.ndarray) -> None:
        self.words = np.asarray(words, dtype=np.uint64)

    def as_words(self) -> List[int]:
        """u64 words for the Fiat-Shamir transcript (``Commitment::as_bytes``)."""
        return [int(w) for w in self.words]

    def to_bytes(self) -> bytes:
        return b"".join(int(w).to_bytes(8, "little") for w in self.words)

    @staticmethod
    def from_bytes(data: bytes) -> "Commitment":
        if len(data) % 8 != 0:
            raise InvalidInputError("commitment byte length must be a multiple of 8")
        words = np.frombuffer(data, dtype="<u8").astype(np.uint64)
        return Commitment(words)

    def digest(self) -> bytes:
        return hashlib.sha3_256(self.to_bytes()).digest()

    def __eq__(self, other) -> bool:
        return isinstance(other, Commitment) and np.array_equal(self.words, other.words)


def _encode_message(ctx: LweContext, message: Sequence[int]) -> np.ndarray:
    """Reduce mod field q, embed mod p, zero-pad to ring degree."""
    if len(message) > ctx.n:
        raise CommitmentError(
            f"message length {len(message)} exceeds ring degree {ctx.n}"
        )
    m = np.zeros(ctx.n, dtype=np.uint64)
    q = ctx.q
    if isinstance(message, np.ndarray) and message.dtype == np.uint64:
        m[: len(message)] = message % np.uint64(q)  # < q < p: injective
    else:
        for i, v in enumerate(message):
            m[i] = int(v) % q  # < q < p: injective embedding
    return m


def commit(ctx: LweContext, message: Sequence[int], seed: int):
    """Commit to a message vector; returns (Commitment, Opening).

    Deterministic in (ctx.context_seed, message, seed). Analog of
    ``lwe_commit`` (``commitment.cpp:138-164``) with the seed honored.
    """
    m = _encode_message(ctx, message)
    s, e = ctx._randomness(seed)
    ntt = ctx.ntt
    acc = np.zeros(ctx.n, dtype=np.uint64)
    for j in range(ctx.k):
        s_hat = ntt.forward_negacyclic(_signed_to_ring(s[j]))
        acc = gl_add(acc, gl_mul(ctx.a_hat[j], s_hat))
    c = ntt.inverse_negacyclic(acc)
    c = gl_add(c, _signed_to_ring(e))
    c = gl_add(c, m)
    opening = Opening(
        message=m, s=s, e=e, norm_bound=_fresh_norm_bound(ctx.sigma), seed=seed
    )
    return Commitment(c), opening


def commit_batch(ctx: LweContext, messages: Sequence[Sequence[int]], seeds: Sequence[int]):
    """Batch ``commit``: one vectorized ring pipeline for S statements.

    Value-identical to ``commit(ctx, messages[i], seeds[i])`` per statement
    (the randomness streams are per-seed by construction; the ring NTTs
    vectorize over the statement axis — exact mod-p arithmetic).
    Returns (list[Commitment], list[Opening]).
    """
    if len(messages) != len(seeds):
        raise InvalidInputError("messages/seeds length mismatch")
    s_count = len(messages)
    if s_count == 0:
        return [], []
    m = np.stack([_encode_message(ctx, msg) for msg in messages])  # (S, n)
    ss, es = randomness_batch(ctx, list(seeds))  # draw-identical per seed
    ntt = ctx.ntt
    acc = np.zeros((s_count, ctx.n), dtype=np.uint64)
    for j in range(ctx.k):
        s_hat = ntt.forward_negacyclic(_signed_to_ring(ss[:, j]))  # (S, n)
        acc = gl_add(acc, gl_mul(ctx.a_hat[j][None, :], s_hat))
    c = ntt.inverse_negacyclic(acc)
    c = gl_add(c, _signed_to_ring(es))
    c = gl_add(c, m)
    bound = _fresh_norm_bound(ctx.sigma)
    commitments = [Commitment(c[i]) for i in range(s_count)]
    openings = [
        Opening(message=m[i], s=ss[i], e=es[i], norm_bound=bound, seed=seeds[i])
        for i in range(s_count)
    ]
    return commitments, openings


def verify_opening(ctx: LweContext, commitment: Commitment, opening: Opening) -> bool:
    """Recompute c from the opening and compare; check the norm bound.

    Replaces the reference's decrypt-and-compare (``commitment.cpp:200-232``)
    with a public recomputation.
    """
    if not opening.norm_ok():
        return False
    if opening.s.shape != (ctx.k, ctx.n) or opening.e.shape != (ctx.n,):
        return False
    ntt = ctx.ntt
    acc = np.zeros(ctx.n, dtype=np.uint64)
    for j in range(ctx.k):
        s_hat = ntt.forward_negacyclic(_signed_to_ring(opening.s[j]))
        acc = gl_add(acc, gl_mul(ctx.a_hat[j], s_hat))
    c = ntt.inverse_negacyclic(acc)
    c = gl_add(c, _signed_to_ring(opening.e))
    c = gl_add(c, np.asarray(opening.message, dtype=np.uint64))
    return bool(np.array_equal(c, commitment.words))


def linear_combine(
    ctx: LweContext,
    commitments: Sequence[Commitment],
    coeffs: Sequence[int],
    openings: Optional[Sequence[Opening]] = None,
):
    """Homomorphic linear combination sum gamma_i * c_i over R.

    Coefficients are reduced mod p. When openings are provided, the combined
    opening (messages and randomness combined the same way) is returned too —
    note randomness norms grow with |gamma|, so combined openings only verify
    for small-coefficient combinations; the protocol layer uses commitment
    combination for transcript binding, not norm-critical openings.
    Reference semantics: ``lwe_linear_combine`` (``commitment.cpp:234-276``).
    """
    if not commitments:
        raise InvalidInputError("no commitments provided")
    if len(commitments) != len(coeffs):
        raise InvalidInputError("commitments/coeffs length mismatch")
    acc = np.zeros(ctx.n, dtype=np.uint64)
    for cm, g in zip(commitments, coeffs):
        gp = np.uint64(int(g) % RING_MODULUS)
        acc = gl_add(acc, gl_mul(cm.words, gp))
    combined = Commitment(acc)
    if openings is None:
        return combined
    m_acc = np.zeros(ctx.n, dtype=np.uint64)
    s_acc = np.zeros((ctx.k, ctx.n), dtype=np.int64)
    e_acc = np.zeros(ctx.n, dtype=np.int64)
    bound = 0
    for op, g in zip(openings, coeffs):
        gp = np.uint64(int(g) % RING_MODULUS)
        m_acc = gl_add(m_acc, gl_mul(np.asarray(op.message, np.uint64), gp))
        gi = int(g) % RING_MODULUS
        gi_signed = gi if gi <= RING_MODULUS // 2 else gi - RING_MODULUS
        if abs(gi_signed) > (1 << 31):
            raise CommitmentError(
                "opening combination only supported for small coefficients "
                f"(|gamma| <= 2^31), got {gi_signed}"
            )
        s_acc = s_acc + op.s * gi_signed
        e_acc = e_acc + op.e * gi_signed
        bound += op.norm_bound * abs(gi_signed)
    combined_opening = Opening(message=m_acc, s=s_acc, e=e_acc, norm_bound=bound)
    return combined, combined_opening


def randomness_keys(ctx: LweContext, seeds: Sequence[int]) -> np.ndarray:
    """(S, 8) uint32 ChaCha key words for the per-seed randomness streams
    (the SHA3 key derivation of ``_randomness``)."""
    keys = np.empty((len(seeds), 8), dtype=np.uint32)
    for i, seed in enumerate(seeds):
        key = hashlib.sha3_256(
            _DOMAIN_RAND
            + ctx.context_seed.to_bytes(8, "little")
            + (int(seed) & ((1 << 64) - 1)).to_bytes(8, "little")
        ).digest()
        keys[i] = np.frombuffer(key, dtype="<u4")
    return keys


def randomness_batch(ctx: LweContext, seeds: Sequence[int]):
    """Vectorized ``ctx._randomness`` over many seeds.

    Draw-for-draw identical per statement (pinned in tests/test_lwe.py):
    each seed keys its own ChaCha20 stream, and every fill in
    ``_randomness`` is an exact multiple of 16 keystream words, so the
    multi-key block generator reproduces the streams exactly.
    Returns (ss (S, k, n) int64, es (S, n) int64).
    """
    from ..utils.chacha import chacha20_blocks_keys_np

    s_count = len(seeds)
    n, k = ctx.n, ctx.k
    keys = randomness_keys(ctx, seeds)
    words_per_row = 4 * n  # 2n u64 draws
    total_words = (k + 1) * words_per_row
    assert total_words % 16 == 0
    blocks = chacha20_blocks_keys_np(keys, 0, [0, 0], total_words // 16)
    w = blocks.reshape(s_count, total_words).astype(np.uint64)
    u64s = w[:, 0::2] | (w[:, 1::2] << np.uint64(32))  # (S, (k+1)*2n)
    rows = u64s.reshape(s_count, k + 1, 2 * n)
    us = rows[:, :, 0::2]
    signs = rows[:, :, 1::2] & np.uint64(1)
    cdf = ctx.cdf
    mags = (cdf[None, None, None, :] < us[..., None]).sum(axis=-1).astype(
        np.int64
    )
    flip = (signs.astype(np.int64) == 1) & (mags != 0)
    signed = np.where(flip, -mags, mags)  # (S, k+1, n)
    return signed[:, :k], signed[:, k]
