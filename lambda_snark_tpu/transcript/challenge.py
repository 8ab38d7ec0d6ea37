"""Deterministic Fiat-Shamir transcript (SHA3-256).

Byte-exact reimplementation of the reference transcript layout
(``rust-api/lambda-snark/src/challenge.rs:102-134``):

    tau = b"LAMBDA-SNARK-R-FS-v1"
        || LE64(len(public_inputs)) || LE64(public_inputs[i])...
        || LE64(len(commitment_words)) || LE64(commitment_words[i])...
    h   = SHA3-256(tau)
    alpha = LE64(h[0..8]) mod q

The reference docs claim SHAKE256 (``README.md:44``) but the code is SHA3-256;
we follow the code. The dual-challenge schedule (alpha from public inputs,
beta from [alpha]) lives in the prover/verifier, reference ``lib.rs:762-767``.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Sequence

import numpy as np

DOMAIN_TAG = b"LAMBDA-SNARK-R-FS-v1"
MASK64 = (1 << 64) - 1


def _words_le_bytes(words: Sequence[int]) -> bytes:
    """len-prefixed LE u64 packing, vectorized for numpy word arrays."""
    prefix = (len(words) & MASK64).to_bytes(8, "little")
    if isinstance(words, np.ndarray) and words.dtype == np.uint64:
        return prefix + words.astype("<u8").tobytes()
    if len(words) > 64:
        arr = np.fromiter(
            ((int(w) & MASK64) for w in words), dtype=np.uint64, count=len(words)
        )
        return prefix + arr.astype("<u8").tobytes()
    return prefix + b"".join(
        (int(w) & MASK64).to_bytes(8, "little") for w in words
    )


@dataclasses.dataclass(frozen=True)
class Challenge:
    """Challenge point alpha in F_q plus the 32-byte derivation hash."""

    alpha: int
    hash: bytes

    @staticmethod
    def derive(
        public_inputs: Sequence[int], commitment_words: Sequence[int], modulus: int
    ) -> "Challenge":
        h = hashlib.sha3_256()
        h.update(DOMAIN_TAG)
        h.update(_words_le_bytes(public_inputs))
        h.update(_words_le_bytes(commitment_words))
        digest = h.digest()
        alpha = int.from_bytes(digest[0:8], "little") % modulus
        return Challenge(alpha=alpha, hash=digest)

    def to_bytes(self) -> bytes:
        return self.alpha.to_bytes(8, "little") + self.hash

    @staticmethod
    def from_bytes(data: bytes) -> "Challenge":
        if len(data) != 40:
            raise ValueError(f"challenge encoding must be 40 bytes, got {len(data)}")
        return Challenge(alpha=int.from_bytes(data[0:8], "little"), hash=data[8:40])


def derive_dual(
    public_inputs: Sequence[int], commitment_words: Sequence[int], modulus: int
):
    """Derive the (alpha, beta) challenge pair.

    alpha = H(public || comm); beta = H([alpha] || comm)
    Reference ``lib.rs:758-767`` — the second transcript hashes the single-
    element public-input list ``[alpha]`` with the same commitment words.
    """
    ch_alpha = Challenge.derive(public_inputs, commitment_words, modulus)
    ch_beta = Challenge.derive([ch_alpha.alpha], commitment_words, modulus)
    return ch_alpha, ch_beta


def derive_dual_v3(
    public_inputs: Sequence[int],
    commitment_words: Sequence[int],
    modulus: int,
    circuit_digest: bytes,
):
    """v3 full-proof transcript: the circuit digest is hashed alongside the
    commitment words, closing the v1 cross-circuit malleability (the
    reference verifier never hashes A/B/C — SECURITY.md). Same byte layout
    as v1 with four LE u64 digest words appended to the commitment words.
    """
    words = list(commitment_words) + [
        int.from_bytes(circuit_digest[i:i + 8], "little")
        for i in range(0, 32, 8)
    ]
    ch_alpha = Challenge.derive(public_inputs, words, modulus)
    ch_beta = Challenge.derive([ch_alpha.alpha], words, modulus)
    return ch_alpha, ch_beta
