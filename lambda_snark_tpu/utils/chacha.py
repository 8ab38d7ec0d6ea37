"""ChaCha20 CSPRNG with bit-parity to Rust's ``rand_chacha::ChaCha20Rng``.

The reference derives zero-knowledge blinding polynomials from
``ChaCha20Rng::seed_from_u64(seed)`` followed by ``rng.gen::<u64>() % q``
(reference ``rust-api/lambda-snark/src/polynomial.rs:176-188``). To keep
*deterministic artifacts identical* for seeded runs, this module reimplements:

1. ``seed_from_u64`` — rand_core 0.6's default impl: a PCG32 stream
   (MUL = 6364136223846793005, INC = 11634580027462260723) emitting one u32
   per 4-byte chunk of the 32-byte seed (little-endian).
2. The ChaCha20 block function in the DJB variant used by rand_chacha
   (constants "expand 32-byte k", 64-bit block counter, 64-bit stream id),
   with ``next_u64`` = two consecutive u32 keystream words (low word first),
   matching ``rand_core::block::BlockRng``.

Verified against RFC 8439 quarter-round/block vectors in
``tests/test_chacha.py``.
"""

from __future__ import annotations

from typing import List

import numpy as np

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


def seed_from_u64(state: int) -> bytes:
    """Expand a u64 into a 32-byte seed exactly like rand_core 0.6."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    out = bytearray()
    state &= M64
    for _ in range(8):
        state = (state * MUL + INC) & M64
        xorshifted = (((state >> 18) ^ state) >> 27) & M32
        rot = (state >> 59) & 31
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & M32
        out += x.to_bytes(4, "little")
    return bytes(out)


def _quarter(a: int, b: int, c: int, d: int):
    a = (a + b) & M32
    d ^= a
    d = ((d << 16) | (d >> 16)) & M32
    c = (c + d) & M32
    b ^= c
    b = ((b << 12) | (b >> 20)) & M32
    a = (a + b) & M32
    d ^= a
    d = ((d << 8) | (d >> 24)) & M32
    c = (c + d) & M32
    b ^= c
    b = ((b << 7) | (b >> 25)) & M32
    return a, b, c, d


def chacha20_block(key_words: List[int], counter: int, nonce_words: List[int]) -> List[int]:
    """One 16-word ChaCha20 block (DJB variant: 64-bit counter + 64-bit nonce)."""
    state = [
        0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
        *key_words,
        counter & M32, (counter >> 32) & M32,
        nonce_words[0], nonce_words[1],
    ]
    x = list(state)
    for _ in range(10):
        x[0], x[4], x[8], x[12] = _quarter(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = _quarter(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = _quarter(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = _quarter(x[3], x[7], x[11], x[15])
        x[0], x[5], x[10], x[15] = _quarter(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = _quarter(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = _quarter(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = _quarter(x[3], x[4], x[9], x[14])
    return [(xi + si) & M32 for xi, si in zip(x, state)]


class ChaCha20Rng:
    """Drop-in parity implementation of ``rand_chacha::ChaCha20Rng``."""

    def __init__(self, seed: bytes) -> None:
        if len(seed) != 32:
            raise ValueError("ChaCha20Rng seed must be 32 bytes")
        self._key = [int.from_bytes(seed[i : i + 4], "little") for i in range(0, 32, 4)]
        self._nonce = [0, 0]
        self._counter = 0
        self._buf: List[int] = []

    @classmethod
    def from_u64(cls, seed: int) -> "ChaCha20Rng":
        return cls(seed_from_u64(seed))

    def _refill(self) -> None:
        self._buf = chacha20_block(self._key, self._counter, self._nonce)
        self._counter += 1

    def next_u32(self) -> int:
        if not self._buf:
            self._refill()
        return self._buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def gen_u64_mod(self, modulus: int) -> int:
        """``rng.gen::<u64>() % modulus`` — the reference's blinding draw."""
        return self.next_u64() % modulus

    def fill_u64(self, count: int) -> np.ndarray:
        return np.array([self.next_u64() for _ in range(count)], dtype=np.uint64)
