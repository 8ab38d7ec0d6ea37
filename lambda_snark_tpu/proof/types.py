"""Proof containers and full binary (de)serialization.

Mirrors the reference proof structs — ``Proof`` (``lib.rs:368-405``),
``ProofR1CS`` 13 fields (``lib.rs:160-199``), ``ProofR1csZk`` + blinding
factor (``lib.rs:266-308``), ``Opening`` (``opening.rs:32-74``) — and closes
its serialization gap: reference ``Commitment`` cannot deserialize
(``commitment.rs:123-135``), so full proof round-trip was impossible. Here
every proof round-trips bytes -> proof -> bytes identically.

Wire format (little-endian, versioned):
    magic "LSNKTPU1" | kind u8 | modulus u64 | body
Body fields are length-prefixed u64-word vectors or fixed-width scalars in
the field order of the corresponding reference struct.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List

import numpy as np

from ..commit.lwe import Commitment
from ..core.errors import SerializationError
from ..transcript.challenge import Challenge

_MAGIC = b"LSNKTPU1"
_KIND_SIMPLE = 1
_KIND_R1CS = 2
_KIND_R1CS_ZK = 3
_KIND_R1CS_V3 = 6  # v1 body, circuit-digest-bound transcript


def _pack_words(words) -> bytes:
    out = struct.pack("<Q", len(words))
    for w in words:
        out += struct.pack("<Q", int(w) & ((1 << 64) - 1))
    return out


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.off = 0

    def u64(self) -> int:
        if self.off + 8 > len(self.data):
            raise SerializationError("truncated proof data (u64)")
        (v,) = struct.unpack_from("<Q", self.data, self.off)
        self.off += 8
        return v

    def u8(self) -> int:
        if self.off >= len(self.data):
            raise SerializationError("truncated proof data (u8)")
        v = self.data[self.off]
        self.off += 1
        return v

    def bytes_(self, n: int) -> bytes:
        b = self.data[self.off : self.off + n]
        if len(b) != n:
            raise SerializationError("truncated proof data")
        self.off += n
        return b

    def words(self) -> List[int]:
        n = self.u64()
        if n > (1 << 32):
            raise SerializationError("unreasonable word-vector length")
        return [self.u64() for _ in range(n)]


@dataclasses.dataclass(frozen=True)
class EvalOpening:
    """Evaluation opening: y = f(alpha) plus witness words.

    Reference ``Opening { evaluation, witness }`` where the witness is
    ``[randomness || coefficients]`` for the simple API (``opening.rs:104-115``)
    and empty for the R1CS stub openings (``lib.rs:790-791``).
    """

    evaluation: int
    witness: List[int] = dataclasses.field(default_factory=list)

    def to_bytes(self) -> bytes:
        return struct.pack("<Q", self.evaluation) + _pack_words(self.witness)

    @staticmethod
    def read(r: _Reader) -> "EvalOpening":
        ev = r.u64()
        return EvalOpening(evaluation=ev, witness=r.words())


@dataclasses.dataclass(frozen=True)
class Proof:
    """Simple proof: commitment + challenge + opening (``lib.rs:368-405``)."""

    commitment: Commitment
    challenge: Challenge
    opening: EvalOpening
    modulus: int

    def to_bytes(self) -> bytes:
        body = (
            _pack_words(self.commitment.as_words())
            + self.challenge.to_bytes()
            + self.opening.to_bytes()
        )
        return _MAGIC + bytes([_KIND_SIMPLE]) + struct.pack("<Q", self.modulus) + body

    @staticmethod
    def from_bytes(data: bytes) -> "Proof":
        r = _header(data, _KIND_SIMPLE)
        modulus = r.u64()
        comm = Commitment(np.array(r.words(), dtype=np.uint64))
        ch = Challenge.from_bytes(r.bytes_(40))
        op = EvalOpening.read(r)
        return Proof(commitment=comm, challenge=ch, opening=op, modulus=modulus)


@dataclasses.dataclass(frozen=True)
class ProofR1CS:
    """Two-challenge R1CS proof, 13 fields (``lib.rs:160-199``)."""

    commitment_q: Commitment
    challenge_alpha: Challenge
    challenge_beta: Challenge
    q_alpha: int
    q_beta: int
    a_z_alpha: int
    b_z_alpha: int
    c_z_alpha: int
    a_z_beta: int
    b_z_beta: int
    c_z_beta: int
    opening_alpha: EvalOpening
    opening_beta: EvalOpening
    modulus: int
    transcript_v: int = 1  # 1 = reference parity; 3 = circuit-digest-bound

    def _evals(self):
        return (
            self.q_alpha,
            self.q_beta,
            self.a_z_alpha,
            self.b_z_alpha,
            self.c_z_alpha,
            self.a_z_beta,
            self.b_z_beta,
            self.c_z_beta,
        )

    def to_bytes(self) -> bytes:
        body = _pack_words(self.commitment_q.as_words())
        body += self.challenge_alpha.to_bytes() + self.challenge_beta.to_bytes()
        body += struct.pack("<8Q", *self._evals())
        body += self.opening_alpha.to_bytes() + self.opening_beta.to_bytes()
        kind = _KIND_R1CS_V3 if self.transcript_v == 3 else _KIND_R1CS
        return _MAGIC + bytes([kind]) + struct.pack("<Q", self.modulus) + body

    @staticmethod
    def from_bytes(data: bytes) -> "ProofR1CS":
        kind = data[8] if len(data) > 8 else _KIND_R1CS
        r = _header(data, kind if kind in (_KIND_R1CS, _KIND_R1CS_V3)
                    else _KIND_R1CS)
        modulus = r.u64()
        comm = Commitment(np.array(r.words(), dtype=np.uint64))
        ch_a = Challenge.from_bytes(r.bytes_(40))
        ch_b = Challenge.from_bytes(r.bytes_(40))
        evals = struct.unpack("<8Q", r.bytes_(64))
        op_a = EvalOpening.read(r)
        op_b = EvalOpening.read(r)
        return ProofR1CS(
            commitment_q=comm,
            challenge_alpha=ch_a,
            challenge_beta=ch_b,
            q_alpha=evals[0],
            q_beta=evals[1],
            a_z_alpha=evals[2],
            b_z_alpha=evals[3],
            c_z_alpha=evals[4],
            a_z_beta=evals[5],
            b_z_beta=evals[6],
            c_z_beta=evals[7],
            opening_alpha=op_a,
            opening_beta=op_b,
            modulus=modulus,
            transcript_v=3 if kind == _KIND_R1CS_V3 else 1,
        )


@dataclasses.dataclass(frozen=True)
class ProofR1csZk:
    """ZK R1CS proof: blinded quotient + explicit blinding factor
    (``lib.rs:266-308``; verifier unblinds at ``lib.rs:1174-1179``)."""

    commitment_q_prime: Commitment
    blinding_factor: int
    challenge_alpha: Challenge
    challenge_beta: Challenge
    q_prime_alpha: int
    q_prime_beta: int
    a_z_alpha: int
    b_z_alpha: int
    c_z_alpha: int
    a_z_beta: int
    b_z_beta: int
    c_z_beta: int
    opening_alpha: EvalOpening
    opening_beta: EvalOpening
    modulus: int

    def _evals(self):
        return (
            self.q_prime_alpha,
            self.q_prime_beta,
            self.a_z_alpha,
            self.b_z_alpha,
            self.c_z_alpha,
            self.a_z_beta,
            self.b_z_beta,
            self.c_z_beta,
        )

    def to_bytes(self) -> bytes:
        body = _pack_words(self.commitment_q_prime.as_words())
        body += struct.pack("<Q", self.blinding_factor)
        body += self.challenge_alpha.to_bytes() + self.challenge_beta.to_bytes()
        body += struct.pack("<8Q", *self._evals())
        body += self.opening_alpha.to_bytes() + self.opening_beta.to_bytes()
        return _MAGIC + bytes([_KIND_R1CS_ZK]) + struct.pack("<Q", self.modulus) + body

    @staticmethod
    def from_bytes(data: bytes) -> "ProofR1csZk":
        r = _header(data, _KIND_R1CS_ZK)
        modulus = r.u64()
        comm = Commitment(np.array(r.words(), dtype=np.uint64))
        blinding = r.u64()
        ch_a = Challenge.from_bytes(r.bytes_(40))
        ch_b = Challenge.from_bytes(r.bytes_(40))
        evals = struct.unpack("<8Q", r.bytes_(64))
        op_a = EvalOpening.read(r)
        op_b = EvalOpening.read(r)
        return ProofR1csZk(
            commitment_q_prime=comm,
            blinding_factor=blinding,
            challenge_alpha=ch_a,
            challenge_beta=ch_b,
            q_prime_alpha=evals[0],
            q_prime_beta=evals[1],
            a_z_alpha=evals[2],
            b_z_alpha=evals[3],
            c_z_alpha=evals[4],
            a_z_beta=evals[5],
            b_z_beta=evals[6],
            c_z_beta=evals[7],
            opening_alpha=op_a,
            opening_beta=op_b,
            modulus=modulus,
        )


def _header(data: bytes, expected_kind: int) -> _Reader:
    r = _Reader(data)
    if r.bytes_(8) != _MAGIC:
        raise SerializationError("bad proof magic")
    kind = r.u8()
    if kind != expected_kind:
        raise SerializationError(f"unexpected proof kind {kind}")
    return r


def deserialize_any(data: bytes):
    """Dispatch on the embedded kind byte."""
    if len(data) < 9 or data[:8] != _MAGIC:
        raise SerializationError("bad proof magic")
    kind = data[8]
    if kind == _KIND_SIMPLE:
        return Proof.from_bytes(data)
    if kind in (_KIND_R1CS, _KIND_R1CS_V3):
        return ProofR1CS.from_bytes(data)
    if kind == _KIND_R1CS_ZK:
        return ProofR1csZk.from_bytes(data)
    if kind in (4, 5):  # compact kinds (proof.compact)
        from .compact import CompactProofR1CS

        return CompactProofR1CS.from_bytes(data)
    if kind == 7:  # succinct FRI-opening proofs (proof.succinct)
        from .succinct import SuccinctProofR1CS

        return SuccinctProofR1CS.from_bytes(data)
    if kind == 8:  # aggregated succinct proofs (proof.aggregate)
        from .aggregate import AggregatedProofR1CS

        return AggregatedProofR1CS.from_bytes(data)
    if kind == 9:  # committed-witness succinct proofs (proof.succinct_witness)
        from .succinct_witness import WitnessProofR1CS

        return WitnessProofR1CS.from_bytes(data)
    raise SerializationError(f"unknown proof kind {kind}")
