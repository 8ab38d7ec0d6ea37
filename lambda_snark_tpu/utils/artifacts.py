"""Deterministic artifact store (the checkpoint/resume analog).

The reference has no checkpointing (SURVEY.md section 5); its recovery story
— and ours — is determinism: every random value is seed-derived, so any
stage can be recomputed bit-identically from its inputs. This module gives
that story a concrete surface:

- ``ProofStore``: content-addressed proof persistence with a JSON manifest
  (statement digest, seeds, sizes) + batch re-verification,
- context descriptors round-tripping the full commitment context,
- digests binding artifacts to the circuit they were produced for.

"Resume" for a long batched proving run = skip every proof whose statement
digest is already in the manifest; re-derivation replaces restart state.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence

from ..proof.types import ProofR1CS, ProofR1csZk, deserialize_any
from ..r1cs.r1cs import R1CS


def circuit_digest(r1cs: R1CS) -> str:
    """SHA3-256 over the canonical circuit description.

    Cached on the instance: the digest is hashed into every kind-7/8/9
    challenge derivation (v4 circuit binding), and the O(nnz) string walk
    would otherwise dominate the ~1.5 ms succinct verifier. Circuits are
    de-facto immutable after construction (every API mutation goes through
    ``dataclasses.replace``, which builds a new object)."""
    cached = getattr(r1cs, "_circuit_digest_cache", None)
    if cached is not None:
        return cached
    h = hashlib.sha3_256()
    h.update(f"{r1cs.m},{r1cs.n},{r1cs.l},{r1cs.modulus},{r1cs.domain.kind}".encode())
    for mat in (r1cs.a, r1cs.b, r1cs.c):
        for row, col, val in mat.coo():
            h.update(f"{row},{col},{val};".encode())
    digest = h.hexdigest()
    r1cs._circuit_digest_cache = digest
    return digest


def statement_digest(
    r1cs: R1CS, public_inputs: Sequence[int], seed: int, label: str = ""
) -> str:
    """Key for one proved statement. ``label`` disambiguates entries whose
    (circuit, publics, seed) coincide — e.g. batch members with a shared
    public prefix (l=1 circuits expose only z0=1)."""
    h = hashlib.sha3_256()
    h.update(circuit_digest(r1cs).encode())
    h.update(b"|")
    for v in public_inputs:
        h.update(f"{int(v)},".encode())
    h.update(f"|{seed}|{label}".encode())
    return h.hexdigest()


class ProofStore:
    """Directory-backed proof store with a manifest."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        self._manifest: Dict[str, dict] = {}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)

    def _flush(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def contains(self, key: str) -> bool:
        return key in self._manifest

    def save(
        self,
        r1cs: R1CS,
        public_inputs: Sequence[int],
        seed: int,
        proof,
        extra: Optional[dict] = None,
        label: str = "",
    ) -> str:
        key = statement_digest(r1cs, public_inputs, seed, label)
        data = proof.to_bytes()
        blob = hashlib.sha3_256(data).hexdigest()
        path = os.path.join(self.root, f"{blob}.proof")
        with open(path, "wb") as f:
            f.write(data)
        self._manifest[key] = {
            "proof_blob": blob,
            "circuit": circuit_digest(r1cs),
            "public_inputs": [int(v) for v in public_inputs],
            "seed": seed,
            "size_bytes": len(data),
            "kind": type(proof).__name__,
            **(extra or {}),
        }
        self._flush()
        return key

    def load(self, key: str):
        entry = self._manifest[key]
        path = os.path.join(self.root, f"{entry['proof_blob']}.proof")
        with open(path, "rb") as f:
            return deserialize_any(f.read())

    def keys(self) -> List[str]:
        return sorted(self._manifest)

    def verify_all(self, r1cs: R1CS) -> Dict[str, bool]:
        """Re-verify every stored proof for this circuit (integrity sweep).

        Succinct proofs are checked against their own recorded FRI
        parameters (this is an integrity sweep, not an acceptance gate —
        callers with a security floor pass it to ``verify_r1cs_succinct``
        directly).
        """
        from ..proof.compact import CompactProofR1CS, verify_r1cs_compact
        from ..proof.succinct import SuccinctProofR1CS, verify_r1cs_succinct
        from ..proof.succinct_witness import (
            WitnessProofR1CS,
            verify_r1cs_witness,
        )
        from ..verifier import verify_r1cs, verify_r1cs_zk

        cdig = circuit_digest(r1cs)
        results = {}
        for key, entry in self._manifest.items():
            if entry["circuit"] != cdig:
                continue
            proof = self.load(key)
            public = entry["public_inputs"]
            if isinstance(proof, ProofR1csZk):
                results[key] = verify_r1cs_zk(proof, public, r1cs)
            elif isinstance(proof, ProofR1CS):
                results[key] = verify_r1cs(proof, public, r1cs)
            elif isinstance(proof, SuccinctProofR1CS):
                results[key] = verify_r1cs_succinct(
                    proof, public, r1cs, min_params=proof.fri_params
                )
            elif isinstance(proof, WitnessProofR1CS):
                results[key] = verify_r1cs_witness(
                    proof, public, r1cs, min_params=proof.fri_params
                )
            elif isinstance(proof, CompactProofR1CS):
                results[key] = verify_r1cs_compact(proof, public, r1cs)
            else:
                results[key] = False
        return results

    def missing_statements(
        self, r1cs: R1CS, publics_and_seeds: Sequence, labels: Optional[Sequence[str]] = None
    ) -> List[int]:
        """Indices not yet proven — the 'resume point' of a batched run."""
        out = []
        for i, (public, seed) in enumerate(publics_and_seeds):
            label = labels[i] if labels else ""
            if not self.contains(statement_digest(r1cs, public, seed, label)):
                out.append(i)
        return out
