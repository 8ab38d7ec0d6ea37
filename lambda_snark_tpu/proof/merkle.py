"""SHA3-256 Merkle commitments for FRI codewords.

The reference has no vector-commitment layer (its openings reveal whole
polynomials — ``opening.rs:104-115``, ``lib.rs:788-791``); this module is the
hash layer of the succinct-opening upgrade (``proof/fri.py``). Hashing stays
on the host, like the Fiat-Shamir transcript: the transcript is host glue
between jitted device stages by design (SURVEY.md section 7 step 4).

Domain separation: leaf hashes are prefixed 0x00, interior nodes 0x01, so a
leaf blob can never be replayed as an interior node (second-preimage hardening).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

_LEAF_PREFIX = b"\x00"
_NODE_PREFIX = b"\x01"

HASH_BYTES = 32


def _hash_leaf(data: bytes) -> bytes:
    return hashlib.sha3_256(_LEAF_PREFIX + data).digest()


def _hash_node(left: bytes, right: bytes) -> bytes:
    return hashlib.sha3_256(_NODE_PREFIX + left + right).digest()


class MerkleTree:
    """Binary Merkle tree over a power-of-two list of byte leaves."""

    def __init__(self, leaves: Sequence[bytes]) -> None:
        n = len(leaves)
        if n == 0 or (n & (n - 1)) != 0:
            raise ValueError(f"Merkle leaf count must be a power of two, got {n}")
        self.num_leaves = n
        # levels[0] = hashed leaves, levels[-1] = [root]
        levels: List[List[bytes]] = [[_hash_leaf(leaf) for leaf in leaves]]
        while len(levels[-1]) > 1:
            prev = levels[-1]
            levels.append(
                [_hash_node(prev[i], prev[i + 1]) for i in range(0, len(prev), 2)]
            )
        self._levels = levels

    @property
    def root(self) -> bytes:
        return self._levels[-1][0]

    def path(self, index: int) -> List[bytes]:
        """Sibling hashes from leaf level up to (excluding) the root."""
        if not 0 <= index < self.num_leaves:
            raise IndexError(f"leaf index {index} out of range")
        out: List[bytes] = []
        for level in self._levels[:-1]:
            out.append(level[index ^ 1])
            index >>= 1
        return out


def verify_path(
    root: bytes, index: int, leaf_data: bytes, path: Sequence[bytes]
) -> bool:
    """Check that ``leaf_data`` sits at ``index`` under ``root``."""
    node = _hash_leaf(leaf_data)
    for sibling in path:
        if len(sibling) != HASH_BYTES:
            return False
        if index & 1:
            node = _hash_node(sibling, node)
        else:
            node = _hash_node(node, sibling)
        index >>= 1
    return node == root
