"""SHA3-256 Merkle commitments for FRI codewords.

The reference has no vector-commitment layer (its openings reveal whole
polynomials — ``opening.rs:104-115``, ``lib.rs:788-791``); this module is the
hash layer of the succinct-opening upgrade (``proof/fri.py``).

Two bit-identical construction paths:

- **Host**: per-leaf ``hashlib.sha3_256`` (the golden path, any byte leaves).
- **Device**: for the paired-uint64 leaves the FRI codewords use, all large
  levels hash as ONE batched Keccak-f[1600] dispatch on the accelerator
  (``ops/keccak_jax.py`` — uint32 lane planes, static gather tables), with
  the small top-of-tree finished on host. Roots/paths are byte-identical to
  the host path (asserted in tests), so proof bytes never depend on where
  hashing ran.

Domain separation: leaf hashes are prefixed 0x00, interior nodes 0x01, so a
leaf blob can never be replayed as an interior node (second-preimage hardening).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

import numpy as np

_LEAF_PREFIX = b"\x00"
_NODE_PREFIX = b"\x01"

HASH_BYTES = 32

#: device tree construction stops when a level has this many rows; the
#: remaining (tiny) top is hashed on host — keeps the jitted graph shallow.
_DEVICE_TOP_ROWS = 128


def _hash_leaf(data: bytes) -> bytes:
    return hashlib.sha3_256(_LEAF_PREFIX + data).digest()


def _hash_node(left: bytes, right: bytes) -> bytes:
    return hashlib.sha3_256(_NODE_PREFIX + left + right).digest()


def _finish_levels(levels: List[np.ndarray]) -> List[np.ndarray]:
    """Extend digest levels by host hashing until the root level."""
    while len(levels[-1]) > 1:
        prev = levels[-1]
        nxt = np.empty((len(prev) // 2, HASH_BYTES), dtype=np.uint8)
        for i in range(0, len(prev), 2):
            nxt[i // 2] = np.frombuffer(
                _hash_node(prev[i].tobytes(), prev[i + 1].tobytes()), dtype=np.uint8
            )
        levels.append(nxt)
    return levels


class MerkleTree:
    """Binary Merkle tree over a power-of-two list of byte leaves.

    Levels are stored as uint8 arrays of shape [k, 32] from hashed leaves up
    to the single-row root level.
    """

    def __init__(
        self,
        leaves: Optional[Sequence[bytes]] = None,
        _levels: Optional[List[np.ndarray]] = None,
    ) -> None:
        if _levels is not None:
            self._levels = _levels
            self.num_leaves = len(_levels[0])
            return
        n = len(leaves) if leaves is not None else 0
        if n == 0 or (n & (n - 1)) != 0:
            raise ValueError(f"Merkle leaf count must be a power of two, got {n}")
        self.num_leaves = n
        level0 = np.frombuffer(
            b"".join(_hash_leaf(leaf) for leaf in leaves), dtype=np.uint8
        ).reshape(n, HASH_BYTES)
        self._levels = _finish_levels([level0])

    @classmethod
    def from_u64_pairs(cls, v_lo: np.ndarray, v_hi: np.ndarray) -> "MerkleTree":
        """Device-hashed tree over leaves ``pack("<QQ", v_lo[i], v_hi[i])``.

        Bit-identical to ``MerkleTree([struct.pack("<QQ", lo, hi) ...])``.
        """
        return build_forest_u64_pairs(v_lo[None, :], v_hi[None, :])[0]

    @property
    def root(self) -> bytes:
        return self._levels[-1][0].tobytes()

    def path(self, index: int) -> List[bytes]:
        """Sibling hashes from leaf level up to (excluding) the root."""
        if not 0 <= index < self.num_leaves:
            raise IndexError(f"leaf index {index} out of range")
        out: List[bytes] = []
        for level in self._levels[:-1]:
            out.append(level[index ^ 1].tobytes())
            index >>= 1
        return out


def build_forest_u64_pairs(v_lo: np.ndarray, v_hi: np.ndarray) -> List[MerkleTree]:
    """Build T equal-size trees with all heavy hashing in one device dispatch.

    v_lo, v_hi: uint64 arrays [T, half]; leaf i of tree t is
    ``0x00 || pack("<QQ", v_lo[t, i], v_hi[t, i])``.
    """
    from ..ops import keccak_jax as kj

    t, half = v_lo.shape
    if half == 0 or (half & (half - 1)) != 0:
        raise ValueError(f"Merkle leaf count must be a power of two, got {half}")
    word_levels = kj.merkle_levels_u64_pairs(v_lo, v_hi, min_rows=_DEVICE_TOP_ROWS)
    byte_levels = [kj.digest_words_to_bytes(level) for level in word_levels]
    trees = []
    for ti in range(t):
        levels = [np.ascontiguousarray(level[ti]) for level in byte_levels]
        tree = MerkleTree(_levels=_finish_levels(levels))
        trees.append(tree)
    return trees


def build_forest_u64_groups(vals: np.ndarray) -> List[MerkleTree]:
    """Build T interleaved-group trees with device-batched hashing.

    vals: uint64 [T, G, n]; leaf i of tree t is
    ``0x00 || concat_g pack("<QQ", vals[t,g,i], vals[t,g,i+n/2])`` — one
    tree committing all G codewords of a group position-wise (wire-v3
    input-oracle layout: one authentication path opens every oracle).
    """
    from ..ops import keccak_jax as kj

    t, g, n = vals.shape
    half = n // 2
    if half == 0 or (half & (half - 1)) != 0:
        raise ValueError(f"Merkle leaf count must be a power of two, got {half}")
    word_levels = kj.merkle_levels_u64_groups(vals, min_rows=_DEVICE_TOP_ROWS)
    byte_levels = [kj.digest_words_to_bytes(level) for level in word_levels]
    trees = []
    for ti in range(t):
        levels = [np.ascontiguousarray(level[ti]) for level in byte_levels]
        trees.append(MerkleTree(_levels=_finish_levels(levels)))
    return trees


def verify_path(
    root: bytes, index: int, leaf_data: bytes, path
) -> bool:
    """Check that ``leaf_data`` sits at ``index`` under ``root``.

    ``path`` is either a sequence of 32-byte sibling digests or one
    contiguous bytes blob of them (``LayerOpening.path``), bottom-up.
    """
    if isinstance(path, (bytes, bytearray)):
        if len(path) % HASH_BYTES:
            return False
        path = [
            path[i : i + HASH_BYTES] for i in range(0, len(path), HASH_BYTES)
        ]
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
