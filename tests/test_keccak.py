"""Batched device Keccak/SHA3-256 and the device Merkle path.

Everything here pins BIT-EXACT agreement with ``hashlib.sha3_256`` — the
Merkle layer's golden oracle — so proof bytes never depend on whether a tree
was hashed on host or accelerator (``ops/keccak_jax.py``,
``proof/merkle.py::build_forest_u64_pairs``, ``proof/fri.py`` auto-dispatch).
"""

import hashlib
import random
import struct

import numpy as np
import pytest

from lambda_snark_tpu.ops import keccak_jax as kj
from lambda_snark_tpu.proof import fri
from lambda_snark_tpu.proof.fri import FriParams, commit_codeword, commit_codewords
from lambda_snark_tpu.proof.merkle import (
    MerkleTree,
    build_forest_u64_pairs,
    verify_path,
)


def _pad_block(msg: bytes) -> np.ndarray:
    assert len(msg) <= 135
    block = bytearray(136)
    block[: len(msg)] = msg
    block[len(msg)] ^= 0x06
    block[135] ^= 0x80
    return np.frombuffer(bytes(block), dtype="<u4").astype(np.uint32)


@pytest.mark.parametrize("length", [0, 1, 17, 64, 65, 135])
def test_sha3_single_block_matches_hashlib(length):
    rng = np.random.default_rng(length)
    msgs = [rng.integers(0, 256, size=length, dtype=np.uint8).tobytes() for _ in range(7)]
    words = np.stack([_pad_block(m) for m in msgs], axis=-1)  # lane-major [34, B]
    out = np.moveaxis(np.asarray(kj.sha3_256_single_block(words)), 0, -1)
    digests = kj.digest_words_to_bytes(out)
    for msg, dig in zip(msgs, digests):
        assert dig.tobytes() == hashlib.sha3_256(msg).digest()


def test_leaf_and_node_hashes_match_hashlib():
    rng = np.random.default_rng(1)
    v_lo = rng.integers(0, 1 << 64, size=33, dtype=np.uint64)
    v_hi = rng.integers(0, 1 << 64, size=33, dtype=np.uint64)
    a0 = (v_lo & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    a1 = (v_lo >> np.uint64(32)).astype(np.uint32)
    b0 = (v_hi & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b1 = (v_hi >> np.uint64(32)).astype(np.uint32)
    leaf = kj.digest_words_to_bytes(
        np.moveaxis(np.asarray(kj.hash_leaves(a0, a1, b0, b1)), 0, -1)
    )
    for i in range(33):
        ref = hashlib.sha3_256(
            b"\x00" + struct.pack("<QQ", int(v_lo[i]), int(v_hi[i]))
        ).digest()
        assert leaf[i].tobytes() == ref

    # lane-major digests: [8 words, batch]
    left = rng.integers(0, 1 << 32, size=(8, 16), dtype=np.uint64).astype(np.uint32)
    right = rng.integers(0, 1 << 32, size=(8, 16), dtype=np.uint64).astype(np.uint32)
    node = kj.digest_words_to_bytes(
        np.moveaxis(np.asarray(kj.hash_nodes(left, right)), 0, -1)
    )
    for i in range(16):
        ref = hashlib.sha3_256(
            b"\x01"
            + left[:, i].astype("<u4").tobytes()
            + right[:, i].astype("<u4").tobytes()
        ).digest()
        assert node[i].tobytes() == ref


@pytest.mark.parametrize("half", [1, 2, 64, 512])
def test_device_tree_bit_identical_to_host(half):
    """Device-built trees (incl. the host-finished top) == hashlib trees."""
    rng = np.random.default_rng(half)
    v_lo = rng.integers(0, 1 << 64, size=half, dtype=np.uint64)
    v_hi = rng.integers(0, 1 << 64, size=half, dtype=np.uint64)
    dev = MerkleTree.from_u64_pairs(v_lo, v_hi)
    host = MerkleTree(
        [struct.pack("<QQ", int(v_lo[i]), int(v_hi[i])) for i in range(half)]
    )
    assert dev.root == host.root
    for idx in {0, half - 1, half // 2}:
        assert dev.path(idx) == host.path(idx)
        leaf = struct.pack("<QQ", int(v_lo[idx]), int(v_hi[idx]))
        assert verify_path(dev.root, idx, leaf, dev.path(idx))


def test_forest_matches_individual_trees():
    rng = np.random.default_rng(7)
    v_lo = rng.integers(0, 1 << 64, size=(4, 256), dtype=np.uint64)
    v_hi = rng.integers(0, 1 << 64, size=(4, 256), dtype=np.uint64)
    forest = build_forest_u64_pairs(v_lo, v_hi)
    for t in range(4):
        single = MerkleTree.from_u64_pairs(v_lo[t], v_hi[t])
        assert forest[t].root == single.root
        assert forest[t].path(13) == single.path(13)


def test_commit_codeword_auto_dispatch_equality(monkeypatch):
    """commit_codeword / commit_codewords device routing == hashlib trees."""
    monkeypatch.setattr(fri, "_DEVICE_HASH_MIN_HALF", 8)
    rng = np.random.default_rng(3)
    codewords = [
        rng.integers(0, 1 << 63, size=128, dtype=np.uint64) for _ in range(3)
    ]
    host_trees = [commit_codeword([int(v) for v in cw]) for cw in codewords]
    dev_single = [commit_codeword(cw) for cw in codewords]
    dev_batch = commit_codewords(codewords)
    for h, s, b in zip(host_trees, dev_single, dev_batch):
        assert h.root == s.root == b.root
        assert h.path(5) == s.path(5) == b.path(5)


def test_succinct_proof_bytes_invariant_to_hash_backend(monkeypatch):
    """The full succinct proof is byte-identical with device hashing forced
    on (tiny threshold) and forced off."""
    from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
    from lambda_snark_tpu.proof.succinct import prove_r1cs_succinct
    from lambda_snark_tpu.core.params import NTT_MODULUS
    from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

    builder = CircuitBuilder(NTT_MODULUS)
    builder.alloc_var()
    xs = builder.alloc_vars(8)
    builder.set_public_inputs(1)
    r = random.Random(5)
    witness = [1]
    for v in xs:
        builder.mul_gate(v, v, builder.alloc_var())
    vals = [r.randrange(NTT_MODULUS) for _ in range(8)]
    witness += vals + [v * v % NTT_MODULUS for v in vals]
    ctx = setup(
        Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, NTT_MODULUS, 3.19))
    )
    r1cs = builder.build()
    params = FriParams(log_blowup=3, num_queries=4)

    monkeypatch.setattr(fri, "DEVICE_HASH", False)
    p_host = prove_r1cs_succinct(r1cs, witness, ctx, seed=9, fri_params=params)
    monkeypatch.setattr(fri, "DEVICE_HASH", True)
    monkeypatch.setattr(fri, "_DEVICE_HASH_MIN_HALF", 4)
    p_dev = prove_r1cs_succinct(r1cs, witness, ctx, seed=9, fri_params=params)
    assert p_host.to_bytes() == p_dev.to_bytes()
