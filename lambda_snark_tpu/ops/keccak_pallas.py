"""Pallas TPU kernel for batched SHA3-256 (Keccak-f[1600]) Merkle hashing.

``ops/keccak_jax.py`` expresses the permutation as XLA array ops over a
lane-major ``[25, batch]`` state. That form is correct everywhere but slow on
TPU (~4 Mhash/s measured): the rho/pi steps are cross-sublane gathers and the
theta broadcasts are sublane rolls, which XLA does not fuse — nearly every
round materializes multi-MB intermediates in HBM, so the permutation runs at
HBM bandwidth instead of VPU throughput.

This kernel removes every gather by construction:

- the 25 Keccak lanes are **named values** (50 uint32 registers/VMEM tiles,
  a (lo, hi) pair per 64-bit lane) — rho's rotations are static shift pairs
  and pi is literally Python variable renaming, so all 24 rounds compile to
  straight-line elementwise VPU ops with zero cross-lane data movement;
- the batch fills a (rows, 128) tile: sublane x vector-lane, the native VPU
  shape, with a grid over row blocks;
- the sponge's block construction (leaf ``0x00 || v_lo || v_hi`` and node
  ``0x01 || left || right`` messages, both a single 136-byte rate block) is
  fused into the kernel, so HBM traffic is just the raw inputs and the
  32-byte digests.

Public API mirrors ``keccak_jax``: ``hash_leaves`` / ``hash_nodes`` on
word-leading batches, bit-identical to ``hashlib.sha3_256`` (asserted in
tests/test_keccak.py vs the host path; on-device parity is additionally
gated in bench.py before any timing). Non-TPU backends delegate to
``keccak_jax`` — interpret-mode Pallas would be bit-identical but is far
slower than the XLA form on CPU.

Reference anchor: this accelerates the Merkle layer of the succinct openings
that replace the reference's stubbed LWE openings (``lib.rs:788-791``); the
reference itself has no vector-commitment hashing at all.
"""

from __future__ import annotations

import numpy as np

from . import keccak_jax as kj

# batch tile: (rows, 128) per grid step. 8 sublanes is the fp32/u32-native
# tile height; 2048 hashes per step keeps the per-step overhead negligible
# while the 50-tile state (50 * 16 * 128 * 4 B = 400 KB) sits well inside
# the 16 MB VMEM budget next to the input/output blocks.
_TILE_ROWS = 16
_LANE = 128
_TILE = _TILE_ROWS * _LANE


def _rotl64(lo, hi, r: int):
    """Rotate a 64-bit lane (as two uint32 planes) left by static r."""
    import jax.numpy as jnp

    r &= 63
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
        if r == 0:
            return lo, hi
    rs = jnp.uint32(r)
    inv = jnp.uint32(32 - r)
    return (lo << rs) | (hi >> inv), (hi << rs) | (lo >> inv)


def _keccak_f_named(lanes):
    """Keccak-f[1600] on 25 named (lo, hi) uint32-array pairs.

    Fully unrolled: rho is static shift pairs, pi is list reindexing, chi is
    elementwise — no gathers anywhere. Uses the same static tables as
    ``keccak_jax`` so the two implementations are identical by construction.
    """
    import jax.numpy as jnp

    rot = [int(r) for r in kj._ROT]
    pi_src = [int(i) for i in kj._PI_SRC]
    chi1 = [int(i) for i in kj._CHI_1]
    chi2 = [int(i) for i in kj._CHI_2]

    for rc in kj._RC:
        # theta
        c = [
            (
                lanes[x][0] ^ lanes[x + 5][0] ^ lanes[x + 10][0]
                ^ lanes[x + 15][0] ^ lanes[x + 20][0],
                lanes[x][1] ^ lanes[x + 5][1] ^ lanes[x + 10][1]
                ^ lanes[x + 15][1] ^ lanes[x + 20][1],
            )
            for x in range(5)
        ]
        d = []
        for x in range(5):
            r_lo, r_hi = _rotl64(*c[(x + 1) % 5], 1)
            d.append((c[(x + 4) % 5][0] ^ r_lo, c[(x + 4) % 5][1] ^ r_hi))
        lanes = [
            (lanes[i][0] ^ d[i % 5][0], lanes[i][1] ^ d[i % 5][1])
            for i in range(25)
        ]
        # rho + pi (pure renaming)
        b = [
            _rotl64(*lanes[pi_src[i]], rot[pi_src[i]]) for i in range(25)
        ]
        # chi
        lanes = [
            (
                b[i][0] ^ (~b[chi1[i]][0] & b[chi2[i]][0]),
                b[i][1] ^ (~b[chi1[i]][1] & b[chi2[i]][1]),
            )
            for i in range(25)
        ]
        # iota
        lanes[0] = (
            lanes[0][0] ^ jnp.uint32(rc & 0xFFFFFFFF),
            lanes[0][1] ^ jnp.uint32(rc >> 32),
        )
    return lanes


def _digest_out(out_ref, lanes):
    """Write the SHA3-256 digest (first 4 lanes, LE words) to out_ref[8]."""
    for k in range(4):
        out_ref[2 * k] = lanes[k][0]
        out_ref[2 * k + 1] = lanes[k][1]


def _leaf_kernel(a0_ref, a1_ref, b0_ref, b1_ref, out_ref):
    """Leaf message ``0x00 || pack("<QQ", v_lo, v_hi)`` -> digest words.

    Byte layout identical to ``keccak_jax.leaf_block_words``.
    """
    import jax.numpy as jnp

    a0, a1 = a0_ref[...], a1_ref[...]
    b0, b1 = b0_ref[...], b1_ref[...]
    m24 = jnp.uint32(0x00FFFFFF)
    s8 = jnp.uint32(8)
    s24 = jnp.uint32(24)
    z = jnp.zeros_like(a0)
    w0 = (a0 & m24) << s8
    w1 = (a0 >> s24) | (a1 << s8)
    w2 = (a1 >> s24) | (b0 << s8)
    w3 = (b0 >> s24) | (b1 << s8)
    w4 = (b1 >> s24) | jnp.uint32(0x06 << 8)
    top = jnp.full_like(z, 0x80000000, dtype=jnp.uint32)
    # lane j = (w[2j], w[2j+1]); capacity lanes 17..24 are zero
    lanes = [(w0, w1), (w2, w3), (w4, z)] + [(z, z)] * 13 + [(z, top)] + [
        (z, z)
    ] * 8
    _digest_out(out_ref, _keccak_f_named(lanes))


def _flex_leaf_kernel(p: int):
    """Kernel factory: leaf ``0x00 || payload`` with p uint32 payload words
    arriving stacked word-leading ([p, rows, 128]). Byte layout identical to
    ``keccak_jax.leaf_block_words_flex``."""
    import jax.numpy as jnp

    def kernel(words_ref, out_ref):
        win = [words_ref[k] for k in range(p)]
        m24 = jnp.uint32(0x00FFFFFF)
        s8 = jnp.uint32(8)
        s24 = jnp.uint32(24)
        z = jnp.zeros_like(win[0])
        w = [z] * 34
        w[0] = (win[0] & m24) << s8
        for k in range(1, p):
            w[k] = (win[k - 1] >> s24) | (win[k] << s8)
        w[p] = (win[p - 1] >> s24) | jnp.uint32(0x06 << 8)
        w[33] = jnp.full_like(z, 0x80000000, dtype=jnp.uint32)
        lanes = [(w[2 * j], w[2 * j + 1]) for j in range(17)] + [(z, z)] * 8
        _digest_out(out_ref, _keccak_f_named(lanes))

    return kernel


def _node_kernel(left_ref, right_ref, out_ref):
    """Node message ``0x01 || left || right`` -> digest words.

    Byte layout identical to ``keccak_jax.node_block_words``.
    """
    import jax.numpy as jnp

    left = [left_ref[k] for k in range(8)]
    right = [right_ref[k] for k in range(8)]
    m24 = jnp.uint32(0x00FFFFFF)
    s8 = jnp.uint32(8)
    s24 = jnp.uint32(24)
    z = jnp.zeros_like(left[0])
    w = [None] * 34
    w[0] = ((left[0] & m24) << s8) | jnp.uint32(0x01)
    for k in range(1, 8):
        w[k] = (left[k - 1] >> s24) | (left[k] << s8)
    w[8] = (left[7] >> s24) | (right[0] << s8)
    for k in range(9, 16):
        w[k] = (right[k - 9] >> s24) | (right[k - 8] << s8)
    w[16] = (right[7] >> s24) | jnp.uint32(0x06 << 8)
    for k in range(17, 33):
        w[k] = z
    w[33] = jnp.full_like(z, 0x80000000, dtype=jnp.uint32)
    lanes = [(w[2 * j], w[2 * j + 1]) for j in range(17)] + [(z, z)] * 8
    _digest_out(out_ref, _keccak_f_named(lanes))


_CALL_CACHE: dict = {}


def _hash_call(kind: str, n_in: int, rows: int):
    """pallas_call for `n_in` word-leading inputs of shape [n_in?, rows, 128]."""
    key = (kind, rows)
    if key in _CALL_CACHE:
        return _CALL_CACHE[key]
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kind == "leaf":
        kernel = _leaf_kernel
    elif kind == "node":
        kernel = _node_kernel
    else:  # flex leaf: kind = "flex<P>"
        kernel = _flex_leaf_kernel(n_in)
    tr = min(_TILE_ROWS, rows)
    grid = (rows // tr,)
    if kind == "leaf":
        in_specs = [
            pl.BlockSpec((tr, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ]
    elif kind == "node":
        in_specs = [
            pl.BlockSpec((8, tr, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ]
    else:
        in_specs = [
            pl.BlockSpec((n_in, tr, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ]
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tr, _LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rows, _LANE), jax.numpy.uint32),
    )
    _CALL_CACHE[key] = fn
    return fn


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _flatten_pad(arrs, batch_shape):
    """[...batch] uint32 arrays -> [rows, 128] padded views + real size."""
    import jax.numpy as jnp

    n = int(np.prod(batch_shape)) if batch_shape else 1
    rows = max((n + _TILE - 1) // _TILE, 1) * _TILE_ROWS
    out = []
    for a in arrs:
        flat = a.reshape(a.shape[: a.ndim - len(batch_shape)] + (n,))
        pad = rows * _LANE - n
        if pad:
            widths = [(0, 0)] * (flat.ndim - 1) + [(0, pad)]
            flat = jnp.pad(flat, widths)
        out.append(flat.reshape(flat.shape[:-1] + (rows, _LANE)))
    return out, n, rows


def _unflatten(digest, n: int, batch_shape):
    return digest.reshape((8, -1))[:, :n].reshape((8,) + batch_shape)


def hash_leaves(a0, a1, b0, b1, looped: bool = False):
    """Digest words [8, ...batch] for Merkle leaves — Pallas on TPU,
    ``keccak_jax`` elsewhere (bit-identical)."""
    if not _on_tpu():
        return kj.hash_leaves(a0, a1, b0, b1, looped)
    batch_shape = a0.shape
    (a0f, a1f, b0f, b1f), n, rows = _flatten_pad(
        [a0, a1, b0, b1], batch_shape
    )
    digest = _hash_call("leaf", 4, rows)(a0f, a1f, b0f, b1f)
    return _unflatten(digest, n, batch_shape)


def hash_leaves_flex(words, looped: bool = False):
    """Digest words [8, ...batch] for flexible-payload leaves (list of
    uint32 payload word arrays) — Pallas on TPU, ``keccak_jax`` elsewhere
    (bit-identical)."""
    if not _on_tpu():
        return kj.hash_leaves_flex(words, looped)
    import jax.numpy as jnp

    p = len(words)
    batch_shape = words[0].shape
    stacked = jnp.stack(words, axis=0)
    (wf,), n, rows = _flatten_pad([stacked], batch_shape)
    digest = _hash_call(f"flex{p}", p, rows)(wf)
    return _unflatten(digest, n, batch_shape)


def hash_nodes(left, right, looped: bool = False):
    """Digest words [8, ...batch] for interior nodes — Pallas on TPU,
    ``keccak_jax`` elsewhere (bit-identical)."""
    if not _on_tpu():
        return kj.hash_nodes(left, right, looped)
    batch_shape = left.shape[1:]
    (lf, rf), n, rows = _flatten_pad([left, right], batch_shape)
    digest = _hash_call("node", 2, rows)(lf, rf)
    return _unflatten(digest, n, batch_shape)
