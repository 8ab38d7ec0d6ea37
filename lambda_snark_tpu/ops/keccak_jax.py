"""Batched SHA3-256 (Keccak-f[1600]) as a JAX array program.

The Merkle layer of the succinct openings (``proof/merkle.py``) hashes
hundreds of thousands of tiny fixed-shape messages per codeword — a leaf is
17 bytes (``0x00 || v_lo || v_hi``), an interior node 65 bytes
(``0x01 || left || right``); both fit in a single SHA3-256 rate block
(136 bytes). That makes the whole tree one embarrassingly-parallel batch of
Keccak-f[1600] permutations: exactly the shape the TPU VPU wants, and the
device-side counterpart of the host ``hashlib`` path (the reference keeps all
hashing host-side because it has no vector-commitment layer at all —
``opening.rs:104-115``).

TPU-native design notes:

- No 64-bit integers on TPU: each 64-bit Keccak lane travels as a
  (lo, hi) pair of uint32 planes.
- **Lane-major layout**: state shape is ``[25, ...batch]`` — the 25 Keccak
  lanes live on the leading (sublane) axis and the batch fills the 128-wide
  vector-lane axis. The batch-major layout ``[batch, 25]`` wastes 80% of
  every vector register (25/128 lane occupancy); lane-major keeps the VPU
  fully fed and turns the rho/pi/chi gathers into static row reorders.
- Lane rotations use static per-lane shift vectors; the cross-word rotate
  composes two legal sub-32 shifts (``(x >> 1) >> (31 - r)``) so no shift
  amount ever reaches the UB-on-XLA width 32.
- theta/rho/pi/chi are static-index row ops — 24 unrolled rounds, ~500
  fused VPU ops total, no data-dependent control flow.

Bit-exactness vs ``hashlib.sha3_256`` is asserted in
``tests/test_keccak.py`` for both message shapes and the generic
single-block path.
"""

from __future__ import annotations

import numpy as np

# --- static tables -------------------------------------------------------------

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y], flat lane index i = x + 5y
_ROT_XY = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_ROT = np.array(
    [_ROT_XY[i % 5][i // 5] for i in range(25)], dtype=np.uint32
)

# pi: dest (x', y') takes the rotated lane at (x, y) = ((x' + 3y') % 5, x')
_PI_SRC = np.array(
    [((i % 5) + 3 * (i // 5)) % 5 + 5 * (i % 5) for i in range(25)],
    dtype=np.int32,
)

# chi gathers: i1 = (x+1, y), i2 = (x+2, y)
_CHI_1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)], dtype=np.int32)
_CHI_2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)], dtype=np.int32)

_RATE_WORDS = 34  # SHA3-256 rate = 136 bytes = 34 uint32 words = 17 lanes


def _bcast(r: np.ndarray, ndim: int):
    """Shape a static per-lane vector [25] for lane-major broadcasting."""
    return r.reshape((len(r),) + (1,) * (ndim - 1))


def _rotl_pair(lo, hi, r):
    """Rotate-left the 64-bit lanes (lo, hi) by static per-lane amounts r.

    r is a numpy uint32 vector over the leading lane axis; all shift amounts
    stay in [0, 31] by construction (the 32-shift composes two sub-shifts).
    """
    import jax.numpy as jnp

    swap = _bcast((r >= 32), lo.ndim)
    rp = _bcast((r % 32).astype(np.uint32), lo.ndim)
    inv = _bcast((31 - (r % 32)).astype(np.uint32), lo.ndim)  # in [0, 31]
    swap_b = jnp.asarray(swap)
    lo1 = jnp.where(swap_b, hi, lo)
    hi1 = jnp.where(swap_b, lo, hi)
    rp_b = jnp.asarray(rp)
    inv_b = jnp.asarray(inv)
    new_lo = (lo1 << rp_b) | ((hi1 >> jnp.uint32(1)) >> inv_b)
    new_hi = (hi1 << rp_b) | ((lo1 >> jnp.uint32(1)) >> inv_b)
    return new_lo, new_hi


def keccak_f(lo, hi):
    """Keccak-f[1600] on a batch of states.

    lo/hi: uint32 arrays of shape [25, ...batch] (lane i = x + 5y on the
    LEADING axis, little-endian 64-bit lane split into 32-bit planes).
    Returns the permuted planes.
    """
    import jax.numpy as jnp

    rot1 = np.uint32(1)
    rot31 = np.uint32(31)
    tile_reps = (5,) + (1,) * (lo.ndim - 1)
    for rc in _RC:
        # theta: C[x] = xor over y of A[x, y]; lane i = x + 5y, so the y-rows
        # are the contiguous 5-slices on the lane axis
        c_lo = lo[0:5] ^ lo[5:10] ^ lo[10:15] ^ lo[15:20] ^ lo[20:25]
        c_hi = hi[0:5] ^ hi[5:10] ^ hi[10:15] ^ hi[15:20] ^ hi[20:25]
        c1_lo = (c_lo << rot1) | (c_hi >> rot31)
        c1_hi = (c_hi << rot1) | (c_lo >> rot31)
        d_lo = jnp.roll(c_lo, 1, axis=0) ^ jnp.roll(c1_lo, -1, axis=0)
        d_hi = jnp.roll(c_hi, 1, axis=0) ^ jnp.roll(c1_hi, -1, axis=0)
        lo = lo ^ jnp.tile(d_lo, tile_reps)
        hi = hi ^ jnp.tile(d_hi, tile_reps)
        # rho
        r_lo, r_hi = _rotl_pair(lo, hi, _ROT)
        # pi (static row reorder)
        b_lo = r_lo[_PI_SRC]
        b_hi = r_hi[_PI_SRC]
        # chi
        lo = b_lo ^ (~b_lo[_CHI_1] & b_lo[_CHI_2])
        hi = b_hi ^ (~b_hi[_CHI_1] & b_hi[_CHI_2])
        # iota
        lo = lo.at[0].set(lo[0] ^ np.uint32(rc & 0xFFFFFFFF))
        hi = hi.at[0].set(hi[0] ^ np.uint32(rc >> 32))
    return lo, hi


def keccak_f_looped(lo, hi):
    """``keccak_f`` with the 24 rounds as a ``lax.fori_loop``.

    Bit-identical to the unrolled form but ~24x smaller as a traced graph —
    used by graph-heavy callers (the single-dispatch FRI chain traces
    hundreds of permutations; unrolled they blow up XLA compile time).
    """
    import jax.numpy as jnp
    from jax import lax

    rot1 = np.uint32(1)
    rot31 = np.uint32(31)
    tile_reps = (5,) + (1,) * (lo.ndim - 1)
    rc_lo = jnp.asarray(
        np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
    )
    rc_hi = jnp.asarray(np.array([rc >> 32 for rc in _RC], dtype=np.uint32))

    def round_fn(i, state):
        lo, hi = state
        c_lo = lo[0:5] ^ lo[5:10] ^ lo[10:15] ^ lo[15:20] ^ lo[20:25]
        c_hi = hi[0:5] ^ hi[5:10] ^ hi[10:15] ^ hi[15:20] ^ hi[20:25]
        c1_lo = (c_lo << rot1) | (c_hi >> rot31)
        c1_hi = (c_hi << rot1) | (c_lo >> rot31)
        d_lo = jnp.roll(c_lo, 1, axis=0) ^ jnp.roll(c1_lo, -1, axis=0)
        d_hi = jnp.roll(c_hi, 1, axis=0) ^ jnp.roll(c1_hi, -1, axis=0)
        lo = lo ^ jnp.tile(d_lo, tile_reps)
        hi = hi ^ jnp.tile(d_hi, tile_reps)
        r_lo, r_hi = _rotl_pair(lo, hi, _ROT)
        b_lo = r_lo[_PI_SRC]
        b_hi = r_hi[_PI_SRC]
        lo = b_lo ^ (~b_lo[_CHI_1] & b_lo[_CHI_2])
        hi = b_hi ^ (~b_hi[_CHI_1] & b_hi[_CHI_2])
        lo = lo.at[0].set(lo[0] ^ rc_lo[i])
        hi = hi.at[0].set(hi[0] ^ rc_hi[i])
        return (lo, hi)

    lo, hi = lax.fori_loop(0, 24, round_fn, (lo, hi))
    return lo, hi


def sha3_256_single_block(words, looped: bool = False):
    """SHA3-256 of a batch of pre-padded single-rate-block messages.

    words: uint32 [34, ...batch] — the 136-byte padded block as little-endian
    words on the LEADING axis (caller applies the 0x06 ... 0x80 padding).
    Returns uint32 [8, ...batch]: the 32-byte digest as LE words.
    ``looped=True`` uses the fori_loop permutation (small traced graph).
    """
    import jax.numpy as jnp

    zeros = jnp.zeros((8,) + words.shape[1:], dtype=jnp.uint32)
    lo = jnp.concatenate([words[0::2], zeros], axis=0)
    hi = jnp.concatenate([words[1::2], zeros], axis=0)
    lo, hi = (keccak_f_looped if looped else keccak_f)(lo, hi)
    digest = jnp.stack(
        [lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], lo[3], hi[3]], axis=0
    )
    return digest


def leaf_block_words(a0, a1, b0, b1):
    """Padded block for a Merkle leaf ``0x00 || pack("<QQ", v_lo, v_hi)``.

    a0/a1 = v_lo as (low, high) uint32 batches; b0/b1 = v_hi. Returns
    uint32 [34, ...batch].
    """
    import jax.numpy as jnp

    m24 = jnp.uint32(0x00FFFFFF)
    z = jnp.zeros_like(a0)
    w = [z] * _RATE_WORDS
    w[0] = (a0 & m24) << jnp.uint32(8)
    w[1] = (a0 >> jnp.uint32(24)) | (a1 << jnp.uint32(8))
    w[2] = (a1 >> jnp.uint32(24)) | (b0 << jnp.uint32(8))
    w[3] = (b0 >> jnp.uint32(24)) | (b1 << jnp.uint32(8))
    w[4] = (b1 >> jnp.uint32(24)) | jnp.uint32(0x06 << 8)
    w[33] = jnp.full_like(a0, jnp.uint32(0x80000000))
    return jnp.stack(w, axis=0)


def leaf_block_words_flex(words):
    """Padded block for a Merkle leaf ``0x00 || payload`` where the payload
    is the uint32 LE words in ``words`` (list of [...batch] arrays, one per
    4 payload bytes, byte order = word order). Payload must fit a single
    rate block: len(words) <= 32 (128 bytes + prefix + padding <= 136).

    Generalizes :func:`leaf_block_words` to G-oracle interleaved leaves
    (``pack("<QQ", lo_g, hi_g)`` per oracle -> 4 words per oracle).
    """
    import jax.numpy as jnp

    p = len(words)
    if p > 32:
        raise ValueError(f"leaf payload {4 * p} bytes exceeds one rate block")
    m24 = jnp.uint32(0x00FFFFFF)
    z = jnp.zeros_like(words[0])
    w = [z] * _RATE_WORDS
    w[0] = (words[0] & m24) << jnp.uint32(8)
    for k in range(1, p):
        w[k] = (words[k - 1] >> jnp.uint32(24)) | (words[k] << jnp.uint32(8))
    w[p] = (words[p - 1] >> jnp.uint32(24)) | jnp.uint32(0x06 << 8)
    w[33] = jnp.full_like(z, jnp.uint32(0x80000000))
    return jnp.stack(w, axis=0)


def hash_leaves_flex(words, looped: bool = False):
    """Digest words [8, ...batch] for flexible-payload Merkle leaves."""
    return sha3_256_single_block(leaf_block_words_flex(words), looped)


def node_block_words(left, right):
    """Padded block for an interior node ``0x01 || left || right``.

    left/right: uint32 [8, ...batch] digest words. Returns uint32
    [34, ...batch].
    """
    import jax.numpy as jnp

    m24 = jnp.uint32(0x00FFFFFF)
    z = jnp.zeros_like(left[0])
    w = [z] * _RATE_WORDS
    w[0] = ((left[0] & m24) << jnp.uint32(8)) | jnp.uint32(0x01)
    for k in range(1, 8):
        w[k] = (left[k - 1] >> jnp.uint32(24)) | (left[k] << jnp.uint32(8))
    w[8] = (left[7] >> jnp.uint32(24)) | (right[0] << jnp.uint32(8))
    for k in range(9, 16):
        w[k] = (right[k - 9] >> jnp.uint32(24)) | (right[k - 8] << jnp.uint32(8))
    w[16] = (right[7] >> jnp.uint32(24)) | jnp.uint32(0x06 << 8)
    w[33] = jnp.full_like(z, jnp.uint32(0x80000000))
    return jnp.stack(w, axis=0)


def hash_leaves(a0, a1, b0, b1, looped: bool = False):
    """Digest words [8, ...batch] for Merkle leaves from uint32 value planes."""
    return sha3_256_single_block(leaf_block_words(a0, a1, b0, b1), looped)


def hash_nodes(left, right, looped: bool = False):
    """Digest words [8, ...batch] for interior nodes from child digest words
    (lane-major: leading axis = the 8 digest words)."""
    return sha3_256_single_block(node_block_words(left, right), looped)


# --- full-tree builder ----------------------------------------------------------

_tree_cache = {}


def _tree_fn(half: int, min_rows: int):
    """Jitted builder: value planes [T, half] -> tuple of digest levels
    [T, k, 8], stopping once a level has <= min_rows rows (the host finishes
    the tiny top — keeps the unrolled graph shallow)."""
    import jax
    import jax.numpy as jnp

    key = (half, min_rows)
    if key in _tree_cache:
        return _tree_cache[key]

    def build(a0, a1, b0, b1):
        # lane-major internally: [8, T, k]. On TPU the hashes route to the
        # Pallas kernel (ops/keccak_pallas.py, ~130x the XLA form); on CPU
        # the looped XLA Keccak keeps the traced graph ~24x smaller
        # (bit-identical either way).
        from . import keccak_pallas as kp

        levels = [kp.hash_leaves(a0, a1, b0, b1, looped=True)]
        cur = levels[0]
        size = half
        while size > min_rows and size > 1:
            cur = kp.hash_nodes(cur[..., 0::2], cur[..., 1::2], looped=True)
            levels.append(cur)
            size //= 2
        # word-minor on the way out: [T, k, 8]
        return tuple(jnp.moveaxis(level, 0, -1) for level in levels)

    fn = jax.jit(build)
    _tree_cache[key] = fn
    return fn


_tree_flex_cache = {}


def _tree_fn_flex(p: int, half: int, min_rows: int):
    """Jitted builder for flexible leaves: stacked payload words [P, T, half]
    -> tuple of digest levels [T, k, 8] (stops at <= min_rows rows)."""
    import jax
    import jax.numpy as jnp

    key = (p, half, min_rows)
    if key in _tree_flex_cache:
        return _tree_flex_cache[key]

    def build(words):
        from . import keccak_pallas as kp

        levels = [kp.hash_leaves_flex(words, looped=True)]
        cur = levels[0]
        size = half
        while size > min_rows and size > 1:
            cur = kp.hash_nodes(cur[..., 0::2], cur[..., 1::2], looped=True)
            levels.append(cur)
            size //= 2
        return tuple(jnp.moveaxis(level, 0, -1) for level in levels)

    fn = jax.jit(build)
    _tree_flex_cache[key] = fn
    return fn


def group_leaf_words(vals: np.ndarray):
    """uint64 [..., G, n] codeword group -> the 4G uint32 leaf payload word
    planes [...shape..., half] for interleaved leaves
    ``concat_g pack("<QQ", v_g[i], v_g[i+half])``."""
    half = vals.shape[-1] // 2
    lo = vals[..., :half]
    hi = vals[..., half:]
    words = []
    g_axis = vals.ndim - 2
    for g in range(vals.shape[g_axis]):
        lo_g = np.take(lo, g, axis=g_axis)
        hi_g = np.take(hi, g, axis=g_axis)
        words.append((lo_g & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        words.append((lo_g >> np.uint64(32)).astype(np.uint32))
        words.append((hi_g & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        words.append((hi_g >> np.uint64(32)).astype(np.uint32))
    return words


def merkle_levels_u64_groups(vals: np.ndarray, min_rows: int = 1):
    """Build Merkle digest levels for interleaved group leaves on the
    accelerator.

    vals: uint64 [T, G, n] (T trees over G equal-size codewords each).
    Leaf i of tree t is ``concat_g pack("<QQ", vals[t,g,i], vals[t,g,i+half])``
    with the 0x00 prefix — the layout of ``proof.fri.commit_codeword_group``.
    Returns uint32 levels [T, k, 8] down to <= min_rows rows, bit-identical
    to the hashlib path.
    """
    t, g, n = vals.shape
    half = n // 2
    if half == 0 or half & (half - 1):
        raise ValueError(f"leaf count must be a power of two, got {half}")
    import jax.numpy as jnp

    words = [jnp.asarray(w) for w in group_leaf_words(vals)]
    fn = _tree_fn_flex(4 * g, half, min_rows)
    levels = fn(words)
    return [np.asarray(level) for level in levels]


def merkle_levels_u64_pairs(
    v_lo: np.ndarray, v_hi: np.ndarray, min_rows: int = 1
):
    """Build Merkle digest levels for paired-value leaves on the accelerator.

    v_lo, v_hi: uint64 numpy arrays of shape [T, half] (T trees of equal
    size) or [half]. Leaf i of each tree is ``pack("<QQ", v_lo[i], v_hi[i])``
    with the 0x00 leaf prefix — the exact layout of
    ``proof.fri.commit_codeword``. Returns a list of uint32 numpy arrays
    [T, k, 8] (or [k, 8]) from the hashed-leaf level up to the first level
    with <= ``min_rows`` rows, bit-identical to the hashlib path.
    """
    a0 = (v_lo & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    a1 = (v_lo >> np.uint64(32)).astype(np.uint32)
    b0 = (v_hi & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b1 = (v_hi >> np.uint64(32)).astype(np.uint32)
    half = v_lo.shape[-1]
    if half & (half - 1):
        raise ValueError(f"leaf count must be a power of two, got {half}")
    fn = _tree_fn(half, min_rows)
    levels = fn(a0, a1, b0, b1)
    return [np.asarray(level) for level in levels]


def digest_words_to_bytes(words: np.ndarray) -> np.ndarray:
    """uint32 [..., 8] digest words -> uint8 [..., 32] digest bytes."""
    # astype(order='K') keeps input strides; device arrays can arrive
    # non-contiguous, and a dtype-size-changing view needs a contiguous
    # last axis
    le = np.ascontiguousarray(words.astype("<u4"))
    return le.view(np.uint8).reshape(words.shape[:-1] + (32,))
