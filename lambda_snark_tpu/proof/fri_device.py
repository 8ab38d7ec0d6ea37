"""Device-resident FRI proving (Goldilocks): the relay-friendly data path.

``fri.fri_prove`` + ``merkle.build_forest_u64_pairs`` move every codeword and
every Merkle level between host and device (~20 MB per m=2^13 proof through
the sandbox relay — the measured 2.5 s warm succinct prove is transfer-bound,
not compute-bound). This module keeps the proof data RESIDENT on the
accelerator:

- codewords live as (4, S, n) uint32 digit planes (S = statement batch),
- each fold layer is one jitted dispatch (``modarith`` digit arithmetic with
  a cached per-layer 1/x table),
- each Merkle forest is one jitted Keccak dispatch whose levels STAY on
  device; the host pulls only the <=128-row top (4 KB) to finish the root,
- query openings (values + authentication paths) are assembled by ONE jitted
  gather over all stored layers and pulled as a single flat array.

Per fold round the host sees 32 bytes of root; everything else crosses the
relay once, at the end. Proof bytes are bit-identical to ``fri.fri_prove``
(pinned in tests/test_fri_device.py).

Reference anchor: this accelerates the succinct-opening layer that replaces
the reference's stubbed openings (``lib.rs:788-791``); transcript and wire
format are unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core import field
from ..core.errors import DomainError
from ..core.params import NTT_MODULUS
from ..ops import goldilocks_np as glnp
from ..ops import keccak_jax as kj
from ..ops import keccak_pallas as kp
from ..ops import modarith
from ..ops.limb import from_limbs_u64, int_to_digits, modulus_ctx, u64_to_limbs
from ..r1cs.poly import ntt_inverse
from .fri import (
    FriParams,
    FriProof,
    FriQuery,
    FriTranscript,
    GroupOpening,
    LayerOpening,
    _effective_final_len,
    _gl_powers,
)

P = NTT_MODULUS
_CTX = modulus_ctx(P)
_D = 4
_INV2_DIGITS = tuple(int_to_digits(field.mod_inverse(2, P), _D))


def planes_from_u64(arr: np.ndarray):
    """Host uint64 array -> device (4, ...) digit planes."""
    import jax.numpy as jnp

    return jnp.asarray(u64_to_limbs(arr, _D))


# --- device Merkle forest -------------------------------------------------------


@dataclasses.dataclass(eq=False)
class DevForest:
    """T Merkle trees with ALL levels resident on device.

    levels_dev: tuple of jax arrays [8, T, rows] (uint32 digest words,
    lane-major), leaf level upward, down to the 1-row root level — full
    depth, so query paths never need host data.
    """

    levels_dev: tuple
    roots: List[bytes]
    num_leaves: int

    @property
    def n_trees(self) -> int:
        return len(self.roots)


def _tree_levels_in_graph(planes4, looped: bool = False) -> List:
    """(4, T, n) planes -> lane-major digest levels [8, T, rows], leaf
    level down to the single-row root. Pure function (traceable inside a
    larger graph)."""
    half = planes4.shape[-1] // 2
    lo32 = planes4[0] | (planes4[1] << 16)
    hi32 = planes4[2] | (planes4[3] << 16)
    a0, a1 = lo32[..., :half], hi32[..., :half]
    b0, b1 = lo32[..., half:], hi32[..., half:]
    levels = [kp.hash_leaves(a0, a1, b0, b1, looped)]
    cur = levels[0]
    size = half
    while size > 1:
        cur = kp.hash_nodes(cur[..., 0::2], cur[..., 1::2], looped)
        levels.append(cur)
        size //= 2
    return levels


_TREE_CACHE: dict = {}


def _tree_from_planes_fn(t: int, n: int):
    """Jitted: (4, T, n) planes -> full digest levels for T trees."""
    key = (t, n)
    if key in _TREE_CACHE:
        return _TREE_CACHE[key]
    import jax

    # looped Keccak: bit-identical, ~24x smaller traced graph (the unrolled
    # form cost ~320 s of XLA compile at n = 2^16 leaf batches)
    fn = jax.jit(lambda planes4: tuple(_tree_levels_in_graph(planes4, True)))
    _TREE_CACHE[key] = fn
    return fn


def forest_from_levels(levels, root_words=None) -> DevForest:
    """Wrap already-computed device digest levels (leaf level first, root
    level last, lane-major [8, T, rows]) as a DevForest; pulls only the
    32 B/tree roots (or none at all when the caller already pulled
    ``root_words`` [8, T] as part of a combined transfer)."""
    if root_words is None:
        root_words = np.asarray(levels[-1])[..., 0]  # [8, T]
    roots = [
        bytes(row) for row in _digest_block_bytes(root_words)
    ]
    return DevForest(
        levels_dev=tuple(levels), roots=roots,
        num_leaves=int(levels[0].shape[-1]),
    )


def commit_planes_dev(planes4) -> DevForest:
    """(4, T, n) device planes -> DevForest of T trees (one device dispatch
    plus one 32 B/tree root pull). Leaf i pairs values (i, i + n/2), the
    exact layout of ``fri.commit_codeword``."""
    _four, t, n = planes4.shape
    if n < 4 or n & (n - 1):
        raise DomainError(f"codeword size must be a power of two >= 4, got {n}")
    return forest_from_levels(_tree_from_planes_fn(t, n)(planes4))


def _tree_levels_in_graph_groups(planesK, looped: bool = False) -> List:
    """(4, S, K, n) planes -> lane-major digest levels [8, S, rows] for S
    interleaved-group trees (leaf i concatenates all K oracles' (lo, hi)
    pairs — the layout of ``fri.commit_codeword_group``)."""
    half = planesK.shape[-1] // 2
    low32 = planesK[0] | (planesK[1] << 16)  # (S, K, n)
    high32 = planesK[2] | (planesK[3] << 16)
    words = []
    for k in range(planesK.shape[2]):
        words.append(low32[:, k, :half])
        words.append(high32[:, k, :half])
        words.append(low32[:, k, half:])
        words.append(high32[:, k, half:])
    levels = [kp.hash_leaves_flex(words, looped)]
    cur = levels[0]
    size = half
    while size > 1:
        cur = kp.hash_nodes(cur[..., 0::2], cur[..., 1::2], looped)
        levels.append(cur)
        size //= 2
    return levels


_TREE_GROUP_CACHE: dict = {}


def _tree_from_planes_groups_fn(s: int, k: int, n: int):
    key = (s, k, n)
    if key in _TREE_GROUP_CACHE:
        return _TREE_GROUP_CACHE[key]
    import jax

    fn = jax.jit(
        lambda planesK: tuple(_tree_levels_in_graph_groups(planesK, True))
    )
    _TREE_GROUP_CACHE[key] = fn
    return fn


def commit_planes_dev_groups(planesK) -> DevForest:
    """(4, S, K, n) device planes -> DevForest of S interleaved-group trees
    (one dispatch + one 32 B/tree root pull)."""
    _four, s, k, n = planesK.shape
    if n < 4 or n & (n - 1):
        raise DomainError(f"codeword size must be a power of two >= 4, got {n}")
    return forest_from_levels(_tree_from_planes_groups_fn(s, k, n)(planesK))


# --- fold -----------------------------------------------------------------------


_FOLD_CACHE: dict = {}


def _fold_fn(shape: Tuple[int, ...]):
    """Jitted fold: (4, ..., n) planes x (4, half) table x (4, ..., 1)
    challenge -> (4, ..., half). v' = ((lo+hi) + c*(lo-hi)/x) / 2."""
    if shape in _FOLD_CACHE:
        return _FOLD_CACHE[shape]
    import jax

    n = shape[-1]
    half = n // 2

    def fold(planes4, inv4, c4):
        lo = planes4[..., :half]
        hi = planes4[..., half:]
        bcast = (slice(None),) + (None,) * (planes4.ndim - 2) + (slice(None),)
        t = modarith.mul_mod(
            _CTX,
            modarith.mul_mod(_CTX, c4, modarith.sub_mod(_CTX, lo, hi)),
            inv4[bcast],
        )
        s = modarith.add_mod(_CTX, modarith.add_mod(_CTX, lo, hi), t)
        return modarith.cpu_fusion_barrier(
            modarith.mul_mod_const(_CTX, s, _INV2_DIGITS)
        )

    fn = jax.jit(fold)
    _FOLD_CACHE[shape] = fn
    return fn


_TABLE_CACHE: dict = {}


def _layer_inv_tables(n0: int, offset: int, omega: int) -> List:
    """Per-fold-layer 1/x tables (device digit planes), cached per config.

    Layer k folds a length n0 >> k codeword on the coset
    offset^(2^k) * <omega^(2^k)>; its table is inv(off_k) * inv(om_k)^i."""
    key = (n0, offset, omega)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    import jax.numpy as jnp

    tabs = []
    off, om, n = offset, omega, n0
    while n >= 4:
        half = n // 2
        inv_xs = glnp.gl_mul(
            np.uint64(field.mod_inverse(off, P)),
            _gl_powers(field.mod_inverse(om, P), half),
        )
        tabs.append(jnp.asarray(u64_to_limbs(inv_xs, _D)))
        off = off * off % P
        om = om * om % P
        n = half
    _TABLE_CACHE[key] = tabs
    return tabs


# --- device DEEP quotient ---------------------------------------------------------


_XS_CACHE: dict = {}


def _coset_planes(n0: int, offset: int, omega: int):
    """Device (4, n0) digit planes of the coset points offset * omega^i."""
    key = (n0, offset, omega)
    if key not in _XS_CACHE:
        import jax.numpy as jnp

        xs = glnp.gl_mul(np.uint64(offset), _gl_powers(omega, n0))
        _XS_CACHE[key] = jnp.asarray(u64_to_limbs(xs, _D))
    return _XS_CACHE[key]


def _inv_planes(planes):
    """Fermat inverse x^(p-2) on digit planes (exact square-and-multiply;
    zero maps to zero like ``field.mod_inverse`` never being called on it —
    DEEP denominators x - alpha are nonzero w.o.p., matching the host path
    which would raise on a zero denominator).

    The 63-step ladder runs as a ``fori_loop`` with a static bit table and a
    masked multiply: the traced graph is 2 mul_mods instead of ~95 (the
    unrolled form cost ~90 s of XLA compile); the barrier per step keeps
    XLA:CPU from re-expanding the chain (no-op on TPU)."""
    import jax.numpy as jnp
    from jax import lax

    bits = [int(b) for b in bin(P - 2)[2:]]  # MSB first; bits[0] == 1
    bits_arr = jnp.asarray(np.array(bits[1:], dtype=np.uint32))
    planes = modarith.cpu_fusion_barrier(planes)

    def body(i, acc):
        acc = modarith.cpu_fusion_barrier(modarith.mul_mod(_CTX, acc, acc))
        mul = modarith.mul_mod(_CTX, acc, planes)
        acc = jnp.where(bits_arr[i] != 0, mul, acc)
        return modarith.cpu_fusion_barrier(acc)

    return lax.fori_loop(0, len(bits) - 1, body, planes)


_DEEP_CACHE: dict = {}


def _deep_fn(shape: Tuple[int, ...]):
    """Jitted batched DEEP quotient combine.

    (4, S, K, n) codeword planes, (4, n) coset planes, per-statement
    challenge planes -> (4, S, n) combined quotient:
        g = sum_k lam^(2k) (cw_k - ev_a_k)/(x - alpha)
                + lam^(2k+1) (cw_k - ev_b_k)/(x - beta)
    with the lam powers precomputed host-side as (4, S, K, 1) planes.
    """
    if shape in _DEEP_CACHE:
        return _DEEP_CACHE[shape]
    import jax

    def deep(cw, xs, alpha4, beta4, ev_a, ev_b, lam_a, lam_b):
        # cw (4,S,K,n); xs (4,n); alpha4/beta4 (4,S,1); ev_* (4,S,K,1);
        # lam_* (4,S,K,1)
        xsb = xs[:, None, :]
        inv_a = modarith.cpu_fusion_barrier(
            _inv_planes(modarith.sub_mod(_CTX, xsb, alpha4))
        )  # (4,S,n)
        inv_b = modarith.cpu_fusion_barrier(
            _inv_planes(modarith.sub_mod(_CTX, xsb, beta4))
        )
        term_a = modarith.mul_mod(
            _CTX,
            modarith.mul_mod(
                _CTX, lam_a, modarith.sub_mod(_CTX, cw, ev_a)
            ),
            inv_a[:, :, None, :],
        )
        term_b = modarith.mul_mod(
            _CTX,
            modarith.mul_mod(
                _CTX, lam_b, modarith.sub_mod(_CTX, cw, ev_b)
            ),
            inv_b[:, :, None, :],
        )
        tot = modarith.add_mod(_CTX, term_a, term_b)  # (4,S,K,n)
        g = tot[:, :, 0, :]
        for k in range(1, tot.shape[2]):
            g = modarith.add_mod(_CTX, g, tot[:, :, k, :])
        return modarith.cpu_fusion_barrier(g)

    fn = jax.jit(deep)
    _DEEP_CACHE[shape] = fn
    return fn


def deep_combine_device(
    input_planes,
    alphas: np.ndarray,
    betas: np.ndarray,
    lams: np.ndarray,
    evals: np.ndarray,
    offset: int,
    omega: int,
    lam_tables=None,
):
    """Batched DEEP quotient on device (no codeword pull, no g upload).

    input_planes: (4, S, K, n0) device planes. alphas/betas/lams: (S,)
    uint64. evals: (S, 2K) uint64 claimed evaluations (alpha block then
    beta block), matching ``succinct.prove_r1cs_succinct``'s ordering.
    Returns (4, S, n0) device planes of g, bit-identical to the host
    vectorized DEEP combine.
    """
    _four, s, k_in, n0 = input_planes.shape
    xs = _coset_planes(n0, offset, omega)
    if lam_tables is not None:
        # caller-supplied (S, K) power tables (the aggregate prover's
        # cross-statement lambda ladder)
        lam_a, lam_b = lam_tables
    else:
        # lam powers — mirror the host loop exactly: lam_pow_0 = 1;
        # per k: lam2 = lam_pow * lam; next lam_pow = lam2 * lam.
        lam_a = np.empty((s, k_in), dtype=np.uint64)
        lam_b = np.empty((s, k_in), dtype=np.uint64)
        for si in range(s):
            lam = int(lams[si])
            lam_pow = 1
            for k in range(k_in):
                lam2 = lam_pow * lam % P
                lam_a[si, k] = lam_pow
                lam_b[si, k] = lam2
                lam_pow = lam2 * lam % P
    ev_a = np.ascontiguousarray(evals[:, :k_in])
    ev_b = np.ascontiguousarray(evals[:, k_in:])

    def plan4(arr, trail):
        return planes_from_u64(np.asarray(arr, dtype=np.uint64)).reshape(
            (4,) + arr.shape + (1,) * trail
        )

    return _deep_fn(tuple(input_planes.shape))(
        input_planes,
        xs,
        plan4(alphas, 1),
        plan4(betas, 1),
        plan4(ev_a, 1),
        plan4(ev_b, 1),
        plan4(lam_a, 1),
        plan4(lam_b, 1),
    )


# --- the batched gather ----------------------------------------------------------


def _gather_flat(specs: tuple, arrays: list, idxs: list):
    """One jitted dispatch gathering every query-opening element.

    specs[i] in {"planes", "planesK", "level"}:
      planes : arr (4, S, n),    idx (S, Q)     -> (4, S, Q)
      planesK: arr (4, S, K, n), idx (S, Q)     -> (4, S, K, Q)
      level  : arr (8, T, rows), idx (T, Q)     -> (8, T, Q)
    Returns one flat uint32 array (a single relay pull syncs everything).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def g(arrays, idxs):
        outs = []
        for kind, arr, idx in zip(specs, arrays, idxs):
            outs.append(_take_spec(kind, arr, idx).reshape(-1))
        return jnp.concatenate(outs)

    return np.asarray(g(arrays, idxs))


def _take_spec(kind: str, arr, idx):
    import jax.numpy as jnp

    if kind == "planes":
        return jnp.take_along_axis(arr, idx[None, :, :], axis=2)
    if kind == "planesK":
        return jnp.take_along_axis(arr, idx[None, :, None, :], axis=3)
    return jnp.take_along_axis(arr, idx[None, :, :], axis=2)  # level


def _split_flat(specs, shapes, flat: np.ndarray) -> List[np.ndarray]:
    out = []
    off = 0
    for shape in shapes:
        size = int(np.prod(shape))
        out.append(flat[off:off + size].reshape(shape))
        off += size
    assert off == flat.size
    return out


def _digest_bytes(words8: np.ndarray) -> bytes:
    return kj.digest_words_to_bytes(words8.reshape(1, 8))[0].tobytes()


def _digest_block_bytes(words8: np.ndarray) -> np.ndarray:
    """uint32 [8, ...] digest words -> uint8 [..., 32], one vectorized pass
    (the per-element ``_digest_bytes`` loop dominated proof reconstruction)."""
    le = np.ascontiguousarray(np.moveaxis(words8, 0, -1).astype("<u4"))
    return le.view(np.uint8).reshape(words8.shape[1:] + (32,))


def _u64_of_plane_cols(cols: np.ndarray) -> int:
    """(4,) uint32 digit column -> int value."""
    return int(
        int(cols[0]) | (int(cols[1]) << 16) | (int(cols[2]) << 32)
        | (int(cols[3]) << 48)
    )


# --- the device-resident prover ---------------------------------------------------


def fri_prove_device(
    g_planes,
    input_planes,
    input_forest: DevForest,
    offset: int,
    omega: int,
    q: int,
    params: FriParams,
    trs: Sequence[FriTranscript],
    n_groups: int = 1,
) -> List[FriProof]:
    """Batched device-resident ``fri.fri_prove``; returns one FriProof per
    statement, byte-identical to the host prover.

    g_planes: (4, S, n0) device planes of the combined DEEP quotients.
    input_planes: (4, S, K, n0) device planes of the committed input
    codewords (K per statement). input_forest: DevForest of S
    interleaved-group trees as built by ``commit_planes_dev_groups`` on
    input_planes. trs: one transcript per statement, already seeded with
    roots/evals by the caller.

    ``n_groups > 1`` (the aggregate prover): each FRI statement's K oracles
    split into n_groups interleaved trees of K/n_groups oracles each
    (tree order s-major, group-minor), all opened at the shared indices.
    """
    if q != P:
        raise DomainError("device FRI is implemented for the Goldilocks modulus")
    params.validate()
    if DEVICE_TRANSCRIPT:
        return fri_prove_device_chain(
            g_planes, input_planes, input_forest, offset, omega, q, params,
            trs, n_groups=n_groups,
        )
    _four, s, k_in, n0 = input_planes.shape
    assert g_planes.shape == (_D, s, n0)
    assert input_forest.n_trees == s * n_groups
    gsize = k_in // n_groups
    assert gsize * n_groups == k_in
    d_bound = n0 >> params.log_blowup
    final_len = _effective_final_len(d_bound, params.final_len)
    tabs = _layer_inv_tables(n0, offset, omega)

    committed: List[Tuple[object, DevForest]] = []  # (planes, forest)
    cur = g_planes
    off, om, d, n = offset, omega, d_bound, n0
    layer = 0
    while True:
        cs = np.array(
            [tr.challenge_field(q, b"fri-fold") for tr in trs], dtype=np.uint64
        )
        c4 = planes_from_u64(cs)[:, :, None]  # (4, S, 1)
        cur = _fold_fn((4, s, n))(cur, tabs[layer], c4)
        layer += 1
        off = off * off % q
        om = om * om % q
        d >>= 1
        n //= 2
        if d <= final_len:
            break
        forest = commit_planes_dev(cur)
        committed.append((cur, forest))
        for si in range(s):
            trs[si].absorb(b"fri-layer-root", forest.roots[si])

    # final polynomial per statement (tiny pull)
    cur_np = from_limbs_u64(np.asarray(cur))  # (S, n)
    finals: List[List[int]] = []
    inv_off = field.mod_inverse(off, q)
    for si in range(s):
        coeffs = ntt_inverse([int(v) for v in cur_np[si]], q, om)
        acc = 1
        fin: List[int] = []
        for cf in coeffs:
            fin.append(cf * acc % q)
            acc = acc * inv_off % q
        if any(fin[final_len:]):
            raise DomainError("FRI final polynomial exceeds its degree bound")
        fin = fin[:final_len]
        trs[si].absorb_words(b"fri-final", fin)
        finals.append(fin)

    all_indices = [
        trs[si].challenge_indices(n0 // 2, params.num_queries, b"fri-query")
        for si in range(s)
    ]
    nq = params.num_queries
    idx_s = np.array(all_indices, dtype=np.int32)  # (S, Q)

    # --- build the single gather ---------------------------------------------
    specs: List[str] = []
    arrays: List = []
    idxs: List[np.ndarray] = []
    shapes: List[tuple] = []

    def add(kind: str, arr, idx: np.ndarray, shape: tuple):
        specs.append(kind)
        arrays.append(arr)
        idxs.append(idx)
        shapes.append(shape)

    import jax.numpy as jnp

    # input values at i0 and i0 + half (two planesK gathers)
    half0 = n0 // 2
    add("planesK", input_planes, idx_s, (4, s, k_in, nq))
    add("planesK", input_planes, idx_s + half0, (4, s, k_in, nq))
    # input forest siblings: full path device-gathered, sibling (i0>>l)^1
    d_dev_in = len(input_forest.levels_dev)
    idx_rep = (
        np.repeat(idx_s, n_groups, axis=0) if n_groups > 1 else idx_s
    )  # (S*G, Q)
    for lvl in range(d_dev_in - 1):
        sib = ((idx_rep >> lvl) ^ 1).astype(np.int32)
        add("level", input_forest.levels_dev[lvl], sib,
            (8, s * n_groups, nq))
    # committed layers
    pos = idx_s.copy()  # folded position inside the next layer
    layer_meta = []
    for values, forest in committed:
        half = forest.num_leaves
        p = (pos % half).astype(np.int32)
        add("planes", values, p, (4, s, nq))
        add("planes", values, p + half, (4, s, nq))
        d_dev = len(forest.levels_dev)
        for lvl in range(d_dev - 1):
            sib = ((p >> lvl) ^ 1).astype(np.int32)
            add("level", forest.levels_dev[lvl], sib, (8, s, nq))
        layer_meta.append((p, d_dev, forest))
        pos = p

    flat = _gather_flat(tuple(specs), arrays, [jnp.asarray(i) for i in idxs])
    parts = _split_flat(specs, shapes, flat)

    # --- unpack ----------------------------------------------------------------
    part_iter = iter(parts)
    in_lo = next(part_iter)  # (4, S, K, Q)
    in_hi = next(part_iter)
    in_sibs = [next(part_iter) for _ in range(max(d_dev_in - 1, 0))]
    layer_parts = []
    for p, d_dev, forest in layer_meta:
        v_lo = next(part_iter)
        v_hi = next(part_iter)
        sibs = [next(part_iter) for _ in range(max(d_dev - 1, 0))]
        layer_parts.append((p, d_dev, forest, v_lo, v_hi, sibs))

    proofs: List[FriProof] = []
    for si in range(s):
        queries: List[FriQuery] = []
        for qi in range(nq):
            input_openings = []
            for g in range(n_groups):
                tree_idx = si * n_groups + g
                path = [
                    _digest_bytes(in_sibs[lvl][:, tree_idx, qi])
                    for lvl in range(d_dev_in - 1)
                ]
                vals = []
                for k in range(g * gsize, (g + 1) * gsize):
                    vals.append(_u64_of_plane_cols(in_lo[:, si, k, qi]))
                    vals.append(_u64_of_plane_cols(in_hi[:, si, k, qi]))
                input_openings.append(GroupOpening(tuple(vals), tuple(path)))
            layer_openings = []
            for (p, d_dev, forest, v_lo, v_hi, sibs) in layer_parts:
                path = [
                    _digest_bytes(sibs[lvl][:, si, qi])
                    for lvl in range(d_dev - 1)
                ]
                layer_openings.append(
                    LayerOpening(
                        _u64_of_plane_cols(v_lo[:, si, qi]),
                        _u64_of_plane_cols(v_hi[:, si, qi]),
                        tuple(path),
                    )
                )
            queries.append(FriQuery(tuple(input_openings), tuple(layer_openings)))
        roots = tuple(forest.roots[si] for _p, _d, forest, *_ in layer_parts)
        proofs.append(FriProof(roots, tuple(finals[si]), tuple(queries)))
    return proofs


# --- Phase 2: device transcript + single-dispatch FRI chain -----------------------
#
# Phase 1 still pays one host<->device round trip per fold layer (the host
# transcript must see each layer root before deriving the next challenge).
# Here the SHA3-256 ratchet transcript itself runs on device — absorb and
# squeeze are single-rate-block Keccak permutations over a static byte
# layout — so the ENTIRE fold/commit/final/query pipeline is one jitted
# dispatch; the host uploads the seeded 32-byte transcript state and pulls
# one flat result array. Byte-identical to fri.FriTranscript (pinned in
# tests/test_fri_device.py).

import struct as _struct

#: module switch: True routes fri_prove_device through the single-dispatch
#: chain; False keeps the per-layer Phase-1 loop (used for A/B timing).
DEVICE_TRANSCRIPT = True


def _sha3_bytes_dev(chunks, batch_shape, looped: bool = True):
    """SHA3-256 over a static-structured byte message, batched.

    chunks: ordered list of ("const", bytes) or ("words", [uint32 arrays of
    shape batch_shape]) — each word contributes 4 little-endian bytes.
    Returns digest words (8, *batch_shape), bit-identical to hashlib.
    """
    import jax.numpy as jnp

    provs: list = []
    for kind, payload in chunks:
        if kind == "const":
            provs.extend(int(b) for b in payload)
        else:
            for arr in payload:
                for k in range(4):
                    provs.append((arr, 8 * k))
    msg_len = len(provs)
    rate = 136
    n_blocks = msg_len // rate + 1
    pad = [0] * (n_blocks * rate - msg_len)
    pad[0] = 0x06
    pad[-1] |= 0x80  # 1-byte pad area folds to 0x86
    provs = provs + pad
    zero = jnp.zeros(batch_shape, dtype=jnp.uint32)

    def block_words(block):
        words = []
        for wi in range(rate // 4):
            const_part = 0
            w = None
            for k in range(4):
                p = block[4 * wi + k]
                if isinstance(p, tuple):
                    arr, shift = p
                    b = (arr >> jnp.uint32(shift)) & jnp.uint32(0xFF)
                    term = b << jnp.uint32(8 * k)
                    w = term if w is None else (w | term)
                else:
                    const_part |= (p & 0xFF) << (8 * k)
            if w is None:
                w = zero + jnp.uint32(const_part) if const_part else zero
            elif const_part:
                w = w | jnp.uint32(const_part)
            words.append(jnp.broadcast_to(w, batch_shape))
        return words

    perm = kj.keccak_f_looped if looped else kj.keccak_f
    lo = jnp.zeros((25,) + batch_shape, dtype=jnp.uint32)
    hi = jnp.zeros((25,) + batch_shape, dtype=jnp.uint32)
    for bi in range(n_blocks):
        words = block_words(provs[bi * rate:(bi + 1) * rate])
        lo = lo.at[:17].set(lo[:17] ^ jnp.stack(words[0::2]))
        hi = hi.at[:17].set(hi[:17] ^ jnp.stack(words[1::2]))
        lo, hi = perm(lo, hi)
    return jnp.stack([lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], lo[3], hi[3]])


class DevTranscript:
    """Device mirror of ``fri.FriTranscript``: the 32-byte ratchet state as
    (8, S) uint32 words; labels and squeeze counters are static."""

    def __init__(self, state_words, counter: int, looped: bool = True):
        self.state = state_words  # (8, S) uint32
        self.counter = counter
        self.looped = looped

    def _chunks_state(self):
        return ("words", [self.state[i] for i in range(8)])

    def absorb_chunks(self, label: bytes, chunks) -> None:
        bshape = self.state.shape[1:]
        self.state = _sha3_bytes_dev(
            [self._chunks_state(), ("const", label)] + chunks, bshape,
            self.looped,
        )

    def squeeze(self, label: bytes):
        self.counter += 1
        bshape = self.state.shape[1:]
        d = _sha3_bytes_dev(
            [self._chunks_state(),
             ("const", label + _struct.pack("<Q", self.counter))],
            bshape, self.looped,
        )
        self.state = d
        return d


def _challenge_planes(digest):
    """Digest words (8, S) -> canonical (4, S) field planes: the first 8
    digest bytes as an LE u64 mod p (one conditional subtract: value < 2p).
    Matches ``FriTranscript.challenge_field``."""
    import jax.numpy as jnp

    w0, w1 = digest[0], digest[1]
    d = [w0 & 0xFFFF, w0 >> 16, w1 & 0xFFFF, w1 >> 16]
    ql = modarith._const_digits(_CTX.q_digits)
    return jnp.stack(modarith._cond_sub(d, ql)[:4])


_CHAIN_CACHE: dict = {}


def _chain_fn(key, n0: int, s: int, k_in: int, d_bound: int, final_len: int,
              num_queries: int, offset: int, omega: int, counter0: int,
              n_input_levels: int, n_groups: int = 1):
    """Build + cache the single-dispatch chain for a static config."""
    if key in _CHAIN_CACHE:
        return _CHAIN_CACHE[key]
    import jax
    import jax.numpy as jnp

    from ..ops import ntt_jax

    half0 = n0 // 2
    assert half0 & (half0 - 1) == 0
    # static fold schedule
    schedule = []  # (n, commit?) per fold
    d, n = d_bound, n0
    off, om = offset, omega
    while True:
        d >>= 1
        n //= 2
        off = off * off % P
        om = om * om % P
        if d <= final_len:
            schedule.append((n, False))
            break
        schedule.append((n, True))
    n_last, off_last, om_last = n, off, om
    final_plan = ntt_jax.ntt_plan(n_last, P, om_last)
    # untwist table: inv_off^i for i < n_last
    inv_off = field.mod_inverse(off_last, P)
    untwist = u64_to_limbs(_gl_powers(inv_off, n_last), _D)

    def chain(g_planes, input_planes, input_levels, state, tabs):
        tr = DevTranscript(state, counter0, looped=True)
        cur = g_planes
        roots_words = []
        layer_levels = []
        layer_values = []
        for li, (n_k, commit) in enumerate(schedule):
            c4 = _challenge_planes(tr.squeeze(b"fri-fold"))[:, :, None]
            lo = cur[..., : n_k]
            hi = cur[..., n_k:]
            t = modarith.mul_mod(
                _CTX,
                modarith.mul_mod(_CTX, c4, modarith.sub_mod(_CTX, lo, hi)),
                tabs[li][:, None, :],
            )
            ssum = modarith.add_mod(_CTX, modarith.add_mod(_CTX, lo, hi), t)
            cur = modarith.cpu_fusion_barrier(
                modarith.mul_mod_const(_CTX, ssum, _INV2_DIGITS)
            )
            if commit:
                levels = _tree_levels_in_graph(cur, looped=True)
                root = levels[-1][..., 0]  # (8, S)
                roots_words.append(root)
                layer_levels.append(levels)
                layer_values.append(cur)
                tr.absorb_chunks(
                    b"fri-layer-root",
                    [("words", [root[i] for i in range(8)])],
                )
        # final polynomial: device iNTT + offset untwist
        fin = ntt_jax.ntt_inverse(final_plan, cur)
        fin = modarith.cpu_fusion_barrier(
            modarith.mul_mod(_CTX, fin, jnp.asarray(untwist)[:, None, :])
        )
        ok = jnp.all(fin[..., final_len:] == 0, axis=(0, 2)) if (
            n_last > final_len
        ) else jnp.ones((s,), dtype=bool)
        fin_t = fin[..., :final_len]
        w_lo = fin_t[0] | (fin_t[1] << 16)  # (S, final_len)
        w_hi = fin_t[2] | (fin_t[3] << 16)
        fin_words = []
        for i in range(final_len):
            fin_words.extend([w_lo[:, i], w_hi[:, i]])
        tr.absorb_chunks(
            b"fri-final",
            [("const", _struct.pack("<Q", final_len)),
             ("words", fin_words)],
        )
        # query indices (bound n0/2 is a power of two -> low-bit mask)
        idx_list = []
        for _ in range(num_queries):
            dg = tr.squeeze(b"fri-query")
            idx_list.append((dg[0] & jnp.uint32(half0 - 1)).astype(jnp.int32))
        idx = jnp.stack(idx_list, axis=-1)  # (S, Q)

        outs = [
            _take_spec("planesK", input_planes, idx),
            _take_spec("planesK", input_planes, idx + half0),
        ]
        idx_rep = jnp.repeat(idx, n_groups, axis=0) if n_groups > 1 else idx
        for lvl in range(n_input_levels - 1):
            sib = (idx_rep >> lvl) ^ 1
            outs.append(_take_spec("level", input_levels[lvl], sib))
        pos = idx
        for values, levels in zip(layer_values, layer_levels):
            half = values.shape[-1] // 2
            p = pos & (half - 1)
            outs.append(_take_spec("planes", values, p))
            outs.append(_take_spec("planes", values, p + half))
            for lvl in range(len(levels) - 1):
                sib = (p >> lvl) ^ 1
                outs.append(_take_spec("level", levels[lvl], sib))
            pos = p
        if roots_words:
            roots_out = jnp.stack(roots_words)  # (L, 8, S)
        else:
            roots_out = jnp.zeros((0, 8, s), dtype=jnp.uint32)
        # ONE flat output array -> one host pull for the whole proof bundle
        return jnp.concatenate(
            [roots_out.reshape(-1), fin_t.reshape(-1),
             ok.astype(jnp.uint32)]
            + [o.reshape(-1) for o in outs]
        )

    fn = jax.jit(chain)
    _CHAIN_CACHE[key] = fn
    return fn


def fri_chain_dispatch(
    g_planes,
    input_planes,
    input_forest: DevForest,
    offset: int,
    omega: int,
    q: int,
    params: FriParams,
    trs: Sequence[FriTranscript],
    n_groups: int = 1,
):
    """Enqueue the single-dispatch FRI chain; returns ``(bundle_dev, cfg)``
    where ``bundle_dev`` is the (device) flat result array and ``cfg`` the
    static layout for :func:`fri_chain_finish`. Pipelined callers dispatch
    several chunks before pulling any bundle."""
    if q != P:
        raise DomainError("device FRI is implemented for the Goldilocks modulus")
    params.validate()
    import jax.numpy as jnp

    _four, s, k_in, n0 = input_planes.shape
    assert g_planes.shape == (_D, s, n0)
    d_bound = n0 >> params.log_blowup
    final_len = _effective_final_len(d_bound, params.final_len)
    tabs = _layer_inv_tables(n0, offset, omega)
    counters = {tr._counter for tr in trs}
    assert len(counters) == 1, "statement transcripts must be in lockstep"
    counter0 = counters.pop()
    state = jnp.asarray(
        np.stack(
            [np.frombuffer(tr._state, dtype="<u4") for tr in trs], axis=1
        )
    )  # (8, S)
    n_input_levels = len(input_forest.levels_dev)
    key = (s, k_in, n0, params.log_blowup, final_len, params.num_queries,
           offset, omega, counter0, n_groups)
    fn = _chain_fn(key, n0, s, k_in, d_bound, final_len, params.num_queries,
                   offset, omega, counter0, n_input_levels, n_groups)
    from ..utils.timing import stage

    stage("chain:dispatch")
    bundle_dev = fn(
        g_planes, input_planes, tuple(input_forest.levels_dev), state, tabs
    )
    cfg = (s, k_in, n0, d_bound, final_len, params.num_queries,
           n_input_levels, n_groups)
    return bundle_dev, cfg


def fri_prove_device_chain(
    g_planes,
    input_planes,
    input_forest: DevForest,
    offset: int,
    omega: int,
    q: int,
    params: FriParams,
    trs: Sequence[FriTranscript],
    n_groups: int = 1,
) -> List[FriProof]:
    """Single-dispatch ``fri_prove_device``: the Fiat-Shamir transcript runs
    on device, so folds, Merkle commits, the final polynomial, query index
    derivation and all opening gathers execute as ONE jitted program. The
    host uploads the seeded transcript states and pulls one result bundle.
    Byte-identical to ``fri.fri_prove``.
    """
    bundle_dev, cfg = fri_chain_dispatch(
        g_planes, input_planes, input_forest, offset, omega, q, params, trs,
        n_groups=n_groups,
    )
    return fri_chain_finish(bundle_dev, cfg)


def fri_chain_finish(bundle_dev, cfg) -> List[FriProof]:
    """Pull a chain bundle (ONE transfer) and reconstruct the FriProofs."""
    from ..utils.timing import stage

    s, k_in, n0, d_bound, final_len, nq, n_input_levels, n_groups = cfg
    gsize = k_in // n_groups
    bundle = np.asarray(bundle_dev)
    stage("chain:bundle-pulled")
    shapes = [(4, s, k_in, nq), (4, s, k_in, nq)]
    shapes += [(8, s * n_groups, nq)] * (n_input_levels - 1)
    n_k = n0
    d = d_bound
    layer_leaves = []
    while True:
        d >>= 1
        n_k //= 2
        if d <= final_len:
            break
        shapes += [(4, s, nq), (4, s, nq)]
        depth = (n_k // 2).bit_length()  # levels incl. root; path = depth-1
        shapes += [(8, s, nq)] * ((n_k // 2).bit_length() - 1)
        layer_leaves.append(n_k // 2)
    n_layers = len(layer_leaves)
    head = n_layers * 8 * s + 4 * s * final_len + s
    roots_np = bundle[: n_layers * 8 * s].reshape(n_layers, 8, s)
    fin_np = bundle[
        n_layers * 8 * s: n_layers * 8 * s + 4 * s * final_len
    ].reshape(4, s, final_len)
    ok_np = bundle[head - s: head]
    if not bool(ok_np.all()):
        raise DomainError("FRI final polynomial exceeds its degree bound")
    parts = _split_flat([None] * len(shapes), shapes, bundle[head:])

    part_iter = iter(parts)
    # vectorized conversions: digit planes -> uint64 values, digest words ->
    # 32-byte rows, each in ONE pass per array (the per-element loops were
    # the reconstruction hot spot at large statement counts)
    in_lo = from_limbs_u64(next(part_iter))  # (S, K, Q)
    in_hi = from_limbs_u64(next(part_iter))
    in_sibs = [
        _digest_block_bytes(next(part_iter))  # (S*G, Q, 32)
        for _ in range(n_input_levels - 1)
    ]
    layer_parts = []
    for leaves in layer_leaves:
        v_lo = from_limbs_u64(next(part_iter))  # (S, Q)
        v_hi = from_limbs_u64(next(part_iter))
        sibs = [
            _digest_block_bytes(next(part_iter))  # (S, Q, 32)
            for _ in range(leaves.bit_length() - 1)
        ]
        layer_parts.append((v_lo, v_hi, sibs))

    fin_u64 = from_limbs_u64(fin_np)  # (S, final_len)
    finals = fin_u64.tolist()  # (S, final_len) Python ints, one C pass
    roots_bytes = _digest_block_bytes(
        np.moveaxis(roots_np, 0, 1)  # (8, L, S)
    ) if n_layers else np.zeros((0, s, 32), dtype=np.uint8)  # (L, S, 32)

    # bulk conversions: .tolist() turns every opened value into Python ints
    # in one C pass, and each sibling level becomes one contiguous bytes
    # object sliced per path element (bytes slicing is far cheaper than a
    # numpy .tobytes() per element) — the per-element loops dominated the
    # batched reconstruction
    in_lo_l = in_lo.tolist()  # [S][K][Q]
    in_hi_l = in_hi.tolist()
    in_sib_flat = [np.ascontiguousarray(sib).tobytes() for sib in in_sibs]
    layer_parts_l = [
        (
            v_lo.tolist(),
            v_hi.tolist(),
            [np.ascontiguousarray(sib).tobytes() for sib in sibs],
        )
        for (v_lo, v_hi, sibs) in layer_parts
    ]

    proofs: List[FriProof] = []
    for si in range(s):
        queries: List[FriQuery] = []
        for qi in range(nq):
            off1 = (si * nq + qi) * 32
            input_openings = []
            for g in range(n_groups):
                off0 = ((si * n_groups + g) * nq + qi) * 32
                path = [flat[off0:off0 + 32] for flat in in_sib_flat]
                vals = []
                for k in range(g * gsize, (g + 1) * gsize):
                    vals.append(in_lo_l[si][k][qi])
                    vals.append(in_hi_l[si][k][qi])
                input_openings.append(GroupOpening(tuple(vals), tuple(path)))
            layer_openings = []
            for (v_lo, v_hi, sib_flats) in layer_parts_l:
                path = [flat[off1:off1 + 32] for flat in sib_flats]
                layer_openings.append(
                    LayerOpening(
                        v_lo[si][qi],
                        v_hi[si][qi],
                        tuple(path),
                    )
                )
            queries.append(FriQuery(tuple(input_openings), tuple(layer_openings)))
        roots = tuple(roots_bytes[li, si].tobytes() for li in range(n_layers))
        proofs.append(FriProof(roots, tuple(finals[si]), tuple(queries)))
    return proofs


_SUM_CACHE: dict = {}


def sum_statements_device(g_planes):
    """(4, S, n) per-statement combined quotients -> (4, 1, n) aggregate sum
    (exact mod-p addition; order-independent). One jitted dispatch."""
    shape = tuple(g_planes.shape)
    if shape not in _SUM_CACHE:
        import jax

        def f(g):
            acc = g[:, 0]
            for i in range(1, shape[1]):
                acc = modarith.add_mod(_CTX, acc, g[:, i])
            return modarith.cpu_fusion_barrier(acc)[:, None]

        _SUM_CACHE[shape] = jax.jit(f)
    return _SUM_CACHE[shape](g_planes)


# --- generic multi-point DEEP combine (kind-9) -----------------------------------

_DEEP_TERMS_CACHE: dict = {}


def deep_combine_terms_device(
    cw_planes,
    points,
    term_oracle,
    term_point_idx,
    weights,
    values,
    offset: int,
    omega: int,
    shift_oracle: int,
    shift_exp: int,
    shift_weight: int,
):
    """Kind-9's DEEP combination on device: arbitrary (oracle, point, value)
    quotient columns plus the shifted degree-bound column.

        g = sum_t weights[t] * (cw[term_oracle[t]] - values[t])
                  / (x - points[term_point_idx[t]])
            + shift_weight * x^shift_exp * cw[shift_oracle]

    cw_planes: (4, K, n0) device planes. points: (P,) uint64 host array
    (challenge values — dynamic); term_oracle/term_point_idx: static index
    tuples; weights/values: (T,) uint64 host arrays. Bit-identical to the
    host numpy build (pinned via the kind-9 device_lde byte test).
    """
    import jax
    import jax.numpy as jnp

    _four, k_in, n0 = cw_planes.shape
    key = (
        k_in, n0, tuple(term_oracle), tuple(term_point_idx), len(points),
        offset, omega, shift_oracle, shift_exp,
    )
    if key not in _DEEP_TERMS_CACHE:
        n_terms = len(term_oracle)
        oracle_idx = tuple(term_oracle)
        point_idx = tuple(term_point_idx)
        xs = _coset_planes(n0, offset, omega)
        # x^shift_exp over the coset is geometric: g^e * (omega^e)^i
        sh_tab = u64_to_limbs(
            glnp.gl_mul(
                np.uint64(pow(offset, shift_exp, P)),
                _gl_powers(pow(omega, shift_exp, P), n0),
            ),
            _D,
        )

        def fn(cw, pts4, w4, v4):
            # pts4 (4, P, 1); w4/v4 (4, T, 1)
            inv = modarith.cpu_fusion_barrier(
                _inv_planes(modarith.sub_mod(_CTX, xs[:, None, :], pts4))
            )  # (4, P, n0)
            g = None
            for t in range(n_terms):
                term = modarith.mul_mod(
                    _CTX,
                    modarith.mul_mod(
                        _CTX,
                        w4[:, t],
                        modarith.sub_mod(_CTX, cw[:, oracle_idx[t]], v4[:, t]),
                    ),
                    inv[:, point_idx[t]],
                )
                g = term if g is None else modarith.add_mod(_CTX, g, term)
            sh_term = modarith.mul_mod(
                _CTX,
                modarith.mul_mod(
                    _CTX, cw[:, shift_oracle], jnp.asarray(sh_tab)
                ),
                w4[:, n_terms],  # the shift weight rides at the ladder's end
            )
            return modarith.cpu_fusion_barrier(
                modarith.add_mod(_CTX, g, sh_term)
            )

        _DEEP_TERMS_CACHE[key] = jax.jit(fn)

    def plan4(arr):
        return planes_from_u64(np.asarray(arr, dtype=np.uint64))[..., None]

    w_all = np.concatenate(
        [np.asarray(weights, dtype=np.uint64),
         np.array([shift_weight], dtype=np.uint64)]
    )
    return _DEEP_TERMS_CACHE[key](
        cw_planes, plan4(points), plan4(w_all), plan4(values)
    )
