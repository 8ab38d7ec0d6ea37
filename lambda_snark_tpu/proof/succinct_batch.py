"""Batched succinct proving: many FRI-bound proofs per device dispatch.

The single-statement succinct prover (``proof/succinct.py``) already runs its
heavy stages on the accelerator — Reed–Solomon encoding as one batched NTT
dispatch, Merkle hashing as one batched Keccak dispatch. This module amortizes
those dispatches across a BATCH of statements (the production serving shape:
one circuit, a stream of witnesses), and vectorizes every host-side field
stage over the statement axis:

- constraint evaluation: padded-CSR gather + mod-exact tree reduction over
  ``[S, m, max_nnz]`` (the batch analog of ``sparse_matrix.rs:259-289``),
- interpolation / odd-coset quotient: the batched Goldilocks NTT
  (``ops/goldilocks_np.py`` transforms over the last axis),
- LDE: ONE device NTT dispatch for all ``4*S`` codewords,
- Merkle: ONE device Keccak dispatch for all ``4*S`` trees (and one per FRI
  fold layer for the ``S`` layer trees),
- DEEP quotient + FRI folding: vectorized with per-statement challenges.

Per-statement work that must stay sequential (Fiat–Shamir transcripts, query
path extraction, the tiny final-polynomial iNTT) is exactly the cheap part.

Bit-exactness: proofs returned here are byte-identical to
``prove_r1cs_succinct`` run per statement with the same seeds (asserted in
``tests/test_succinct_batch.py``) — every batched stage is exact modular
arithmetic, so regrouping/padding cannot change a single output word.

The reference has no batching story at all (its benchmark loop proves
sequentially — ``lambda-snark-cli/src/main.rs:640-706``); this is the
TPU-native upgrade of that loop.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..commit import lwe
from ..core.errors import DomainError, InvalidDimensionsError, InvalidWitnessError
from ..ops import goldilocks_np as glnp
from ..r1cs.r1cs import R1CS
from ..r1cs.sparse import SparseMatrix
from ..transcript.challenge import derive_dual
from ..utils.chacha import ChaCha20Rng
from ..utils.timing import stage
from .fri import (
    FriParams,
    FriProof,
    FriQuery,
    GroupOpening,
    LayerOpening,
    _effective_final_len,
    _gl_pow_array,
    _gl_powers,
    commit_codeword_groups,
    commit_codewords,
    coset_offset,
    root_of_order,
)
from ..r1cs.poly import ntt_inverse
from ..core import field
from .succinct import (
    SuccinctProofR1CS,
    _check_instance,
    _gl_frontend_applicable,
    _gl_trim,
    _roots_to_words,
    _seed_fri_transcript,
    prove_r1cs_succinct,
)

__all__ = [
    "prove_r1cs_succinct_batch",
    "prove_r1cs_succinct_stream",
    "prove_r1cs_witness_batch",
]


# --- batched host field helpers -------------------------------------------------


def _gl_powers_batch(bases: np.ndarray, n: int) -> np.ndarray:
    """[S, n] geometric rows [base_s^0, ..., base_s^(n-1)] mod Goldilocks."""
    s = len(bases)
    out = np.empty((s, n), dtype=np.uint64)
    out[:, 0] = 1
    cur = np.asarray(bases, dtype=np.uint64)
    step = 1
    while step < n:
        m = min(step, n - step)
        out[:, step : step + m] = glnp.gl_mul(out[:, :m], cur[:, None])
        cur = glnp.gl_mul(cur, cur)
        step <<= 1
    return out


def _gl_eval_batch(polys: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Evaluate row polynomial s at point s: [S, L], [S] -> [S].

    Mod-exact tree reduction — same values as ``succinct._gl_poly_eval``.
    """
    terms = glnp.gl_mul(polys, _gl_powers_batch(points, polys.shape[1]))
    while terms.shape[1] > 1:
        if terms.shape[1] & 1:
            terms = np.concatenate(
                [terms, np.zeros((terms.shape[0], 1), dtype=np.uint64)], axis=1
            )
        terms = glnp.gl_add(terms[:, 0::2], terms[:, 1::2])
    return terms[:, 0]


def _gl_inverse_batch(a: np.ndarray) -> np.ndarray:
    from .fri import _gl_inverse_array

    return _gl_inverse_array(a)


def _csr_padded(mat: SparseMatrix, q: int):
    """CSR -> row-padded gather tables (col index [m, w], value [m, w])."""
    rows = mat.rows
    counts = [mat.row_ptr[r + 1] - mat.row_ptr[r] for r in range(rows)]
    w = max(max(counts), 1) if rows else 1
    cols = np.zeros((rows, w), dtype=np.int64)
    vals = np.zeros((rows, w), dtype=np.uint64)
    for r in range(rows):
        lo, hi = mat.row_ptr[r], mat.row_ptr[r + 1]
        for j, k in enumerate(range(lo, hi)):
            cols[r, j] = mat.col_indices[k]
            vals[r, j] = mat.values[k] % q
    return cols, vals


def _spmv_batch(mat: SparseMatrix, z: np.ndarray, q: int) -> np.ndarray:
    """Batched modular SpMV: [S, n] witnesses -> [S, m] constraint rows.

    Padded gather + gl tree reduction; exact mod arithmetic, so equal to
    ``SparseMatrix.mul_vec`` per row.
    """
    cols, vals = _csr_padded(mat, q)
    terms = glnp.gl_mul(z[:, cols], vals[None, :, :])  # [S, m, w]
    while terms.shape[2] > 1:
        if terms.shape[2] & 1:
            terms = np.concatenate(
                [terms, np.zeros(terms.shape[:2] + (1,), dtype=np.uint64)], axis=2
            )
        terms = glnp.gl_add(terms[:, :, 0::2], terms[:, :, 1::2])
    return terms[:, :, 0]


def _pad_to(p: np.ndarray, n: int) -> np.ndarray:
    """Zero-pad [S, L] rows to [S, n] (mod-exact: padding never changes values)."""
    if p.shape[1] == n:
        return p
    out = np.zeros((p.shape[0], n), dtype=np.uint64)
    out[:, : p.shape[1]] = p
    return out


def _gl_zh_mul_batch(rho: np.ndarray, m: int) -> np.ndarray:
    """(X^m - 1) * rho over the statement axis: [S, L] -> [S, m + L]."""
    s, length = rho.shape
    out = np.zeros((s, m + length), dtype=np.uint64)
    out[:, m:] = rho
    out[:, :length] = glnp.gl_sub(out[:, :length], rho)
    return out


def _gl_conv_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise exact polynomial product via a batched cyclic NTT."""
    out_len = a.shape[1] + b.shape[1] - 1
    size = 1 << (out_len - 1).bit_length() if out_len > 1 else 1
    ntt = glnp.goldilocks_ntt(max(size, 2))
    pa = _pad_to(a, ntt.n)
    pb = _pad_to(b, ntt.n)
    return ntt.inverse(glnp.gl_mul(ntt.forward(pa), ntt.forward(pb)))[:, :out_len]


# --- batched FRI ------------------------------------------------------------------


def _fold_batch(
    values: np.ndarray, offset: int, omega: int, cs: np.ndarray
) -> np.ndarray:
    """Vectorized fold of [S, n] codewords with per-statement challenges [S].

    Identical math to ``fri._fold_codeword`` (Goldilocks branch).
    """
    q = glnp.GOLDILOCKS
    half = values.shape[1] // 2
    lo, hi = values[:, :half], values[:, half:]
    inv_xs = glnp.gl_mul(
        np.uint64(field.mod_inverse(offset, q)),
        _gl_powers(field.mod_inverse(omega, q), half),
    )
    inv2 = np.uint64(field.mod_inverse(2, q))
    t = glnp.gl_mul(
        glnp.gl_mul(cs[:, None], glnp.gl_sub(lo, hi)), inv_xs[None, :]
    )
    return glnp.gl_mul(glnp.gl_add(glnp.gl_add(lo, hi), t), inv2)


def _fri_prove_batch(
    g: np.ndarray,
    inputs,  # list over statements of (group codewords [K, n0], MerkleTree)
    offset: int,
    omega: int,
    params: FriParams,
    trs,
) -> List[FriProof]:
    """Batched ``fri.fri_prove``: one Merkle dispatch per fold layer for all
    statements; transcripts stay per-statement. Byte-identical proofs."""
    q = glnp.GOLDILOCKS
    s, n0 = g.shape
    d_bound = n0 >> params.log_blowup
    final_len = _effective_final_len(d_bound, params.final_len)

    committed: List[np.ndarray] = []  # [S, n] values per committed layer
    layer_trees: List[list] = []  # trees[layer][statement]
    roots_per_stmt: List[List[bytes]] = [[] for _ in range(s)]
    cur = g
    off, om, d = offset, omega, d_bound
    while True:
        cs = np.array(
            [tr.challenge_field(q, b"fri-fold") for tr in trs], dtype=np.uint64
        )
        cur = _fold_batch(cur, off, om, cs)
        off = off * off % q
        om = om * om % q
        d >>= 1
        if d <= final_len:
            break
        trees = commit_codewords([cur[i] for i in range(s)])
        committed.append(cur)
        layer_trees.append(trees)
        for i in range(s):
            roots_per_stmt[i].append(trees[i].root)
            trs[i].absorb(b"fri-layer-root", trees[i].root)

    inv_off = field.mod_inverse(off, q)
    finals: List[List[int]] = []
    for i in range(s):
        coeffs = ntt_inverse([int(v) for v in cur[i]], q, om)
        acc = 1
        final: List[int] = []
        for cf in coeffs:
            final.append(cf * acc % q)
            acc = acc * inv_off % q
        if any(final[final_len:]):
            raise DomainError("FRI final polynomial exceeds its degree bound")
        finals.append(final[:final_len])
        trs[i].absorb_words(b"fri-final", finals[i])

    proofs: List[FriProof] = []
    for i in range(s):
        indices = trs[i].challenge_indices(n0 // 2, params.num_queries, b"fri-query")
        queries: List[FriQuery] = []
        for i0 in indices:
            group_cws, tree = inputs[i]
            half = len(group_cws[0]) // 2
            vals = []
            for cwk in group_cws:
                vals.append(int(cwk[i0]))
                vals.append(int(cwk[i0 + half]))
            input_openings = [GroupOpening(tuple(vals), tuple(tree.path(i0)))]
            layer_openings = []
            pos = i0
            for values, trees in zip(committed, layer_trees):
                half = values.shape[1] // 2
                p = pos % half
                layer_openings.append(
                    LayerOpening(
                        int(values[i, p]),
                        int(values[i, p + half]),
                        tuple(trees[i].path(p)),
                    )
                )
                pos = p
            queries.append(FriQuery(tuple(input_openings), tuple(layer_openings)))
        proofs.append(
            FriProof(tuple(roots_per_stmt[i]), tuple(finals[i]), tuple(queries))
        )
    return proofs


# --- batched prover -----------------------------------------------------------------


def prove_r1cs_succinct_batch(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: lwe.LweContext,
    seeds: Sequence[int],
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seeds: Optional[Sequence[int]] = None,
    device_lde: bool = True,
    pipeline_chunk: Optional[int] = None,
) -> List[SuccinctProofR1CS]:
    """Prove a batch of statements over one circuit with succinct openings.

    Byte-identical to ``prove_r1cs_succinct(r1cs, w, ctx, seed, ...)`` per
    statement; all heavy device work (RS encoding, Merkle hashing) and all
    host field math run batched over the statement axis. ZK blinding is
    per-statement via ``blinding_seeds`` (required when ``zk=True`` — batched
    proving is deterministic by construction).

    Falls back to the sequential prover for non-Goldilocks / non-roots
    instances (where no vectorized front-end exists).
    """
    params = fri_params or FriParams()
    params.validate()
    s = len(witnesses)
    if len(seeds) != s:
        raise InvalidDimensionsError("need one seed per witness")
    if zk:
        if blinding_seeds is None or len(blinding_seeds) != s:
            raise InvalidDimensionsError(
                "zk batch proving needs one blinding seed per witness"
            )
    if s == 0:
        return []

    if not _gl_frontend_applicable(r1cs):
        return [
            prove_r1cs_succinct(
                r1cs,
                w,
                ctx,
                seed,
                zk=zk,
                fri_params=params,
                blinding_seed=(blinding_seeds[i] if zk else None),
            )
            for i, (w, seed) in enumerate(zip(witnesses, seeds))
        ]

    from . import fri as fri_mod

    device_fri = device_lde and fri_mod.DEVICE_HASH
    from . import fri_device as _frid

    if (
        pipeline_chunk
        and not zk
        and device_fri
        and _frid.DEVICE_TRANSCRIPT
        and _gl_frontend_applicable(r1cs)
        and ctx.n >= r1cs.m
        and len(witnesses) > pipeline_chunk
    ):
        return _prove_pipelined(
            r1cs, witnesses, ctx, seeds, params, pipeline_chunk
        )
    stage("prove:start")
    fe = _gl_batch_frontend(
        r1cs, witnesses, ctx, seeds, zk, params, blinding_seeds, device_lde,
        device_fri=device_fri,
    )
    q, m, mask_len = fe.q, fe.m, fe.mask_len
    d_bound, n0, omega_n, offset = fe.d_bound, fe.n0, fe.omega_n, fe.offset
    s = len(witnesses)
    cw, trees, roots = fe.cw, fe.trees, fe.roots
    commitments, chals = fe.commitments, fe.chals
    alphas, betas, evals = fe.alphas, fe.betas, fe.evals

    stage("prove:frontend-done")
    # per-statement FRI transcripts + batched DEEP quotient
    trs, lams = _seed_batch_transcripts(
        q, m, mask_len, params, d_bound, roots, alphas, betas, evals
    )

    # batched FRI (DEEP quotient on device for the device-resident path)
    if fe.forest is not None:
        from . import fri_device

        input_planes = fe.planes_dev.reshape(4, s, 4, n0)
        stage("prove:transcripts-seeded")
        g_planes = fri_device.deep_combine_device(
            input_planes, alphas, betas, lams, evals, offset, omega_n
        )
        stage("prove:deep-dispatched")
        fri_proofs = fri_device.fri_prove_device(
            g_planes, input_planes, fe.forest, offset, omega_n, q, params, trs
        )
        stage("prove:fri-done")
    else:
        xs = glnp.gl_mul(np.uint64(offset), _gl_powers(omega_n, n0))  # [n0]
        inv_a = _gl_inverse_batch(glnp.gl_sub(xs[None, :], alphas[:, None]))
        inv_b = _gl_inverse_batch(glnp.gl_sub(xs[None, :], betas[:, None]))
        g = np.zeros((s, n0), dtype=np.uint64)
        lam_pow = np.ones(s, dtype=np.uint64)
        for k in range(4):
            lam2 = glnp.gl_mul(lam_pow, lams)
            term_a = glnp.gl_mul(
                glnp.gl_mul(
                    lam_pow[:, None],
                    glnp.gl_sub(cw[:, k], evals[:, k][:, None]),
                ),
                inv_a,
            )
            term_b = glnp.gl_mul(
                glnp.gl_mul(
                    lam2[:, None],
                    glnp.gl_sub(cw[:, k], evals[:, 4 + k][:, None]),
                ),
                inv_b,
            )
            g = glnp.gl_add(g, glnp.gl_add(term_a, term_b))
            lam_pow = glnp.gl_mul(lam2, lams)
        inputs = [
            ([cw[i, k] for k in range(4)], trees[i]) for i in range(s)
        ]
        fri_proofs = _fri_prove_batch(g, inputs, offset, omega_n, params, trs)

    return [
        SuccinctProofR1CS(
            commitment_q=commitments[i],
            input_root=roots[i][0],
            challenge_alpha=chals[i][0],
            challenge_beta=chals[i][1],
            a_alpha=int(evals[i, 0]),
            b_alpha=int(evals[i, 1]),
            c_alpha=int(evals[i, 2]),
            q_alpha=int(evals[i, 3]),
            a_beta=int(evals[i, 4]),
            b_beta=int(evals[i, 5]),
            c_beta=int(evals[i, 6]),
            q_beta=int(evals[i, 7]),
            fri=fri_proofs[i],
            m=m,
            mask_len=mask_len,
            log_blowup=params.log_blowup,
            num_queries=params.num_queries,
            final_len=params.final_len,
            modulus=q,
        )
        for i in range(s)
    ]


def prove_r1cs_witness_batch(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: lwe.LweContext,
    seeds: Sequence[int],
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seeds: Optional[Sequence[int]] = None,
    device_lde: bool = True,
) -> list:
    """Batch of kind-9 committed-witness proofs (one per statement).

    Routing parity with ``prove_r1cs_succinct_batch``: same seed
    conventions, same store/stream integration (pass
    ``witness_bind=True`` to ``prove_r1cs_succinct_stream``). The per-
    statement pipeline is the vectorized-Goldilocks single prover; cross-
    statement amortization of the LDE/Merkle dispatches mirrors the kind-7
    batcher and is tracked in ROADMAP #22.
    """
    from .succinct_witness import prove_r1cs_witness

    params = fri_params or FriParams()
    params.validate()
    s = len(witnesses)
    if len(seeds) != s:
        raise InvalidDimensionsError("need one seed per witness")
    if zk and (blinding_seeds is None or len(blinding_seeds) != s):
        raise InvalidDimensionsError(
            "zk witness batch proving needs one blinding seed per witness"
        )
    return [
        prove_r1cs_witness(
            r1cs, w, ctx, seed, zk=zk, fri_params=params,
            blinding_seed=(blinding_seeds[i] if zk else None),
            device_lde=device_lde,
        )
        for i, (w, seed) in enumerate(zip(witnesses, seeds))
    ]


def _derive_batch_challenges(r1cs, witnesses, commitments, roots, q):
    """Per-statement dual Fiat-Shamir challenges binding LWE words + the
    four Merkle roots (shared by the device front-end and the pipelined
    prover — ONE implementation so the byte contract has one home)."""
    s = len(commitments)
    alphas = np.empty(s, dtype=np.uint64)
    betas = np.empty(s, dtype=np.uint64)
    chals = []
    from .succinct import statement_binding_words

    for i in range(s):
        comm_words = np.concatenate(
            [
                statement_binding_words(commitments[i], r1cs),
                np.array(_roots_to_words(roots[i]), dtype=np.uint64),
            ]
        )
        ch_alpha, ch_beta = derive_dual(
            r1cs.public_inputs(witnesses[i]), comm_words, q
        )
        chals.append((ch_alpha, ch_beta))
        alphas[i] = ch_alpha.alpha
        betas[i] = ch_beta.alpha
    return chals, alphas, betas


def _seed_batch_transcripts(q, m, mask_len, params, d_bound, roots,
                            alphas, betas, evals):
    """Per-statement FRI transcripts + lambda challenges (one home)."""
    trs = []
    lams = np.empty(len(roots), dtype=np.uint64)
    for i in range(len(roots)):
        tr = _seed_fri_transcript(
            q, m, mask_len, params, d_bound, roots[i],
            int(alphas[i]), int(betas[i]), [int(v) for v in evals[i]],
        )
        lams[i] = tr.challenge_field(q, b"fri-lambda")
        trs.append(tr)
    return trs, lams


def _device_frontend(
    r1cs: R1CS,
    witnesses,
    ctx: lwe.LweContext,
    seeds,
    az: np.ndarray,
    bz: np.ndarray,
    cz: np.ndarray,
    mask_len: int,
    d_bound: int,
    n0: int,
    omega_n: int,
    offset: int,
) -> "_BatchFrontend":
    """Non-ZK device front-end: ONE quotient+LDE+Merkle dispatch plus one
    evaluation dispatch. Byte-identical proofs to the host front-end
    (pinned in tests/test_succinct_batch.py)."""
    from . import succinct_device as sd

    s = az.shape[0]
    q = r1cs.modulus
    m = r1cs.m
    # Fuse the Module-LWE commitment into the quotient/LDE dispatch when the
    # quotient fits the ring: the ChaCha randomness streams generate
    # in-graph (only the 32-byte keys upload) and the quotient never visits
    # the host. Fallback: pull q_poly and commit on host (value-identical
    # either way; pinned in tests/test_succinct_batch.py).
    fused_commit = ctx.n >= m
    stage("frontend:lde-dispatch")
    if fused_commit:
        planes_dev, commitments, polys_dev, forest = sd.quotient_lde_device(
            az, bz, cz, n0, offset, commit_ctx=ctx, seeds=seeds
        )
    else:
        planes_dev, q_poly, polys_dev, forest = sd.quotient_lde_device(
            az, bz, cz, n0, offset
        )
        commitments, _ops = lwe.commit_batch(
            ctx, [_gl_trim(q_poly[i]) for i in range(s)], list(seeds)
        )
    stage("frontend:lde-pulled")
    roots = [[forest.roots[i]] for i in range(s)]
    chals, alphas, betas = _derive_batch_challenges(
        r1cs, witnesses, commitments, roots, q
    )

    stage("frontend:challenges")
    evals = sd.eval_device(polys_dev, alphas, betas)
    stage("frontend:evals-pulled")

    fe = _BatchFrontend()
    fe.q, fe.m, fe.mask_len = q, r1cs.m, mask_len
    fe.d_bound, fe.n0, fe.omega_n, fe.offset = d_bound, n0, omega_n, offset
    fe.cw, fe.trees, fe.roots = None, None, roots
    fe.commitments, fe.chals = commitments, chals
    fe.alphas, fe.betas, fe.evals = alphas, betas, evals
    fe.planes_dev, fe.forest = planes_dev, forest
    return fe


class _BatchFrontend:
    """Everything shared by the per-statement and aggregated succinct
    provers: batched constraint evals, interpolations, quotients, masks,
    RS codewords, Merkle trees, lattice commitments, dual challenges and
    claimed evaluations."""

    __slots__ = (
        "q", "m", "mask_len", "d_bound", "n0", "omega_n", "offset",
        "cw", "trees", "roots", "commitments", "chals",
        "alphas", "betas", "evals", "planes_dev", "forest",
    )


def _embed_and_eval(r1cs: R1CS, witnesses):
    """Embed witnesses mod q (one C pass per canonical-int witness) and
    compute the validated (az, bz, cz) constraint evaluations [S, m]."""
    s = len(witnesses)
    q = r1cs.modulus
    n = r1cs.n
    z = np.empty((s, n), dtype=np.uint64)
    for i, w in enumerate(witnesses):
        if len(w) != n:
            raise InvalidDimensionsError(
                f"witness {i} length {len(w)} must equal n={n}"
            )
        # Fast paths must NEVER go through np.asarray(..., dtype=np.uint64)
        # on signed numpy values: int64 arrays (and np.int64 scalars inside
        # lists) wrap mod 2^64 SILENTLY, and the wrapped value can pass the
        # < q guard (e.g. -2^33 -> 2^64 - 2^33 < Goldilocks q).
        arr = None
        if isinstance(w, np.ndarray):
            if w.dtype == np.uint64:
                arr = w
            elif np.issubdtype(w.dtype, np.integer) and bool((w >= 0).all()):
                arr = w.astype(np.uint64)
        elif type(w) is list and all(type(v) is int for v in w):
            # pure-Python ints: the uint64 cast raises on negative/oversized
            try:
                arr = np.asarray(w, dtype=np.uint64)
            except (OverflowError, TypeError, ValueError):
                arr = None
        if arr is not None and bool((arr < q).all()):
            z[i] = arr
        else:
            z[i] = np.array([int(v) % q for v in w], dtype=np.uint64)
    az = _spmv_batch(r1cs.a, z, q)
    bz = _spmv_batch(r1cs.b, z, q)
    cz = _spmv_batch(r1cs.c, z, q)
    bad = glnp.gl_sub(glnp.gl_mul(az, bz), cz).any(axis=1)
    if bool(bad.any()):
        raise InvalidWitnessError(
            f"witness {int(np.nonzero(bad)[0][0])} does not satisfy R1CS constraints"
        )
    return az, bz, cz


def _gl_batch_frontend(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: lwe.LweContext,
    seeds: Sequence[int],
    zk: bool,
    params: FriParams,
    blinding_seeds: Optional[Sequence[int]],
    device_lde: bool,
    device_fri: bool = False,
) -> _BatchFrontend:
    s = len(witnesses)
    q = r1cs.modulus
    m = r1cs.m
    mask_len = (2 * params.num_queries + 8) if zk else 0
    d_bound, n0, omega_n = _check_instance(r1cs, params, mask_len)
    offset = coset_offset(q)

    # 1. batched constraint evaluation + witness validation
    az, bz, cz = _embed_and_eval(r1cs, witnesses)

    if device_fri and not zk:
        # device front-end: interpolation, quotient, twist and LDE run as one
        # dispatch; polynomials never visit the host (proof/succinct_device.py)
        return _device_frontend(
            r1cs, witnesses, ctx, seeds, az, bz, cz,
            mask_len, d_bound, n0, omega_n, offset,
        )

    # 2. batched interpolation + odd-coset quotient (one NTT call per stage)
    ntt = glnp.goldilocks_ntt(m)
    a_poly = ntt.inverse(az)
    b_poly = ntt.inverse(bz)
    c_poly = ntt.inverse(cz)
    neg_half_inv = np.uint64(glnp.gl_inv(q - 2))
    q_odd = glnp.gl_mul(
        glnp.gl_sub(
            glnp.gl_mul(ntt.forward_negacyclic(a_poly), ntt.forward_negacyclic(b_poly)),
            ntt.forward_negacyclic(c_poly),
        ),
        neg_half_inv,
    )
    q_poly = glnp.gl_mul(ntt.inverse(q_odd), ntt._psi_inv_pows)  # [S, m]

    # 3. masks (ZK): per-statement ChaCha streams, batched composition
    if zk:
        masks = np.empty((3, s, mask_len), dtype=np.uint64)
        for i in range(s):
            rng = ChaCha20Rng.from_u64(blinding_seeds[i])
            for k in range(3):
                masks[k, i] = [rng.next_u64() % q for _ in range(mask_len)]
        rho_a, rho_b, rho_c = masks[0], masks[1], masks[2]
        a_t = glnp.gl_add(_pad_to(a_poly, m + mask_len), _gl_zh_mul_batch(rho_a, m))
        b_t = glnp.gl_add(_pad_to(b_poly, m + mask_len), _gl_zh_mul_batch(rho_b, m))
        c_t = glnp.gl_add(_pad_to(c_poly, m + mask_len), _gl_zh_mul_batch(rho_c, m))
        q_len = m + 2 * mask_len
        q_t = glnp.gl_add(
            glnp.gl_add(
                _pad_to(q_poly, q_len),
                _pad_to(_gl_conv_batch(rho_a, b_poly), q_len),
            ),
            glnp.gl_add(
                _pad_to(_gl_conv_batch(rho_b, a_poly), q_len),
                glnp.gl_sub(
                    _pad_to(_gl_zh_mul_batch(_gl_conv_batch(rho_a, rho_b), m), q_len),
                    _pad_to(rho_c, q_len),
                ),
            ),
        )
    else:
        a_t, b_t, c_t, q_t = a_poly, b_poly, c_poly, q_poly

    # 4. Reed–Solomon encodings: ONE batched NTT over all 4*S polynomials
    polys = [p[i] for i in range(s) for p in (a_t, b_t, c_t, q_t)]
    planes_dev = None
    forest = None
    if device_fri:
        # device-resident path: codewords and Merkle levels stay on device
        # (proof/fri_device.py); the host pulls values once for the DEEP
        # quotient and 32-byte roots.
        from . import fri_device
        from .fri import lde_batch_device_planes

        planes_dev, _ = lde_batch_device_planes(
            polys, n0, offset, q, pull_values=False
        )
        cw = None  # device DEEP: codewords never visit the host
        forest = fri_device.commit_planes_dev_groups(
            planes_dev.reshape(4, s, 4, n0)
        )
        trees = None
        roots = [[forest.roots[i]] for i in range(s)]
    else:
        if device_lde:
            from .fri import lde_batch_device

            codewords = lde_batch_device(polys, n0, offset, q)
        else:
            from .fri import lde

            codewords = [
                np.asarray(lde(p, n0, offset, omega_n, q), dtype=np.uint64)
                for p in polys
            ]
        cw = np.stack(codewords).reshape(s, 4, n0)

        # 5. Merkle commitments: ONE batched Keccak dispatch, one
        # interleaved tree per statement (wire v3)
        trees = commit_codeword_groups(
            [[cw[i, k] for k in range(4)] for i in range(s)]
        )
        roots = [[trees[i].root] for i in range(s)]

    # 6. lattice commitments + dual Fiat–Shamir challenges (per statement)
    commitments = []
    alphas = np.empty(s, dtype=np.uint64)
    betas = np.empty(s, dtype=np.uint64)
    chals = []
    for i in range(s):
        commitment_q, _op = lwe.commit(ctx, _gl_trim(q_poly[i]), seeds[i])
        commitments.append(commitment_q)
        from .succinct import statement_binding_words

        comm_words = list(statement_binding_words(commitment_q, r1cs)) + _roots_to_words(roots[i])
        ch_alpha, ch_beta = derive_dual(
            r1cs.public_inputs(witnesses[i]), comm_words, q
        )
        chals.append((ch_alpha, ch_beta))
        alphas[i] = ch_alpha.alpha
        betas[i] = ch_beta.alpha

    # 7. claimed evaluations, batched per polynomial kind
    evals = np.empty((s, 8), dtype=np.uint64)
    for k, p in enumerate((a_t, b_t, c_t, q_t)):
        evals[:, k] = _gl_eval_batch(p, alphas)
        evals[:, 4 + k] = _gl_eval_batch(p, betas)

    fe = _BatchFrontend()
    fe.q, fe.m, fe.mask_len = q, m, mask_len
    fe.d_bound, fe.n0, fe.omega_n, fe.offset = d_bound, n0, omega_n, offset
    fe.cw, fe.trees, fe.roots = cw, trees, roots
    fe.commitments, fe.chals = commitments, chals
    fe.alphas, fe.betas, fe.evals = alphas, betas, evals
    fe.planes_dev, fe.forest = planes_dev, forest
    return fe


# --- streaming service ---------------------------------------------------------------

#: the seed-fold constant shared with ``prover_batched.prove_r1cs_stream``
_SEED_FOLD = 0x9E3779B97F4A7C15
#: salt separating the default blinding-seed stream from the proof seeds
_BLIND_SALT = 0xA5A5A5A55A5A5A5A


def _prove_pipelined(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: lwe.LweContext,
    seeds: Sequence[int],
    params: FriParams,
    chunk: int,
) -> List[SuccinctProofR1CS]:
    """Software-pipelined batched succinct proving (non-ZK, fused-commit).

    The warm batch prover spends ~80% of its wall time blocked on two relay
    transfers per batch (the LDE/commit pack pull and the FRI bundle pull)
    while the device sits idle between them. Splitting the batch into
    chunks and dispatching every chunk's quotient+LDE+commit program BEFORE
    pulling any pack overlaps chunk i's pull with chunk i+1's device
    compute; the FRI chain bundles are likewise pulled only after every
    chunk's chain is enqueued.

    Byte-exactness: proofs depend only on (witness, seed) per statement —
    chunking is pinned byte-identical to the unchunked batch prover in
    tests/test_succinct_batch.py.
    """
    from . import fri_device
    from . import succinct_device as sd

    q = r1cs.modulus
    m = r1cs.m
    mask_len = 0
    d_bound, n0, omega_n = _check_instance(r1cs, params, mask_len)
    offset = coset_offset(q)
    s = len(witnesses)
    az, bz, cz = _embed_and_eval(r1cs, witnesses)

    stage("pipe:dispatch-A")
    slices = [slice(i, min(i + chunk, s)) for i in range(0, s, chunk)]
    phase_a = []
    for sl in slices:
        lde, deferred, polys_dev, _ = sd.quotient_lde_device(
            az[sl], bz[sl], cz[sl], n0, offset, commit_ctx=ctx,
            seeds=list(seeds[sl.start : sl.stop]), defer_pull=True,
        )
        phase_a.append((sl, lde, deferred, polys_dev))

    stage("pipe:phase-B")
    phase_c = []
    for sl, lde, deferred, polys_dev in phase_a:
        commitments, forest = sd.finish_quotient_lde(deferred)
        sc = sl.stop - sl.start
        roots = [[forest.roots[i]] for i in range(sc)]
        chals, alphas, betas = _derive_batch_challenges(
            r1cs, witnesses[sl.start : sl.stop], commitments, roots, q
        )
        evals = sd.eval_device(polys_dev, alphas, betas)
        trs, lams = _seed_batch_transcripts(
            q, m, mask_len, params, d_bound, roots, alphas, betas, evals
        )
        input_planes = lde.reshape(4, sc, 4, n0)
        g_planes = fri_device.deep_combine_device(
            input_planes, alphas, betas, lams, evals, offset, omega_n
        )
        bundle_dev, cfg = fri_device.fri_chain_dispatch(
            g_planes, input_planes, forest, offset, omega_n, q, params, trs
        )
        phase_c.append((sl, commitments, roots, chals, evals, bundle_dev, cfg))

    stage("pipe:phase-C")
    proofs: List[SuccinctProofR1CS] = []
    for sl, commitments, roots, chals, evals, bundle_dev, cfg in phase_c:
        fri_proofs = fri_device.fri_chain_finish(bundle_dev, cfg)
        for i in range(sl.stop - sl.start):
            proofs.append(
                SuccinctProofR1CS(
                    commitment_q=commitments[i],
                    input_root=roots[i][0],
                    challenge_alpha=chals[i][0],
                    challenge_beta=chals[i][1],
                    a_alpha=int(evals[i, 0]),
                    b_alpha=int(evals[i, 1]),
                    c_alpha=int(evals[i, 2]),
                    q_alpha=int(evals[i, 3]),
                    a_beta=int(evals[i, 4]),
                    b_beta=int(evals[i, 5]),
                    c_beta=int(evals[i, 6]),
                    q_beta=int(evals[i, 7]),
                    fri=fri_proofs[i],
                    m=m,
                    mask_len=mask_len,
                    log_blowup=params.log_blowup,
                    num_queries=params.num_queries,
                    final_len=params.final_len,
                    modulus=q,
                )
            )
    stage("pipe:done")
    return proofs


def _index_seed(master: int, index: int) -> int:
    """Deterministic per-statement seed: resume-stable for any partition."""
    return (master ^ (_SEED_FOLD * (index + 1))) & ((1 << 63) - 1)


def prove_r1cs_succinct_stream(
    r1cs: R1CS,
    witnesses,
    ctx: lwe.LweContext,
    seed: int,
    batch: int = 8,
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seed: Optional[int] = None,
    store=None,
    device_lde: bool = True,
    label_prefix: str = "succinct",
    pipeline_chunk: Optional[int] = None,
    witness_bind: bool = False,
):
    """Yield ``(index, SuccinctProofR1CS)`` for a witness stream, in order.

    The succinct analog of ``prover_batched.prove_r1cs_stream`` /
    ``parallel.service.ShardedProofService``: witnesses are proven in
    device-amortized batches (``prove_r1cs_succinct_batch``), each statement
    is seeded by a fold of the master seed with its stream index (so any
    partition of the stream reproduces identical bytes), and a ``ProofStore``
    makes runs resumable — statements already in the store are served
    byte-identical, only the remainder is proven.

    ``witness_bind=True`` routes the stream through the kind-9
    committed-witness prover instead (same seed folds, same resume
    semantics; the store's integrity sweep covers kind 9).
    """
    params = fri_params or FriParams()
    params.validate()
    blind_master = (
        blinding_seed if blinding_seed is not None else seed ^ _BLIND_SALT
    )
    from ..utils.artifacts import statement_digest

    pending: list = []  # (index, witness)

    def label(index: int) -> str:
        prefix = f"{label_prefix}-w" if witness_bind else label_prefix
        return f"{prefix}-{index}"

    def flush():
        if not pending:
            return
        idxs = [i for i, _w in pending]
        ws = [w for _i, w in pending]
        seeds = [_index_seed(seed, i) for i in idxs]
        blinds = [_index_seed(blind_master, i) for i in idxs] if zk else None
        if witness_bind:
            proofs = prove_r1cs_witness_batch(
                r1cs, ws, ctx, seeds, zk=zk, fri_params=params,
                blinding_seeds=blinds, device_lde=device_lde,
            )
        else:
            proofs = prove_r1cs_succinct_batch(
                r1cs, ws, ctx, seeds, zk=zk, fri_params=params,
                blinding_seeds=blinds, device_lde=device_lde,
                pipeline_chunk=pipeline_chunk,
            )
        for (index, w), proof, s in zip(pending, proofs, seeds):
            if store is not None:
                store.save(
                    r1cs, r1cs.public_inputs(w), s, proof, label=label(index)
                )
            yield index, proof
        pending.clear()

    for index, w in enumerate(witnesses):
        if store is not None:
            key = statement_digest(
                r1cs, r1cs.public_inputs(w), _index_seed(seed, index),
                label(index),
            )
            if store.contains(key):
                for item in flush():
                    yield item
                yield index, store.load(key)
                continue
        pending.append((index, w))
        if len(pending) == batch:
            for item in flush():
                yield item
    for item in flush():
        yield item
