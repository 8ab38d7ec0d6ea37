"""Pins for the device-resident FRI prover (``proof/fri_device.py``).

Byte-level parity of every layer against the host golden path ``fri.fri_prove``:
the device SHA3 transcript (``DevTranscript``), the challenge reduction, and
full proofs through both the per-layer (Phase 1) and the single-dispatch
device-transcript chain (Phase 2) paths.
"""

import numpy as np
import pytest

from lambda_snark_tpu.core.params import NTT_MODULUS
from lambda_snark_tpu.proof import fri, fri_device
from lambda_snark_tpu.proof.fri import FriParams, FriTranscript

P = NTT_MODULUS
FAST = FriParams(log_blowup=2, num_queries=4, final_len=4)


def _dev_transcript_from(tr: FriTranscript, s: int):
    import jax.numpy as jnp

    state = jnp.asarray(
        np.stack([np.frombuffer(tr._state, dtype="<u4")] * s, axis=1)
    )
    return fri_device.DevTranscript(state, tr._counter)


def _state_bytes(dev, col: int) -> bytes:
    return np.asarray(dev.state)[:, col].astype("<u4").tobytes()


def test_dev_transcript_absorb_squeeze_matches_host():
    """DevTranscript must ratchet byte-identically to FriTranscript."""
    tr = FriTranscript()
    tr.absorb(b"seed", b"\x01\x02\x03")
    dev = _dev_transcript_from(tr, 2)

    # absorb a 32-byte root (raw bytes, as fri_prove does for layer roots)
    root = bytes(range(32))
    tr.absorb(b"fri-layer-root", root)
    words = np.frombuffer(root, dtype="<u4")
    import jax.numpy as jnp

    dev.absorb_chunks(
        b"fri-layer-root",
        [("words", [jnp.full((2,), w, dtype=jnp.uint32) for w in words])],
    )
    assert _state_bytes(dev, 0) == tr._state
    assert _state_bytes(dev, 1) == tr._state

    # absorb_words layout (length prefix + LE u64 words), as fri-final does
    import struct

    vals = [5, P - 1, 0, 123456789]
    tr.absorb_words(b"fri-final", vals)
    chunks = [("const", struct.pack("<Q", len(vals)))]
    word_list = []
    for v in vals:
        word_list.append(jnp.full((2,), v & 0xFFFFFFFF, dtype=jnp.uint32))
        word_list.append(jnp.full((2,), v >> 32, dtype=jnp.uint32))
    chunks.append(("words", word_list))
    dev.absorb_chunks(b"fri-final", chunks)
    assert _state_bytes(dev, 0) == tr._state

    # squeeze ratchet + counter
    host_digest = tr._squeeze(b"fri-query")
    dev_digest = np.asarray(dev.squeeze(b"fri-query"))
    assert dev_digest[:, 0].astype("<u4").tobytes() == host_digest
    assert _state_bytes(dev, 0) == tr._state
    assert dev.counter == tr._counter


def test_challenge_planes_matches_challenge_field():
    tr = FriTranscript()
    tr.absorb(b"x", b"y")
    dev = _dev_transcript_from(tr, 1)
    for _ in range(8):
        want = tr.challenge_field(P, b"fri-fold")
        planes = np.asarray(
            fri_device._challenge_planes(dev.squeeze(b"fri-fold"))
        )
        got = int(planes[0, 0]) | (int(planes[1, 0]) << 16) | (
            int(planes[2, 0]) << 32) | (int(planes[3, 0]) << 48)
        assert got == want


def _proof_case(seed: int, s: int, n0: int, k: int = 4):
    """Random codewords (already low-degree) + matching host/device inputs."""
    rng = np.random.default_rng(seed)
    q = P
    offset = fri.coset_offset(q)
    omega = fri.root_of_order(q, n0)
    d_bound = n0 >> FAST.log_blowup
    polys = rng.integers(0, q, size=(s, k, d_bound), dtype=np.uint64)
    cw = np.empty((s, k, n0), dtype=np.uint64)
    for i in range(s):
        for j in range(k):
            cw[i, j] = np.array(
                fri.lde(list(map(int, polys[i, j])), n0, offset, omega, q),
                dtype=np.uint64,
            )
    # virtual oracle g = sum of codewords (any linear combination is fine:
    # the FRI itself only needs g low-degree and the openings self-consistent)
    from lambda_snark_tpu.ops import goldilocks_np as glnp

    g = np.zeros((s, n0), dtype=np.uint64)
    for j in range(k):
        g = glnp.gl_add(g, cw[:, j])
    return q, offset, omega, cw, g


def _host_proofs(q, offset, omega, cw, g, seeds):
    proofs = []
    for i in range(cw.shape[0]):
        tr = FriTranscript()
        tr.absorb(b"case", seeds[i])
        group = [list(map(int, cw[i, j])) for j in range(cw.shape[1])]
        inputs = [(group, fri.commit_codeword_group(group))]
        proofs.append(
            fri.fri_prove(list(map(int, g[i])), inputs, offset, omega, q,
                          FAST, tr)
        )
    return proofs


def _device_proofs(q, offset, omega, cw, g, seeds):
    s, k, n0 = cw.shape
    input_planes = fri_device.planes_from_u64(cw)  # (4, S, K, n0)
    forest = fri_device.commit_planes_dev_groups(input_planes)
    g_planes = fri_device.planes_from_u64(g)
    trs = []
    for i in range(s):
        tr = FriTranscript()
        tr.absorb(b"case", seeds[i])
        trs.append(tr)
    return fri_device.fri_prove_device(
        g_planes, input_planes, forest, offset, omega, q, FAST, trs
    )


@pytest.mark.parametrize("s", [1, 3])
def test_device_chain_proofs_bitwise_equal_host(s):
    """Phase-2 single-dispatch chain == host fri_prove, byte for byte."""
    q, offset, omega, cw, g = _proof_case(7, s, 64)
    seeds = [bytes([i]) * 4 for i in range(s)]
    host = _host_proofs(q, offset, omega, cw, g, seeds)
    assert fri_device.DEVICE_TRANSCRIPT
    dev = _device_proofs(q, offset, omega, cw, g, seeds)
    for hp, dp in zip(host, dev):
        assert dp.to_bytes() == hp.to_bytes()


def test_phase1_loop_proofs_bitwise_equal_host():
    """The per-layer Phase-1 path (DEVICE_TRANSCRIPT off) stays bit-exact."""
    q, offset, omega, cw, g = _proof_case(11, 2, 128)
    seeds = [b"p1-a", b"p1-b"]
    host = _host_proofs(q, offset, omega, cw, g, seeds)
    old = fri_device.DEVICE_TRANSCRIPT
    fri_device.DEVICE_TRANSCRIPT = False
    try:
        dev = _device_proofs(q, offset, omega, cw, g, seeds)
    finally:
        fri_device.DEVICE_TRANSCRIPT = old
    for hp, dp in zip(host, dev):
        assert dp.to_bytes() == hp.to_bytes()


def test_keccak_looped_matches_unrolled():
    from lambda_snark_tpu.ops import keccak_jax as kj
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    lo = jnp.asarray(rng.integers(0, 2**32, size=(25, 5), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, size=(25, 5), dtype=np.uint32))
    a_lo, a_hi = kj.keccak_f(lo, hi)
    b_lo, b_hi = kj.keccak_f_looped(lo, hi)
    assert np.array_equal(np.asarray(a_lo), np.asarray(b_lo))
    assert np.array_equal(np.asarray(a_hi), np.asarray(b_hi))
