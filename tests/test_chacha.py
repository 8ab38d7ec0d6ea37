"""ChaCha20 parity: RFC 8439 vectors + rand_core seed-expansion invariants."""

from lambda_snark_tpu.utils.chacha import ChaCha20Rng, chacha20_block, seed_from_u64


def test_chacha20_block_rfc8439():
    # RFC 8439 section 2.3.2 test vector, adapted to the DJB 64/64 layout:
    # the RFC uses a 32-bit counter + 96-bit nonce; with nonce words
    # (0x09000000, 0x4a000000, 0x00000000) and counter 1 the state matches the
    # DJB layout counter = 1 | (0x09000000 << 32), nonce = (0x4a000000, 0).
    key = [
        0x03020100, 0x07060504, 0x0B0A0908, 0x0F0E0D0C,
        0x13121110, 0x17161514, 0x1B1A1918, 0x1F1E1D1C,
    ]
    counter = 1 | (0x09000000 << 32)
    nonce = [0x4A000000, 0x00000000]
    out = chacha20_block(key, counter, nonce)
    expected = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert out == expected


def test_chacha20_block_zero_key_djb():
    # Known keystream for all-zero key/nonce/counter (original DJB variant,
    # also the IETF vector since counter=nonce=0 coincide):
    out = chacha20_block([0] * 8, 0, [0, 0])
    first_bytes = b"".join(w.to_bytes(4, "little") for w in out)
    assert first_bytes.hex().startswith("76b8e0ada0f13d90405d6ae55386bd28")


def test_seed_from_u64_structure():
    # deterministic, 32 bytes, differs per seed
    s1 = seed_from_u64(42)
    s2 = seed_from_u64(42)
    s3 = seed_from_u64(43)
    assert s1 == s2 and len(s1) == 32
    assert s1 != s3


def test_rng_determinism_and_stream():
    r1 = ChaCha20Rng.from_u64(42)
    r2 = ChaCha20Rng.from_u64(42)
    seq1 = [r1.next_u64() for _ in range(10)]
    seq2 = [r2.next_u64() for _ in range(10)]
    assert seq1 == seq2
    assert len(set(seq1)) == 10
    # fill_u64 matches sequential next_u64
    r3 = ChaCha20Rng.from_u64(42)
    assert list(r3.fill_u64(10)) == seq1


def test_next_u64_word_order():
    # next_u64 = lo word | hi word << 32 from consecutive keystream words
    rng = ChaCha20Rng.from_u64(7)
    w0 = ChaCha20Rng.from_u64(7).next_u32()
    rng2 = ChaCha20Rng.from_u64(7)
    rng2.next_u32()
    w1 = rng2.next_u32()
    assert ChaCha20Rng.from_u64(7).next_u64() == w0 | (w1 << 32)


def test_chacha20_blocks_np_matches_scalar_blocks():
    # Direct row-for-row parity of the vectorized block generator with the
    # scalar block function, including a counter that crosses the 32-bit
    # word boundary (state[12] wraps, state[13] increments).
    from lambda_snark_tpu.utils.chacha import chacha20_blocks_np

    key = [int.from_bytes(seed_from_u64(99)[i : i + 4], "little")
           for i in range(0, 32, 4)]
    nonce = [0xDEADBEEF, 0x0BADF00D]
    for counter in (0, 5, (1 << 32) - 2):
        rows = chacha20_blocks_np(key, counter, nonce, 5)
        assert rows.shape == (5, 16)
        for b in range(5):
            expect = chacha20_block(key, counter + b, nonce)
            assert [int(w) for w in rows[b]] == expect, (counter, b)


def test_keystream_partial_buffer_drain():
    # Interleave scalar next_u32 draws with vectorized fill_u64 so
    # _keystream_u32 must (a) drain a partial buffer and (b) re-buffer a
    # partial block remainder — word-for-word identical to all-scalar draws.
    scalar = ChaCha20Rng.from_u64(1234)
    mixed = ChaCha20Rng.from_u64(1234)
    stream = [scalar.next_u32() for _ in range(200)]
    got = []
    got.append(mixed.next_u32())                      # partial buffer: 15 left
    v = mixed.fill_u64(10)                            # drains 15, refills
    for x in v:
        got.extend([int(x) & 0xFFFFFFFF, int(x) >> 32])
    got.extend(mixed.next_u32() for _ in range(3))    # from re-buffered words
    v = mixed.fill_u64(30)                            # drain + multi-block
    for x in v:
        got.extend([int(x) & 0xFFFFFFFF, int(x) >> 32])
    assert got == stream[: len(got)]


def test_chacha20_blocks_keys_matches_scalar():
    # multi-key block generator: row (k, b) == scalar block for key k
    import numpy as np

    from lambda_snark_tpu.utils.chacha import chacha20_blocks_keys_np

    keys = []
    for s in (1, 2, 0xDEADBEEF):
        kb = seed_from_u64(s)
        keys.append(
            [int.from_bytes(kb[i : i + 4], "little") for i in range(0, 32, 4)]
        )
    for counter in (0, (1 << 32) - 1):
        out = chacha20_blocks_keys_np(
            np.array(keys, dtype=np.uint32), counter, [7, 9], 3
        )
        assert out.shape == (3, 3, 16)
        for ki, k in enumerate(keys):
            for b in range(3):
                assert [int(w) for w in out[ki, b]] == chacha20_block(
                    k, counter + b, [7, 9]
                ), (ki, b)
