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
