// Keccak-f[1600] permutation + sponge (FIPS 202).
#include "keccak.h"

namespace ls {

namespace {

constexpr uint64_t kRound[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

constexpr int kRotc[24] = {1,  3,  6,  10, 15, 21, 28, 36, 45, 55, 2,  14,
                           27, 41, 56, 8,  25, 43, 62, 18, 39, 61, 20, 44};

constexpr int kPiln[24] = {10, 7,  11, 17, 18, 3, 5,  16, 8,  21, 24, 4,
                           15, 23, 19, 13, 12, 2, 20, 14, 22, 9,  6,  1};

inline uint64_t rotl64(uint64_t x, int s) {
  return (x << s) | (x >> (64 - s));
}

}  // namespace

void KeccakSponge::permute() {
  uint64_t* st = state_;
  uint64_t bc[5];
  for (int round = 0; round < 24; ++round) {
    // theta
    for (int i = 0; i < 5; ++i)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; ++i) {
      uint64_t t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    uint64_t t = st[1];
    for (int i = 0; i < 24; ++i) {
      int j = kPiln[i];
      bc[0] = st[j];
      st[j] = rotl64(t, kRotc[i]);
      t = bc[0];
    }
    // chi
    for (int j = 0; j < 25; j += 5) {
      for (int i = 0; i < 5; ++i) bc[i] = st[j + i];
      for (int i = 0; i < 5; ++i)
        st[j + i] ^= (~bc[(i + 1) % 5]) & bc[(i + 2) % 5];
    }
    // iota
    st[0] ^= kRound[round];
  }
}

void KeccakSponge::xor_block(const uint8_t* data, size_t len) {
  uint8_t* bytes = reinterpret_cast<uint8_t*>(state_);
  for (size_t i = 0; i < len; ++i) bytes[absorb_pos_ + i] ^= data[i];
}

void KeccakSponge::absorb(const uint8_t* data, size_t len) {
  while (len > 0) {
    size_t take = rate_ - absorb_pos_;
    if (take > len) take = len;
    xor_block(data, take);
    absorb_pos_ += take;
    data += take;
    len -= take;
    if (absorb_pos_ == rate_) {
      permute();
      absorb_pos_ = 0;
    }
  }
}

void KeccakSponge::finalize() {
  uint8_t* bytes = reinterpret_cast<uint8_t*>(state_);
  bytes[absorb_pos_] ^= pad_;
  bytes[rate_ - 1] ^= 0x80;
  permute();
  absorb_pos_ = 0;
  squeeze_pos_ = 0;
  finalized_ = true;
}

void KeccakSponge::squeeze(uint8_t* out, size_t len) {
  const uint8_t* bytes = reinterpret_cast<const uint8_t*>(state_);
  while (len > 0) {
    if (squeeze_pos_ == rate_) {
      permute();
      squeeze_pos_ = 0;
    }
    size_t take = rate_ - squeeze_pos_;
    if (take > len) take = len;
    std::memcpy(out, bytes + squeeze_pos_, take);
    squeeze_pos_ += take;
    out += take;
    len -= take;
  }
}

void sha3_256(const uint8_t* data, size_t len, uint8_t out[32]) {
  KeccakSponge sponge(136, 0x06);
  sponge.absorb(data, len);
  sponge.finalize();
  sponge.squeeze(out, 32);
}

}  // namespace ls
