// ChaCha20 keystream RNG, bit-parity with rand_chacha::ChaCha20Rng and the
// Python mirror (lambda_snark_tpu/utils/chacha.py): DJB variant (64-bit
// counter + 64-bit nonce), next_u64 = two consecutive u32 words (low first).
#ifndef LS_CHACHA_H
#define LS_CHACHA_H

#include <cstdint>
#include <cstring>

namespace ls {

class ChaCha20Rng {
 public:
  explicit ChaCha20Rng(const uint8_t key[32]) {
    for (int i = 0; i < 8; ++i) {
      key_[i] = static_cast<uint32_t>(key[4 * i]) |
                (static_cast<uint32_t>(key[4 * i + 1]) << 8) |
                (static_cast<uint32_t>(key[4 * i + 2]) << 16) |
                (static_cast<uint32_t>(key[4 * i + 3]) << 24);
    }
  }

  uint32_t next_u32() {
    if (pos_ == 16) refill();
    return buf_[pos_++];
  }

  uint64_t next_u64() {
    uint64_t lo = next_u32();
    uint64_t hi = next_u32();
    return lo | (hi << 32);
  }

 private:
  static inline uint32_t rotl(uint32_t x, int s) {
    return (x << s) | (x >> (32 - s));
  }
  static inline void quarter(uint32_t& a, uint32_t& b, uint32_t& c,
                             uint32_t& d) {
    a += b; d ^= a; d = rotl(d, 16);
    c += d; b ^= c; b = rotl(b, 12);
    a += b; d ^= a; d = rotl(d, 8);
    c += d; b ^= c; b = rotl(b, 7);
  }

  void refill() {
    uint32_t st[16] = {0x61707865u, 0x3320646Eu, 0x79622D32u, 0x6B206574u,
                       key_[0], key_[1], key_[2], key_[3],
                       key_[4], key_[5], key_[6], key_[7],
                       static_cast<uint32_t>(counter_),
                       static_cast<uint32_t>(counter_ >> 32), 0u, 0u};
    uint32_t x[16];
    std::memcpy(x, st, sizeof(x));
    for (int i = 0; i < 10; ++i) {
      quarter(x[0], x[4], x[8], x[12]);
      quarter(x[1], x[5], x[9], x[13]);
      quarter(x[2], x[6], x[10], x[14]);
      quarter(x[3], x[7], x[11], x[15]);
      quarter(x[0], x[5], x[10], x[15]);
      quarter(x[1], x[6], x[11], x[12]);
      quarter(x[2], x[7], x[8], x[13]);
      quarter(x[3], x[4], x[9], x[14]);
    }
    for (int i = 0; i < 16; ++i) buf_[i] = x[i] + st[i];
    ++counter_;
    pos_ = 0;
  }

  uint32_t key_[8];
  uint64_t counter_ = 0;
  uint32_t buf_[16];
  int pos_ = 16;
};

}  // namespace ls

#endif  // LS_CHACHA_H
