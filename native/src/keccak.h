// Minimal Keccak-f[1600] sponge: SHA3-256 and streaming SHAKE256.
// Standard FIPS-202 algorithm, self-contained (no OpenSSL).
#ifndef LS_KECCAK_H
#define LS_KECCAK_H

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

namespace ls {

class KeccakSponge {
 public:
  // rate_bytes: 136 for SHA3-256/SHAKE256 capacity 512.
  explicit KeccakSponge(size_t rate_bytes, uint8_t domain_pad)
      : rate_(rate_bytes), pad_(domain_pad) {
    std::memset(state_, 0, sizeof(state_));
  }

  void absorb(const uint8_t* data, size_t len);
  void finalize();                       // pad + final permute; enters squeeze
  void squeeze(uint8_t* out, size_t len);  // streaming

 private:
  void permute();
  void xor_block(const uint8_t* data, size_t len);

  uint64_t state_[25];
  size_t rate_;
  uint8_t pad_;
  size_t absorb_pos_ = 0;
  size_t squeeze_pos_ = 0;
  bool finalized_ = false;
};

// One-shot SHA3-256.
void sha3_256(const uint8_t* data, size_t len, uint8_t out[32]);

// Streaming SHAKE256 reader.
class Shake256 {
 public:
  Shake256() : sponge_(136, 0x1F) {}
  void absorb(const uint8_t* data, size_t len) { sponge_.absorb(data, len); }
  void finalize() { sponge_.finalize(); }
  void read(uint8_t* out, size_t len) { sponge_.squeeze(out, len); }
  uint64_t read_u64_le() {
    uint8_t b[8];
    read(b, 8);
    uint64_t v = 0;
    for (int i = 7; i >= 0; --i) v = (v << 8) | b[i];
    return v;
  }

 private:
  KeccakSponge sponge_;
};

}  // namespace ls

#endif  // LS_KECCAK_H
