// Batched SHA3-256 + Merkle-path verification (8-lane SIMD Keccak-f[1600]).
//
// The succinct verifier (proof/fri.py) authenticates ~5k Merkle nodes per
// proof; per-call hashlib makes that the dominant verify cost (VERDICT r4
// weak #3). This file runs eight independent single-block sponges at once —
// the state lives in GCC vector-extension registers (one zmm per state word
// under AVX-512, two ymm under AVX2) — and walks authentication paths in
// blocks of eight lanes so each block's digests stay in L1. Node messages
// are assembled directly as rate words (no per-byte staging). Semantics
// match proof/merkle.py exactly: leaf = SHA3-256(0x00 || data),
// node = SHA3-256(0x01 || left || right).
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

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

constexpr int kLanes = 8;      // SoA width
constexpr size_t kRate = 136;  // SHA3-256 rate bytes (17 words)

typedef uint64_t v8 __attribute__((vector_size(64), aligned(64)));

inline v8 rot(v8 x, int s) { return (x << s) | (x >> (64 - s)); }

// 8 independent Keccak-f[1600] permutations on vector-typed state.
void keccak_f1600_x8(v8 st[25]) {
  for (int round = 0; round < 24; ++round) {
    // theta
    v8 bc0 = st[0] ^ st[5] ^ st[10] ^ st[15] ^ st[20];
    v8 bc1 = st[1] ^ st[6] ^ st[11] ^ st[16] ^ st[21];
    v8 bc2 = st[2] ^ st[7] ^ st[12] ^ st[17] ^ st[22];
    v8 bc3 = st[3] ^ st[8] ^ st[13] ^ st[18] ^ st[23];
    v8 bc4 = st[4] ^ st[9] ^ st[14] ^ st[19] ^ st[24];
    v8 d0 = bc4 ^ rot(bc1, 1), d1 = bc0 ^ rot(bc2, 1), d2 = bc1 ^ rot(bc3, 1),
       d3 = bc2 ^ rot(bc4, 1), d4 = bc3 ^ rot(bc0, 1);
    for (int j = 0; j < 25; j += 5) {
      st[j] ^= d0;
      st[j + 1] ^= d1;
      st[j + 2] ^= d2;
      st[j + 3] ^= d3;
      st[j + 4] ^= d4;
    }
    // rho + pi
    v8 t = st[1];
    for (int i = 0; i < 24; ++i) {
      int j = kPiln[i];
      v8 t2 = st[j];
      st[j] = rot(t, kRotc[i]);
      t = t2;
    }
    // chi
    for (int j = 0; j < 25; j += 5) {
      v8 a0 = st[j], a1 = st[j + 1], a2 = st[j + 2], a3 = st[j + 3],
         a4 = st[j + 4];
      st[j] ^= (~a1) & a2;
      st[j + 1] ^= (~a2) & a3;
      st[j + 2] ^= (~a3) & a4;
      st[j + 3] ^= (~a4) & a0;
      st[j + 4] ^= (~a0) & a1;
    }
    // iota
    st[0] ^= kRound[round];
  }
}

// Zero state, set lane l's rate words from a generic padded message.
inline void set_lane_generic(v8 st[25], int l, const uint8_t* msg, size_t len) {
  uint8_t bytes[kRate];
  std::memset(bytes, 0, kRate);
  std::memcpy(bytes, msg, len);
  bytes[len] ^= 0x06;
  bytes[kRate - 1] ^= 0x80;
  uint64_t w[17];
  std::memcpy(w, bytes, kRate);
  for (int i = 0; i < 17; ++i) st[i][l] = w[i];
}

// Set lane l's rate words for the 65-byte node message
// 0x01 || L(32B) || R(32B), assembled directly as words.
inline void set_lane_node(v8 st[25], int l, const uint64_t L[4],
                          const uint64_t R[4]) {
  st[0][l] = 0x01ULL | (L[0] << 8);
  st[1][l] = (L[0] >> 56) | (L[1] << 8);
  st[2][l] = (L[1] >> 56) | (L[2] << 8);
  st[3][l] = (L[2] >> 56) | (L[3] << 8);
  st[4][l] = (L[3] >> 56) | (R[0] << 8);
  st[5][l] = (R[0] >> 56) | (R[1] << 8);
  st[6][l] = (R[1] >> 56) | (R[2] << 8);
  st[7][l] = (R[2] >> 56) | (R[3] << 8);
  st[8][l] = (R[3] >> 56) | (0x06ULL << 8);
  st[9][l] = 0;
  st[10][l] = 0;
  st[11][l] = 0;
  st[12][l] = 0;
  st[13][l] = 0;
  st[14][l] = 0;
  st[15][l] = 0;
  st[16][l] = 0x8000000000000000ULL;
}

inline void zero_high_words(v8 st[25]) {
  for (int w = 17; w < 25; ++w)
    st[w] = v8{0, 0, 0, 0, 0, 0, 0, 0};
}

// Verify lanes [lane_begin, lane_end) in blocks of 8; each lane's digest
// chain lives in dig[lane][4] words.
void merkle_verify_range(const uint8_t* leaves, size_t leaf_len,
                         const uint64_t* indices, const uint8_t* siblings,
                         const uint32_t* depths, size_t max_depth,
                         const uint8_t* roots, size_t lane_begin,
                         size_t lane_end, uint8_t* ok) {
  v8 st[25];
  for (size_t b = lane_begin; b < lane_end; b += kLanes) {
    int active = static_cast<int>(lane_end - b < static_cast<size_t>(kLanes)
                                      ? lane_end - b
                                      : kLanes);
    uint64_t dig[kLanes][4];
    // leaf hashes
    zero_high_words(st);
    for (int w = 0; w < 17; ++w) st[w] = v8{0, 0, 0, 0, 0, 0, 0, 0};
    for (int l = 0; l < active; ++l) {
      uint8_t msg[kRate];
      msg[0] = 0x00;
      std::memcpy(msg + 1, leaves + (b + l) * leaf_len, leaf_len);
      set_lane_generic(st, l, msg, 1 + leaf_len);
    }
    keccak_f1600_x8(st);
    for (int l = 0; l < active; ++l)
      for (int w = 0; w < 4; ++w) dig[l][w] = st[w][l];

    // path walk; lanes in a block usually share a depth, but divergence is
    // handled by freezing finished lanes' digests
    uint32_t block_depth = 0;
    for (int l = 0; l < active; ++l)
      if (depths[b + l] > block_depth) block_depth = depths[b + l];
    for (uint32_t level = 0; level < block_depth; ++level) {
      zero_high_words(st);
      for (int l = 0; l < active; ++l) {
        if (depths[b + l] <= level) {
          // keep the permutation input harmless; result is discarded
          set_lane_node(st, l, dig[l], dig[l]);
          continue;
        }
        uint64_t sib[4];
        std::memcpy(sib,
                    siblings + ((b + l) * max_depth + level) * 32, 32);
        if ((indices[b + l] >> level) & 1)
          set_lane_node(st, l, sib, dig[l]);
        else
          set_lane_node(st, l, dig[l], sib);
      }
      keccak_f1600_x8(st);
      for (int l = 0; l < active; ++l) {
        if (depths[b + l] <= level) continue;
        for (int w = 0; w < 4; ++w) dig[l][w] = st[w][l];
      }
    }

    for (int l = 0; l < active; ++l) {
      uint64_t r[4];
      std::memcpy(r, roots + (b + l) * 32, 32);
      ok[b + l] = (r[0] == dig[l][0] && r[1] == dig[l][1] &&
                   r[2] == dig[l][2] && r[3] == dig[l][3])
                      ? 1
                      : 0;
    }
  }
}

}  // namespace
}  // namespace ls

extern "C" {

// Batch SHA3-256 over n equal-length messages (msg_len < 136, single block).
// msgs: [n * msg_len] contiguous; out: [n * 32]. Returns 0 on success.
int ls_sha3_256_batch(const uint8_t* msgs, size_t msg_len, size_t n,
                      uint8_t* out) {
  if (msg_len >= ls::kRate) return -1;
  ls::v8 st[25];
  for (size_t i = 0; i < n; i += ls::kLanes) {
    int active = static_cast<int>(n - i < static_cast<size_t>(ls::kLanes)
                                      ? n - i
                                      : ls::kLanes);
    for (int w = 0; w < 25; ++w) st[w] = ls::v8{0, 0, 0, 0, 0, 0, 0, 0};
    for (int l = 0; l < active; ++l)
      ls::set_lane_generic(st, l, msgs + (i + l) * msg_len, msg_len);
    ls::keccak_f1600_x8(st);
    for (int l = 0; l < active; ++l) {
      uint64_t d[4] = {st[0][l], st[1][l], st[2][l], st[3][l]};
      std::memcpy(out + (i + l) * 32, d, 32);
    }
  }
  return 0;
}

// Verify `lanes` Merkle authentication paths in one call.
//
//   leaves:   [lanes * leaf_len]  raw leaf data (hashed as 0x00 || data)
//   indices:  [lanes]             leaf index within its tree
//   siblings: [lanes * max_depth * 32]  per-lane sibling digests, bottom-up,
//             only the first depths[l] entries of a lane are read
//   depths:   [lanes]             path length per lane (<= max_depth)
//   roots:    [lanes * 32]        expected root per lane
//   ok:       [lanes]             out, 1 = path valid
//
// Returns 0 on success (individual failures land in `ok`), negative on
// malformed arguments. Splits across two threads for large batches.
int ls_merkle_verify_batch(const uint8_t* leaves, size_t leaf_len,
                           const uint64_t* indices, const uint8_t* siblings,
                           const uint32_t* depths, size_t max_depth,
                           const uint8_t* roots, size_t lanes, uint8_t* ok) {
  if (leaf_len + 1 >= ls::kRate) return -1;
  if (lanes == 0) return 0;
  // 64+: the wire-v3 verifier's lane counts (30 input groups, ~180 layer
  // lanes at m=2^13) sit well under the old 256 threshold, leaving the
  // second core idle exactly where the <2 ms verify budget is tightest
  if (lanes >= 64 && std::thread::hardware_concurrency() >= 2) {
    size_t mid = ((lanes / 2) / ls::kLanes) * ls::kLanes;  // block-aligned
    std::thread t1(ls::merkle_verify_range, leaves, leaf_len, indices,
                   siblings, depths, max_depth, roots, 0, mid, ok);
    ls::merkle_verify_range(leaves, leaf_len, indices, siblings, depths,
                            max_depth, roots, mid, lanes, ok);
    t1.join();
  } else {
    ls::merkle_verify_range(leaves, leaf_len, indices, siblings, depths,
                            max_depth, roots, 0, lanes, ok);
  }
  return 0;
}

}  // extern "C"
