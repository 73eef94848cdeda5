// ctypes-facing batch token hashing (packed-buffer ABI).
//
// Replaces the reference's per-token Python hashlib loop
// (/root/reference/datasketch/minhash.py:263). Tokens are packed
// back-to-back in `data`; token i spans [offsets[i], offsets[i+1]).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread hashing.cpp -o libdshash.so

#include "dshash_core.h"

extern "C" {

void batch_sha1_32(const uint8_t* data, const int64_t* offsets, int64_t n,
                   uint32_t* out) {
  const dshash::compress_fn c = dshash::sha1_compress();
  dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++)
      out[i] = dshash::sha1_32(
          data + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]), c);
  });
}

void batch_sha1_64(const uint8_t* data, const int64_t* offsets, int64_t n,
                   uint64_t* out) {
  const dshash::compress_fn c = dshash::sha1_compress();
  dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++)
      out[i] = dshash::sha1_64(
          data + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]), c);
  });
}

void batch_xxhash32(const uint8_t* data, const int64_t* offsets, int64_t n,
                    uint32_t seed, uint32_t* out) {
  dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++)
      out[i] = dshash::xxh32(data + offsets[i],
                             static_cast<size_t>(offsets[i + 1] - offsets[i]),
                             seed);
  });
}

int sha_ni_available(void) { return dshash::sha_ni_available() ? 1 : 0; }

}  // extern "C"
