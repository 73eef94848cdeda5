// Native batch token hashing for datasketch_tpu.
//
// Replaces the reference's per-token Python hashlib loop
// (/root/reference/datasketch/minhash.py:263) with a threaded C++ pass over
// a packed token buffer. SHA1 implemented from the FIPS 180-1 specification;
// outputs match `struct.unpack("<I", hashlib.sha1(data).digest()[:4])` /
// `"<Q" ... [:8]` exactly (low 4/8 digest bytes, little-endian).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread hashing.cpp -o libdshash.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline uint32_t rotl32(uint32_t x, int c) { return (x << c) | (x >> (32 - c)); }

// Compute SHA1 of `len` bytes at `data`; writes the 5 state words (h0..h4,
// each in the spec's big-endian word order) to `out`.
void sha1(const uint8_t* data, size_t len, uint32_t out[5]) {
  uint32_t h0 = 0x67452301u, h1 = 0xEFCDAB89u, h2 = 0x98BADCFEu,
           h3 = 0x10325476u, h4 = 0xC3D2E1F0u;
  uint64_t total_bits = static_cast<uint64_t>(len) * 8;

  uint8_t block[64];
  size_t pos = 0;
  bool appended = false, length_written = false;
  while (!length_written) {
    size_t take = 0;
    if (pos < len) {
      take = std::min<size_t>(64, len - pos);
      std::memcpy(block, data + pos, take);
      pos += take;
    }
    if (take < 64) {
      if (!appended) {
        block[take++] = 0x80;
        appended = true;
      }
      if (take <= 56) {
        std::memset(block + take, 0, 56 - take);
        for (int i = 0; i < 8; i++)
          block[56 + i] = static_cast<uint8_t>(total_bits >> (8 * (7 - i)));
        length_written = true;
      } else {
        std::memset(block + take, 0, 64 - take);
      }
    }

    uint32_t w[80];
    for (int i = 0; i < 16; i++)
      w[i] = (uint32_t(block[4 * i]) << 24) | (uint32_t(block[4 * i + 1]) << 16) |
             (uint32_t(block[4 * i + 2]) << 8) | uint32_t(block[4 * i + 3]);
    for (int i = 16; i < 80; i++)
      w[i] = rotl32(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);

    uint32_t a = h0, b = h1, c = h2, d = h3, e = h4;
    for (int i = 0; i < 80; i++) {
      uint32_t f, k;
      if (i < 20) {
        f = (b & c) | ((~b) & d);
        k = 0x5A827999u;
      } else if (i < 40) {
        f = b ^ c ^ d;
        k = 0x6ED9EBA1u;
      } else if (i < 60) {
        f = (b & c) | (b & d) | (c & d);
        k = 0x8F1BBCDCu;
      } else {
        f = b ^ c ^ d;
        k = 0xCA62C1D6u;
      }
      uint32_t tmp = rotl32(a, 5) + f + e + k + w[i];
      e = d;
      d = c;
      c = rotl32(b, 30);
      b = a;
      a = tmp;
    }
    h0 += a; h1 += b; h2 += c; h3 += d; h4 += e;
  }
  out[0] = h0; out[1] = h1; out[2] = h2; out[3] = h3; out[4] = h4;
}

inline uint32_t bswap32(uint32_t x) { return __builtin_bswap32(x); }

// xxHash32 (public algorithm), seed 0 unless given.
uint32_t xxh32(const uint8_t* p, size_t len, uint32_t seed) {
  const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;
  const uint8_t* end = p + len;
  uint32_t h;
  if (len >= 16) {
    const uint8_t* limit = end - 16;
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    do {
      uint32_t x;
      std::memcpy(&x, p, 4); v1 = rotl32(v1 + x * P2, 13) * P1; p += 4;
      std::memcpy(&x, p, 4); v2 = rotl32(v2 + x * P2, 13) * P1; p += 4;
      std::memcpy(&x, p, 4); v3 = rotl32(v3 + x * P2, 13) * P1; p += 4;
      std::memcpy(&x, p, 4); v4 = rotl32(v4 + x * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint32_t>(len);
  while (p + 4 <= end) {
    uint32_t x;
    std::memcpy(&x, p, 4);
    h = rotl32(h + x * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl32(h + (*p) * P5, 11) * P1;
    p++;
  }
  h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
  return h;
}

template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n / 2048));
  if (nthreads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; t++) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Tokens are packed back-to-back in `data`; token i spans
// [offsets[i], offsets[i+1]). Writes low-32 (LE) SHA1 to out[i].
void batch_sha1_32(const uint8_t* data, const int64_t* offsets, int64_t n,
                   uint32_t* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    uint32_t h[5];
    for (int64_t i = lo; i < hi; i++) {
      sha1(data + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]), h);
      out[i] = bswap32(h[0]);  // digest[0:4] little-endian
    }
  });
}

void batch_sha1_64(const uint8_t* data, const int64_t* offsets, int64_t n,
                   uint64_t* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    uint32_t h[5];
    for (int64_t i = lo; i < hi; i++) {
      sha1(data + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]), h);
      // digest[0:8] little-endian == bswap(h0) | bswap(h1) << 32
      out[i] = (static_cast<uint64_t>(bswap32(h[1])) << 32) |
               static_cast<uint64_t>(bswap32(h[0]));
    }
  });
}

void batch_xxhash32(const uint8_t* data, const int64_t* offsets, int64_t n,
                    uint32_t seed, uint32_t* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      out[i] = xxh32(data + offsets[i],
                     static_cast<size_t>(offsets[i + 1] - offsets[i]), seed);
    }
  });
}

}  // extern "C"
