// Shared native hashing core for datasketch_tpu.
//
// SHA1 from the FIPS 180-1 specification, with an x86 SHA-NI fast path
// (runtime-dispatched via __builtin_cpu_supports). Outputs match
// `struct.unpack("<I", hashlib.sha1(data).digest()[:4])` / `"<Q" ... [:8]`
// exactly (low 4/8 digest bytes, little-endian) — the reference's default
// token hashes (/root/reference/datasketch/hashfunc.py:5,18).

#pragma once

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define DSHASH_X86 1
#endif

namespace dshash {

inline uint32_t rotl32(uint32_t x, int c) { return (x << c) | (x >> (32 - c)); }
inline uint32_t bswap32(uint32_t x) { return __builtin_bswap32(x); }

// ---------------------------------------------------------------- scalar SHA1

// Compress one 64-byte block into state (spec word order).
inline void sha1_compress_scalar(uint32_t state[5], const uint8_t* block) {
  uint32_t w[80];
  for (int i = 0; i < 16; i++)
    w[i] = (uint32_t(block[4 * i]) << 24) | (uint32_t(block[4 * i + 1]) << 16) |
           (uint32_t(block[4 * i + 2]) << 8) | uint32_t(block[4 * i + 3]);
  for (int i = 16; i < 80; i++)
    w[i] = rotl32(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);

  uint32_t a = state[0], b = state[1], c = state[2], d = state[3], e = state[4];
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
    e = d; d = c; c = rotl32(b, 30); b = a; a = tmp;
  }
  state[0] += a; state[1] += b; state[2] += c; state[3] += d; state[4] += e;
}

// -------------------------------------------------------------- SHA-NI SHA1

#ifdef DSHASH_X86
__attribute__((target("sha,sse4.1,ssse3")))
inline void sha1_compress_ni(uint32_t state[5], const uint8_t* block) {
  __m128i ABCD = _mm_loadu_si128(reinterpret_cast<const __m128i*>(state));
  ABCD = _mm_shuffle_epi32(ABCD, 0x1B);
  __m128i E0 = _mm_set_epi32(static_cast<int>(state[4]), 0, 0, 0);
  const __m128i MASK =
      _mm_set_epi64x(0x0001020304050607LL, 0x08090a0b0c0d0e0fLL);

  const __m128i ABCD_SAVE = ABCD;
  const __m128i E0_SAVE = E0;

  __m128i MSG0 = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(block + 0)), MASK);
  __m128i MSG1 = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(block + 16)), MASK);
  __m128i MSG2 = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(block + 32)), MASK);
  __m128i MSG3 = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(block + 48)), MASK);
  __m128i E1;

  // Rounds 0-3
  E0 = _mm_add_epi32(E0, MSG0);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 0);
  // Rounds 4-7
  E1 = _mm_sha1nexte_epu32(E1, MSG1);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 0);
  MSG0 = _mm_sha1msg1_epu32(MSG0, MSG1);
  // Rounds 8-11
  E0 = _mm_sha1nexte_epu32(E0, MSG2);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 0);
  MSG1 = _mm_sha1msg1_epu32(MSG1, MSG2);
  MSG0 = _mm_xor_si128(MSG0, MSG2);
  // Rounds 12-15
  E1 = _mm_sha1nexte_epu32(E1, MSG3);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 0);
  MSG0 = _mm_sha1msg2_epu32(MSG0, MSG3);
  MSG2 = _mm_sha1msg1_epu32(MSG2, MSG3);
  MSG1 = _mm_xor_si128(MSG1, MSG3);
  // Rounds 16-19
  E0 = _mm_sha1nexte_epu32(E0, MSG0);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 0);
  MSG1 = _mm_sha1msg2_epu32(MSG1, MSG0);
  MSG3 = _mm_sha1msg1_epu32(MSG3, MSG0);
  MSG2 = _mm_xor_si128(MSG2, MSG0);
  // Rounds 20-23
  E1 = _mm_sha1nexte_epu32(E1, MSG1);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 1);
  MSG2 = _mm_sha1msg2_epu32(MSG2, MSG1);
  MSG0 = _mm_sha1msg1_epu32(MSG0, MSG1);
  MSG3 = _mm_xor_si128(MSG3, MSG1);
  // Rounds 24-27
  E0 = _mm_sha1nexte_epu32(E0, MSG2);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 1);
  MSG3 = _mm_sha1msg2_epu32(MSG3, MSG2);
  MSG1 = _mm_sha1msg1_epu32(MSG1, MSG2);
  MSG0 = _mm_xor_si128(MSG0, MSG2);
  // Rounds 28-31
  E1 = _mm_sha1nexte_epu32(E1, MSG3);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 1);
  MSG0 = _mm_sha1msg2_epu32(MSG0, MSG3);
  MSG2 = _mm_sha1msg1_epu32(MSG2, MSG3);
  MSG1 = _mm_xor_si128(MSG1, MSG3);
  // Rounds 32-35
  E0 = _mm_sha1nexte_epu32(E0, MSG0);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 1);
  MSG1 = _mm_sha1msg2_epu32(MSG1, MSG0);
  MSG3 = _mm_sha1msg1_epu32(MSG3, MSG0);
  MSG2 = _mm_xor_si128(MSG2, MSG0);
  // Rounds 36-39
  E1 = _mm_sha1nexte_epu32(E1, MSG1);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 1);
  MSG2 = _mm_sha1msg2_epu32(MSG2, MSG1);
  MSG0 = _mm_sha1msg1_epu32(MSG0, MSG1);
  MSG3 = _mm_xor_si128(MSG3, MSG1);
  // Rounds 40-43
  E0 = _mm_sha1nexte_epu32(E0, MSG2);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 2);
  MSG3 = _mm_sha1msg2_epu32(MSG3, MSG2);
  MSG1 = _mm_sha1msg1_epu32(MSG1, MSG2);
  MSG0 = _mm_xor_si128(MSG0, MSG2);
  // Rounds 44-47
  E1 = _mm_sha1nexte_epu32(E1, MSG3);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 2);
  MSG0 = _mm_sha1msg2_epu32(MSG0, MSG3);
  MSG2 = _mm_sha1msg1_epu32(MSG2, MSG3);
  MSG1 = _mm_xor_si128(MSG1, MSG3);
  // Rounds 48-51
  E0 = _mm_sha1nexte_epu32(E0, MSG0);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 2);
  MSG1 = _mm_sha1msg2_epu32(MSG1, MSG0);
  MSG3 = _mm_sha1msg1_epu32(MSG3, MSG0);
  MSG2 = _mm_xor_si128(MSG2, MSG0);
  // Rounds 52-55
  E1 = _mm_sha1nexte_epu32(E1, MSG1);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 2);
  MSG2 = _mm_sha1msg2_epu32(MSG2, MSG1);
  MSG0 = _mm_sha1msg1_epu32(MSG0, MSG1);
  MSG3 = _mm_xor_si128(MSG3, MSG1);
  // Rounds 56-59
  E0 = _mm_sha1nexte_epu32(E0, MSG2);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 2);
  MSG3 = _mm_sha1msg2_epu32(MSG3, MSG2);
  MSG1 = _mm_sha1msg1_epu32(MSG1, MSG2);
  MSG0 = _mm_xor_si128(MSG0, MSG2);
  // Rounds 60-63
  E1 = _mm_sha1nexte_epu32(E1, MSG3);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 3);
  MSG0 = _mm_sha1msg2_epu32(MSG0, MSG3);
  MSG2 = _mm_sha1msg1_epu32(MSG2, MSG3);
  MSG1 = _mm_xor_si128(MSG1, MSG3);
  // Rounds 64-67
  E0 = _mm_sha1nexte_epu32(E0, MSG0);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 3);
  MSG1 = _mm_sha1msg2_epu32(MSG1, MSG0);
  MSG3 = _mm_sha1msg1_epu32(MSG3, MSG0);
  MSG2 = _mm_xor_si128(MSG2, MSG0);
  // Rounds 68-71
  E1 = _mm_sha1nexte_epu32(E1, MSG1);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 3);
  MSG2 = _mm_sha1msg2_epu32(MSG2, MSG1);
  MSG3 = _mm_xor_si128(MSG3, MSG1);
  // Rounds 72-75
  E0 = _mm_sha1nexte_epu32(E0, MSG2);
  E1 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E0, 3);
  MSG3 = _mm_sha1msg2_epu32(MSG3, MSG2);
  // Rounds 76-79
  E1 = _mm_sha1nexte_epu32(E1, MSG3);
  E0 = ABCD;
  ABCD = _mm_sha1rnds4_epu32(ABCD, E1, 3);

  E0 = _mm_sha1nexte_epu32(E0, E0_SAVE);
  ABCD = _mm_add_epi32(ABCD, ABCD_SAVE);

  ABCD = _mm_shuffle_epi32(ABCD, 0x1B);
  _mm_storeu_si128(reinterpret_cast<__m128i*>(state), ABCD);
  state[4] = static_cast<uint32_t>(_mm_extract_epi32(E0, 3));
}
// Two-message interleaved SHA-NI compress: hides sha1rnds4 latency
// (~6 cycles) behind the second stream for ~1.7x throughput on
// single-block messages (the common case: shingle tokens are tiny).
// 14 of 16 xmm registers live; 4-way would spill.
__attribute__((target("sha,sse4.1,ssse3")))
inline void sha1_compress_ni_x2(uint32_t* sA, const uint8_t* bA, uint32_t* sB,
                                const uint8_t* bB) {
  const __m128i MASK =
      _mm_set_epi64x(0x0001020304050607LL, 0x08090a0b0c0d0e0fLL);

  __m128i ABCD_A = _mm_shuffle_epi32(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(sA)), 0x1B);
  __m128i ABCD_B = _mm_shuffle_epi32(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(sB)), 0x1B);
  __m128i E0_A = _mm_set_epi32(static_cast<int>(sA[4]), 0, 0, 0);
  __m128i E0_B = _mm_set_epi32(static_cast<int>(sB[4]), 0, 0, 0);
  const __m128i SAVE_A = ABCD_A, SAVE_B = ABCD_B;
  const __m128i ESAVE_A = E0_A, ESAVE_B = E0_B;

  __m128i M0_A = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bA + 0)), MASK);
  __m128i M0_B = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bB + 0)), MASK);
  __m128i M1_A = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bA + 16)), MASK);
  __m128i M1_B = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bB + 16)), MASK);
  __m128i M2_A = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bA + 32)), MASK);
  __m128i M2_B = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bB + 32)), MASK);
  __m128i M3_A = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bA + 48)), MASK);
  __m128i M3_B = _mm_shuffle_epi8(
      _mm_loadu_si128(reinterpret_cast<const __m128i*>(bB + 48)), MASK);
  __m128i E1_A, E1_B;

  // Rounds 0-3
  E0_A = _mm_add_epi32(E0_A, M0_A);
  E0_B = _mm_add_epi32(E0_B, M0_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 0);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 0);
  // Rounds 4-7
  E1_A = _mm_sha1nexte_epu32(E1_A, M1_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M1_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 0);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 0);
  M0_A = _mm_sha1msg1_epu32(M0_A, M1_A);
  M0_B = _mm_sha1msg1_epu32(M0_B, M1_B);
  // Rounds 8-11
  E0_A = _mm_sha1nexte_epu32(E0_A, M2_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M2_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 0);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 0);
  M1_A = _mm_sha1msg1_epu32(M1_A, M2_A);
  M1_B = _mm_sha1msg1_epu32(M1_B, M2_B);
  M0_A = _mm_xor_si128(M0_A, M2_A);
  M0_B = _mm_xor_si128(M0_B, M2_B);
  // Rounds 12-15
  E1_A = _mm_sha1nexte_epu32(E1_A, M3_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M3_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 0);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 0);
  M0_A = _mm_sha1msg2_epu32(M0_A, M3_A);
  M0_B = _mm_sha1msg2_epu32(M0_B, M3_B);
  M2_A = _mm_sha1msg1_epu32(M2_A, M3_A);
  M2_B = _mm_sha1msg1_epu32(M2_B, M3_B);
  M1_A = _mm_xor_si128(M1_A, M3_A);
  M1_B = _mm_xor_si128(M1_B, M3_B);
  // Rounds 16-19
  E0_A = _mm_sha1nexte_epu32(E0_A, M0_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M0_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 0);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 0);
  M1_A = _mm_sha1msg2_epu32(M1_A, M0_A);
  M1_B = _mm_sha1msg2_epu32(M1_B, M0_B);
  M3_A = _mm_sha1msg1_epu32(M3_A, M0_A);
  M3_B = _mm_sha1msg1_epu32(M3_B, M0_B);
  M2_A = _mm_xor_si128(M2_A, M0_A);
  M2_B = _mm_xor_si128(M2_B, M0_B);
  // Rounds 20-23
  E1_A = _mm_sha1nexte_epu32(E1_A, M1_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M1_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 1);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 1);
  M2_A = _mm_sha1msg2_epu32(M2_A, M1_A);
  M2_B = _mm_sha1msg2_epu32(M2_B, M1_B);
  M0_A = _mm_sha1msg1_epu32(M0_A, M1_A);
  M0_B = _mm_sha1msg1_epu32(M0_B, M1_B);
  M3_A = _mm_xor_si128(M3_A, M1_A);
  M3_B = _mm_xor_si128(M3_B, M1_B);
  // Rounds 24-27
  E0_A = _mm_sha1nexte_epu32(E0_A, M2_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M2_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 1);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 1);
  M3_A = _mm_sha1msg2_epu32(M3_A, M2_A);
  M3_B = _mm_sha1msg2_epu32(M3_B, M2_B);
  M1_A = _mm_sha1msg1_epu32(M1_A, M2_A);
  M1_B = _mm_sha1msg1_epu32(M1_B, M2_B);
  M0_A = _mm_xor_si128(M0_A, M2_A);
  M0_B = _mm_xor_si128(M0_B, M2_B);
  // Rounds 28-31
  E1_A = _mm_sha1nexte_epu32(E1_A, M3_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M3_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 1);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 1);
  M0_A = _mm_sha1msg2_epu32(M0_A, M3_A);
  M0_B = _mm_sha1msg2_epu32(M0_B, M3_B);
  M2_A = _mm_sha1msg1_epu32(M2_A, M3_A);
  M2_B = _mm_sha1msg1_epu32(M2_B, M3_B);
  M1_A = _mm_xor_si128(M1_A, M3_A);
  M1_B = _mm_xor_si128(M1_B, M3_B);
  // Rounds 32-35
  E0_A = _mm_sha1nexte_epu32(E0_A, M0_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M0_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 1);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 1);
  M1_A = _mm_sha1msg2_epu32(M1_A, M0_A);
  M1_B = _mm_sha1msg2_epu32(M1_B, M0_B);
  M3_A = _mm_sha1msg1_epu32(M3_A, M0_A);
  M3_B = _mm_sha1msg1_epu32(M3_B, M0_B);
  M2_A = _mm_xor_si128(M2_A, M0_A);
  M2_B = _mm_xor_si128(M2_B, M0_B);
  // Rounds 36-39
  E1_A = _mm_sha1nexte_epu32(E1_A, M1_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M1_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 1);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 1);
  M2_A = _mm_sha1msg2_epu32(M2_A, M1_A);
  M2_B = _mm_sha1msg2_epu32(M2_B, M1_B);
  M0_A = _mm_sha1msg1_epu32(M0_A, M1_A);
  M0_B = _mm_sha1msg1_epu32(M0_B, M1_B);
  M3_A = _mm_xor_si128(M3_A, M1_A);
  M3_B = _mm_xor_si128(M3_B, M1_B);
  // Rounds 40-43
  E0_A = _mm_sha1nexte_epu32(E0_A, M2_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M2_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 2);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 2);
  M3_A = _mm_sha1msg2_epu32(M3_A, M2_A);
  M3_B = _mm_sha1msg2_epu32(M3_B, M2_B);
  M1_A = _mm_sha1msg1_epu32(M1_A, M2_A);
  M1_B = _mm_sha1msg1_epu32(M1_B, M2_B);
  M0_A = _mm_xor_si128(M0_A, M2_A);
  M0_B = _mm_xor_si128(M0_B, M2_B);
  // Rounds 44-47
  E1_A = _mm_sha1nexte_epu32(E1_A, M3_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M3_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 2);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 2);
  M0_A = _mm_sha1msg2_epu32(M0_A, M3_A);
  M0_B = _mm_sha1msg2_epu32(M0_B, M3_B);
  M2_A = _mm_sha1msg1_epu32(M2_A, M3_A);
  M2_B = _mm_sha1msg1_epu32(M2_B, M3_B);
  M1_A = _mm_xor_si128(M1_A, M3_A);
  M1_B = _mm_xor_si128(M1_B, M3_B);
  // Rounds 48-51
  E0_A = _mm_sha1nexte_epu32(E0_A, M0_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M0_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 2);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 2);
  M1_A = _mm_sha1msg2_epu32(M1_A, M0_A);
  M1_B = _mm_sha1msg2_epu32(M1_B, M0_B);
  M3_A = _mm_sha1msg1_epu32(M3_A, M0_A);
  M3_B = _mm_sha1msg1_epu32(M3_B, M0_B);
  M2_A = _mm_xor_si128(M2_A, M0_A);
  M2_B = _mm_xor_si128(M2_B, M0_B);
  // Rounds 52-55
  E1_A = _mm_sha1nexte_epu32(E1_A, M1_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M1_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 2);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 2);
  M2_A = _mm_sha1msg2_epu32(M2_A, M1_A);
  M2_B = _mm_sha1msg2_epu32(M2_B, M1_B);
  M0_A = _mm_sha1msg1_epu32(M0_A, M1_A);
  M0_B = _mm_sha1msg1_epu32(M0_B, M1_B);
  M3_A = _mm_xor_si128(M3_A, M1_A);
  M3_B = _mm_xor_si128(M3_B, M1_B);
  // Rounds 56-59
  E0_A = _mm_sha1nexte_epu32(E0_A, M2_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M2_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 2);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 2);
  M3_A = _mm_sha1msg2_epu32(M3_A, M2_A);
  M3_B = _mm_sha1msg2_epu32(M3_B, M2_B);
  M1_A = _mm_sha1msg1_epu32(M1_A, M2_A);
  M1_B = _mm_sha1msg1_epu32(M1_B, M2_B);
  M0_A = _mm_xor_si128(M0_A, M2_A);
  M0_B = _mm_xor_si128(M0_B, M2_B);
  // Rounds 60-63
  E1_A = _mm_sha1nexte_epu32(E1_A, M3_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M3_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 3);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 3);
  M0_A = _mm_sha1msg2_epu32(M0_A, M3_A);
  M0_B = _mm_sha1msg2_epu32(M0_B, M3_B);
  M2_A = _mm_sha1msg1_epu32(M2_A, M3_A);
  M2_B = _mm_sha1msg1_epu32(M2_B, M3_B);
  M1_A = _mm_xor_si128(M1_A, M3_A);
  M1_B = _mm_xor_si128(M1_B, M3_B);
  // Rounds 64-67
  E0_A = _mm_sha1nexte_epu32(E0_A, M0_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M0_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 3);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 3);
  M1_A = _mm_sha1msg2_epu32(M1_A, M0_A);
  M1_B = _mm_sha1msg2_epu32(M1_B, M0_B);
  M3_A = _mm_sha1msg1_epu32(M3_A, M0_A);
  M3_B = _mm_sha1msg1_epu32(M3_B, M0_B);
  M2_A = _mm_xor_si128(M2_A, M0_A);
  M2_B = _mm_xor_si128(M2_B, M0_B);
  // Rounds 68-71
  E1_A = _mm_sha1nexte_epu32(E1_A, M1_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M1_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 3);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 3);
  M2_A = _mm_sha1msg2_epu32(M2_A, M1_A);
  M2_B = _mm_sha1msg2_epu32(M2_B, M1_B);
  M3_A = _mm_xor_si128(M3_A, M1_A);
  M3_B = _mm_xor_si128(M3_B, M1_B);
  // Rounds 72-75
  E0_A = _mm_sha1nexte_epu32(E0_A, M2_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, M2_B);
  E1_A = ABCD_A;
  E1_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E0_A, 3);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E0_B, 3);
  M3_A = _mm_sha1msg2_epu32(M3_A, M2_A);
  M3_B = _mm_sha1msg2_epu32(M3_B, M2_B);
  // Rounds 76-79
  E1_A = _mm_sha1nexte_epu32(E1_A, M3_A);
  E1_B = _mm_sha1nexte_epu32(E1_B, M3_B);
  E0_A = ABCD_A;
  E0_B = ABCD_B;
  ABCD_A = _mm_sha1rnds4_epu32(ABCD_A, E1_A, 3);
  ABCD_B = _mm_sha1rnds4_epu32(ABCD_B, E1_B, 3);

  E0_A = _mm_sha1nexte_epu32(E0_A, ESAVE_A);
  E0_B = _mm_sha1nexte_epu32(E0_B, ESAVE_B);
  ABCD_A = _mm_add_epi32(ABCD_A, SAVE_A);
  ABCD_B = _mm_add_epi32(ABCD_B, SAVE_B);

  _mm_storeu_si128(reinterpret_cast<__m128i*>(sA),
                   _mm_shuffle_epi32(ABCD_A, 0x1B));
  _mm_storeu_si128(reinterpret_cast<__m128i*>(sB),
                   _mm_shuffle_epi32(ABCD_B, 0x1B));
  sA[4] = static_cast<uint32_t>(_mm_extract_epi32(E0_A, 3));
  sB[4] = static_cast<uint32_t>(_mm_extract_epi32(E0_B, 3));
}

// Single-block message pair (len <= 55 each): pad + compress + low-4-LE out.
__attribute__((target("sha,sse4.1,ssse3")))
inline void sha1_32_short_x2(const uint8_t* pA, uint32_t lenA,
                             const uint8_t* pB, uint32_t lenB, uint32_t* outA,
                             uint32_t* outB) {
  alignas(16) uint8_t blockA[64], blockB[64];
  std::memset(blockA, 0, 64);
  std::memset(blockB, 0, 64);
  std::memcpy(blockA, pA, lenA);
  std::memcpy(blockB, pB, lenB);
  blockA[lenA] = 0x80;
  blockB[lenB] = 0x80;
  const uint64_t bitsA = static_cast<uint64_t>(lenA) * 8;
  const uint64_t bitsB = static_cast<uint64_t>(lenB) * 8;
  for (int i = 0; i < 8; i++) {
    blockA[56 + i] = static_cast<uint8_t>(bitsA >> (8 * (7 - i)));
    blockB[56 + i] = static_cast<uint8_t>(bitsB >> (8 * (7 - i)));
  }
  uint32_t hA[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                    0xC3D2E1F0u};
  uint32_t hB[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                    0xC3D2E1F0u};
  sha1_compress_ni_x2(hA, blockA, hB, blockB);
  *outA = bswap32(hA[0]);
  *outB = bswap32(hB[0]);
}

// 64-bit-output twin of sha1_32_short_x2 (low 8 digest bytes LE — the
// reference's sha1_hash64): same paired SHA-NI compress, two state words
// read out instead of one.
__attribute__((target("sha,sse4.1,ssse3")))
inline void sha1_64_short_x2(const uint8_t* pA, uint32_t lenA,
                             const uint8_t* pB, uint32_t lenB, uint64_t* outA,
                             uint64_t* outB) {
  alignas(16) uint8_t blockA[64], blockB[64];
  std::memset(blockA, 0, 64);
  std::memset(blockB, 0, 64);
  std::memcpy(blockA, pA, lenA);
  std::memcpy(blockB, pB, lenB);
  blockA[lenA] = 0x80;
  blockB[lenB] = 0x80;
  const uint64_t bitsA = static_cast<uint64_t>(lenA) * 8;
  const uint64_t bitsB = static_cast<uint64_t>(lenB) * 8;
  for (int i = 0; i < 8; i++) {
    blockA[56 + i] = static_cast<uint8_t>(bitsA >> (8 * (7 - i)));
    blockB[56 + i] = static_cast<uint8_t>(bitsB >> (8 * (7 - i)));
  }
  uint32_t hA[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                    0xC3D2E1F0u};
  uint32_t hB[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                    0xC3D2E1F0u};
  sha1_compress_ni_x2(hA, blockA, hB, blockB);
  *outA = (static_cast<uint64_t>(bswap32(hA[1])) << 32) |
          static_cast<uint64_t>(bswap32(hA[0]));
  *outB = (static_cast<uint64_t>(bswap32(hB[1])) << 32) |
          static_cast<uint64_t>(bswap32(hB[0]));
}
#endif  // DSHASH_X86

inline bool sha_ni_available() {
#ifdef DSHASH_X86
  static const bool ok = __builtin_cpu_supports("sha") &&
                         __builtin_cpu_supports("sse4.1") &&
                         __builtin_cpu_supports("ssse3");
  return ok;
#else
  return false;
#endif
}

typedef void (*compress_fn)(uint32_t*, const uint8_t*);

inline compress_fn sha1_compress() {
#ifdef DSHASH_X86
  if (sha_ni_available())
    return reinterpret_cast<compress_fn>(&sha1_compress_ni);
#endif
  return reinterpret_cast<compress_fn>(&sha1_compress_scalar);
}

// Full SHA1 with padding; writes 5 state words (spec word order) to out.
// `compress` is resolved once by callers (avoids the cpuid branch per token).
inline void sha1(const uint8_t* data, size_t len, uint32_t out[5],
                 compress_fn compress) {
  uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                   0xC3D2E1F0u};
  const uint64_t total_bits = static_cast<uint64_t>(len) * 8;

  size_t pos = 0;
  while (len - pos >= 64) {
    compress(h, data + pos);
    pos += 64;
  }
  uint8_t block[64];
  const size_t tail = len - pos;
  std::memcpy(block, data + pos, tail);
  block[tail] = 0x80;
  if (tail < 56) {
    std::memset(block + tail + 1, 0, 55 - tail);
  } else {
    std::memset(block + tail + 1, 0, 63 - tail);
    compress(h, block);
    std::memset(block, 0, 56);
  }
  for (int i = 0; i < 8; i++)
    block[56 + i] = static_cast<uint8_t>(total_bits >> (8 * (7 - i)));
  compress(h, block);
  std::memcpy(out, h, sizeof(h));
}

// Low 4 digest bytes little-endian == bswap(h0); low 8 == bswap pair.
inline uint32_t sha1_32(const uint8_t* data, size_t len, compress_fn c) {
  uint32_t h[5];
  sha1(data, len, h, c);
  return bswap32(h[0]);
}

inline uint64_t sha1_64(const uint8_t* data, size_t len, compress_fn c) {
  uint32_t h[5];
  sha1(data, len, h, c);
  return (static_cast<uint64_t>(bswap32(h[1])) << 32) |
         static_cast<uint64_t>(bswap32(h[0]));
}

// ------------------------------------------------------------------ xxHash32

inline uint32_t xxh32(const uint8_t* p, size_t len, uint32_t seed) {
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

// ------------------------------------------------------------------ xxHash64

inline uint64_t rotl64(uint64_t x, int c) { return (x << c) | (x >> (64 - c)); }

inline uint64_t xxh64(const uint8_t* p, size_t len, uint64_t seed) {
  const uint64_t P1 = 11400714785074694791ULL, P2 = 14029467366897019727ULL,
                 P3 = 1609587929392839161ULL, P4 = 9650029242287828579ULL,
                 P5 = 2870177450012600261ULL;
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    const uint8_t* limit = end - 32;
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    do {
      uint64_t x;
      std::memcpy(&x, p, 8); v1 = rotl64(v1 + x * P2, 31) * P1; p += 8;
      std::memcpy(&x, p, 8); v2 = rotl64(v2 + x * P2, 31) * P1; p += 8;
      std::memcpy(&x, p, 8); v3 = rotl64(v3 + x * P2, 31) * P1; p += 8;
      std::memcpy(&x, p, 8); v4 = rotl64(v4 + x * P2, 31) * P1; p += 8;
    } while (p <= limit);
    h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
    for (uint64_t v : {v1, v2, v3, v4}) {
      h ^= rotl64(v * P2, 31) * P1;
      h = h * P1 + P4;
    }
  } else {
    h = seed + P5;
  }
  h += static_cast<uint64_t>(len);
  while (p + 8 <= end) {
    uint64_t x;
    std::memcpy(&x, p, 8);
    h ^= rotl64(x * P2, 31) * P1;
    h = rotl64(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    uint32_t x;
    std::memcpy(&x, p, 4);
    h ^= static_cast<uint64_t>(x) * P1;
    h = rotl64(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl64(h, 11) * P1;
    p++;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// ------------------------------------------------- token memoization cache

// Direct-mapped content-addressed cache: Zipfian token streams re-hash the
// same byte strings constantly; memoizing sha1-low-32 by xxh64(content)
// makes repeats ~free while producing identical outputs. A hit requires
// BOTH the full 64-bit content hash AND the token length to match —
// an adversary (or astronomical luck) must find a same-length 64-bit
// xxh64 collision to get a wrong value, vs hash-only matching where any
// 64-bit collision silently voids the sha1-identical guarantee.
struct TokenCache {
  // 2-way set-associative (direct-mapped thrashes on vocab-sized key sets:
  // pairwise slot conflicts evict each other forever); 2^17 sets x 2 ways
  // = 3 MB, L2/L3 resident.
  static constexpr size_t kBits = 17;
  static constexpr size_t kSets = 1ULL << kBits;
  struct Set {  // both ways of a set inside one 32-byte span (one line)
    uint64_t k0, k1;
    uint32_t v0, v1;
    uint32_t len0, len1;
  };
  std::vector<Set> sets;
  TokenCache() : sets(kSets, Set{0, 0, 0, 0, 0, 0}) {}

  static uint64_t content_key(const uint8_t* p, size_t len) {
    uint64_t k = xxh64(p, len, 0x5bd1e995ULL);
    return k ? k : 1;  // 0 marks empty slots
  }

  inline bool lookup(uint64_t k, uint32_t len, uint32_t* out) const {
    const Set& s = sets[static_cast<size_t>(k) & (kSets - 1)];
    if (s.k0 == k && s.len0 == len) {
      *out = s.v0;
      return true;
    }
    if (s.k1 == k && s.len1 == len) {
      *out = s.v1;
      return true;
    }
    return false;
  }

  inline void insert(uint64_t k, uint32_t len, uint32_t v) {
    Set& s = sets[static_cast<size_t>(k) & (kSets - 1)];
    // insert into way 0, demote previous occupant to way 1 (LRU-of-2)
    s.k1 = s.k0;
    s.v1 = s.v0;
    s.len1 = s.len0;
    s.k0 = k;
    s.v0 = v;
    s.len0 = len;
  }
};

// Pointer-identity memo layered above TokenCache: token streams that draw
// from a materialized vocabulary (vocab lists, id->bytes tables, cached
// shingles) repeat the same PyObject, so (pointer, len) alone identifies
// the content — skipping even the xxh64 content key. Pointers are only
// stable while the caller holds references (one hash_corpus call), so
// entries are tagged with a SESSION epoch: each call claims its own via
// begin_session() and passes it to every lookup/insert. Sessions must be
// compared against the caller's claimed epoch, not the cache's current
// counter — token collection can re-enter Python (lazy sequences,
// __buffer__ hooks) and yield the GIL, so a second call may start (and
// finish, freeing its tokens) while the first is mid-collection; with a
// single shared "current" epoch the first call would then match the
// second call's entries for reused heap addresses and silently emit
// wrong hashes. Stale-session entries read as empty without any table
// zeroing. Content-fresh tokens (tokenizers that allocate new bytes each
// time) miss here and fall through to the content-addressed cache, which
// stays authoritative.
struct IdentCache {
  static constexpr size_t kBits = 16;
  static constexpr size_t kSlots = 1ULL << kBits;
  struct Entry {
    const void* ptr;
    uint32_t len;
    uint32_t val;
    uint64_t epoch;
  };
  std::vector<Entry> slots;
  uint64_t epoch = 0;
  IdentCache() : slots(kSlots, Entry{nullptr, 0, 0, 0}) {}

  // Claim a fresh session id (GIL-serialized).
  uint64_t begin_session() { return ++epoch; }

  static inline size_t slot_of(const void* p) {
    uintptr_t x = reinterpret_cast<uintptr_t>(p) >> 4;
    x *= 0x9e3779b97f4a7c15ULL;
    return static_cast<size_t>(x >> (64 - kBits));
  }

  inline bool lookup(const void* p, uint32_t len, uint32_t* out,
                     uint64_t session) const {
    const Entry& e = slots[slot_of(p)];
    if (e.epoch == session && e.ptr == p && e.len == len) {
      *out = e.val;
      return true;
    }
    return false;
  }

  inline void insert(const void* p, uint32_t len, uint32_t v,
                     uint64_t session) {
    slots[slot_of(p)] = Entry{p, len, v, session};
  }
};

// --------------------------------------------------------------- parallelism

template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads =
      std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n / 2048));
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

}  // namespace dshash
