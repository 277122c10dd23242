// Native (C++) hot loops for the proof factory and witness pipeline.
//
// The reference is an all-compiled Rust library; this fills the equivalent
// native-runtime slot for the TPU framework's host side: Goldilocks field
// arithmetic on __uint128_t, the Poseidon permutation, Merkle tree
// construction, NTT/coset-FFT, and proof-of-work grinding — the operations
// that dominate proof generation (the test-vector/benchmark factory) and
// batch witness preparation.  Exposed via a C ABI consumed with ctypes
// (refimpl/native_backend.py); differentially tested against the pure-int
// reference layer.
//
// Build: g++ -O3 -march=native -shared -fPIC goldilocks_native.cc -o libgoldilocks_native.so

#include <cstdint>
#include <cstring>
#include <vector>

#include "poseidon_constants.h"  // generated from the validated Python tables

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPSILON = 0xFFFFFFFFULL;  // 2^64 mod p

static inline u64 reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & EPSILON;
  u64 t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= EPSILON;  // cannot underflow twice
  u64 t1 = hi_lo * EPSILON;
  u64 res = t0 + t1;
  if (res < t0) res += EPSILON;  // wrapped
  if (res >= P) res -= P;
  return res;
}

static inline u64 gl_mul(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPSILON;
  if (s >= P) s -= P;
  return s;
}

static inline u64 gl_sub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPSILON;
  if (d >= P) d -= P;
  return d;
}

static inline u64 gl_pow(u64 a, u64 e) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = gl_mul(r, a);
    a = gl_mul(a, a);
    e >>= 1;
  }
  return r;
}

// ---------------------------------------------------------------------------
// Poseidon permutation (width 12, 8 full + 22 partial rounds, x^7 sbox)
// ---------------------------------------------------------------------------

static inline u64 sbox7(u64 x) {
  u64 x2 = gl_mul(x, x);
  u64 x4 = gl_mul(x2, x2);
  u64 x6 = gl_mul(x4, x2);
  return gl_mul(x6, x);
}

static inline void mds_layer(u64* s) {
  u64 out[12];
  for (int r = 0; r < 12; r++) {
    u128 acc = (u128)MDS_DIAG[r] * s[r];
    for (int i = 0; i < 12; i++) {
      acc += (u128)MDS_CIRC[i] * s[(i + r) % 12];
    }
    out[r] = reduce128(acc);
  }
  memcpy(s, out, sizeof(out));
}

extern "C" void gl_poseidon_permute(u64* s) {
  for (int rnd = 0; rnd < 30; rnd++) {
    const u64* rc = &ALL_ROUND_CONSTANTS[rnd * 12];
    for (int i = 0; i < 12; i++) s[i] = gl_add(s[i], rc[i]);
    if (rnd >= 4 && rnd < 26) {
      s[0] = sbox7(s[0]);
    } else {
      for (int i = 0; i < 12; i++) s[i] = sbox7(s[i]);
    }
    mds_layer(s);
  }
}

extern "C" void gl_poseidon_permute_batch(u64* states, size_t n) {
  for (size_t i = 0; i < n; i++) gl_poseidon_permute(states + 12 * i);
}

// hash_or_noop of fixed-width leaves -> 4-element digests
extern "C" void gl_hash_leaves(const u64* leaves, size_t n, size_t width,
                               u64* out) {
  for (size_t i = 0; i < n; i++) {
    const u64* leaf = leaves + i * width;
    u64* d = out + i * 4;
    if (width <= 4) {
      for (size_t k = 0; k < 4; k++) d[k] = k < width ? leaf[k] : 0;
    } else {
      u64 st[12] = {0};
      for (size_t off = 0; off < width; off += 8) {
        size_t c = width - off < 8 ? width - off : 8;
        memcpy(st, leaf + off, c * sizeof(u64));
        gl_poseidon_permute(st);
      }
      memcpy(d, st, 4 * sizeof(u64));
    }
  }
}

extern "C" void gl_two_to_one_batch(const u64* left, const u64* right,
                                    size_t n, u64* out) {
  for (size_t i = 0; i < n; i++) {
    u64 st[12] = {0};
    memcpy(st, left + 4 * i, 4 * sizeof(u64));
    memcpy(st + 4, right + 4 * i, 4 * sizeof(u64));
    gl_poseidon_permute(st);
    memcpy(out + 4 * i, st, 4 * sizeof(u64));
  }
}

// Full Merkle digest stack: writes hash level (n digests), then successive
// levels down to 2^cap_height digests, all concatenated into `out`
// (total 2n - 2^cap_height digests of 4 u64).
extern "C" void gl_merkle_levels(const u64* leaves, size_t n, size_t width,
                                 size_t cap_height, u64* out) {
  gl_hash_leaves(leaves, n, width, out);
  size_t cap = (size_t)1 << cap_height;
  u64* prev = out;
  size_t level_n = n;
  while (level_n > cap) {
    u64* cur = prev + 4 * level_n;
    for (size_t i = 0; i < level_n / 2; i++) {
      u64 st[12] = {0};
      memcpy(st, prev + 8 * i, 8 * sizeof(u64));
      gl_poseidon_permute(st);
      memcpy(cur + 4 * i, st, 4 * sizeof(u64));
    }
    prev = cur;
    level_n /= 2;
  }
}

// ---------------------------------------------------------------------------
// Proof-of-work grinding: find min w >= start with challenge < 2^(64-bits).
// state = sponge state after absorbing all full chunks; tail = pending
// partial chunk (tail_len < 8); candidate w goes to lane tail_len.
// ---------------------------------------------------------------------------

extern "C" u64 gl_pow_grind(const u64* state, const u64* tail, size_t tail_len,
                            u32 pow_bits, u64 start) {
  u64 threshold = pow_bits >= 64 ? 0 : (1ULL << (64 - pow_bits));
  for (u64 w = start;; w++) {
    u64 st[12];
    memcpy(st, state, sizeof(st));
    for (size_t i = 0; i < tail_len; i++) st[i] = tail[i];
    st[tail_len] = w;
    gl_poseidon_permute(st);
    if (st[7] < threshold) return w;
  }
}

// ---------------------------------------------------------------------------
// NTT (iterative radix-2, natural order in/out) + coset variants
// ---------------------------------------------------------------------------

static const u64 POWER_OF_TWO_GENERATOR = 0x185629DCDA58878CULL;
static const int TWO_ADICITY = 32;

static inline u64 root_of_unity(int n_log) {
  u64 g = POWER_OF_TWO_GENERATOR;
  for (int i = 0; i < TWO_ADICITY - n_log; i++) g = gl_mul(g, g);
  return g;
}

static void bit_reverse(u64* a, size_t n) {
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      u64 t = a[i];
      a[i] = a[j];
      a[j] = t;
    }
  }
}

// forward NTT: values[i] = poly(g^i); if inverse, the inverse transform.
extern "C" void gl_ntt(u64* a, size_t n, int inverse) {
  int n_log = 0;
  while (((size_t)1 << n_log) < n) n_log++;
  bit_reverse(a, n);
  for (size_t len = 2; len <= n; len <<= 1) {
    int len_log = 0;
    while (((size_t)1 << len_log) < len) len_log++;
    u64 w_len = root_of_unity(len_log);
    if (inverse) w_len = gl_pow(w_len, P - 2);
    for (size_t i = 0; i < n; i += len) {
      u64 w = 1;
      for (size_t j = 0; j < len / 2; j++) {
        u64 u = a[i + j];
        u64 v = gl_mul(a[i + j + len / 2], w);
        a[i + j] = gl_add(u, v);
        a[i + j + len / 2] = gl_sub(u, v);
        w = gl_mul(w, w_len);
      }
    }
  }
  if (inverse) {
    u64 n_inv = gl_pow(n % P, P - 2);
    for (size_t i = 0; i < n; i++) a[i] = gl_mul(a[i], n_inv);
  }
}

// coset FFT: out[i] = poly(shift * g^i) (in-place over coefficients)
extern "C" void gl_coset_fft(u64* coeffs, size_t n, u64 shift) {
  u64 s = 1;
  for (size_t i = 0; i < n; i++) {
    coeffs[i] = gl_mul(coeffs[i], s);
    s = gl_mul(s, shift);
  }
  gl_ntt(coeffs, n, 0);
}

extern "C" void gl_coset_ifft(u64* values, size_t n, u64 shift) {
  gl_ntt(values, n, 1);
  u64 s_inv = gl_pow(shift, P - 2);
  u64 s = 1;
  for (size_t i = 0; i < n; i++) {
    values[i] = gl_mul(values[i], s);
    s = gl_mul(s, s_inv);
  }
}

// batched field ops for the witness pipeline
extern "C" void gl_mul_batch(const u64* a, const u64* b, size_t n, u64* out) {
  for (size_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

extern "C" void gl_batch_inverse(const u64* a, size_t n, u64* out) {
  // Montgomery trick
  std::vector<u64> prefix(n + 1);
  prefix[0] = 1;
  for (size_t i = 0; i < n; i++) prefix[i + 1] = gl_mul(prefix[i], a[i]);
  u64 inv = gl_pow(prefix[n], P - 2);
  for (size_t i = n; i-- > 0;) {
    out[i] = gl_mul(prefix[i], inv);
    inv = gl_mul(inv, a[i]);
  }
}
