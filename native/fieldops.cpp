// XLA:CPU FFI kernels for batched prime-field arithmetic (BLS12-377 Fr/Fq).
//
// The JAX limb formulation (algebra/field.py: base-2^16 digit vectors,
// Montgomery form, lazy [0, 2p) representatives) is designed for the TPU
// VPU/MXU; on the CPU backend XLA lowers the integer convolutions to scalar
// loops (~7 us per Montgomery mul).  These kernels are the CPU
// speed-of-light path (~40-80 ns per mul): 64-bit-word CIOS Montgomery
// multiplication, exactly the same integer results as the JAX path
//   mul: REDC(a*b) in [0, 2p)           (same representative: CIOS == REDC)
//   add: a+b - (2p if >= 2p)            in [0, 2p)
//   sub: a-b+2p - (2p if >= 2p)         in [0, 2p)
// so mixing the two paths is bit-transparent.
//
// Layout contract: arrays of L=16 (Fr) or L=24 (Fq) little-endian base-2^16
// digits each stored in a uint32; 4 digits pack into one 64-bit word
// (R = 2^256 for Fr, 2^384 for Fq — matching the FieldSpec Montgomery R).
//
// Reference analog: this plays the role the hand-written/asm field backends
// (ff-asm fork) play for the reference's CPU provers (SURVEY.md §2.2).

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

// ---------------------------------------------------------------------------
// Field constants
// ---------------------------------------------------------------------------

// BLS12-377 scalar field r (253 bits), 4 words LE.
static const u64 FR_P[4] = {0x0a11800000000001ull, 0x59aa76fed0000001ull,
                            0x60b44d1e5c37b001ull, 0x12ab655e9a2ca556ull};
// BLS12-377 base field q (377 bits), 6 words LE.
static const u64 FQ_P[6] = {0x8508c00000000001ull, 0x170b5d4430000000ull,
                            0x1ef3622fba094800ull, 0x1a22d9f300f5138full,
                            0xc63b05c06ca1493bull, 0x01ae3a4617c510eaull};

static u64 ninv64(const u64 p0) {
  // -p^{-1} mod 2^64 by Newton iteration.
  u64 inv = 1;
  for (int i = 0; i < 6; ++i) inv *= 2 - p0 * inv;
  return (u64)(0 - inv);
}

template <int W>
struct FieldC {
  u64 p[W];
  u64 twop[W + 1];
  u64 ninv;
};

template <int W>
static FieldC<W> make_field(const u64 *p) {
  FieldC<W> f;
  u64 carry = 0;
  for (int i = 0; i < W; ++i) {
    f.p[i] = p[i];
    u128 t = ((u128)p[i] << 1) | carry;
    f.twop[i] = (u64)t;
    carry = (u64)(t >> 64);
  }
  f.twop[W] = carry;  // 2p can need one extra bit (Fq: 378 bits < 6*64 ok)
  f.ninv = ninv64(p[0]);
  return f;
}

static const FieldC<4> FR_C = make_field<4>(FR_P);
static const FieldC<6> FQ_C = make_field<6>(FQ_P);

// ---------------------------------------------------------------------------
// Word-level kernels
// ---------------------------------------------------------------------------

template <int W>
static inline void unpack(const u32 *limbs, u64 *w) {
  for (int i = 0; i < W; ++i)
    w[i] = (u64)limbs[4 * i] | ((u64)limbs[4 * i + 1] << 16) |
           ((u64)limbs[4 * i + 2] << 32) | ((u64)limbs[4 * i + 3] << 48);
}

template <int W>
static inline void pack(const u64 *w, u32 *limbs) {
  for (int i = 0; i < W; ++i) {
    limbs[4 * i] = (u32)(w[i] & 0xffff);
    limbs[4 * i + 1] = (u32)((w[i] >> 16) & 0xffff);
    limbs[4 * i + 2] = (u32)((w[i] >> 32) & 0xffff);
    limbs[4 * i + 3] = (u32)((w[i] >> 48) & 0xffff);
  }
}

// CIOS Montgomery multiplication; inputs < 2p, output < 2p (p < R/4).
template <int W>
static inline void mont_mul(const FieldC<W> &f, const u64 *a, const u64 *b,
                            u64 *out) {
  u64 t[W + 2] = {0};
  for (int i = 0; i < W; ++i) {
    u128 carry = 0;
    for (int j = 0; j < W; ++j) {
      u128 cur = (u128)a[i] * b[j] + t[j] + (u64)carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[W] + (u64)carry;
    t[W] = (u64)cur;
    t[W + 1] += (u64)(cur >> 64);

    u64 m = t[0] * f.ninv;
    carry = ((u128)m * f.p[0] + t[0]) >> 64;
    for (int j = 1; j < W; ++j) {
      u128 cur2 = (u128)m * f.p[j] + t[j] + (u64)carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[W] + (u64)carry;
    t[W - 1] = (u64)cur3;
    t[W] = t[W + 1] + (u64)(cur3 >> 64);
    t[W + 1] = 0;
  }
  // final value < 2p < R  =>  fits in W words
  memcpy(out, t, W * 8);
}

// out = x - 2p if x >= 2p else x.  x has W+1 words (x < 4p), out W words.
template <int W>
static inline void reduce_2p(const FieldC<W> &f, const u64 *x, u64 *out) {
  u64 d[W + 1];
  u64 borrow = 0;
  for (int i = 0; i <= W; ++i) {
    u128 cur = (u128)x[i] - f.twop[i] - borrow;
    d[i] = (u64)cur;
    borrow = (u64)(-(int64_t)(cur >> 64)) & 1;
  }
  const u64 *src = borrow ? x : d;
  memcpy(out, src, W * 8);
}

template <int W>
static inline void mont_add(const FieldC<W> &f, const u64 *a, const u64 *b,
                            u64 *out) {
  u64 s[W + 1];
  u64 carry = 0;
  for (int i = 0; i < W; ++i) {
    u128 cur = (u128)a[i] + b[i] + carry;
    s[i] = (u64)cur;
    carry = (u64)(cur >> 64);
  }
  s[W] = carry;
  reduce_2p<W>(f, s, out);
}

template <int W>
static inline void mont_sub(const FieldC<W> &f, const u64 *a, const u64 *b,
                            u64 *out) {
  // a + 2p - b, in (0, 4p)
  u64 s[W + 1];
  u64 carry = 0;
  for (int i = 0; i < W; ++i) {
    u128 cur = (u128)a[i] + f.twop[i] + carry;
    s[i] = (u64)cur;
    carry = (u64)(cur >> 64);
  }
  s[W] = f.twop[W] + carry;
  u64 borrow = 0;
  for (int i = 0; i < W; ++i) {
    u128 cur = (u128)s[i] - b[i] - borrow;
    s[i] = (u64)cur;
    borrow = (u64)(-(int64_t)(cur >> 64)) & 1;
  }
  s[W] -= borrow;
  reduce_2p<W>(f, s, out);
}

// ---------------------------------------------------------------------------
// Batched drivers
// ---------------------------------------------------------------------------

enum OpKind { OP_MUL, OP_ADD, OP_SUB };

template <int W, OpKind K>
static void run_batch(const FieldC<W> &f, const u32 *a, const u32 *b, u32 *out,
                      int64_t n) {
#pragma omp parallel for schedule(static) if (n > 2048)
  for (int64_t i = 0; i < n; ++i) {
    u64 wa[W], wb[W], wo[W];
    unpack<W>(a + i * 4 * W, wa);
    unpack<W>(b + i * 4 * W, wb);
    if (K == OP_MUL)
      mont_mul<W>(f, wa, wb, wo);
    else if (K == OP_ADD)
      mont_add<W>(f, wa, wb, wo);
    else
      mont_sub<W>(f, wa, wb, wo);
    pack<W>(wo, out + i * 4 * W);
  }
}

template <int W, OpKind K>
static ffi::Error field_op(const FieldC<W> &f, ffi::Buffer<ffi::U32> a,
                           ffi::Buffer<ffi::U32> b,
                           ffi::ResultBuffer<ffi::U32> out) {
  const int L = 4 * W;
  int64_t total = (int64_t)a.element_count();
  if (total % L != 0 || (int64_t)b.element_count() != total ||
      (int64_t)out->element_count() != total)
    return ffi::Error::InvalidArgument("field_op: bad buffer sizes");
  run_batch<W, K>(f, a.typed_data(), b.typed_data(), out->typed_data(),
                  total / L);
  return ffi::Error::Success();
}

#define DEFINE_OP(NAME, W, FCONST, KIND)                                     \
  static ffi::Error NAME(ffi::Buffer<ffi::U32> a, ffi::Buffer<ffi::U32> b,   \
                         ffi::ResultBuffer<ffi::U32> out) {                  \
    return field_op<W, KIND>(FCONST, a, b, out);                             \
  }                                                                          \
  XLA_FFI_DEFINE_HANDLER_SYMBOL(k_##NAME, NAME,                              \
                                ffi::Ffi::Bind()                             \
                                    .Arg<ffi::Buffer<ffi::U32>>()            \
                                    .Arg<ffi::Buffer<ffi::U32>>()            \
                                    .Ret<ffi::Buffer<ffi::U32>>());

DEFINE_OP(cz_mul_fr, 4, FR_C, OP_MUL)
DEFINE_OP(cz_add_fr, 4, FR_C, OP_ADD)
DEFINE_OP(cz_sub_fr, 4, FR_C, OP_SUB)
DEFINE_OP(cz_mul_fq, 6, FQ_C, OP_MUL)
DEFINE_OP(cz_add_fq, 6, FQ_C, OP_ADD)
DEFINE_OP(cz_sub_fq, 6, FQ_C, OP_SUB)

// C-linkage accessors so Python can fetch the handler pointers via ctypes.
extern "C" {
#define EXPORT_PTR(NAME) \
  void *get_##NAME() { return (void *)k_##NAME; }
EXPORT_PTR(cz_mul_fr)
EXPORT_PTR(cz_add_fr)
EXPORT_PTR(cz_sub_fr)
EXPORT_PTR(cz_mul_fq)
EXPORT_PTR(cz_add_fq)
EXPORT_PTR(cz_sub_fq)
}
