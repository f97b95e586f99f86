// Native host pairing for BLS12-377 — the C++ runtime component backing
// SNARK verification (the host-side analog of the reference's Rust
// arkworks pairing; the compute-path on TPU never calls this).
//
// Implementation mirrors the (test-validated) Python host algebra in
// collaborative_zksnark_tpu/algebra/hostfield.py:
//   Fp:   6x64-bit Montgomery (CIOS with __uint128_t)
//   Fq2 = Fp[u]/(u^2+5), Fq6 = Fq2[v]/(v^3-u), Fq12 = Fq6[w]/(w^2-v)
//   ate pairing: Miller loop over BLS_X with the G2 point untwisted into
//   E(Fq12) ((x,y) -> (x w^2, y w^3)); final exponentiation =
//   (q^6-1)(q^2+1) easy part then square-and-multiply by (q^4-q^2+1)/r.
//
// API (extern "C"): field elements cross the boundary as 6x uint64_t
// little-endian STANDARD-form limbs.
//   cz_multi_pairing(n, g1s[12n], g1_inf[n], g2s[24n], g2_inf[n], out[72])
//   cz_version()

#include <cstdint>
#include <cstring>

#include "consts.h"

typedef uint64_t u64;
typedef __uint128_t u128;

// ---------------------------------------------------------------------- Fp

static inline Fp fp_zero() { Fp r; memset(r.v, 0, sizeof r.v); return r; }

static inline bool fp_is_zero(const Fp &a) {
  for (int i = 0; i < 6; i++) if (a.v[i]) return false;
  return true;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
  return memcmp(a.v, b.v, sizeof a.v) == 0;
}

static inline int fp_cmp(const Fp &a, const Fp &b) {
  for (int i = 5; i >= 0; i--) {
    if (a.v[i] < b.v[i]) return -1;
    if (a.v[i] > b.v[i]) return 1;
  }
  return 0;
}

static inline Fp fp_add_raw(const Fp &a, const Fp &b, u64 *carry_out) {
  Fp r; u128 c = 0;
  for (int i = 0; i < 6; i++) {
    c += (u128)a.v[i] + b.v[i];
    r.v[i] = (u64)c;
    c >>= 64;
  }
  if (carry_out) *carry_out = (u64)c;
  return r;
}

static inline Fp fp_sub_raw(const Fp &a, const Fp &b, u64 *borrow_out) {
  Fp r; __int128 c = 0;
  for (int i = 0; i < 6; i++) {
    c = (__int128)a.v[i] - b.v[i] + c;
    r.v[i] = (u64)c;
    c = (c < 0) ? -1 : 0;
  }
  if (borrow_out) *borrow_out = (u64)(-(int64_t)c);
  return r;
}

static inline Fp fp_add(const Fp &a, const Fp &b) {
  u64 carry;
  Fp r = fp_add_raw(a, b, &carry);
  if (carry || fp_cmp(r, Q_MOD) >= 0) r = fp_sub_raw(r, Q_MOD, nullptr);
  return r;
}

static inline Fp fp_sub(const Fp &a, const Fp &b) {
  u64 borrow;
  Fp r = fp_sub_raw(a, b, &borrow);
  if (borrow) r = fp_add_raw(r, Q_MOD, nullptr);
  return r;
}

static inline Fp fp_neg(const Fp &a) {
  if (fp_is_zero(a)) return a;
  return fp_sub_raw(Q_MOD, a, nullptr);
}

// CIOS Montgomery multiplication
static Fp fp_mul(const Fp &a, const Fp &b) {
  u64 t[8];
  memset(t, 0, sizeof t);
  for (int i = 0; i < 6; i++) {
    u128 c = 0;
    for (int j = 0; j < 6; j++) {
      c = (u128)a.v[j] * b.v[i] + t[j] + (u64)c;
      t[j] = (u64)c;
      c >>= 64;
    }
    u128 s = (u128)t[6] + (u64)c;
    t[6] = (u64)s;
    t[7] = (u64)(s >> 64);
    u64 m = t[0] * Q_INV;
    c = (u128)m * Q_MOD.v[0] + t[0];
    c >>= 64;
    for (int j = 1; j < 6; j++) {
      c = (u128)m * Q_MOD.v[j] + t[j] + (u64)c;
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    s = (u128)t[6] + (u64)c;
    t[5] = (u64)s;
    t[6] = t[7] + (u64)(s >> 64);
  }
  Fp r;
  memcpy(r.v, t, sizeof r.v);
  if (t[6] || fp_cmp(r, Q_MOD) >= 0) r = fp_sub_raw(r, Q_MOD, nullptr);
  return r;
}

static inline Fp fp_sqr(const Fp &a) { return fp_mul(a, a); }

static Fp fp_pow(const Fp &a, const u64 *e, int words) {
  Fp r = ONE_M, base = a;
  for (int w = 0; w < words; w++)
    for (int b = 0; b < 64; b++) {
      if ((e[w] >> b) & 1) r = fp_mul(r, base);
      base = fp_sqr(base);
    }
  return r;
}

static inline Fp fp_inv(const Fp &a) { return fp_pow(a, Q_MINUS_2.v, 6); }
static inline Fp fp_to_mont(const Fp &a) { return fp_mul(a, R2); }
static inline Fp fp_from_mont(const Fp &a) {
  Fp one = fp_zero(); one.v[0] = 1;
  return fp_mul(a, one);
}

static inline Fp fp_mul_small(const Fp &a, int k) {
  Fp r = fp_zero();
  for (int i = 0; i < k; i++) r = fp_add(r, a);
  return r;
}

// ---------------------------------------------------------------------- Fq2

struct Fp2 { Fp a, b; };

static inline Fp2 fp2_zero() { return { fp_zero(), fp_zero() }; }
static inline Fp2 fp2_one() { return { ONE_M, fp_zero() }; }
static inline bool fp2_is_zero(const Fp2 &x) { return fp_is_zero(x.a) && fp_is_zero(x.b); }
static inline bool fp2_eq(const Fp2 &x, const Fp2 &y) { return fp_eq(x.a, y.a) && fp_eq(x.b, y.b); }
static inline Fp2 fp2_add(const Fp2 &x, const Fp2 &y) { return { fp_add(x.a, y.a), fp_add(x.b, y.b) }; }
static inline Fp2 fp2_sub(const Fp2 &x, const Fp2 &y) { return { fp_sub(x.a, y.a), fp_sub(x.b, y.b) }; }
static inline Fp2 fp2_neg(const Fp2 &x) { return { fp_neg(x.a), fp_neg(x.b) }; }
static inline Fp2 fp2_conj(const Fp2 &x) { return { x.a, fp_neg(x.b) }; }

static inline Fp2 fp2_mul(const Fp2 &x, const Fp2 &y) {
  Fp t0 = fp_mul(x.a, y.a);
  Fp t1 = fp_mul(x.b, y.b);
  Fp s = fp_mul(fp_add(x.a, x.b), fp_add(y.a, y.b));
  // NR = -5
  return { fp_sub(t0, fp_mul_small(t1, 5)), fp_sub(s, fp_add(t0, t1)) };
}

static inline Fp2 fp2_sqr(const Fp2 &x) { return fp2_mul(x, x); }

static inline Fp2 fp2_mul_by_u(const Fp2 &x) {
  // (a + b u) * u = -5 b + a u
  return { fp_neg(fp_mul_small(x.b, 5)), x.a };
}

static Fp2 fp2_inv(const Fp2 &x) {
  // 1/(a+bu) = (a - bu)/(a^2 + 5 b^2)
  Fp norm = fp_add(fp_sqr(x.a), fp_mul_small(fp_sqr(x.b), 5));
  Fp ninv = fp_inv(norm);
  return { fp_mul(x.a, ninv), fp_neg(fp_mul(x.b, ninv)) };
}

// ---------------------------------------------------------------------- Fq6

struct Fp6 { Fp2 c0, c1, c2; };

static inline Fp6 fp6_zero() { return { fp2_zero(), fp2_zero(), fp2_zero() }; }
static inline Fp6 fp6_one() { return { fp2_one(), fp2_zero(), fp2_zero() }; }
static inline Fp6 fp6_add(const Fp6 &x, const Fp6 &y) { return { fp2_add(x.c0, y.c0), fp2_add(x.c1, y.c1), fp2_add(x.c2, y.c2) }; }
static inline Fp6 fp6_sub(const Fp6 &x, const Fp6 &y) { return { fp2_sub(x.c0, y.c0), fp2_sub(x.c1, y.c1), fp2_sub(x.c2, y.c2) }; }
static inline Fp6 fp6_neg(const Fp6 &x) { return { fp2_neg(x.c0), fp2_neg(x.c1), fp2_neg(x.c2) }; }

static Fp6 fp6_mul(const Fp6 &x, const Fp6 &y) {
  Fp2 t0 = fp2_mul(x.c0, y.c0);
  Fp2 t1 = fp2_mul(x.c1, y.c1);
  Fp2 t2 = fp2_mul(x.c2, y.c2);
  Fp2 a = fp2_add(x.c1, x.c2), b = fp2_add(y.c1, y.c2);
  Fp2 c0 = fp2_add(t0, fp2_mul_by_u(fp2_sub(fp2_mul(a, b), fp2_add(t1, t2))));
  a = fp2_add(x.c0, x.c1); b = fp2_add(y.c0, y.c1);
  Fp2 c1 = fp2_add(fp2_sub(fp2_mul(a, b), fp2_add(t0, t1)), fp2_mul_by_u(t2));
  a = fp2_add(x.c0, x.c2); b = fp2_add(y.c0, y.c2);
  Fp2 c2 = fp2_add(fp2_sub(fp2_mul(a, b), fp2_add(t0, t2)), t1);
  return { c0, c1, c2 };
}

static inline Fp6 fp6_sqr(const Fp6 &x) { return fp6_mul(x, x); }
static inline Fp6 fp6_mul_by_v(const Fp6 &x) {
  return { fp2_mul_by_u(x.c2), x.c0, x.c1 };
}

static Fp6 fp6_inv(const Fp6 &x) {
  Fp2 t0 = fp2_sub(fp2_sqr(x.c0), fp2_mul_by_u(fp2_mul(x.c1, x.c2)));
  Fp2 t1 = fp2_sub(fp2_mul_by_u(fp2_sqr(x.c2)), fp2_mul(x.c0, x.c1));
  Fp2 t2 = fp2_sub(fp2_sqr(x.c1), fp2_mul(x.c0, x.c2));
  Fp2 norm = fp2_add(fp2_mul(x.c0, t0),
                     fp2_mul_by_u(fp2_add(fp2_mul(x.c2, t1), fp2_mul(x.c1, t2))));
  Fp2 ninv = fp2_inv(norm);
  return { fp2_mul(t0, ninv), fp2_mul(t1, ninv), fp2_mul(t2, ninv) };
}

// --------------------------------------------------------------------- Fq12

struct Fp12 { Fp6 c0, c1; };

static inline Fp12 fp12_one() { return { fp6_one(), fp6_zero() }; }
static inline Fp12 fp12_add(const Fp12 &x, const Fp12 &y) { return { fp6_add(x.c0, y.c0), fp6_add(x.c1, y.c1) }; }
static inline Fp12 fp12_sub(const Fp12 &x, const Fp12 &y) { return { fp6_sub(x.c0, y.c0), fp6_sub(x.c1, y.c1) }; }

static Fp12 fp12_mul(const Fp12 &x, const Fp12 &y) {
  Fp6 t0 = fp6_mul(x.c0, y.c0);
  Fp6 t1 = fp6_mul(x.c1, y.c1);
  Fp6 c0 = fp6_add(t0, fp6_mul_by_v(t1));
  Fp6 c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(x.c0, x.c1), fp6_add(y.c0, y.c1)), t0), t1);
  return { c0, c1 };
}

static inline Fp12 fp12_sqr(const Fp12 &x) { return fp12_mul(x, x); }
static inline Fp12 fp12_conj(const Fp12 &x) { return { x.c0, fp6_neg(x.c1) }; }

static Fp12 fp12_inv(const Fp12 &x) {
  Fp6 norm = fp6_sub(fp6_sqr(x.c0), fp6_mul_by_v(fp6_sqr(x.c1)));
  Fp6 ninv = fp6_inv(norm);
  return { fp6_mul(x.c0, ninv), fp6_neg(fp6_mul(x.c1, ninv)) };
}

static bool fp12_eq(const Fp12 &x, const Fp12 &y) {
  return fp2_eq(x.c0.c0, y.c0.c0) && fp2_eq(x.c0.c1, y.c0.c1) &&
         fp2_eq(x.c0.c2, y.c0.c2) && fp2_eq(x.c1.c0, y.c1.c0) &&
         fp2_eq(x.c1.c1, y.c1.c1) && fp2_eq(x.c1.c2, y.c1.c2);
}

// Frobenius x -> x^q: conjugate Fq2 coefficients and scale coefficient of
// v^j w^i by gamma[2j + i] (gamma = u^{(q-1)/6} powers; see hostfield.py).
static Fp12 fp12_frobenius(const Fp12 &x) {
  Fp2 gam[12];
  for (int i = 0; i < 12; i++)
    gam[i] = { fp_to_mont(FROB_GAMMA[i][0]), fp_to_mont(FROB_GAMMA[i][1]) };
  Fp12 r;
  r.c0.c0 = fp2_mul(fp2_conj(x.c0.c0), gam[0]);
  r.c0.c1 = fp2_mul(fp2_conj(x.c0.c1), gam[2]);
  r.c0.c2 = fp2_mul(fp2_conj(x.c0.c2), gam[4]);
  r.c1.c0 = fp2_mul(fp2_conj(x.c1.c0), gam[1]);
  r.c1.c1 = fp2_mul(fp2_conj(x.c1.c1), gam[3]);
  r.c1.c2 = fp2_mul(fp2_conj(x.c1.c2), gam[5]);
  return r;
}

// --------------------------------------------------------- E(Fq12) + Miller

struct Pt12 { Fp12 x, y; bool inf; };

static Pt12 pt_double(const Pt12 &p) {
  if (p.inf) return p;
  Fp12 three = fp12_add(fp12_add(fp12_one(), fp12_one()), fp12_one());
  Fp12 two = fp12_add(fp12_one(), fp12_one());
  Fp12 lam = fp12_mul(fp12_mul(three, fp12_sqr(p.x)),
                      fp12_inv(fp12_mul(two, p.y)));
  Fp12 x3 = fp12_sub(fp12_sub(fp12_sqr(lam), p.x), p.x);
  Fp12 y3 = fp12_sub(fp12_mul(lam, fp12_sub(p.x, x3)), p.y);
  return { x3, y3, false };
}

static Pt12 pt_add(const Pt12 &p, const Pt12 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  if (fp12_eq(p.x, q.x)) {
    if (fp12_eq(p.y, q.y)) return pt_double(p);
    return { fp12_one(), fp12_one(), true };
  }
  Fp12 lam = fp12_mul(fp12_sub(q.y, p.y), fp12_inv(fp12_sub(q.x, p.x)));
  Fp12 x3 = fp12_sub(fp12_sub(fp12_sqr(lam), p.x), q.x);
  Fp12 y3 = fp12_sub(fp12_mul(lam, fp12_sub(p.x, x3)), p.y);
  return { x3, y3, false };
}

// line through T and Q evaluated at P (all embedded in Fq12)
static Fp12 line_eval(const Pt12 &t, const Pt12 &q, const Fp12 &px, const Fp12 &py) {
  Fp12 num, den;
  if (fp12_eq(t.x, q.x) && fp12_eq(t.y, q.y)) {
    Fp12 three = fp12_add(fp12_add(fp12_one(), fp12_one()), fp12_one());
    Fp12 two = fp12_add(fp12_one(), fp12_one());
    num = fp12_mul(three, fp12_sqr(t.x));
    den = fp12_mul(two, t.y);
  } else if (fp12_eq(t.x, q.x)) {
    return fp12_sub(px, t.x);  // vertical
  } else {
    num = fp12_sub(q.y, t.y);
    den = fp12_sub(q.x, t.x);
  }
  Fp12 lam = fp12_mul(num, fp12_inv(den));
  return fp12_sub(fp12_sub(py, t.y), fp12_mul(lam, fp12_sub(px, t.x)));
}

// sparse embeddings: fq -> fq12, fq2*w^2, fq2*w^3
static Fp12 embed_fq(const Fp &a) {
  Fp12 r = { fp6_zero(), fp6_zero() };
  r.c0.c0 = { a, fp_zero() };
  return r;
}

static Fp12 embed_w2(const Fp2 &a) {
  // a * w^2 = a * v  (coefficient v^1 of c0)
  Fp12 r = { fp6_zero(), fp6_zero() };
  r.c0.c1 = a;
  return r;
}

static Fp12 embed_w3(const Fp2 &a) {
  // a * w^3 = a * v w (coefficient v^1 of c1)
  Fp12 r = { fp6_zero(), fp6_zero() };
  r.c1.c1 = a;
  return r;
}

static Fp12 miller_loop(const Fp &px, const Fp &py, const Fp2 &qx, const Fp2 &qy) {
  Fp12 ex = embed_fq(px), ey = embed_fq(py);
  Pt12 Qe = { embed_w2(qx), embed_w3(qy), false };
  Pt12 T = Qe;
  Fp12 f = fp12_one();
  int top = 63;
  while (top >= 0 && !((BLS_X >> top) & 1)) top--;
  for (int i = top - 1; i >= 0; i--) {
    f = fp12_mul(fp12_sqr(f), line_eval(T, T, ex, ey));
    T = pt_double(T);
    if ((BLS_X >> i) & 1) {
      f = fp12_mul(f, line_eval(T, Qe, ex, ey));
      T = pt_add(T, Qe);
    }
  }
  return f;
}

static Fp12 final_exponentiation(Fp12 f) {
  // easy: f^(q^6-1) then f^(q^2+1)
  f = fp12_mul(fp12_conj(f), fp12_inv(f));
  f = fp12_mul(fp12_frobenius(fp12_frobenius(f)), f);
  // hard: square-and-multiply by (q^4 - q^2 + 1)/r
  Fp12 r = fp12_one(), base = f;
  for (int w = 0; w < HARD_EXP_WORDS; w++)
    for (int b = 0; b < 64; b++) {
      if ((HARD_EXP[w] >> b) & 1) r = fp12_mul(r, base);
      base = fp12_sqr(base);
    }
  return r;
}

// ------------------------------------------------------------------ C API

extern "C" {

int cz_version() { return 1; }

// g1s: n * 12 u64 (x[6], y[6]) standard form; g2s: n * 24 u64
// (x.c0, x.c1, y.c0, y.c1); inf flags per point; out: 72 u64 fq12 std form
// (c0.c0.a, c0.c0.b, c0.c1.a, ..., c1.c2.b).
void cz_multi_pairing(uint64_t n, const u64 *g1s, const uint8_t *g1_inf,
                      const u64 *g2s, const uint8_t *g2_inf, u64 *out) {
  Fp12 acc = fp12_one();
  for (uint64_t i = 0; i < n; i++) {
    if (g1_inf[i] || g2_inf[i]) continue;
    Fp px, py;
    memcpy(px.v, g1s + 12 * i, 48);
    memcpy(py.v, g1s + 12 * i + 6, 48);
    px = fp_to_mont(px);
    py = fp_to_mont(py);
    Fp2 qx, qy;
    memcpy(qx.a.v, g2s + 24 * i, 48);
    memcpy(qx.b.v, g2s + 24 * i + 6, 48);
    memcpy(qy.a.v, g2s + 24 * i + 12, 48);
    memcpy(qy.b.v, g2s + 24 * i + 18, 48);
    qx.a = fp_to_mont(qx.a); qx.b = fp_to_mont(qx.b);
    qy.a = fp_to_mont(qy.a); qy.b = fp_to_mont(qy.b);
    acc = fp12_mul(acc, miller_loop(px, py, qx, qy));
  }
  Fp12 r = final_exponentiation(acc);
  const Fp2 *cs[6] = { &r.c0.c0, &r.c0.c1, &r.c0.c2, &r.c1.c0, &r.c1.c1, &r.c1.c2 };
  for (int i = 0; i < 6; i++) {
    Fp a = fp_from_mont(cs[i]->a), b = fp_from_mont(cs[i]->b);
    memcpy(out + 12 * i, a.v, 48);
    memcpy(out + 12 * i + 6, b.v, 48);
  }
}

}  // extern "C"
