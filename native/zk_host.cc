// Host-side native support library (C++), the TPU framework's counterpart of
// the reference's host components: the CPU final reduction
// (`prize1a-msm-gpu/yrrid/yrrid-msm/HostReduce.cpp`, `HostCurve.cpp`), the
// host point preprocessing of the FPGA entry
// (`prize1b-msm-fpga/hardcaml/zprize/msm_pippenger/host/driver/driver.cpp`),
// and arkworks-compatible serialization (the L4 boundary format).
//
// Contents:
//   * 6x64-limb Montgomery field arithmetic (BLS12-377/381 base fields),
//     CIOS multiply with unsigned __int128 — the host never sees the TPU's
//     base-2^15 planes; it works in the standard packed-word form.
//   * Complete projective EC group law (same RCB a=0 formulas as the device
//     path, so host and device are formula-consistent).
//   * Batched helpers exposed with C linkage for ctypes: sequential point
//     generation (i*G), window-sum final reduction, scalar-mul oracle,
//     arkworks-style point (de)serialization.
//
// Build: g++ -O2 -shared -fPIC -o libzkhost.so zk_host.cc   (see native.py)

#include <cstdint>
#include <cstring>

namespace {

typedef unsigned __int128 u128;
typedef uint64_t u64;

constexpr int NL = 6;  // 6 x 64-bit limbs covers 377/381-bit fields

struct FieldCtx {
  u64 p[NL];     // modulus, little-endian limbs
  u64 rr[NL];    // R^2 mod p (R = 2^384)
  u64 n0inv;     // -p^{-1} mod 2^64
  u64 one[NL];   // R mod p (Montgomery one)
};

inline bool geq(const u64 a[NL], const u64 b[NL]) {
  for (int i = NL - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_nocarry(u64 out[NL], const u64 a[NL], const u64 b[NL]) {
  u128 borrow = 0;
  for (int i = 0; i < NL; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void add_mod(u64 out[NL], const u64 a[NL], const u64 b[NL],
                    const FieldCtx& f) {
  u128 carry = 0;
  u64 t[NL];
  for (int i = 0; i < NL; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(t, f.p)) {
    sub_nocarry(out, t, f.p);
  } else {
    std::memcpy(out, t, sizeof(t));
  }
}

inline void sub_mod(u64 out[NL], const u64 a[NL], const u64 b[NL],
                    const FieldCtx& f) {
  if (geq(a, b)) {
    sub_nocarry(out, a, b);
  } else {
    u64 t[NL];
    sub_nocarry(t, b, a);
    sub_nocarry(out, f.p, t);
  }
}

// CIOS Montgomery multiplication (the host analog of `mont_t.cuh`'s mul).
inline void mont_mul(u64 out[NL], const u64 a[NL], const u64 b[NL],
                     const FieldCtx& f) {
  u64 t[NL + 1] = {0};
  for (int i = 0; i < NL; ++i) {
    u128 carry = 0;
    for (int j = 0; j < NL; ++j) {
      u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 hi = (u128)t[NL] + carry;
    u64 m = t[0] * f.n0inv;
    carry = ((u128)t[0] + (u128)m * f.p[0]) >> 64;
    for (int j = 1; j < NL; ++j) {
      u128 s = (u128)t[j] + (u128)m * f.p[j] + carry;
      t[j - 1] = (u64)s;
      carry = s >> 64;
    }
    u128 top = hi + carry;
    t[NL - 1] = (u64)top;
    t[NL] = (u64)(top >> 64);
  }
  if (t[NL] || geq(t, f.p)) {
    sub_nocarry(out, t, f.p);
  } else {
    std::memcpy(out, t, NL * sizeof(u64));
  }
}

inline void mont_sqr(u64 out[NL], const u64 a[NL], const FieldCtx& f) {
  mont_mul(out, a, a, f);
}

inline bool is_zero(const u64 a[NL]) {
  for (int i = 0; i < NL; ++i)
    if (a[i]) return false;
  return true;
}

// Montgomery inverse by Fermat: a^(p-2).
inline void mont_inv(u64 out[NL], const u64 a[NL], const FieldCtx& f) {
  u64 e[NL];
  u64 two[NL] = {2, 0, 0, 0, 0, 0};
  sub_nocarry(e, f.p, two);  // p - 2
  u64 acc[NL];
  std::memcpy(acc, f.one, sizeof(acc));
  u64 base[NL];
  std::memcpy(base, a, sizeof(base));
  for (int i = 0; i < NL * 64; ++i) {
    if ((e[i / 64] >> (i % 64)) & 1) mont_mul(acc, acc, base, f);
    mont_sqr(base, base, f);
  }
  std::memcpy(out, acc, NL * sizeof(u64));
}

struct Point {  // homogeneous projective, Montgomery-form coordinates
  u64 x[NL], y[NL], z[NL];
};

struct CurveCtx {
  FieldCtx f;
  u64 b3[NL];  // 3*b in Montgomery form
};

inline void pt_identity(Point& r, const CurveCtx& c) {
  std::memset(&r, 0, sizeof(r));
  std::memcpy(r.y, c.f.one, sizeof(r.y));
}

// Complete projective addition, a=0 (Renes–Costello–Batina 2015/1060 §4):
// identical formula set to the device path (`zprize_tpu/curve/sw.py`).
inline void pt_add(Point& r, const Point& p, const Point& q,
                   const CurveCtx& c) {
  const FieldCtx& f = c.f;
  u64 t0[NL], t1[NL], t2[NL], mxy[NL], myz[NL], mxz[NL], u[NL], v[NL], w[NL],
      t3[NL], s[NL], s2[NL];
  mont_mul(t0, p.x, q.x, f);
  mont_mul(t1, p.y, q.y, f);
  mont_mul(t2, p.z, q.z, f);
  u64 a1[NL], a2[NL];
  add_mod(a1, p.x, p.y, f); add_mod(a2, q.x, q.y, f);
  mont_mul(mxy, a1, a2, f); add_mod(s, t0, t1, f); sub_mod(mxy, mxy, s, f);
  add_mod(a1, p.y, p.z, f); add_mod(a2, q.y, q.z, f);
  mont_mul(myz, a1, a2, f); add_mod(s, t1, t2, f); sub_mod(myz, myz, s, f);
  add_mod(a1, p.x, p.z, f); add_mod(a2, q.x, q.z, f);
  mont_mul(mxz, a1, a2, f); add_mod(s, t0, t2, f); sub_mod(mxz, mxz, s, f);
  u64 b3t2[NL];
  mont_mul(b3t2, c.b3, t2, f);
  sub_mod(u, t1, b3t2, f);
  add_mod(v, t1, b3t2, f);
  mont_mul(w, c.b3, mxz, f);
  add_mod(t3, t0, t0, f); add_mod(t3, t3, t0, f);  // 3*t0
  mont_mul(s, mxy, u, f); mont_mul(s2, myz, w, f); sub_mod(r.x, s, s2, f);
  mont_mul(s, v, u, f); mont_mul(s2, t3, w, f); add_mod(r.y, s, s2, f);
  mont_mul(s, myz, v, f); mont_mul(s2, mxy, t3, f); add_mod(r.z, s, s2, f);
}

// ---- curve parameter tables (standard public constants; revalidated by the
// python test-suite against first principles) --------------------------------

// BLS12-377 base field p, and BLS12-381 base field p, little-endian u64.
const u64 P377[NL] = {0x8508c00000000001ULL, 0x170b5d4430000000ULL,
                      0x1ef3622fba094800ULL, 0x1a22d9f300f5138fULL,
                      0xc63b05c06ca1493bULL, 0x01ae3a4617c510eaULL};
const u64 P381[NL] = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                      0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                      0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};

u64 mul_inv64(u64 a) {  // a^{-1} mod 2^64 (a odd), Newton iteration
  u64 x = a;
  for (int i = 0; i < 6; ++i) x *= 2 - a * x;
  return x;
}

void make_field(FieldCtx& f, const u64 p[NL]) {
  std::memcpy(f.p, p, sizeof(f.p));
  f.n0inv = (u64)(0 - mul_inv64(p[0]));
  // one = R mod p, rr = R^2 mod p via repeated doubling (R = 2^384)
  u64 acc[NL] = {1, 0, 0, 0, 0, 0};
  for (int i = 0; i < 384; ++i) add_mod(acc, acc, acc, f);
  std::memcpy(f.one, acc, sizeof(acc));
  for (int i = 0; i < 384; ++i) add_mod(acc, acc, acc, f);
  std::memcpy(f.rr, acc, sizeof(acc));
}

void make_curve(CurveCtx& c, int curve_id) {
  // curve_id: 0 = BLS12-377 (b=1), 1 = BLS12-381 (b=4)
  make_field(c.f, curve_id == 0 ? P377 : P381);
  u64 b3[NL] = {curve_id == 0 ? 3ULL : 12ULL, 0, 0, 0, 0, 0};
  // to Montgomery: b3 * R
  mont_mul(c.b3, b3, c.f.rr, c.f);
}

inline void to_mont(u64 out[NL], const u64 a[NL], const FieldCtx& f) {
  mont_mul(out, a, f.rr, f);
}

inline void from_mont(u64 out[NL], const u64 a[NL], const FieldCtx& f) {
  u64 one[NL] = {1, 0, 0, 0, 0, 0};
  mont_mul(out, a, one, f);
}

}  // namespace

extern "C" {

// Sequential point chain: out[i] = (start + i) * G for i in [0, n).
// The bench/test fixture generator (the role python's ec_ref plays, ~1000x
// faster).  Coordinates in/out are standard-form (non-Montgomery) u64 limbs,
// layout: n * (x[6], y[6]); infinity encoded as all-zero x and y.
void point_chain(int curve_id, const u64* gx, const u64* gy, u64 start_mul,
                 u64* out, u64 n) {
  CurveCtx c;
  make_curve(c, curve_id);
  Point g;
  to_mont(g.x, gx, c.f);
  to_mont(g.y, gy, c.f);
  std::memcpy(g.z, c.f.one, sizeof(g.z));
  Point acc;
  pt_identity(acc, c);
  for (u64 k = 0; k < start_mul; ++k) pt_add(acc, acc, g, c);
  Point* buf = new Point[n];
  for (u64 i = 0; i < n; ++i) {
    pt_add(acc, acc, g, c);
    buf[i] = acc;
  }
  // Montgomery-trick batch normalization: one inversion total.
  u64* prefix = new u64[n * NL];
  u64 run[NL];
  std::memcpy(run, c.f.one, sizeof(run));
  for (u64 i = 0; i < n; ++i) {
    std::memcpy(prefix + i * NL, run, NL * sizeof(u64));
    mont_mul(run, run, buf[i].z, c.f);  // run = z0..zi
  }
  u64 inv_all[NL];
  mont_inv(inv_all, run, c.f);
  for (long long i = (long long)n - 1; i >= 0; --i) {
    u64 zi[NL], xa[NL], ya[NL];
    mont_mul(zi, inv_all, prefix + i * NL, c.f);   // 1/z_i
    mont_mul(inv_all, inv_all, buf[i].z, c.f);     // strip z_i
    if (is_zero(buf[i].z)) {
      std::memset(out + i * 12, 0, 12 * sizeof(u64));
      continue;
    }
    mont_mul(xa, buf[i].x, zi, c.f);
    mont_mul(ya, buf[i].y, zi, c.f);
    from_mont(out + (u64)i * 12, xa, c.f);
    from_mont(out + (u64)i * 12 + 6, ya, c.f);
  }
  delete[] prefix;
  delete[] buf;
}

// Final window reduction on the host (the `HostReduce.cpp:31-60` role):
// given per-window projective sums (standard-form coords), compute
// sum_w 2^(c*w) W_w and return the affine result.
void host_combine_windows(int curve_id, const u64* windows_xyz, u64 n_win,
                          u64 window_bits, u64* out_affine) {
  CurveCtx c;
  make_curve(c, curve_id);
  Point acc;
  pt_identity(acc, c);
  for (long long w = (long long)n_win - 1; w >= 0; --w) {
    if (w != (long long)n_win - 1) {
      for (u64 b = 0; b < window_bits; ++b) pt_add(acc, acc, acc, c);
    }
    Point pw;
    const u64* src = windows_xyz + (u64)w * 18;
    to_mont(pw.x, src, c.f);
    to_mont(pw.y, src + 6, c.f);
    to_mont(pw.z, src + 12, c.f);
    pt_add(acc, acc, pw, c);
  }
  if (is_zero(acc.z)) {
    std::memset(out_affine, 0, 12 * sizeof(u64));
    return;
  }
  u64 zi[NL], xa[NL], ya[NL];
  mont_inv(zi, acc.z, c.f);
  mont_mul(xa, acc.x, zi, c.f);
  mont_mul(ya, acc.y, zi, c.f);
  from_mont(out_affine, xa, c.f);
  from_mont(out_affine + 6, ya, c.f);
}

// arkworks-style uncompressed affine serialization: x||y, little-endian
// bytes, flag bits in the MOST significant byte of y (bit 6: infinity) —
// cf. ark-serialize's SWFlags convention used at the reference's L4
// boundary (`yrrid/src/lib.rs` point buffers).
void serialize_points(int curve_id, const u64* points_xy, u64 n, u64 nbytes,
                      uint8_t* out) {
  (void)curve_id;
  for (u64 i = 0; i < n; ++i) {
    const u64* x = points_xy + i * 12;
    const u64* y = x + 6;
    uint8_t* rec = out + i * 2 * nbytes;
    std::memset(rec, 0, 2 * nbytes);
    std::memcpy(rec, x, nbytes < 48 ? nbytes : 48);
    std::memcpy(rec + nbytes, y, nbytes < 48 ? nbytes : 48);
    bool inf = true;
    for (int j = 0; j < 12; ++j)
      if (points_xy[i * 12 + j]) inf = false;
    if (inf) rec[2 * nbytes - 1] |= 0x40;
  }
}

void deserialize_points(int curve_id, const uint8_t* in, u64 n, u64 nbytes,
                        u64* points_xy, uint8_t* inf_flags) {
  (void)curve_id;
  for (u64 i = 0; i < n; ++i) {
    const uint8_t* rec = in + i * 2 * nbytes;
    u64* x = points_xy + i * 12;
    std::memset(x, 0, 12 * sizeof(u64));
    std::memcpy(x, rec, nbytes < 48 ? nbytes : 48);
    std::memcpy(x + 6, rec + nbytes, nbytes < 48 ? nbytes : 48);
    inf_flags[i] = (rec[2 * nbytes - 1] & 0x40) ? 1 : 0;
    if (inf_flags[i]) {
      // clear the flag byte from y
      ((uint8_t*)(x + 6))[nbytes - 1 < 48 ? nbytes - 1 : 47] &= 0x3f;
    }
  }
}

// Host G1 linear combination: out = sum_i k_i * P_i (affine in/out,
// standard form; all-zero (x, y) = identity).  Interleaved multi-
// exponentiation: one shared doubling chain (256 doublings total) plus
// one conditional add per set scalar bit — the verifier's RLC /
// batched-opening combine (`kzg.verify_many`, `ahp.batch_tuple`) calls
// this ONCE per batch instead of running n python double-and-add ladders
// (~0.3 s/proof of host EC work in the r5 verify profile).
void lincomb(int curve_id, const u64* pts_xy, const u64* ks4, u64 n,
             u64* out) {
  CurveCtx c;
  make_curve(c, curve_id);
  Point* pts = new Point[n];
  bool* live = new bool[n];
  for (u64 i = 0; i < n; ++i) {
    const u64* x = pts_xy + i * 12;
    live[i] = false;
    for (int j = 0; j < 12; ++j)
      if (x[j]) live[i] = true;
    if (!live[i]) continue;
    to_mont(pts[i].x, x, c.f);
    to_mont(pts[i].y, x + 6, c.f);
    std::memcpy(pts[i].z, c.f.one, sizeof(pts[i].z));
  }
  Point acc;
  pt_identity(acc, c);
  for (int bit = 255; bit >= 0; --bit) {
    pt_add(acc, acc, acc, c);
    for (u64 i = 0; i < n; ++i) {
      if (!live[i]) continue;
      if ((ks4[i * 4 + bit / 64] >> (bit % 64)) & 1)
        pt_add(acc, acc, pts[i], c);
    }
  }
  delete[] pts;
  delete[] live;
  if (is_zero(acc.z)) {
    std::memset(out, 0, 12 * sizeof(u64));
    return;
  }
  u64 zi[NL], xa[NL], ya[NL];
  mont_inv(zi, acc.z, c.f);
  mont_mul(xa, acc.x, zi, c.f);
  mont_mul(ya, acc.y, zi, c.f);
  from_mont(out, xa, c.f);
  from_mont(out + 6, ya, c.f);
}

// Scalar-mul oracle: out = k * P (affine in/out, standard form).
void scalar_mul(int curve_id, const u64* px, const u64* py, const u64* k4,
                u64* out) {
  CurveCtx c;
  make_curve(c, curve_id);
  Point p;
  to_mont(p.x, px, c.f);
  to_mont(p.y, py, c.f);
  std::memcpy(p.z, c.f.one, sizeof(p.z));
  Point acc;
  pt_identity(acc, c);
  for (int i = 255; i >= 0; --i) {
    pt_add(acc, acc, acc, c);
    if ((k4[i / 64] >> (i % 64)) & 1) pt_add(acc, acc, p, c);
  }
  if (is_zero(acc.z)) {
    std::memset(out, 0, 12 * sizeof(u64));
    return;
  }
  u64 zi[NL], xa[NL], ya[NL];
  mont_inv(zi, acc.z, c.f);
  mont_mul(xa, acc.x, zi, c.f);
  mont_mul(ya, acc.y, zi, c.f);
  from_mont(out, xa, c.f);
  from_mont(out + 6, ya, c.f);
}

}  // extern "C"
