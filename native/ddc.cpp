// Native host channelizer: fused convert -> mix -> decimating FIR.
//
// CPU-side counterpart of the device channelizers (ops/ddc.py): computes,
// per channel c and output t in [0, N/D):
//
//     y[c, t] = sum_j h_rev[j] * xm_c[t*D + j],      j in [0, L)
//     xm_c[k] = order(x_ext[k]) * exp(+i * psi_k),
//     psi_k   = (phase0_c + inc_c * (k - (L-1))) mod 2^32   [uint32 counts]
//     angle   = float32(counts) * (2*pi / 2^32)
//
// where x_ext = carried scaled tail (L-1 complex) ++ scaled chunk (N).
// This is EXACTLY the bandpass-taps formulation used on device
// (ops/ddc.py::bandpass_kernel + mix_and_advance): filtering with
// g = h * e^{-i*theta*l} and rotating the decimated output by e^{+i*phi_t}
// equals mixing first and filtering with the real taps — the identity is
// exact, so the paths agree to f32 rounding (measured -120 dB class,
// docs/probes/perf_probe_r3l.py), far inside the -60 dB golden contract.
//
// Layout/conventions (must match ops/ddc.py::ddc_apply_il):
//   * raw chunk: interleaved stream pairs as stored in the capture
//     (pcm_u8 / pcm_s16le / pcm_f32le), 2*N scalars;
//   * tail: 2*(L-1) floats, the SCALED raw interleaved stream tail of the
//     previous chunk (conv-path ``fir_tail`` layout, stream order);
//   * IQ order (reference input_formats.py semantics): re = pair[re_idx],
//     im = im_sign * pair[1 - re_idx];
//   * oscillator: uint32 fixed-point phase, f32 angle = counts * RAD,
//     positive rotation (ops/ddc.py::mix_and_advance convention);
//   * taps arrive REVERSED (h_rev[j] = h[L-1-j]) so the kernel is a plain
//     correlation regardless of tap symmetry.
//
// Fast path (AVX-512): the oscillator is SEPARABLE over the polyphase
// index j = u*D + p:  e^{i psi(tD+j)} = col[t+u] * row[p]  with
// col[i] = e^{i angle(phase_ext0 + inc*D*i)} (the CHANNEL-rate oscillator
// — sin/cos per decimated sample, 1/D-th of the naive count) and
// row[p] = e^{i angle(inc*p)} (D values per chunk).  So:
//
//     zp[p][i] = xs[i*D + p] * col[i]            (phase-split mix)
//     s_p[t]   = sum_u h_rev[u*D + p] * zp[p][t+u]   (real-tap dots)
//     y[t]     = sum_p row[p] * s_p[t]           (combine)
//
// The FIR vectorizes across 16 OUTPUT lanes with unit-stride loads from
// the phase rows (the naive stride-D windows make every 64-byte load
// straddle cache lines), taps broadcast and amortized over 4 output
// blocks; outputs stay in lanes (no horizontal reductions).  The
// phase-split fill (s16, D >= 16) loads contiguous u32 rows of the raw
// stream and transposes 16x16 blocks in-register — gather-free, because
// this host class is gather-mitigated (XLA targets it with
// +prefer-no-gather); a 32-bit-gather fill remains for the in-chunk edge
// blocks and D < 16.  Measured on the 1-core AVX-512 host at the
// headline geometry (L=1601, D=26): ~3.4 ns/input-sample vs ~7 for the
// direct per-sample-oscillator version and ~10 for the XLA overlap-save
// FFT chain (docs/probes/perf_probe_r3l.py).
//
// Single-threaded by design: one pipeline run owns one core here; the
// hetero executor scales across workers by process, and XLA:CPU calls the
// FFI handler from its own executor thread.
//
// Built on demand by iq_to_audio_tpu/ops/native_ddc.py (g++ -O3
// -march=native -ffast-math; the only -ffast-math-sensitive loops are the
// elementwise angle/sincos fills, which need it for libmvec
// vectorization; the FIR reduction order is fixed by explicit
// intrinsics).  No pybind11 — plain C ABI.

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr double kTwoPi = 6.283185307179586476925286766559;
constexpr float kRadPerCount = (float)(kTwoPi / 4294967296.0);

constexpr int64_t kTileOutputs = 512;  // outputs per phase-split tile

// ---- scaled sample fetch (codec + stream position) -----------------------

template <typename Raw>
static inline float scale_sample(Raw v);

template <>
inline float scale_sample<uint8_t>(uint8_t v) {
  return ((float)v - 128.0f) * (1.0f / 128.0f);
}
template <>
inline float scale_sample<int16_t>(int16_t v) {
  return (float)v * (1.0f / 32768.0f);
}
template <>
inline float scale_sample<float>(float v) {
  return v;
}

// x_ext scalar fetch: position p in [0, 2*(L-1+N)) over tail ++ chunk.
template <typename Raw>
static inline float x_ext_at(const float* tail, const Raw* raw,
                             int64_t tail_len, int64_t p) {
  return p < tail_len ? tail[p] : scale_sample<Raw>(raw[p - tail_len]);
}

// ---- channel-rate oscillator fill -----------------------------------------
// col[i] = e^{+i * angle(counts0 + inc_d * i)}; plain loops so the
// compiler vectorizes the trig through libmvec (-ffast-math build).

static void fill_col(uint32_t counts0, uint32_t inc_d, int64_t count,
                     float* ang, float* colr, float* coli) {
  for (int64_t i = 0; i < count; ++i) {
    uint32_t c = counts0 + inc_d * (uint32_t)i;
    ang[i] = (float)c * kRadPerCount;
  }
  for (int64_t i = 0; i < count; ++i) colr[i] = cosf(ang[i]);
  for (int64_t i = 0; i < count; ++i) coli[i] = sinf(ang[i]);
}

#if defined(__AVX512F__)

// ---- phase-split fill ------------------------------------------------------
// zp rows (per phase p): zpr[p][ii], zpi[p][ii] = xs[(i0+ii)*D + p] *
// col[ii] (caller passes col pre-offset to i0).  Scalar reference (handles
// the tail boundary and all codecs); s16 gather version for the hot path.

template <typename Raw>
static void zp_fill_scalar(const float* tail, const Raw* raw,
                           int64_t tail_pairs, int64_t i0,
                           int64_t fill_count, int64_t D, int re_idx,
                           float im_sign, const float* colr,
                           const float* coli, float* zpr_row,
                           float* zpi_row, int64_t p) {
  const int64_t tail_len = 2 * tail_pairs;
  const int im_idx = 1 - re_idx;
  for (int64_t ii = 0; ii < fill_count; ++ii) {
    const int64_t k = (i0 + ii) * D + p;
    const float a = x_ext_at<Raw>(tail, raw, tail_len, 2 * k + re_idx);
    const float b =
        im_sign * x_ext_at<Raw>(tail, raw, tail_len, 2 * k + im_idx);
    const float cr = colr[ii], ci = coli[ii];
    zpr_row[ii] = a * cr - b * ci;
    zpi_row[ii] = a * ci + b * cr;
  }
}

// 16x16 epi32 in-register transpose (standard 4-stage unpack/shuffle
// network, 64 ops).  Used by the transpose fill below: on this host class
// XLA itself compiles with +prefer-no-gather — vpgatherdd is
// mitigation-slowed — so building the phase rows from contiguous row
// loads + transpose beats one-gather-per-16-samples (measured in
// docs/probes/perf_probe_r3l.py).
static inline void transpose16x16_epi32(__m512i r[16]) {
  __m512i t[16];
  for (int i = 0; i < 8; ++i) {
    t[2 * i] = _mm512_unpacklo_epi32(r[2 * i], r[2 * i + 1]);
    t[2 * i + 1] = _mm512_unpackhi_epi32(r[2 * i], r[2 * i + 1]);
  }
  for (int k = 0; k < 4; ++k) {
    r[4 * k + 0] = _mm512_unpacklo_epi64(t[4 * k + 0], t[4 * k + 2]);
    r[4 * k + 1] = _mm512_unpackhi_epi64(t[4 * k + 0], t[4 * k + 2]);
    r[4 * k + 2] = _mm512_unpacklo_epi64(t[4 * k + 1], t[4 * k + 3]);
    r[4 * k + 3] = _mm512_unpackhi_epi64(t[4 * k + 1], t[4 * k + 3]);
  }
  for (int i = 0; i < 4; ++i) {
    t[i] = _mm512_shuffle_i32x4(r[i], r[i + 4], 0x88);
    t[i + 4] = _mm512_shuffle_i32x4(r[i], r[i + 4], 0xdd);
    t[i + 8] = _mm512_shuffle_i32x4(r[i + 8], r[i + 12], 0x88);
    t[i + 12] = _mm512_shuffle_i32x4(r[i + 8], r[i + 12], 0xdd);
  }
  for (int i = 0; i < 4; ++i) {
    r[i] = _mm512_shuffle_i32x4(t[i], t[i + 8], 0x88);
    r[i + 4] = _mm512_shuffle_i32x4(t[i + 4], t[i + 12], 0x88);
    r[i + 8] = _mm512_shuffle_i32x4(t[i], t[i + 8], 0xdd);
    r[i + 12] = _mm512_shuffle_i32x4(t[i + 4], t[i + 12], 0xdd);
  }
}

// s16 transpose fill: ONE 16-output block (rows ii0..ii0+15) across ALL
// phase rows at once.  Element (ii, p) is the raw complex sample at
// q = (t0+ii)*D + p - (L-1); for 16 consecutive p those are contiguous
// u32s, so each loop loads 16 unit-stride rows and transposes them
// in-register — no gathers.  Caller guarantees every touched q (including
// the full-width loads of the final partial p-group) lies inside the raw
// chunk.  Convert/mix semantics identical to zp_fill_s16_gather.
static void zp_fill_s16_transpose(const int16_t* raw, int64_t q_base,
                                  int64_t D, int re_idx, float im_sign,
                                  const float* colr, const float* coli,
                                  float* zpr, float* zpi,
                                  int64_t row_stride, int64_t ii0) {
  const int* raw32 = (const int*)raw;
  const __m512 scale = _mm512_set1_ps(1.0f / 32768.0f);
  const __m512 sscale = _mm512_set1_ps(im_sign / 32768.0f);
  const __m512 cr = _mm512_loadu_ps(colr + ii0);
  const __m512 ci = _mm512_loadu_ps(coli + ii0);
  for (int64_t p0 = 0; p0 < D; p0 += 16) {
    __m512i v[16];
    for (int j = 0; j < 16; ++j)
      v[j] = _mm512_loadu_si512(
          (const void*)(raw32 + q_base + (int64_t)j * D + p0));
    transpose16x16_epi32(v);
    const int64_t pw = (D - p0 < 16) ? (D - p0) : 16;
    for (int64_t k = 0; k < pw; ++k) {
      const __m512i pairs = v[k];
      const __m512i lo =
          _mm512_srai_epi32(_mm512_slli_epi32(pairs, 16), 16);
      const __m512i hi = _mm512_srai_epi32(pairs, 16);
      __m512 first = _mm512_cvtepi32_ps(lo);
      __m512 second = _mm512_cvtepi32_ps(hi);
      if (re_idx == 1) {
        const __m512 t = first;
        first = second;
        second = t;
      }
      const __m512 a = _mm512_mul_ps(first, scale);
      const __m512 b = _mm512_mul_ps(second, sscale);
      _mm512_storeu_ps(zpr + (p0 + k) * row_stride + ii0,
                       _mm512_fmsub_ps(a, cr, _mm512_mul_ps(b, ci)));
      _mm512_storeu_ps(zpi + (p0 + k) * row_stride + ii0,
                       _mm512_fmadd_ps(a, ci, _mm512_mul_ps(b, cr)));
    }
  }
}

// s16 fast fill: one 32-bit gather per 16 complex samples per row.
// Requires every touched k to lie inside the raw chunk (no tail overlap):
// k_raw = (i0+ii)*D + p - (L-1) must be in [0, n).
static void zp_fill_s16_gather(const int16_t* raw, int64_t k_raw_base,
                               int64_t fill_count, int64_t D, int re_idx,
                               float im_sign, const float* colr,
                               const float* coli, float* zpr_row,
                               float* zpi_row) {
  const __m512i lane_step = _mm512_mullo_epi32(
      _mm512_set_epi32(15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0),
      _mm512_set1_epi32((int)D));
  const __m512 scale = _mm512_set1_ps(1.0f / 32768.0f);
  const __m512 sscale = _mm512_set1_ps(im_sign / 32768.0f);
  int64_t ii = 0;
  for (; ii + 16 <= fill_count; ii += 16) {
    const __m512i idx = _mm512_add_epi32(
        _mm512_set1_epi32((int)(k_raw_base + ii * D)), lane_step);
    // each complex sample is one 32-bit little-endian (first, second) pair
    const __m512i pairs =
        _mm512_i32gather_epi32(idx, (const int*)raw, 4);
    const __m512i lo =
        _mm512_srai_epi32(_mm512_slli_epi32(pairs, 16), 16);
    const __m512i hi = _mm512_srai_epi32(pairs, 16);
    __m512 first = _mm512_cvtepi32_ps(lo);
    __m512 second = _mm512_cvtepi32_ps(hi);
    if (re_idx == 1) {
      const __m512 t = first;
      first = second;
      second = t;
    }
    const __m512 a = _mm512_mul_ps(first, scale);
    const __m512 b = _mm512_mul_ps(second, sscale);
    const __m512 cr = _mm512_loadu_ps(colr + ii);
    const __m512 ci = _mm512_loadu_ps(coli + ii);
    _mm512_storeu_ps(zpr_row + ii,
                     _mm512_fmsub_ps(a, cr, _mm512_mul_ps(b, ci)));
    _mm512_storeu_ps(zpi_row + ii,
                     _mm512_fmadd_ps(a, ci, _mm512_mul_ps(b, cr)));
  }
  for (; ii < fill_count; ++ii) {
    const int64_t k_raw = k_raw_base + ii * D;
    float first = scale_sample<int16_t>(raw[2 * k_raw]);
    float second = scale_sample<int16_t>(raw[2 * k_raw + 1]);
    if (re_idx == 1) {
      const float t = first;
      first = second;
      second = t;
    }
    const float a = first, b = im_sign * second;
    const float cr = colr[ii], ci = coli[ii];
    zpr_row[ii] = a * cr - b * ci;
    zpi_row[ii] = a * ci + b * cr;
  }
}

// ---- FIR + combine over one tile -------------------------------------------
// Per 16-output block: s_p accumulates in lanes via unit-stride loads from
// the phase rows with the tap broadcast; row[p] folds s_p into y on the
// fly.  4 blocks share each tap broadcast.
//
// Window synthesis is HYBRID to balance the load and shuffle ports: a
// sliding-by-one unaligned load makes 15/16 of 64-byte loads straddle
// cache lines (2 load slots each on this core — measured 2.3x on the
// FIR), while building every window with valignd from aligned caches is
// shuffle-port-bound (1 shuffle/cycle vs 2 FMAs).  So per 16-tap group
// the 5 aligned cache vectors serve s=0 directly and the odd shifts via
// valignd (port 5), while even shifts use plain unaligned loads (ports
// 2/3) — both port groups run concurrently.

#define IQ2A_WIN(Ahi, Alo, S)                                          \
  _mm512_castsi512_ps(_mm512_alignr_epi32(                             \
      _mm512_castps_si512(Ahi), _mm512_castps_si512(Alo), (S)))

// One 16-tap hybrid group over ONE component's 4 output blocks.  Separate
// per-component passes keep live registers at ~11 (5 cache + 4 acc + 2
// temps): the fused-both-components version spilled heavily (measured 85
// zmm stack stores in the group body).
static inline void hyb_group(const float* zg, const float* hu, __m512& s0,
                             __m512& s1, __m512& s2, __m512& s3) {
  const __m512 a0 = _mm512_loadu_ps(zg);
  const __m512 a1 = _mm512_loadu_ps(zg + 16);
  const __m512 a2 = _mm512_loadu_ps(zg + 32);
  const __m512 a3 = _mm512_loadu_ps(zg + 48);
  const __m512 a4 = _mm512_loadu_ps(zg + 64);
  {
    const __m512 hv = _mm512_set1_ps(hu[0]);
    s0 = _mm512_fmadd_ps(hv, a0, s0);
    s1 = _mm512_fmadd_ps(hv, a1, s1);
    s2 = _mm512_fmadd_ps(hv, a2, s2);
    s3 = _mm512_fmadd_ps(hv, a3, s3);
  }
#define IQ2A_HYB_ODD(S)                                                \
  {                                                                    \
    const __m512 hv = _mm512_set1_ps(hu[S]);                           \
    s0 = _mm512_fmadd_ps(hv, IQ2A_WIN(a1, a0, S), s0);                 \
    s1 = _mm512_fmadd_ps(hv, IQ2A_WIN(a2, a1, S), s1);                 \
    s2 = _mm512_fmadd_ps(hv, IQ2A_WIN(a3, a2, S), s2);                 \
    s3 = _mm512_fmadd_ps(hv, IQ2A_WIN(a4, a3, S), s3);                 \
  }
#define IQ2A_HYB_EVEN(S)                                               \
  {                                                                    \
    const __m512 hv = _mm512_set1_ps(hu[S]);                           \
    s0 = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zg + (S)), s0);           \
    s1 = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zg + (S) + 16), s1);      \
    s2 = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zg + (S) + 32), s2);      \
    s3 = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zg + (S) + 48), s3);      \
  }
  IQ2A_HYB_ODD(1)
  IQ2A_HYB_EVEN(2)
  IQ2A_HYB_ODD(3)
  IQ2A_HYB_EVEN(4)
  IQ2A_HYB_ODD(5)
  IQ2A_HYB_EVEN(6)
  IQ2A_HYB_ODD(7)
  IQ2A_HYB_EVEN(8)
  IQ2A_HYB_ODD(9)
  IQ2A_HYB_EVEN(10)
  IQ2A_HYB_ODD(11)
  IQ2A_HYB_EVEN(12)
  IQ2A_HYB_ODD(13)
  IQ2A_HYB_EVEN(14)
  IQ2A_HYB_ODD(15)
#undef IQ2A_HYB_ODD
#undef IQ2A_HYB_EVEN
}

static void fir_combine_tile(const float* zpr, const float* zpi,
                             int64_t row_stride, const float* taps_p,
                             int64_t taps_stride, int64_t U, int64_t D,
                             const float* rowr, const float* rowi,
                             int64_t t_count, float* yr, float* yi) {
  int64_t t = 0;
  for (; t + 64 <= t_count; t += 64) {
    __m512 y0r = _mm512_setzero_ps(), y0i = _mm512_setzero_ps();
    __m512 y1r = _mm512_setzero_ps(), y1i = _mm512_setzero_ps();
    __m512 y2r = _mm512_setzero_ps(), y2i = _mm512_setzero_ps();
    __m512 y3r = _mm512_setzero_ps(), y3i = _mm512_setzero_ps();
    for (int64_t p = 0; p < D; ++p) {
      const float* zr = zpr + p * row_stride + t;
      const float* zi = zpi + p * row_stride + t;
      const float* hp = taps_p + p * taps_stride;
      __m512 s0r = _mm512_setzero_ps(), s0i = _mm512_setzero_ps();
      __m512 s1r = _mm512_setzero_ps(), s1i = _mm512_setzero_ps();
      __m512 s2r = _mm512_setzero_ps(), s2i = _mm512_setzero_ps();
      __m512 s3r = _mm512_setzero_ps(), s3i = _mm512_setzero_ps();
      // full zero-padded tap groups only: taps_p rows are zeroed to
      // taps_stride and the zp pad region is zeroed once per channel, so
      // the final partial group multiplies stale-free zeros instead of
      // running a split-load scalar tail.
      for (int64_t u = 0; u < U; u += 16) {
        hyb_group(zr + u, hp + u, s0r, s1r, s2r, s3r);
        hyb_group(zi + u, hp + u, s0i, s1i, s2i, s3i);
      }
      const __m512 rr = _mm512_set1_ps(rowr[p]);
      const __m512 ri = _mm512_set1_ps(rowi[p]);
      y0r = _mm512_fmadd_ps(rr, s0r, _mm512_fnmadd_ps(ri, s0i, y0r));
      y0i = _mm512_fmadd_ps(rr, s0i, _mm512_fmadd_ps(ri, s0r, y0i));
      y1r = _mm512_fmadd_ps(rr, s1r, _mm512_fnmadd_ps(ri, s1i, y1r));
      y1i = _mm512_fmadd_ps(rr, s1i, _mm512_fmadd_ps(ri, s1r, y1i));
      y2r = _mm512_fmadd_ps(rr, s2r, _mm512_fnmadd_ps(ri, s2i, y2r));
      y2i = _mm512_fmadd_ps(rr, s2i, _mm512_fmadd_ps(ri, s2r, y2i));
      y3r = _mm512_fmadd_ps(rr, s3r, _mm512_fnmadd_ps(ri, s3i, y3r));
      y3i = _mm512_fmadd_ps(rr, s3i, _mm512_fmadd_ps(ri, s3r, y3i));
    }
    _mm512_storeu_ps(yr + t, y0r);
    _mm512_storeu_ps(yi + t, y0i);
    _mm512_storeu_ps(yr + t + 16, y1r);
    _mm512_storeu_ps(yi + t + 16, y1i);
    _mm512_storeu_ps(yr + t + 32, y2r);
    _mm512_storeu_ps(yi + t + 32, y2i);
    _mm512_storeu_ps(yr + t + 48, y3r);
    _mm512_storeu_ps(yi + t + 48, y3i);
  }
  for (; t < t_count; t += 16) {
    const int64_t left = t_count - t;
    const __mmask16 m =
        left >= 16 ? (__mmask16)0xffff : (__mmask16)((1u << left) - 1u);
    __m512 yrv = _mm512_setzero_ps(), yiv = _mm512_setzero_ps();
    for (int64_t p = 0; p < D; ++p) {
      const float* zr = zpr + p * row_stride + t;
      const float* zi = zpi + p * row_stride + t;
      const float* hp = taps_p + p * taps_stride;
      __m512 sr = _mm512_setzero_ps(), si = _mm512_setzero_ps();
      for (int64_t u = 0; u < U; ++u) {
        const __m512 hv = _mm512_set1_ps(hp[u]);
        sr = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zr + u), sr);
        si = _mm512_fmadd_ps(hv, _mm512_loadu_ps(zi + u), si);
      }
      const __m512 rr = _mm512_set1_ps(rowr[p]);
      const __m512 ri = _mm512_set1_ps(rowi[p]);
      yrv = _mm512_fmadd_ps(rr, sr, _mm512_fnmadd_ps(ri, si, yrv));
      yiv = _mm512_fmadd_ps(rr, si, _mm512_fmadd_ps(ri, sr, yiv));
    }
    _mm512_mask_storeu_ps(yr + t, m, yrv);
    _mm512_mask_storeu_ps(yi + t, m, yiv);
  }
}

#endif  // __AVX512F__

// ---- portable fallback (any host): direct per-sample-oscillator FIR -------

template <typename Raw>
static void ddc_run_portable(const Raw* raw, int64_t n, const float* tail,
                             int64_t L, const float* h_rev,
                             const uint32_t* phase0, const uint32_t* incs,
                             int64_t C, int64_t D, int re_idx, float im_sign,
                             float* yr, float* yi, float* xm_scratch,
                             float* ang_scratch) {
  const int64_t m = n / D;
  const int64_t tile = 256;
  const int64_t tail_len = 2 * (L - 1);
  const int im_idx = 1 - re_idx;
  float* xmr = xm_scratch;
  float* xmi = xm_scratch + (tile - 1) * D + L;
  for (int64_t c = 0; c < C; ++c) {
    const uint32_t inc = incs[c];
    const uint32_t phase_ext0 = phase0[c] - inc * (uint32_t)(L - 1);
    float* yrc = yr + c * m;
    float* yic = yi + c * m;
    for (int64_t t0 = 0; t0 < m; t0 += tile) {
      const int64_t tc = (m - t0 < tile) ? (m - t0) : tile;
      const int64_t k0 = t0 * D;
      const int64_t w = (tc - 1) * D + L;
      const uint32_t base = phase_ext0 + inc * (uint32_t)(k0 & 0xffffffffu);
      for (int64_t k = 0; k < w; ++k)
        ang_scratch[k] = (float)(uint32_t)(base + inc * (uint32_t)k) *
                         kRadPerCount;
      for (int64_t k = 0; k < w; ++k) xmr[k] = cosf(ang_scratch[k]);
      for (int64_t k = 0; k < w; ++k) xmi[k] = sinf(ang_scratch[k]);
      for (int64_t k = 0; k < w; ++k) {
        const int64_t pidx = 2 * (k0 + k);
        const float a =
            x_ext_at<Raw>(tail, raw, tail_len, pidx + re_idx);
        const float b =
            im_sign * x_ext_at<Raw>(tail, raw, tail_len, pidx + im_idx);
        const float ck = xmr[k], sk = xmi[k];
        xmr[k] = a * ck - b * sk;
        xmi[k] = a * sk + b * ck;
      }
      for (int64_t t = 0; t < tc; ++t) {
        const float* r = xmr + t * D;
        const float* i = xmi + t * D;
        float ar = 0.0f, ai = 0.0f;
        for (int64_t j = 0; j < L; ++j) {
          ar += h_rev[j] * r[j];
          ai += h_rev[j] * i[j];
        }
        yrc[t0 + t] = ar;
        yic[t0 + t] = ai;
      }
    }
  }
}

#if defined(__AVX512F__)

// ---- AVX-512 driver --------------------------------------------------------

template <typename Raw>
static void ddc_run_avx512(const Raw* raw, int64_t n, const float* tail,
                           int64_t L, const float* h_rev,
                           const uint32_t* phase0, const uint32_t* incs,
                           int64_t C, int64_t D, int re_idx, float im_sign,
                           float* yr, float* yi, float* scratch) {
  const int64_t m = n / D;
  const int64_t U = (L + D - 1) / D;  // taps per phase (zero-padded)
  const int64_t row_fill = kTileOutputs + U - 1;  // zp entries per tile row
  // +16 pad: the FIR's cache/masked loads read whole vectors whose upper
  // lanes can land past the fill region (values never used / masked out)
  const int64_t row_stride = ((row_fill + 15) & ~int64_t(15)) + 16;
  const int64_t taps_stride = (U + 15) & ~int64_t(15);
  const int64_t col_count = (m + U + 15) & ~int64_t(15);

  // scratch layout (iq2a_ddc_scratch_floats): taps_p | rowr | rowi |
  // ang/colr/coli | zpr | zpi — base 64-byte-aligned and every section a
  // multiple of 16 floats, so the zp rows are cache-line-aligned (the
  // hybrid FIR's even-shift loads are then genuinely split-free)
  float* base = (float*)(((uintptr_t)scratch + 63) & ~(uintptr_t)63);
  const int64_t d_pad = (D + 15) & ~int64_t(15);
  float* taps_p = base;
  float* rowr = taps_p + D * taps_stride;
  float* rowi = rowr + d_pad;
  float* ang = rowi + d_pad;
  float* colr = ang + col_count;
  float* coli = colr + col_count;
  float* zpr = coli + col_count;
  float* zpi = zpr + D * row_stride;

  // phase-split taps (shared across channels)
  std::memset(taps_p, 0, sizeof(float) * D * taps_stride);
  for (int64_t j = 0; j < L; ++j) taps_p[(j % D) * taps_stride + j / D] =
      h_rev[j];

  // i-range whose window still touches the carried tail: k = i*D + p <
  // 2*(L-1) pairs... tail covers x_ext[0, L-1); i*D + D - 1 < L - 1 is
  // fully inside, boundary rows handled scalar up to i_gather_start.
  const int64_t i_tail_end = (L - 1 + D - 1) / D;  // first i fully in chunk

  for (int64_t c = 0; c < C; ++c) {
    const uint32_t inc = incs[c];
    const uint32_t phase_ext0 = phase0[c] - inc * (uint32_t)(L - 1);
    const uint32_t inc_d = inc * (uint32_t)D;
    fill_col(phase_ext0, inc_d, col_count, ang, colr, coli);
    for (int64_t p = 0; p < D; ++p) {
      const double a =
          (double)(uint32_t)(inc * (uint32_t)p) * (kTwoPi / 4294967296.0);
      rowr[p] = (float)cos(a);
      rowi[p] = (float)sin(a);
    }
    float* yrc = yr + c * m;
    float* yic = yi + c * m;
    // the FIR runs whole zero-padded tap groups, whose upper windows can
    // read past the fill region: those lanes must be 0.0 (a stale NaN
    // would poison 0*NaN), so the zp arenas start zeroed
    std::memset(zpr, 0, sizeof(float) * D * row_stride);
    std::memset(zpi, 0, sizeof(float) * D * row_stride);
    // transpose fill needs full-width loads even for the partial final
    // p-group, so its in-chunk bound uses that group's load start
    const int64_t p0_last = ((D - 1) / 16) * 16;
    for (int64_t t0 = 0; t0 < m; t0 += kTileOutputs) {
      const int64_t tc =
          (m - t0 < kTileOutputs) ? (m - t0) : kTileOutputs;
      const int64_t fill = tc + U - 1;
      // rows whose window still touches the carried tail: scalar seam
      const int64_t scalar_count =
          (t0 < i_tail_end)
              ? ((i_tail_end - t0 < fill) ? (i_tail_end - t0) : fill)
              : 0;
      // interior: gather-free transpose fill across ALL phases per
      // 16-row block (s16 only; needs >= 16 phase columns per row load)
      int64_t ii_tr = scalar_count;
      if (sizeof(Raw) == 2 && D >= 16) {
        while (ii_tr + 16 <= fill) {
          const int64_t max_q =
              (t0 + ii_tr + 15) * D + p0_last + 15 - (L - 1);
          if (max_q >= n) break;  // final blocks fall back per-phase
          zp_fill_s16_transpose((const int16_t*)raw,
                                (t0 + ii_tr) * D - (L - 1), D, re_idx,
                                im_sign, colr + t0, coli + t0, zpr, zpi,
                                row_stride, ii_tr);
          ii_tr += 16;
        }
      }
      for (int64_t p = 0; p < D; ++p) {
        float* zr = zpr + p * row_stride;
        float* zi = zpi + p * row_stride;
        if (scalar_count > 0) {
          // boundary rows: scalar fill across the tail/chunk seam
          zp_fill_scalar<Raw>(tail, raw, L - 1, t0, scalar_count, D,
                              re_idx, im_sign, colr + t0, coli + t0, zr,
                              zi, p);
        }
        const int64_t ii0 = ii_tr;
        if (ii0 < fill) {
          const int64_t k_raw_base = (t0 + ii0) * D + p - (L - 1);
          if (sizeof(Raw) == 2) {
            zp_fill_s16_gather((const int16_t*)raw, k_raw_base, fill - ii0,
                               D, re_idx, im_sign, colr + t0 + ii0,
                               coli + t0 + ii0, zr + ii0, zi + ii0);
          } else {
            zp_fill_scalar<Raw>(tail, raw, L - 1, t0 + ii0, fill - ii0, D,
                                re_idx, im_sign, colr + t0 + ii0,
                                coli + t0 + ii0, zr + ii0, zi + ii0, p);
          }
        }
      }
      fir_combine_tile(zpr, zpi, row_stride, taps_p, taps_stride, U, D,
                       rowr, rowi, tc, yrc + t0, yic + t0);
    }
  }
}

#endif  // __AVX512F__

}  // namespace

extern "C" {

// Whether the fast (phase-split AVX-512) path is compiled in.
int iq2a_ddc_fast_path(void) {
#if defined(__AVX512F__)
  return 1;
#else
  return 0;
#endif
}

// Scratch size in floats for (n, L, D) with the fixed tile size.
int64_t iq2a_ddc_scratch_floats(int64_t n, int64_t L, int64_t D) {
#if defined(__AVX512F__)
  const int64_t U = (L + D - 1) / D;
  const int64_t row_stride = ((kTileOutputs + U - 1 + 15) & ~int64_t(15)) + 16;
  const int64_t taps_stride = (U + 15) & ~int64_t(15);
  const int64_t col_count = (n / D + U + 15) & ~int64_t(15);
  const int64_t d_pad = (D + 15) & ~int64_t(15);
  // +16: 64-byte base alignment slack (the driver aligns the base up)
  return 16 + D * taps_stride + 2 * d_pad + 3 * col_count +
         2 * D * row_stride;
#else
  const int64_t tile = 256;
  return 3 * ((tile - 1) * D + L);
#endif
}

// codec: 0 = pcm_u8, 1 = pcm_s16le, 2 = pcm_f32le (io/native.py ids).
// raw: 2*n scalars; tail: 2*(L-1) floats; h_rev: L floats (reversed taps);
// phase0/incs: C uint32; yr/yi: C * (n/D) floats; scratch: see above.
int iq2a_ddc_run(const void* raw, int codec, int64_t n, const float* tail,
                 int64_t L, const float* h_rev, const uint32_t* phase0,
                 const uint32_t* incs, int64_t C, int64_t D, int re_idx,
                 float im_sign, float* yr, float* yi, float* scratch) {
  if (n <= 0 || L <= 0 || D <= 0 || C <= 0 || n % D != 0) return 1;
  if (re_idx != 0 && re_idx != 1) return 1;
#if defined(__AVX512F__)
#define IQ2A_DDC_DISPATCH(T)                                              \
  ddc_run_avx512<T>((const T*)raw, n, tail, L, h_rev, phase0, incs, C, D, \
                    re_idx, im_sign, yr, yi, scratch)
#else
  const int64_t tile = 256;
  float* ang = scratch + 2 * ((tile - 1) * D + L);
#define IQ2A_DDC_DISPATCH(T)                                               \
  ddc_run_portable<T>((const T*)raw, n, tail, L, h_rev, phase0, incs, C,   \
                      D, re_idx, im_sign, yr, yi, scratch, ang)
#endif
  switch (codec) {
    case 0:
      IQ2A_DDC_DISPATCH(uint8_t);
      return 0;
    case 1:
      IQ2A_DDC_DISPATCH(int16_t);
      return 0;
    case 2:
      IQ2A_DDC_DISPATCH(float);
      return 0;
    default:
      return 1;
  }
#undef IQ2A_DDC_DISPATCH
}

}  // extern "C"
