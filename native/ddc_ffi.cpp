// XLA FFI handler wrapping the native channelizer (native/ddc.cpp) as a
// CPU custom call, so the jitted chunk step (pipeline/step.py) can invoke
// it inline: convert + mix + decimating FIR leave XLA; the cheap epilogue
// (tail slice, phase advance, demod, resample, encode) stays in the
// compiled graph.
//
// Registered from Python (iq_to_audio_tpu/ops/native_ddc.py) via
// jax.ffi.register_ffi_target(jax.ffi.pycapsule(lib.iq2a_ddc_handler)).
// Buffers: raw (u8/s16/f32 interleaved, 2N scalars), tail (f32 2(L-1)),
// h_rev (f32 L, reversed taps), phase0 (u32 C), incs (u32 C) ->
// yr, yi (f32 (C, m)).  Attrs: codec, decim, re_idx (int64), im_sign
// (float).  Dims are derived from the buffers.
//
// The kernel is single-threaded and reads only its arguments; scratch is
// a thread-local arena (XLA:CPU may invoke handlers from several executor
// threads, each gets its own).

#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

extern "C" {
int64_t iq2a_ddc_scratch_floats(int64_t n, int64_t L, int64_t D);
int iq2a_ddc_run(const void* raw, int codec, int64_t n, const float* tail,
                 int64_t L, const float* h_rev, const uint32_t* phase0,
                 const uint32_t* incs, int64_t C, int64_t D, int re_idx,
                 float im_sign, float* yr, float* yi, float* scratch);
}

static ffi::Error Iq2aDdcImpl(
    ffi::AnyBuffer raw, ffi::Buffer<ffi::F32> tail,
    ffi::Buffer<ffi::F32> h_rev, ffi::Buffer<ffi::U32> phase0,
    ffi::Buffer<ffi::U32> incs, ffi::Result<ffi::Buffer<ffi::F32>> yr,
    ffi::Result<ffi::Buffer<ffi::F32>> yi, int64_t codec, int64_t decim,
    int64_t re_idx, float im_sign) {
  const int64_t n = (int64_t)raw.element_count() / 2;
  const int64_t L = (int64_t)h_rev.element_count();
  const int64_t C = (int64_t)incs.element_count();
  if ((int64_t)tail.element_count() != 2 * (L - 1))
    return ffi::Error::InvalidArgument("tail must hold 2*(L-1) floats");
  if ((int64_t)phase0.element_count() != C)
    return ffi::Error::InvalidArgument("phase0/incs length mismatch");
  if (decim <= 0 || n % decim != 0)
    return ffi::Error::InvalidArgument("chunk not decimation-aligned");
  const int64_t m = n / decim;
  if ((int64_t)yr->element_count() != C * m ||
      (int64_t)yi->element_count() != C * m)
    return ffi::Error::InvalidArgument("output must be (C, n/decim)");

  static thread_local std::vector<float> scratch;
  const size_t want = (size_t)iq2a_ddc_scratch_floats(n, L, decim);
  if (scratch.size() < want) scratch.resize(want);

  const int rc = iq2a_ddc_run(
      raw.untyped_data(), (int)codec, n, tail.typed_data(), L,
      h_rev.typed_data(), phase0.typed_data(), incs.typed_data(), C, decim,
      (int)re_idx, im_sign, yr->typed_data(), yi->typed_data(),
      scratch.data());
  if (rc != 0) return ffi::Error::InvalidArgument("iq2a_ddc_run failed");
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    iq2a_ddc_handler, Iq2aDdcImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::AnyBuffer>()          // raw
        .Arg<ffi::Buffer<ffi::F32>>()   // tail
        .Arg<ffi::Buffer<ffi::F32>>()   // h_rev
        .Arg<ffi::Buffer<ffi::U32>>()   // phase0
        .Arg<ffi::Buffer<ffi::U32>>()   // incs
        .Ret<ffi::Buffer<ffi::F32>>()   // yr
        .Ret<ffi::Buffer<ffi::F32>>()   // yi
        .Attr<int64_t>("codec")
        .Attr<int64_t>("decim")
        .Attr<int64_t>("re_idx")
        .Attr<float>("im_sign"));
