// iqio — native host IO kernels for iq-to-audio-tpu.
//
// Fills the role ffmpeg/libsndfile play in the reference (sample-format
// conversion and de-interleaving at hundreds of MB/s, reference
// processing.py:268-279 and :527-539): tight loops that g++ auto-vectorizes,
// exposed through a tiny C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: make -C native   (or iq_to_audio_tpu.io.native builds on demand)

#include <cstdint>
#include <cstddef>
#include <cmath>

extern "C" {

// codec ids (keep in sync with io/native.py)
enum Codec : int32_t { CODEC_U8 = 0, CODEC_S16 = 1, CODEC_F32 = 2 };
// iq order ids
enum Order : int32_t { ORDER_IQ = 0, ORDER_QI = 1, ORDER_IQ_INV = 2, ORDER_QI_INV = 3 };

// Convert interleaved raw samples to split float32 I/Q.
// ffmpeg-compatible scaling: u8 -> (x-128)/128, s16 -> x/32768.
void iqio_convert_deinterleave(const void* src, int32_t codec, int32_t order,
                               int64_t frames, float* i_out, float* q_out) {
    const bool swap = (order == ORDER_QI || order == ORDER_QI_INV);
    const bool inv = (order == ORDER_IQ_INV || order == ORDER_QI_INV);
    float* a = swap ? q_out : i_out;  // first interleaved slot
    float* b = swap ? i_out : q_out;  // second interleaved slot
    if (codec == CODEC_U8) {
        const uint8_t* s = static_cast<const uint8_t*>(src);
        constexpr float k = 1.0f / 128.0f;
        for (int64_t n = 0; n < frames; ++n) {
            a[n] = (static_cast<float>(s[2 * n]) - 128.0f) * k;
            b[n] = (static_cast<float>(s[2 * n + 1]) - 128.0f) * k;
        }
    } else if (codec == CODEC_S16) {
        const int16_t* s = static_cast<const int16_t*>(src);
        constexpr float k = 1.0f / 32768.0f;
        for (int64_t n = 0; n < frames; ++n) {
            a[n] = static_cast<float>(s[2 * n]) * k;
            b[n] = static_cast<float>(s[2 * n + 1]) * k;
        }
    } else {
        const float* s = static_cast<const float*>(src);
        for (int64_t n = 0; n < frames; ++n) {
            a[n] = s[2 * n];
            b[n] = s[2 * n + 1];
        }
    }
    if (inv) {
        for (int64_t n = 0; n < frames; ++n) q_out[n] = -q_out[n];
    }
}

// Encode float32 mono audio to s16le with clipping (AudioWriter hot path,
// reference processing.py:449-452 clip to +-0.99 then ffmpeg s16 encode).
// Rounds half-to-even (nearbyintf under the default FE_TONEAREST mode) to
// match np.round / the device-side jnp.round encode exactly.
// Returns the peak |x| BEFORE clipping.
float iqio_encode_s16(const float* in, int64_t n, float clip, int16_t* out) {
    float peak = 0.0f;
    for (int64_t k = 0; k < n; ++k) {
        float v = in[k];
        float av = v < 0 ? -v : v;
        if (av > peak) peak = av;
        if (v > clip) v = clip;
        if (v < -clip) v = -clip;
        out[k] = static_cast<int16_t>(nearbyintf(v * 32767.0f));
    }
    return peak;
}

// Interleave split I/Q floats and encode to the requested raw codec
// (IQ slice writer pass-through hot path, reference processing.py:527-539).
// Semantics pinned to io/writer.py::_encode_iq_raw: s16 clips to
// [-1.0, 0.999969] then TRUNCATES toward zero (numpy astype), u8 clips to
// [-1, 1] then rounds (np.round, half-to-even) after the (x+1)*127.5 map.
void iqio_interleave_encode(const float* i_in, const float* q_in, int64_t frames,
                            int32_t codec, void* dst) {
    if (codec == CODEC_F32) {
        float* d = static_cast<float*>(dst);
        for (int64_t n = 0; n < frames; ++n) {
            d[2 * n] = i_in[n];
            d[2 * n + 1] = q_in[n];
        }
    } else if (codec == CODEC_S16) {
        int16_t* d = static_cast<int16_t*>(dst);
        for (int64_t n = 0; n < frames; ++n) {
            for (int c = 0; c < 2; ++c) {
                float v = c == 0 ? i_in[n] : q_in[n];
                if (v > 0.999969f) v = 0.999969f;
                if (v < -1.0f) v = -1.0f;
                d[2 * n + c] = static_cast<int16_t>(v * 32767.0f);
            }
        }
    } else {  // u8
        uint8_t* d = static_cast<uint8_t*>(dst);
        for (int64_t n = 0; n < frames; ++n) {
            for (int c = 0; c < 2; ++c) {
                float v = c == 0 ? i_in[n] : q_in[n];
                if (v > 1.0f) v = 1.0f;
                if (v < -1.0f) v = -1.0f;
                d[2 * n + c] = static_cast<uint8_t>(nearbyintf((v + 1.0f) * 127.5f));
            }
        }
    }
}

int32_t iqio_abi_version() { return 2; }

}  // extern "C"
