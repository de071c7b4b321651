// Native PCM codec hot paths (16/24-bit decode/encode).
//
// Host-side equivalent of the reference's c_lib AudioSamples codec work
// (SURVEY.md §2.2) for the conversions that dominate host time on large
// files. Exposed through a plain C ABI and loaded via ctypes
// (audio_fir_filter_tpu/native/pcm_codec.py); NumPy remains the fallback.
//
// Semantics must match codec.py exactly:
//   decode: x = pcm / 2^(bits-1)
//   encode: pcm = clip(rint(x * 2^(bits-1)), -2^(bits-1), 2^(bits-1)-1)
// rint uses the current rounding mode (round-half-even), matching np.rint.

#include <cmath>
#include <cstdint>

extern "C" {

void decode_pcm16(const uint8_t* in, int64_t n, int big_endian, float* out) {
    const float scale = 1.0f / 32768.0f;
    if (big_endian) {
        for (int64_t i = 0; i < n; ++i) {
            int16_t v = static_cast<int16_t>((in[2 * i] << 8) | in[2 * i + 1]);
            out[i] = static_cast<float>(v) * scale;
        }
    } else {
        for (int64_t i = 0; i < n; ++i) {
            int16_t v = static_cast<int16_t>(in[2 * i] | (in[2 * i + 1] << 8));
            out[i] = static_cast<float>(v) * scale;
        }
    }
}

void decode_pcm24(const uint8_t* in, int64_t n, int big_endian, float* out) {
    const float scale = 1.0f / 8388608.0f;
    if (big_endian) {
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = (in[3 * i] << 16) | (in[3 * i + 1] << 8) | in[3 * i + 2];
            v = (v ^ 0x800000) - 0x800000;  // sign-extend bit 23
            out[i] = static_cast<float>(v) * scale;
        }
    } else {
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = in[3 * i] | (in[3 * i + 1] << 8) | (in[3 * i + 2] << 16);
            v = (v ^ 0x800000) - 0x800000;
            out[i] = static_cast<float>(v) * scale;
        }
    }
}

static inline int32_t quantize(float x, double full, double lo, double hi) {
    double v = std::nearbyint(static_cast<double>(x) * full);
    if (v < lo) v = lo;
    if (v > hi) v = hi;
    return static_cast<int32_t>(v);
}

void encode_pcm16(const float* in, int64_t n, int big_endian, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = quantize(in[i], 32768.0, -32768.0, 32767.0);
        if (big_endian) {
            out[2 * i] = static_cast<uint8_t>((v >> 8) & 0xFF);
            out[2 * i + 1] = static_cast<uint8_t>(v & 0xFF);
        } else {
            out[2 * i] = static_cast<uint8_t>(v & 0xFF);
            out[2 * i + 1] = static_cast<uint8_t>((v >> 8) & 0xFF);
        }
    }
}

void encode_pcm24(const float* in, int64_t n, int big_endian, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = quantize(in[i], 8388608.0, -8388608.0, 8388607.0);
        if (big_endian) {
            out[3 * i] = static_cast<uint8_t>((v >> 16) & 0xFF);
            out[3 * i + 1] = static_cast<uint8_t>((v >> 8) & 0xFF);
            out[3 * i + 2] = static_cast<uint8_t>(v & 0xFF);
        } else {
            out[3 * i] = static_cast<uint8_t>(v & 0xFF);
            out[3 * i + 1] = static_cast<uint8_t>((v >> 8) & 0xFF);
            out[3 * i + 2] = static_cast<uint8_t>((v >> 16) & 0xFF);
        }
    }
}

// Peak scan (|max|) used by normalization on the host fallback path.
float peak_abs_f32(const float* in, int64_t n) {
    float m = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        float a = in[i] < 0 ? -in[i] : in[i];
        if (a > m) m = a;
    }
    return m;
}

}  // extern "C"
