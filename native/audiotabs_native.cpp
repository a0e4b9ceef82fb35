// audiotabs_native — host-side audio I/O and resampling hot paths.
//
// The native counterpart of the reference's ffmpeg/libsndfile dependencies
// (reference: backend/app/services/audio.py:7-26 shells out to ffmpeg and
// reads WAVs through libsndfile). This library provides:
//   * atn_read_wav  — RIFF/WAVE decode (PCM 8/16/24/32 + IEEE float 32/64)
//     straight into a float32 buffer with optional mono downmix;
//   * atn_resample  — windowed-sinc polyphase rational resampling;
//   * atn_peak_normalize — in-place peak normalization.
// Exposed through a plain C ABI consumed via ctypes (audiotabs_tpu/io/native.py).
//
// Build: cc -O3 -shared -fPIC -o libaudiotabs_native.so audiotabs_native.cpp
// (see native/build.sh; a Makefile-free single TU keeps the toolchain trivial.)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV read

// Parses the RIFF in `data`/`size`. On success fills *out (caller frees via
// atn_free), *n_samples (per channel), *channels, *sample_rate; mono=1
// downmixes by mean. Returns 0 on success, negative error code otherwise.
int atn_read_wav(const uint8_t* data, int64_t size, int mono, float** out,
                 int64_t* n_samples, int32_t* channels, int32_t* sample_rate) {
  if (size < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  uint16_t fmt_tag = 0, n_ch = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* body = nullptr;
  int64_t body_size = 0;
  const uint8_t* fmt_body = nullptr;
  uint32_t fmt_size = 0;

  while (pos + 8 <= size) {
    const uint8_t* cid = data + pos;
    uint32_t csize;
    memcpy(&csize, data + pos + 4, 4);
    const uint8_t* cbody = data + pos + 8;
    int64_t avail = size - (pos + 8);
    int64_t take = csize < (uint32_t)avail ? csize : avail;
    if (memcmp(cid, "fmt ", 4) == 0 && take >= 16) {
      fmt_body = cbody;
      fmt_size = (uint32_t)take;
      memcpy(&fmt_tag, cbody, 2);
      memcpy(&n_ch, cbody + 2, 2);
      memcpy(&rate, cbody + 4, 4);
      memcpy(&bits, cbody + 14, 2);
    } else if (memcmp(cid, "data", 4) == 0) {
      body = cbody;
      body_size = take;
    }
    pos += 8 + csize + (csize & 1);
    if (fmt_body && body) break;
  }
  if (!fmt_body || !body || n_ch == 0) return -2;
  if (fmt_tag == 0xFFFE && fmt_size >= 26) memcpy(&fmt_tag, fmt_body + 24, 2);

  int64_t frame_bytes = (int64_t)n_ch * (bits / 8);
  if (frame_bytes == 0) return -3;
  int64_t frames = body_size / frame_bytes;
  int out_ch = mono ? 1 : n_ch;
  float* buf = new float[(size_t)(frames * out_ch)];

  auto emit = [&](int64_t f, int c, float v) {
    if (mono)
      buf[f] += v / (float)n_ch;
    else
      buf[f * n_ch + c] = v;
  };
  if (mono) memset(buf, 0, sizeof(float) * (size_t)frames);

  const uint8_t* p = body;
  if (fmt_tag == 1 && bits == 16) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c) {
        int16_t v;
        memcpy(&v, p + (f * n_ch + c) * 2, 2);
        emit(f, c, (float)v / 32768.0f);
      }
  } else if (fmt_tag == 1 && bits == 32) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c) {
        int32_t v;
        memcpy(&v, p + (f * n_ch + c) * 4, 4);
        emit(f, c, (float)v / 2147483648.0f);
      }
  } else if (fmt_tag == 1 && bits == 24) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c) {
        const uint8_t* b = p + (f * n_ch + c) * 3;
        int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
        if (v >= (1 << 23)) v -= (1 << 24);
        emit(f, c, (float)v / 8388608.0f);
      }
  } else if (fmt_tag == 1 && bits == 8) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c)
        emit(f, c, ((float)p[f * n_ch + c] - 128.0f) / 128.0f);
  } else if (fmt_tag == 3 && bits == 32) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c) {
        float v;
        memcpy(&v, p + (f * n_ch + c) * 4, 4);
        emit(f, c, v);
      }
  } else if (fmt_tag == 3 && bits == 64) {
    for (int64_t f = 0; f < frames; ++f)
      for (int c = 0; c < n_ch; ++c) {
        double v;
        memcpy(&v, p + (f * n_ch + c) * 8, 8);
        emit(f, c, (float)v);
      }
  } else {
    delete[] buf;
    return -4;
  }

  *out = buf;
  *n_samples = frames;
  *channels = out_ch;
  *sample_rate = (int32_t)rate;
  return 0;
}

void atn_free(float* ptr) { delete[] ptr; }

// ------------------------------------------------------------- resampling

static inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return sin(px) / px;
}

// Kaiser window via the modified Bessel function I0.
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Rational polyphase resampling in [0, n_in) → returns samples written.
// Caller provides `out` sized >= ceil(n_in * up / down).
int64_t atn_resample(const float* in, int64_t n_in, int32_t up, int32_t down,
                     float* out, int32_t taps_per_phase) {
  if (up == down) {
    memcpy(out, in, sizeof(float) * (size_t)n_in);
    return n_in;
  }
  const double cutoff = 1.0 / (up > down ? up : down);
  const int half = taps_per_phase * up / 2;
  const int n_taps = 2 * half + 1;
  const double beta = 8.6;
  const double i0b = bessel_i0(beta);

  // filter bank [up][taps_per_phase+1] laid out phase-major
  std::vector<double> h((size_t)n_taps);
  for (int i = 0; i < n_taps; ++i) {
    double n = i - half;
    double w = bessel_i0(beta * sqrt(1.0 - (n / half) * (n / half))) / i0b;
    h[(size_t)i] = up * cutoff * sinc(cutoff * n) * w;
  }

  int64_t n_out = n_in * up / down;
  for (int64_t t = 0; t < n_out; ++t) {
    int64_t num = t * down;
    int64_t k0 = num / up;         // input index at the filter center
    int phase = (int)(num % up);   // fractional position
    double acc = 0.0;
    // taps at input positions k0 - j where filter index = phase + j*up + half
    for (int j = -taps_per_phase / 2; j <= taps_per_phase / 2; ++j) {
      int64_t k = k0 - j;
      if (k < 0 || k >= n_in) continue;
      int64_t hi = (int64_t)half + (int64_t)j * up + phase;
      if (hi < 0 || hi >= n_taps) continue;
      acc += (double)in[k] * h[(size_t)hi];
    }
    out[t] = (float)acc;
  }
  return n_out;
}

// ------------------------------------------------------------- normalize

void atn_peak_normalize(float* x, int64_t n, float peak) {
  float m = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = fabsf(x[i]);
    if (a > m) m = a;
  }
  if (m <= 1e-9f) return;
  float s = peak / m;
  for (int64_t i = 0; i < n; ++i) x[i] *= s;
}

}  // extern "C"
