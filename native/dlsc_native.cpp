// dlsc_native: C++ data-path runtime for dlsc_tpu.
//
// The reference delegates its hot host-side work to dependencies' native
// kernels (torchaudio C++ decode/resample — SURVEY.md §2.6); this library is
// the equivalent for the TPU stack's host pipeline: WAV decode, mono mix,
// peak normalization, Kaiser-windowed polyphase resampling, and batch row
// gathering for the shard loader. Bound from Python via ctypes
// (dlsc_tpu/native/__init__.py); every entry point has a pure-Python
// fallback so the framework works without the .so.
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode (RIFF PCM 8/16/24/32-bit int + 32-bit float)
// Returns number of frames decoded, or -1 on error.
// out must hold frames*channels floats; query first with frames==nullptr? No:
// call wav_info() first.
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits;
  int32_t format;     // 1 = PCM, 3 = float
  int64_t frames;
  int64_t data_offset;
};

static bool read_header(FILE* f, WavInfo* info) {
  char id[5] = {0};
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || strncmp(id, "RIFF", 4)) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || strncmp(id, "WAVE", 4)) return false;
  bool have_fmt = false;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (!strncmp(id, "fmt ", 4)) {
      uint16_t fmt, ch, block, bits;
      uint32_t rate, byterate;
      if (fread(&fmt, 2, 1, f) != 1) return false;
      fread(&ch, 2, 1, f);
      fread(&rate, 4, 1, f);
      fread(&byterate, 4, 1, f);
      fread(&block, 2, 1, f);
      fread(&bits, 2, 1, f);
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
      info->format = fmt == 0xFFFE ? 1 : fmt;  // extensible ~ PCM
      info->channels = ch;
      info->sample_rate = (int32_t)rate;
      info->bits = bits;
      have_fmt = true;
    } else if (!strncmp(id, "data", 4)) {
      if (!have_fmt) return false;
      info->data_offset = ftell(f);
      info->frames = (int64_t)sz / (info->channels * info->bits / 8);
      return true;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  return false;
}

int64_t wav_info(const char* path, int32_t* sample_rate, int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info{};
  bool ok = read_header(f, &info);
  fclose(f);
  if (!ok) return -1;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  return info.frames;
}

// Decode into interleaved float32 [-1, 1]. Returns frames or -1.
int64_t wav_decode(const char* path, float* out, int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info{};
  if (!read_header(f, &info)) { fclose(f); return -1; }
  int64_t frames = info.frames < max_frames ? info.frames : max_frames;
  int64_t n = frames * info.channels;
  fseek(f, info.data_offset, SEEK_SET);
  int64_t done = -1;
  if (info.format == 3 && info.bits == 32) {
    done = (int64_t)fread(out, 4, n, f) / info.channels;
  } else if (info.format == 1 && info.bits == 16) {
    std::vector<int16_t> buf(n);
    int64_t got = (int64_t)fread(buf.data(), 2, n, f);
    for (int64_t i = 0; i < got; ++i) out[i] = buf[i] / 32768.0f;
    done = got / info.channels;
  } else if (info.format == 1 && info.bits == 32) {
    std::vector<int32_t> buf(n);
    int64_t got = (int64_t)fread(buf.data(), 4, n, f);
    for (int64_t i = 0; i < got; ++i) out[i] = (float)(buf[i] / 2147483648.0);
    done = got / info.channels;
  } else if (info.format == 1 && info.bits == 24) {
    std::vector<uint8_t> buf(n * 3);
    int64_t got = (int64_t)fread(buf.data(), 3, n, f);
    for (int64_t i = 0; i < got; ++i) {
      int32_t v = buf[3 * i] | (buf[3 * i + 1] << 8) | (buf[3 * i + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = (float)v / 8388608.0f;
    }
    done = got / info.channels;
  } else if (info.format == 1 && info.bits == 8) {
    std::vector<uint8_t> buf(n);
    int64_t got = (int64_t)fread(buf.data(), 1, n, f);
    for (int64_t i = 0; i < got; ++i) out[i] = (buf[i] - 128) / 128.0f;
    done = got / info.channels;
  }
  fclose(f);
  return done;
}

// ---------------------------------------------------------------------------
// Mono mix + peak normalize (single pass helpers)
// ---------------------------------------------------------------------------

void mono_mix(const float* in, int64_t frames, int32_t channels, float* out) {
  if (channels == 1) { memcpy(out, in, frames * 4); return; }
  const float inv = 1.0f / channels;
  for (int64_t i = 0; i < frames; ++i) {
    float acc = 0.f;
    for (int32_t c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = acc * inv;
  }
}

void peak_normalize(float* x, int64_t n, float eps) {
  float peak = 0.f;
  for (int64_t i = 0; i < n; ++i) {
    float a = fabsf(x[i]);
    if (a > peak) peak = a;
  }
  if (peak > eps) {
    const float inv = 1.0f / peak;
    for (int64_t i = 0; i < n; ++i) x[i] *= inv;
  }
}

// ---------------------------------------------------------------------------
// Kaiser-windowed sinc polyphase resampler (up/down already gcd-reduced)
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

int64_t resample_out_len(int64_t n_in, int32_t up, int32_t down) {
  return (n_in * up + down - 1) / down;
}

// Returns output length written.
int64_t resample_poly(const float* in, int64_t n_in, int32_t up, int32_t down,
                      float* out, int64_t out_cap) {
  if (up == down) {
    int64_t n = n_in < out_cap ? n_in : out_cap;
    memcpy(out, in, n * 4);
    return n;
  }
  const int half_zc = 10;                        // zero crossings per side
  const double beta = 8.555;                     // ~ scipy kaiser_best-ish
  const int max_ud = up > down ? up : down;
  const int half_len = half_zc * max_ud;
  const int taps = 2 * half_len + 1;
  const double cutoff = 1.0 / max_ud;            // in units of Nyquist*up
  std::vector<double> h(taps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < taps; ++i) {
    const double t = i - half_len;
    const double x = t * cutoff;
    const double sinc = x == 0.0 ? 1.0 : sin(M_PI * x) / (M_PI * x);
    const double w = t / half_len;
    const double kaiser = bessel_i0(beta * sqrt(1.0 - w * w < 0 ? 0 : 1.0 - w * w)) / i0b;
    h[i] = cutoff * sinc * kaiser * up;
  }
  const int64_t n_out = resample_out_len(n_in, up, down);
  const int64_t lim = n_out < out_cap ? n_out : out_cap;
  // y[m] = sum_k h[k] * x_up[m*down - k] where x_up has zeros except at
  // multiples of up: x_up[j] = x[j/up] when j % up == 0.
  for (int64_t m = 0; m < lim; ++m) {
    const int64_t j0 = m * down + half_len;      // center alignment
    double acc = 0.0;
    // iterate over input samples i where j = i*up hits the kernel support
    int64_t i_hi = j0 / up;
    for (int64_t i = i_hi; i >= 0; --i) {
      const int64_t k = j0 - i * up;
      if (k >= taps) break;
      if (i < n_in) acc += h[k] * in[i];
    }
    out[m] = (float)acc;
  }
  return lim;
}

// ---------------------------------------------------------------------------
// Batch gather: out[b] = base[idx[b]] (rows of length row_len)
// ---------------------------------------------------------------------------

void gather_rows(const float* base, int64_t row_len, const int64_t* idx,
                 int32_t n_idx, float* out) {
  for (int32_t b = 0; b < n_idx; ++b) {
    memcpy(out + (int64_t)b * row_len, base + idx[b] * row_len, row_len * 4);
  }
}

}  // extern "C"
