// Native host-side audio runtime: RIFF/WAVE decode/encode + polyphase
// windowed-sinc resampling.
//
// The reference pipeline does this work through three separate Python
// dependencies (soundfile/librosa decode, utils/audio.py:10-55; an ffmpeg
// *subprocess* for the Whisper path, whisper_extractor/audio.py:22-49;
// torchaudio for encode, utils/util.py:20-37). Here it is one small C++
// library: decode, down-mix, normalise, and resample in a single pass with
// no Python-heap churn and no process boundary. The Python fallback
// (utils/audio_io.py) implements identical semantics for environments
// without a compiler.
//
// Build: cc -O2 -shared -fPIC -o libsvc_native.so wav_codec.cc  (see build.py)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int32_t n_frames;
  int32_t n_channels;
  int32_t error;  // 0 ok, nonzero = error code
};

// ---------------------------------------------------------------------------
// Decode: returns channel-0 float32 samples normalised per the reference's
// magnitude rules (int PCM by -iinfo.min; see utils/audio.py:32-43).
// Caller provides the output buffer sized from wav_probe().
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

struct FmtChunk {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
};

static int parse(const uint8_t* data, int64_t size, FmtChunk* fmt,
                 const uint8_t** body, uint32_t* body_size) {
  if (size < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return 1;
  int64_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= size) {
    const uint8_t* id = data + pos;
    uint32_t csize = rd_u32(data + pos + 4);
    const uint8_t* cbody = data + pos + 8;
    if ((int64_t)(pos + 8 + csize) > size) csize = (uint32_t)(size - pos - 8);
    if (memcmp(id, "fmt ", 4) == 0 && csize >= 16) {
      fmt->format = rd_u16(cbody);
      fmt->channels = rd_u16(cbody + 2);
      fmt->rate = rd_u32(cbody + 4);
      fmt->bits = rd_u16(cbody + 14);
      if (fmt->format == 0xFFFE && csize >= 40) fmt->format = rd_u16(cbody + 24);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      *body = cbody;
      *body_size = csize;
      have_data = true;
    }
    pos += 8 + csize + (csize & 1);
  }
  return (have_fmt && have_data) ? 0 : 2;
}

// probe: fill WavInfo from a file (frames = per-channel sample count)
void wav_probe(const char* path, WavInfo* info) {
  info->error = 0;
  FILE* f = fopen(path, "rb");
  if (!f) { info->error = 10; return; }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f); info->error = 11; return;
  }
  fclose(f);
  FmtChunk fmt; const uint8_t* body = nullptr; uint32_t bs = 0;
  int err = parse(buf.data(), size, &fmt, &body, &bs);
  if (err) { info->error = err; return; }
  int bytes = fmt.bits / 8;
  if (!bytes || !fmt.channels) { info->error = 3; return; }
  info->sample_rate = (int32_t)fmt.rate;
  info->n_channels = fmt.channels;
  info->n_frames = (int32_t)(bs / (bytes * fmt.channels));
}

// decode channel 0 into out[n_frames] (float32, normalised)
void wav_decode_ch0(const char* path, float* out, int32_t n_frames, int32_t* error) {
  *error = 0;
  FILE* f = fopen(path, "rb");
  if (!f) { *error = 10; return; }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f); *error = 11; return;
  }
  fclose(f);
  FmtChunk fmt; const uint8_t* body = nullptr; uint32_t bs = 0;
  int err = parse(buf.data(), size, &fmt, &body, &bs);
  if (err) { *error = err; return; }

  int bytes = fmt.bits / 8;
  int ch = fmt.channels;
  int64_t frames = bs / (bytes * ch);
  if (frames > n_frames) frames = n_frames;

  if (fmt.format == 1) {  // integer PCM: normalise by -iinfo.min
    for (int64_t i = 0; i < frames; i++) {
      const uint8_t* p = body + (size_t)(i * ch) * bytes;
      int32_t v = 0;
      switch (fmt.bits) {
        case 8:  v = (int32_t)p[0] - 128; out[i] = (float)v / 128.0f; continue;
        case 16: v = (int16_t)rd_u16(p); out[i] = (float)v / 32768.0f; continue;
        case 24:
          v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16));
          v = (v << 8) >> 8;
          out[i] = (float)v / 8388608.0f;
          continue;
        case 32: v = (int32_t)rd_u32(p); out[i] = (float)((double)v / 2147483648.0); continue;
        default: *error = 4; return;
      }
    }
  } else if (fmt.format == 3) {  // IEEE float
    for (int64_t i = 0; i < frames; i++) {
      const uint8_t* p = body + (size_t)(i * ch) * bytes;
      if (fmt.bits == 32) {
        float v; memcpy(&v, p, 4); out[i] = v;
      } else if (fmt.bits == 64) {
        double v; memcpy(&v, p, 8); out[i] = (float)v;
      } else { *error = 4; return; }
    }
  } else {
    *error = 5;
  }
}

// encode float32 mono to 16-bit PCM WAV
void wav_encode_pcm16(const char* path, const float* samples, int32_t n,
                      int32_t rate, int32_t* error) {
  *error = 0;
  FILE* f = fopen(path, "wb");
  if (!f) { *error = 10; return; }
  uint32_t body = (uint32_t)n * 2;
  uint32_t riff = 36 + body;
  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  memcpy(hdr + 4, &riff, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16; memcpy(hdr + 16, &fmt_size, 4);
  uint16_t pcm = 1, ch = 1, block = 2, bits = 16;
  uint32_t byte_rate = (uint32_t)rate * 2;
  memcpy(hdr + 20, &pcm, 2);
  memcpy(hdr + 22, &ch, 2);
  memcpy(hdr + 24, &rate, 4);
  memcpy(hdr + 28, &byte_rate, 4);
  memcpy(hdr + 32, &block, 2);
  memcpy(hdr + 34, &bits, 2);
  memcpy(hdr + 36, "data", 4);
  memcpy(hdr + 40, &body, 4);
  fwrite(hdr, 1, 44, f);
  std::vector<int16_t> pcm_buf((size_t)n);
  for (int32_t i = 0; i < n; i++) {
    float v = samples[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    pcm_buf[(size_t)i] = (int16_t)lrintf(v);
  }
  fwrite(pcm_buf.data(), 2, (size_t)n, f);
  fclose(f);
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler (kaiser_best parameters), mirroring
// ops/resample.py — used for host-side preprocessing when the device path
// is not warranted (tiny clips, data loading).
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) { while (b) { int64_t t = a % b; a = b; b = t; } return a; }

int32_t resample_out_len(int32_t n_in, int32_t sr_in, int32_t sr_out) {
  int64_t g = gcd64(sr_in, sr_out);
  int64_t up = sr_out / g, down = sr_in / g;
  return (int32_t)(((int64_t)n_in * up + down - 1) / down);  // ceil
}

void resample_f32(const float* x, int32_t n_in, int32_t sr_in, int32_t sr_out,
                  float* out, int32_t n_out) {
  const int num_zeros = 64;
  const double beta = 14.769656459379492;
  const double rolloff = 0.9475937167399596;

  int64_t g = gcd64(sr_in, sr_out);
  int64_t up = sr_out / g, down = sr_in / g;
  double scale = up < down ? (double)up / (double)down : 1.0;
  int half = (int)ceil(num_zeros / scale);
  int K = 2 * half + 1;

  // per-phase tap table [up, K]
  std::vector<float> taps((size_t)up * K);
  double i0b = bessel_i0(beta);
  for (int64_t p = 0; p < up; p++) {
    double frac = (double)p / (double)up;
    for (int k = 0; k < K; k++) {
      double t = ((double)(k - half) - frac) * scale;
      double xn = t / num_zeros;
      double w = 0.0;
      if (xn >= -1.0 && xn <= 1.0)
        w = bessel_i0(beta * sqrt(1.0 - xn * xn)) / i0b;
      double s = rolloff * t * M_PI;
      double sinc = (fabs(s) < 1e-12) ? 1.0 : sin(s) / s;
      taps[(size_t)p * K + k] = (float)(scale * rolloff * sinc * w);
    }
  }

  for (int32_t n = 0; n < n_out; n++) {
    int64_t num = (int64_t)n * down;
    int64_t left = num / up;
    int64_t phase = num % up;
    const float* h = &taps[(size_t)phase * K];
    double acc = 0.0;
    for (int k = 0; k < K; k++) {
      int64_t idx = left + k - half;
      if (idx < 0 || idx >= n_in) continue;  // zero padding (matches ops/resample.py)
      acc += (double)x[idx] * h[k];
    }
    out[n] = (float)acc;
  }
}

}  // extern "C"
