// Native FLAC decoder (channel-0, float32 output).
//
// Closes the non-WAV half of the reference's audio loader: its
// load_audio_torch falls back to librosa/soundfile (ffmpeg) for anything
// that is not RIFF/WAVE (/root/reference/utils/audio.py:21-24). This is a
// from-scratch implementation of the FLAC format's mandatory decode path
// (RFC 9639): STREAMINFO, frame headers with UTF-8 coded numbers, CONSTANT
// / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, 4- and 5-bit Rice
// residual partitions with escape codes, wasted bits, and all four
// channel-decorrelation modes. CRCs are parsed over but not verified (a
// corrupt stream fails structurally instead).
//
// Output samples are normalised by 2^(bits-1) — the same magnitude rule
// the WAV integer-PCM path uses (utils/audio.py:32-33), matching what
// soundfile/librosa hand the reference.
//
// Built into libsvc_native.so alongside wav_codec.cc (see
// svc_inference_pipeline_tpu/native/wav_codec.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// MSB-first bit reader over an in-memory buffer.
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed of data[byte], 0..7
  bool fail = false;

  BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

  bool eof() const { return byte >= size; }

  uint32_t bits(int n) {  // n <= 32
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      if (byte >= size) { fail = true; return 0; }
      v = (v << 1) | ((data[byte] >> (7 - bit)) & 1u);
      if (++bit == 8) { bit = 0; byte++; }
    }
    return v;
  }

  uint64_t bits64(int n) {
    uint64_t v = 0;
    if (n > 32) { v = bits(n - 32); n = 32; }
    return (v << n) | bits(n);
  }

  int64_t sbits(int n) {  // signed two's complement
    uint64_t v = bits64(n);
    if (n < 64 && (v >> (n - 1)) & 1u) v |= ~0ull << n;
    return (int64_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (!fail && bits(1) == 0) {
      q++;
      if (q > (1u << 30)) { fail = true; break; }
    }
    return q;
  }

  void align() {
    if (bit) { bit = 0; byte++; }
  }
};

// UTF-8 style coded number (frame/sample index; up to 36 bits → 7 bytes)
uint64_t read_coded_number(BitReader& br) {
  uint32_t b0 = br.bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) return b0;
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { br.fail = true; return 0; }
  for (int i = 0; i < extra; i++) {
    uint32_t b = br.bits(8);
    if ((b & 0xC0) != 0x80) { br.fail = true; return 0; }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits = 0;
  uint64_t total_samples = 0;
};

// Parse "fLaC" magic + metadata blocks; returns offset of first frame or 0.
size_t parse_metadata(const uint8_t* data, size_t size, StreamInfo* si) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return 0;
  size_t pos = 4;
  bool last = false, have_si = false;
  while (!last && pos + 4 <= size) {
    uint8_t hdr = data[pos];
    last = (hdr & 0x80) != 0;
    int type = hdr & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) |
                   data[pos + 3];
    pos += 4;
    if (pos + len > size) return 0;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      si->sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
      si->channels = ((p[12] >> 1) & 0x7) + 1;
      si->bits = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si->total_samples = ((uint64_t)(p[13] & 0x0F) << 32) | ((uint64_t)p[14] << 24) |
                          ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
      have_si = true;
    }
    pos += len;
  }
  return have_si ? pos : 0;
}

// Rice-coded residual into res[order .. blocksize)
bool read_residual(BitReader& br, int order, int blocksize, int64_t* res) {
  uint32_t method = br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;
  uint32_t po = br.bits(4);
  uint32_t nparts = 1u << po;
  if (blocksize % nparts != 0) return false;
  int idx = order;
  for (uint32_t p = 0; p < nparts; p++) {
    int count = (int)(blocksize / nparts) - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = br.bits(plen);
    if (param == escape) {
      uint32_t nbits = br.bits(5);
      for (int i = 0; i < count; i++)
        res[idx++] = nbits ? br.sbits((int)nbits) : 0;
    } else {
      for (int i = 0; i < count; i++) {
        uint32_t q = br.unary();
        uint64_t r = param ? br.bits64((int)param) : 0;
        uint64_t u = ((uint64_t)q << param) | r;
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // unzigzag
      }
    }
    if (br.fail) return false;
  }
  return true;
}

bool read_subframe(BitReader& br, int blocksize, int bps, int64_t* out) {
  if (br.bits(1) != 0) return false;  // pad bit
  uint32_t type = br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = 1 + (int)br.unary();
  bps -= wasted;
  if (bps <= 0 || br.fail) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(bps);
    for (int i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; i++) out[i] = br.sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED 0-4
    int order = type & 0x07;
    if (order > blocksize) return false;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] += p;
    }
  } else if (type & 0x20) {  // LPC, order 1-32
    int order = (int)(type & 0x1F) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    uint32_t prec = br.bits(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; i++) coef[i] = br.sbits((int)prec);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (br.fail) return false;
  if (wasted)
    for (int i = 0; i < blocksize; i++) out[i] <<= wasted;
  return true;
}

const int kBlockSizes[16] = {0,    192,  576,  1152, 2304, 4608, -1,   -2,
                             256,  512,  1024, 2048, 4096, 8192, 16384, 32768};

struct FrameHeader {
  int blocksize = 0;
  int channels = 0;
  int assignment = 0;  // 0-7 independent, 8 L/S, 9 R/S, 10 M/S
  int bps = 0;
};

bool read_frame_header(BitReader& br, const StreamInfo& si, FrameHeader* fh) {
  if (br.bits(14) != 0x3FFE) return false;  // sync
  br.bits(1);                               // reserved
  br.bits(1);                               // blocking strategy
  uint32_t bs_code = br.bits(4);
  uint32_t sr_code = br.bits(4);
  uint32_t ch_code = br.bits(4);
  uint32_t ss_code = br.bits(3);
  br.bits(1);  // reserved
  read_coded_number(br);
  if (br.fail) return false;

  if (bs_code == 0) return false;
  int bs = kBlockSizes[bs_code];
  if (bs == -1) bs = (int)br.bits(8) + 1;
  else if (bs == -2) bs = (int)br.bits(16) + 1;
  fh->blocksize = bs;

  if (sr_code == 12) br.bits(8);
  else if (sr_code == 13 || sr_code == 14) br.bits(16);
  else if (sr_code == 15) return false;

  if (ch_code <= 7) { fh->channels = (int)ch_code + 1; fh->assignment = 0; }
  else if (ch_code <= 10) { fh->channels = 2; fh->assignment = (int)ch_code; }
  else return false;

  static const int kBits[8] = {0, 8, 12, -1, 16, 20, 24, 32};
  int b = kBits[ss_code];
  if (b == -1) return false;
  fh->bps = b ? b : si.bits;

  br.bits(8);  // CRC-8 of the header (not verified)
  return !br.fail;
}

}  // namespace

extern "C" {

// Mirrors WavInfo in wav_codec.cc (kept binary-compatible for the bindings)
struct FlacInfo {
  int32_t sample_rate;
  int32_t n_frames;
  int32_t n_channels;
  int32_t error;  // 0 ok; 1 not-flac, 2 bad stream, 3 truncated, 10/11 io
};

static int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return 10;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize((size_t)size);
  if (fread(buf->data(), 1, (size_t)size, f) != (size_t)size) { fclose(f); return 11; }
  fclose(f);
  return 0;
}

void flac_probe(const char* path, FlacInfo* info) {
  info->error = 0;
  std::vector<uint8_t> buf;
  int err = read_file(path, &buf);
  if (err) { info->error = err; return; }
  StreamInfo si;
  if (!parse_metadata(buf.data(), buf.size(), &si)) { info->error = 1; return; }
  info->sample_rate = (int32_t)si.sample_rate;
  info->n_channels = si.channels;
  info->n_frames = (int32_t)si.total_samples;
}

// Decode channel 0 → out[n_frames] float32, normalised by 2^(bits-1).
void flac_decode_ch0(const char* path, float* out, int32_t n_frames, int32_t* error) {
  *error = 0;
  std::vector<uint8_t> buf;
  int err = read_file(path, &buf);
  if (err) { *error = err; return; }
  StreamInfo si;
  size_t pos = parse_metadata(buf.data(), buf.size(), &si);
  if (!pos) { *error = 1; return; }

  BitReader br(buf.data(), buf.size());
  br.byte = pos;

  std::vector<int64_t> ch0, ch1;
  int64_t written = 0;
  while (written < n_frames && br.byte < br.size && !br.fail) {
    FrameHeader fh;
    if (!read_frame_header(br, si, &fh)) { *error = 2; return; }
    ch0.resize((size_t)fh.blocksize);
    // side channel carries one extra bit in decorrelated modes
    int bps0 = fh.bps + (fh.assignment == 9 ? 1 : 0);
    if (!read_subframe(br, fh.blocksize, bps0, ch0.data())) { *error = 2; return; }
    if (fh.channels >= 2) {
      ch1.resize((size_t)fh.blocksize);
      for (int c = 1; c < fh.channels; c++) {
        int bps_c = fh.bps + ((fh.assignment == 8 || fh.assignment == 10) && c == 1 ? 1 : 0);
        if (!read_subframe(br, fh.blocksize, bps_c, ch1.data())) { *error = 2; return; }
        if (c > 1) continue;  // only channels 0/1 participate in decorrelation
        if (fh.assignment == 8) {  // left/side: ch0 = left (already)
          // nothing — channel 0 is the left channel
        } else if (fh.assignment == 9) {  // side/right: left = side + right
          for (int i = 0; i < fh.blocksize; i++) ch0[i] += ch1[i];
        } else if (fh.assignment == 10) {  // mid/side
          for (int i = 0; i < fh.blocksize; i++) {
            int64_t mid = (ch0[i] << 1) | (ch1[i] & 1);
            ch0[i] = (mid + ch1[i]) >> 1;  // left
          }
        }
      }
    }
    br.align();
    br.bits(16);  // frame CRC-16 (not verified)
    if (br.fail) { *error = 2; return; }

    double denom = (double)(1ll << (si.bits - 1));
    for (int i = 0; i < fh.blocksize && written < n_frames; i++)
      out[written++] = (float)((double)ch0[i] / denom);
  }
  // a stream that ends short of STREAMINFO's promise is structurally
  // corrupt (truncated file) — fail loudly, never zero-fill silently
  if (written < n_frames) { *error = 3; return; }
}

}  // extern "C"
