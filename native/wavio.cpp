// Streaming WAV reader/writer — the native data-loader for file sources
// and sinks. Supports PCM16, PCM24, PCM32 and IEEE float32, reading into
// channel-interleaved float32 frames (the pipeline's wire format).
//
// Plays the role of the reference ecosystem's wav codec package feeding
// pipe Sources/Sinks; kept native so a prefetch thread can stream from
// disk into the SPSC ring without holding the GIL.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;       // 1 = PCM, 3 = IEEE float
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

struct WavReader {
  FILE* f;
  FmtChunk fmt;
  int64_t data_bytes;   // remaining payload bytes
  int64_t total_frames; // frames in the data chunk
};

struct WavWriter {
  FILE* f;
  uint16_t channels;
  uint32_t sample_rate;
  uint16_t bits;     // 16 or 32 (32 = float)
  uint16_t format;   // 1 pcm / 3 float
  int64_t frames_written;
};

float pcm_to_float(const uint8_t* p, int bits) {
  switch (bits) {
    case 16: {
      int16_t v;
      std::memcpy(&v, p, 2);
      return static_cast<float>(v) / 32768.0f;
    }
    case 24: {
      int32_t v = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
      return static_cast<float>(v >> 8) / 8388608.0f;
    }
    case 32: {
      int32_t v;
      std::memcpy(&v, p, 4);
      return static_cast<float>(v) / 2147483648.0f;
    }
    default:
      return 0.0f;
  }
}

}  // namespace

extern "C" {

// Returns nullptr on any parse error.
WavReader* pipe_wav_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  RiffHeader rh;
  if (std::fread(&rh, sizeof(rh), 1, f) != 1 ||
      std::memcmp(rh.riff, "RIFF", 4) != 0 ||
      std::memcmp(rh.wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return nullptr;
  }
  FmtChunk fmt{};
  bool have_fmt = false;
  int64_t data_bytes = -1;
  // walk chunks until `data`
  for (;;) {
    ChunkHeader ch;
    if (std::fread(&ch, sizeof(ch), 1, f) != 1) break;
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      uint32_t take = ch.size < sizeof(FmtChunk) ? ch.size : sizeof(FmtChunk);
      if (std::fread(&fmt, take, 1, f) != 1) break;
      if (ch.size > take) std::fseek(f, ch.size - take, SEEK_CUR);
      have_fmt = true;
    } else if (std::memcmp(ch.id, "data", 4) == 0) {
      data_bytes = ch.size;
      break;
    } else {
      std::fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  if (!have_fmt || data_bytes < 0 || fmt.channels == 0 ||
      (fmt.format != 1 && fmt.format != 3) ||
      (fmt.bits != 16 && fmt.bits != 24 && fmt.bits != 32)) {
    std::fclose(f);
    return nullptr;
  }
  auto* r = new (std::nothrow) WavReader();
  if (!r) {
    std::fclose(f);
    return nullptr;
  }
  r->f = f;
  r->fmt = fmt;
  r->data_bytes = data_bytes;
  r->total_frames = data_bytes / (fmt.channels * (fmt.bits / 8));
  return r;
}

void pipe_wav_close_reader(WavReader* r) {
  if (!r) return;
  std::fclose(r->f);
  delete r;
}

int32_t pipe_wav_channels(const WavReader* r) { return r->fmt.channels; }
int32_t pipe_wav_sample_rate(const WavReader* r) { return r->fmt.sample_rate; }
int64_t pipe_wav_total_frames(const WavReader* r) { return r->total_frames; }

// Read up to n frames of interleaved float32 into out. Returns frames read
// (0 = EOF).
int64_t pipe_wav_read(WavReader* r, float* out, int64_t n) {
  const int ch = r->fmt.channels;
  const int bytes = r->fmt.bits / 8;
  const int64_t frame_bytes = static_cast<int64_t>(ch) * bytes;
  int64_t want = n;
  const int64_t left = r->data_bytes / frame_bytes;
  if (want > left) want = left;
  if (want <= 0) return 0;
  if (r->fmt.format == 3 && r->fmt.bits == 32) {
    const int64_t got = std::fread(out, frame_bytes, want, r->f);
    r->data_bytes -= got * frame_bytes;
    return got;
  }
  // PCM: convert via a stack/heap staging buffer
  const int64_t chunk = 4096;
  uint8_t* stage = static_cast<uint8_t*>(std::malloc(chunk * frame_bytes));
  if (!stage) return 0;
  int64_t done = 0;
  while (done < want) {
    int64_t take = want - done;
    if (take > chunk) take = chunk;
    const int64_t got = std::fread(stage, frame_bytes, take, r->f);
    if (got <= 0) break;
    for (int64_t i = 0; i < got * ch; ++i) {
      out[done * ch + i] = pcm_to_float(stage + i * bytes, r->fmt.bits);
    }
    done += got;
    r->data_bytes -= got * frame_bytes;
    if (got < take) break;
  }
  std::free(stage);
  return done;
}

// ---- writer (float32 or PCM16) -------------------------------------------

static void write_headers(WavWriter* w) {
  // RIFF sizes patched on close
  RiffHeader rh{{'R', 'I', 'F', 'F'}, 0, {'W', 'A', 'V', 'E'}};
  std::fwrite(&rh, sizeof(rh), 1, w->f);
  ChunkHeader fh{{'f', 'm', 't', ' '}, sizeof(FmtChunk)};
  std::fwrite(&fh, sizeof(fh), 1, w->f);
  FmtChunk fmt{};
  fmt.format = w->format;
  fmt.channels = w->channels;
  fmt.sample_rate = w->sample_rate;
  fmt.bits = w->bits;
  fmt.block_align = w->channels * (w->bits / 8);
  fmt.byte_rate = w->sample_rate * fmt.block_align;
  std::fwrite(&fmt, sizeof(fmt), 1, w->f);
  ChunkHeader dh{{'d', 'a', 't', 'a'}, 0};
  std::fwrite(&dh, sizeof(dh), 1, w->f);
}

// bits: 16 (PCM) or 32 (IEEE float)
WavWriter* pipe_wav_create(const char* path, int32_t channels,
                           int32_t sample_rate, int32_t bits) {
  if (channels <= 0 || (bits != 16 && bits != 32)) return nullptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new (std::nothrow) WavWriter();
  if (!w) {
    std::fclose(f);
    return nullptr;
  }
  w->f = f;
  w->channels = static_cast<uint16_t>(channels);
  w->sample_rate = static_cast<uint32_t>(sample_rate);
  w->bits = static_cast<uint16_t>(bits);
  w->format = bits == 32 ? 3 : 1;
  w->frames_written = 0;
  write_headers(w);
  return w;
}

int64_t pipe_wav_write(WavWriter* w, const float* frames, int64_t n) {
  if (n <= 0) return 0;
  const int ch = w->channels;
  if (w->bits == 32) {
    const int64_t got = std::fwrite(frames, sizeof(float) * ch, n, w->f);
    w->frames_written += got;
    return got;
  }
  const int64_t total = n * ch;
  int16_t* stage = static_cast<int16_t*>(std::malloc(total * 2));
  if (!stage) return 0;
  for (int64_t i = 0; i < total; ++i) {
    float v = frames[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    stage[i] = static_cast<int16_t>(v * 32767.0f);
  }
  const int64_t got = std::fwrite(stage, 2 * ch, n, w->f);
  std::free(stage);
  w->frames_written += got;
  return got;
}

void pipe_wav_close_writer(WavWriter* w) {
  if (!w) return;
  const int64_t data_bytes = w->frames_written * w->channels * (w->bits / 8);
  // patch RIFF + data sizes
  std::fseek(w->f, 4, SEEK_SET);
  uint32_t riff_size = static_cast<uint32_t>(
      4 + (8 + sizeof(FmtChunk)) + 8 + data_bytes);
  std::fwrite(&riff_size, 4, 1, w->f);
  std::fseek(w->f, static_cast<long>(sizeof(RiffHeader) + 8 + sizeof(FmtChunk) + 4),
             SEEK_SET);
  uint32_t ds = static_cast<uint32_t>(data_bytes);
  std::fwrite(&ds, 4, 1, w->f);
  std::fclose(w->f);
  delete w;
}

}  // extern "C"
