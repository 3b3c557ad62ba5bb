// Lock-free SPSC ring buffer for interleaved float32 frames.
//
// The host-side transport of the streaming runtime: one producer thread
// (file reader / network source) and one consumer (the block dispatcher)
// exchange fixed-size frame batches without locks or GIL involvement.
// This is the native analog of the reference's cap-1 Go channels
// (internal/fitting/fitting.go:81-104) generalized to a cap-N ring: the
// depth-1 backpressure idiom becomes capacity = one block.
//
// Memory order: the producer publishes with a release store of the write
// index after writing payload; the consumer acquires it before reading.
// Single-producer single-consumer only.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

struct RingBuf {
  float* data;          // capacity_frames * channels floats
  int64_t capacity;     // frames
  int64_t channels;
  std::atomic<int64_t> write_idx;  // total frames written (monotonic)
  std::atomic<int64_t> read_idx;   // total frames read (monotonic)
  std::atomic<int32_t> closed;     // producer signals EOF
};

}  // namespace

extern "C" {

RingBuf* pipe_ringbuf_create(int64_t capacity_frames, int64_t channels) {
  if (capacity_frames <= 0 || channels <= 0) return nullptr;
  auto* rb = new (std::nothrow) RingBuf();
  if (!rb) return nullptr;
  rb->data = static_cast<float*>(
      std::malloc(sizeof(float) * capacity_frames * channels));
  if (!rb->data) {
    delete rb;
    return nullptr;
  }
  rb->capacity = capacity_frames;
  rb->channels = channels;
  rb->write_idx.store(0, std::memory_order_relaxed);
  rb->read_idx.store(0, std::memory_order_relaxed);
  rb->closed.store(0, std::memory_order_relaxed);
  return rb;
}

void pipe_ringbuf_destroy(RingBuf* rb) {
  if (!rb) return;
  std::free(rb->data);
  delete rb;
}

int64_t pipe_ringbuf_capacity(const RingBuf* rb) { return rb->capacity; }

// Frames currently readable.
int64_t pipe_ringbuf_size(const RingBuf* rb) {
  return rb->write_idx.load(std::memory_order_acquire) -
         rb->read_idx.load(std::memory_order_acquire);
}

void pipe_ringbuf_close(RingBuf* rb) {
  rb->closed.store(1, std::memory_order_release);
}

int32_t pipe_ringbuf_closed(const RingBuf* rb) {
  return rb->closed.load(std::memory_order_acquire);
}

// Producer: try to append n frames (channel-interleaved). Returns frames
// actually written (0..n); never blocks.
int64_t pipe_ringbuf_push(RingBuf* rb, const float* frames, int64_t n) {
  const int64_t w = rb->write_idx.load(std::memory_order_relaxed);
  const int64_t r = rb->read_idx.load(std::memory_order_acquire);
  const int64_t free_frames = rb->capacity - (w - r);
  if (n > free_frames) n = free_frames;
  if (n <= 0) return 0;
  const int64_t ch = rb->channels;
  const int64_t pos = w % rb->capacity;
  const int64_t first = (pos + n <= rb->capacity) ? n : rb->capacity - pos;
  std::memcpy(rb->data + pos * ch, frames, sizeof(float) * first * ch);
  if (n > first) {
    std::memcpy(rb->data, frames + first * ch, sizeof(float) * (n - first) * ch);
  }
  rb->write_idx.store(w + n, std::memory_order_release);
  return n;
}

// Consumer: try to read up to n frames into out. Returns frames read
// (0..n); never blocks. 0 with closed() set means EOF.
int64_t pipe_ringbuf_pop(RingBuf* rb, float* out, int64_t n) {
  const int64_t r = rb->read_idx.load(std::memory_order_relaxed);
  const int64_t w = rb->write_idx.load(std::memory_order_acquire);
  const int64_t avail = w - r;
  if (n > avail) n = avail;
  if (n <= 0) return 0;
  const int64_t ch = rb->channels;
  const int64_t pos = r % rb->capacity;
  const int64_t first = (pos + n <= rb->capacity) ? n : rb->capacity - pos;
  std::memcpy(out, rb->data + pos * ch, sizeof(float) * first * ch);
  if (n > first) {
    std::memcpy(out + first * ch, rb->data, sizeof(float) * (n - first) * ch);
  }
  rb->read_idx.store(r + n, std::memory_order_release);
  return n;
}

}  // extern "C"
