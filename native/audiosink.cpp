// Live audio sink: a real-time pull loop with underrun accounting.
//
// The reference's L0 runtime is an SDL audio device pulling 128-sample
// stereo f32 blocks through a callback under a hard ~2.9 ms cadence
// (sound_system.zig:44-92 opens the device, 123-172 is the callback).
// This container has no DAC, but the *runtime behavior* that defines the
// reference — an OS thread on an absolute-deadline clock consuming fixed
// blocks from a ring the producer must keep fed — is pure software:
//
//   * a lock-free SPSC ring of interleaved f32 frames (producer = the
//     render thread, consumer = the sink thread);
//   * a consumer thread paced by clock_nanosleep(CLOCK_MONOTONIC,
//     TIMER_ABSTIME) on an absolute schedule (t0 + k*period) — the same
//     drift-free cadence a DAC's DMA interrupts provide. Each tick it
//     pops exactly one block; a short ring means an UNDERRUN (the tick
//     emits silence, like SDL does when the callback can't fill);
//   * optional raw PCM out to a file descriptor (interleaved f32), so
//     with real hardware the stream pipes straight into aplay/pacat;
//     fd < 0 discards samples (pure timing harness).
//
// Stats are plain atomics read from any thread: blocks_played, underruns,
// late_wakeups (tick serviced > half a period behind schedule — host
// scheduling jitter, distinct from a starved ring), frames_written.
//
// Memory ordering: head/tail are the classic SPSC pair — each side reads
// the other's index with acquire and publishes its own with release; the
// data copy is ordered by those.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <pthread.h>
#include <unistd.h>

namespace {

struct Sink {
  // config
  int64_t sample_rate;
  int64_t block_frames;
  int64_t channels;
  int64_t ring_frames;  // power of two
  int out_fd;           // < 0: discard
  // ring
  float* ring;          // ring_frames * channels interleaved
  std::atomic<uint64_t> head;  // frames ever written (producer)
  std::atomic<uint64_t> tail;  // frames ever consumed (consumer)
  // thread
  pthread_t thread;
  std::atomic<int> running;
  std::atomic<int> stop;
  // stats
  std::atomic<uint64_t> blocks_played;
  std::atomic<uint64_t> underruns;
  std::atomic<uint64_t> late_wakeups;
  std::atomic<uint64_t> frames_written;
  // scratch block for the consumer (silence on underrun)
  float* scratch;
};

uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

void add_ns(timespec* t, int64_t ns) {
  t->tv_nsec += ns;
  while (t->tv_nsec >= 1000000000L) {
    t->tv_nsec -= 1000000000L;
    t->tv_sec += 1;
  }
}

int64_t diff_ns(const timespec& a, const timespec& b) {
  // a - b in ns
  return (int64_t)(a.tv_sec - b.tv_sec) * 1000000000L +
         (a.tv_nsec - b.tv_nsec);
}

void* sink_loop(void* arg) {
  Sink* s = static_cast<Sink*>(arg);
  const int64_t period_ns =
      (int64_t)(1e9 * (double)s->block_frames / (double)s->sample_rate);
  const int64_t blk = s->block_frames * s->channels;  // floats per block
  const uint64_t mask = (uint64_t)s->ring_frames - 1;
  timespec next;
  clock_gettime(CLOCK_MONOTONIC, &next);
  while (!s->stop.load(std::memory_order_acquire)) {
    add_ns(&next, period_ns);
    clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &next, nullptr);
    // re-check after the sleep: a stop that landed while we slept must not
    // be serviced as a tick (it would count a spurious shutdown underrun)
    if (s->stop.load(std::memory_order_acquire)) break;
    timespec now;
    clock_gettime(CLOCK_MONOTONIC, &now);
    if (diff_ns(now, next) > period_ns / 2)
      s->late_wakeups.fetch_add(1, std::memory_order_relaxed);
    const uint64_t head = s->head.load(std::memory_order_acquire);
    const uint64_t tail = s->tail.load(std::memory_order_relaxed);
    const float* out = s->scratch;
    if (head - tail >= (uint64_t)s->block_frames) {
      // pop one block (possibly wrapping)
      for (int64_t f = 0; f < s->block_frames; ++f) {
        const uint64_t idx = (tail + (uint64_t)f) & mask;
        std::memcpy(s->scratch + f * s->channels,
                    s->ring + idx * s->channels,
                    sizeof(float) * (size_t)s->channels);
      }
      s->tail.store(tail + (uint64_t)s->block_frames,
                    std::memory_order_release);
    } else {
      // starved: emit silence, count the underrun (SDL's callback
      // contract — the device pulls regardless)
      std::memset(s->scratch, 0, sizeof(float) * (size_t)blk);
      s->underruns.fetch_add(1, std::memory_order_relaxed);
    }
    if (s->out_fd >= 0) {
      size_t left = sizeof(float) * (size_t)blk;
      const char* p = reinterpret_cast<const char*>(out);
      while (left > 0) {
        ssize_t n = write(s->out_fd, p, left);
        if (n <= 0) break;  // sink fd gone/full: drop, keep the clock
        p += n;
        left -= (size_t)n;
      }
    }
    s->blocks_played.fetch_add(1, std::memory_order_relaxed);
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Create a sink. ring_frames is rounded up to a power of two (>= 4
// blocks). out_fd: raw interleaved f32 PCM destination, or -1 to discard.
// Returns NULL on OOM/bad args.
void* arbih_sink_create(int64_t sample_rate, int64_t block_frames,
                        int64_t channels, int64_t ring_frames, int out_fd) {
  if (sample_rate <= 0 || block_frames <= 0 || channels <= 0) return nullptr;
  auto* s = static_cast<Sink*>(std::calloc(1, sizeof(Sink)));
  if (!s) return nullptr;
  s->sample_rate = sample_rate;
  s->block_frames = block_frames;
  s->channels = channels;
  if (ring_frames < 4 * block_frames) ring_frames = 4 * block_frames;
  s->ring_frames = (int64_t)next_pow2((uint64_t)ring_frames);
  s->out_fd = out_fd;
  s->ring = static_cast<float*>(
      std::calloc((size_t)(s->ring_frames * channels), sizeof(float)));
  s->scratch = static_cast<float*>(
      std::calloc((size_t)(block_frames * channels), sizeof(float)));
  if (!s->ring || !s->scratch) {
    std::free(s->ring);
    std::free(s->scratch);
    std::free(s);
    return nullptr;
  }
  return s;
}

// Start the pull thread. Returns 0 on success.
int arbih_sink_start(void* h) {
  auto* s = static_cast<Sink*>(h);
  if (s->running.load(std::memory_order_acquire)) return 0;
  s->stop.store(0, std::memory_order_release);
  if (pthread_create(&s->thread, nullptr, sink_loop, s) != 0) return -1;
  s->running.store(1, std::memory_order_release);
  return 0;
}

// Stop and join the pull thread (worst-case latency: one block period).
void arbih_sink_stop(void* h) {
  auto* s = static_cast<Sink*>(h);
  if (!s->running.load(std::memory_order_acquire)) return;
  s->stop.store(1, std::memory_order_release);
  pthread_join(s->thread, nullptr);
  s->running.store(0, std::memory_order_release);
}

// Producer: offer `frames` interleaved f32 frames; copies as many as fit
// and returns the count accepted (never blocks).
int64_t arbih_sink_write(void* h, const float* data, int64_t frames) {
  auto* s = static_cast<Sink*>(h);
  const uint64_t mask = (uint64_t)s->ring_frames - 1;
  const uint64_t head = s->head.load(std::memory_order_relaxed);
  const uint64_t tail = s->tail.load(std::memory_order_acquire);
  uint64_t space = (uint64_t)s->ring_frames - (head - tail);
  uint64_t n = (uint64_t)frames < space ? (uint64_t)frames : space;
  for (uint64_t f = 0; f < n; ++f) {
    const uint64_t idx = (head + f) & mask;
    std::memcpy(s->ring + idx * s->channels, data + f * s->channels,
                sizeof(float) * (size_t)s->channels);
  }
  s->head.store(head + n, std::memory_order_release);
  s->frames_written.fetch_add(n, std::memory_order_relaxed);
  return (int64_t)n;
}

// Producer-visible free space, in frames.
int64_t arbih_sink_space(void* h) {
  auto* s = static_cast<Sink*>(h);
  const uint64_t head = s->head.load(std::memory_order_relaxed);
  const uint64_t tail = s->tail.load(std::memory_order_acquire);
  return (int64_t)((uint64_t)s->ring_frames - (head - tail));
}

// Frames queued and not yet consumed.
int64_t arbih_sink_level(void* h) {
  auto* s = static_cast<Sink*>(h);
  return (int64_t)(s->head.load(std::memory_order_relaxed) -
                   s->tail.load(std::memory_order_acquire));
}

// out[4] = {blocks_played, underruns, late_wakeups, frames_written}.
void arbih_sink_stats(void* h, uint64_t* out) {
  auto* s = static_cast<Sink*>(h);
  out[0] = s->blocks_played.load(std::memory_order_relaxed);
  out[1] = s->underruns.load(std::memory_order_relaxed);
  out[2] = s->late_wakeups.load(std::memory_order_relaxed);
  out[3] = s->frames_written.load(std::memory_order_relaxed);
}

void arbih_sink_destroy(void* h) {
  auto* s = static_cast<Sink*>(h);
  if (!s) return;
  arbih_sink_stop(s);
  std::free(s->ring);
  std::free(s->scratch);
  std::free(s);
}

}  // extern "C"
