// Lock-free triple-buffer mailbox for real-time parameter handoff.
//
// The reference synchronizes its game thread and SDL audio thread with one
// mutex (sound_system.zig:42, locked at main.zig:523) and its own comment
// proposes the better design this implements: "instead of locking, a
// triple buffer mailbox would prevent audio glitches" (main.zig:518-521).
//
// Classic triple buffering: three equally sized slots and one atomic
// control word packing (ready_slot, fresh_bit). The writer owns a spare
// slot, fills it, then atomically swaps it with the ready slot (setting
// the fresh bit); the reader atomically claims the ready slot (clearing
// the bit) and reads it at leisure. Neither side ever waits: the writer
// can publish at any rate (intermediate states are simply dropped) and
// the reader always sees the latest complete block — exactly the
// semantics an acoustic-update thread feeding an audio thread needs.
//
// Memory ordering: the writer's release store on the control word
// publishes the slot contents; the reader's acquire exchange observes
// them. Slots never move, so indices stay valid across threads.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Mailbox {
  std::atomic<uint32_t> ctl;  // bits 0-1: ready slot, bit 2: fresh
  uint32_t write_slot;        // writer-owned spare (no atomicity needed)
  uint32_t read_slot;         // reader-owned
  int64_t slot_bytes;
  std::atomic<uint64_t> seq;  // publish counter (cross-thread diagnostic)
  char* slots[3];
};

constexpr uint32_t kFresh = 4u;

}  // namespace

extern "C" {

// Create a mailbox with three slot_bytes-sized slots. Returns NULL on OOM.
void* arbih_mailbox_create(int64_t slot_bytes) {
  if (slot_bytes <= 0) return nullptr;
  auto* m = static_cast<Mailbox*>(std::calloc(1, sizeof(Mailbox)));
  if (!m) return nullptr;
  for (int i = 0; i < 3; ++i) {
    m->slots[i] = static_cast<char*>(std::calloc(1, slot_bytes));
    if (!m->slots[i]) {
      for (int j = 0; j < i; ++j) std::free(m->slots[j]);
      std::free(m);
      return nullptr;
    }
  }
  m->slot_bytes = slot_bytes;
  m->write_slot = 0;
  m->read_slot = 1;
  m->ctl.store(2u, std::memory_order_relaxed);  // ready = slot 2, not fresh
  m->seq.store(0, std::memory_order_relaxed);
  return m;
}

void arbih_mailbox_destroy(void* handle) {
  if (!handle) return;
  auto* m = static_cast<Mailbox*>(handle);
  for (int i = 0; i < 3; ++i) std::free(m->slots[i]);
  std::free(m);
}

// Publish one block (writer thread only). Never blocks.
void arbih_mailbox_write(void* handle, const void* data) {
  auto* m = static_cast<Mailbox*>(handle);
  std::memcpy(m->slots[m->write_slot], data, m->slot_bytes);
  // swap our filled slot with the ready slot, marking it fresh
  uint32_t prev = m->ctl.exchange(m->write_slot | kFresh,
                                  std::memory_order_acq_rel);
  m->write_slot = prev & 3u;
  m->seq.fetch_add(1, std::memory_order_relaxed);
}

// Fetch the latest block (reader thread only). Returns 1 and copies
// slot_bytes into out when a block newer than the last read is available,
// else 0 (out untouched). Never blocks.
int32_t arbih_mailbox_read(void* handle, void* out) {
  auto* m = static_cast<Mailbox*>(handle);
  uint32_t ctl = m->ctl.load(std::memory_order_acquire);
  if (!(ctl & kFresh)) return 0;
  // claim the fresh slot, handing our old read slot back as the spare
  uint32_t prev = m->ctl.exchange(m->read_slot, std::memory_order_acq_rel);
  if (!(prev & kFresh)) {
    // writer republished between load and exchange is fine (prev still
    // fresh); a non-fresh prev means another reader raced us — single
    // reader contract violated; put it back and bail
    m->ctl.exchange(prev, std::memory_order_acq_rel);
    return 0;
  }
  m->read_slot = prev & 3u;
  std::memcpy(out, m->slots[m->read_slot], m->slot_bytes);
  return 1;
}

uint64_t arbih_mailbox_seq(void* handle) {
  return static_cast<Mailbox*>(handle)->seq.load(std::memory_order_relaxed);
}

}  // extern "C"
