// Native event-stream loader: mmap'd event packs, multi-slot window
// assembly, and background double-buffered batch prefetch.
//
// TPU-native replacement for the reference's single-threaded, GIL-bound
// Python dataloader hot path (reference: dataloader/h5.py __getitem__,
// single process with num_workers=0, configs/parser.py:86). The device
// consumes fixed-shape [B, N, 4] float32 windows; this loader assembles
// the next batch on a producer thread while the accelerator computes,
// so host input time hides behind device step time.
//
// Pack format (.evpack, written by event_flow_tpu/data/native_loader.py):
//   magic "EVPK1\0\0\0" (8 bytes)
//   uint64 n_events
//   float64 ts[n]   (seconds, absolute)
//   uint16  ys[n]
//   uint16  xs[n]
//   uint8   ps[n]   (0/1)
//
// Window semantics mirror the reference's events mode: fixed event-count
// windows, slot rollover to file max(batch_idx)+1 when a sequence runs
// out (h5.py:227-270), timestamps shifted to the sequence's t0.
//
// Build: g++ -O3 -shared -fPIC -o libevloader.so evloader.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Pack {
  int fd = -1;
  size_t bytes = 0;
  const uint8_t* base = nullptr;
  uint64_t n = 0;
  const double* ts = nullptr;
  const uint16_t* ys = nullptr;
  const uint16_t* xs = nullptr;
  const uint8_t* ps = nullptr;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    bytes = static_cast<size_t>(st.st_size);
    base = static_cast<const uint8_t*>(
        mmap(nullptr, bytes, PROT_READ, MAP_PRIVATE, fd, 0));
    if (base == MAP_FAILED) return false;
    if (bytes < 16 || memcmp(base, "EVPK1\0\0\0", 8) != 0) return false;
    memcpy(&n, base + 8, 8);
    const uint8_t* p = base + 16;
    ts = reinterpret_cast<const double*>(p);
    p += n * sizeof(double);
    ys = reinterpret_cast<const uint16_t*>(p);
    p += n * sizeof(uint16_t);
    xs = reinterpret_cast<const uint16_t*>(p);
    p += n * sizeof(uint16_t);
    ps = p;
    return p + n <= base + bytes;
  }
  void close() {
    if (base && base != MAP_FAILED) munmap(const_cast<uint8_t*>(base), bytes);
    if (fd >= 0) ::close(fd);
  }
};

struct Batch {
  std::vector<float> events;  // [B, N, 4] (ts, y, x, p)
  std::vector<float> dt_input;  // [B]
  uint64_t rolled_mask = 0;   // bit per slot: sequence rolled this batch
  std::vector<int32_t> file_of_slot;  // file index per slot (attribution)
};

struct Loader {
  std::vector<Pack> packs;
  int batch = 0;
  int window = 0;
  // per-slot stream state (reference: h5.py:51-54)
  std::vector<int64_t> batch_idx;
  std::vector<uint64_t> cursor;
  int64_t seq_num = 0;

  // double buffer: producer fills alternating slots, consumer drains in
  // the same order; `filled` flags are the handshake
  Batch buf[2];
  bool filled[2] = {false, false};
  int cons_slot = 0;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::thread producer;
  std::atomic<bool> stop{false};

  void assemble(Batch& b) {
    const int N = window;
    b.events.assign(static_cast<size_t>(batch) * N * 4, 0.0f);
    b.dt_input.assign(batch, 0.0f);
    b.file_of_slot.assign(batch, 0);
    b.rolled_mask = 0;
    for (int s = 0; s < batch; ++s) {
      // rollover until the slot has a full window
      // (reference: h5.py:227-232, 242-270)
      for (;;) {
        const Pack& pk = packs[batch_idx[s] % packs.size()];
        if (cursor[s] + static_cast<uint64_t>(N) <= pk.n) break;
        int64_t mx = batch_idx[0];
        for (int j = 1; j < batch; ++j) mx = std::max(mx, batch_idx[j]);
        batch_idx[s] = mx + 1;
        cursor[s] = 0;
        seq_num += 1;
        b.rolled_mask |= (1ull << s);
      }
      const Pack& pk = packs[batch_idx[s] % packs.size()];
      b.file_of_slot[s] = static_cast<int32_t>(batch_idx[s] % packs.size());
      const uint64_t c = cursor[s];
      const double t0 = pk.ts[0];
      float* out = b.events.data() + static_cast<size_t>(s) * N * 4;
      for (int i = 0; i < N; ++i) {
        const uint64_t e = c + i;
        out[i * 4 + 0] = static_cast<float>(pk.ts[e] - t0);
        out[i * 4 + 1] = static_cast<float>(pk.ys[e]);
        out[i * 4 + 2] = static_cast<float>(pk.xs[e]);
        out[i * 4 + 3] = pk.ps[e] ? 1.0f : -1.0f;
      }
      b.dt_input[s] = static_cast<float>(pk.ts[c + N - 1] - pk.ts[c]);
      cursor[s] += N;
    }
  }

  void produce_loop() {
    int slot = 0;
    while (!stop.load()) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return !filled[slot] || stop.load(); });
      }
      if (stop.load()) break;
      assemble(buf[slot]);
      {
        std::lock_guard<std::mutex> lk(mu);
        filled[slot] = true;
      }
      cv_ready.notify_one();
      slot ^= 1;
    }
  }
};

}  // namespace

extern "C" {

void* evl_open(const char** paths, int n_files, int batch, int window) {
  auto* L = new Loader();
  L->batch = batch;
  L->window = window;
  L->packs.resize(n_files);
  for (int i = 0; i < n_files; ++i) {
    if (!L->packs[i].open(paths[i])) {
      for (int j = 0; j <= i; ++j) L->packs[j].close();
      delete L;
      return nullptr;
    }
  }
  L->batch_idx.resize(batch);
  L->cursor.assign(batch, 0);
  for (int s = 0; s < batch; ++s) L->batch_idx[s] = s;
  L->producer = std::thread([L] { L->produce_loop(); });
  return L;
}

// Blocks until the prefetched batch is ready, copies it out, and wakes the
// producer to assemble the next one. Returns the rolled-slot bitmask.
uint64_t evl_next(void* h, float* out_events, float* out_dt,
                  int32_t* out_file_of_slot, int64_t* out_seq_num) {
  auto* L = static_cast<Loader*>(h);
  const int slot = L->cons_slot;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return L->filled[slot]; });
  }
  Batch& b = L->buf[slot];
  memcpy(out_events, b.events.data(), b.events.size() * sizeof(float));
  memcpy(out_dt, b.dt_input.data(), b.dt_input.size() * sizeof(float));
  memcpy(out_file_of_slot, b.file_of_slot.data(),
         b.file_of_slot.size() * sizeof(int32_t));
  uint64_t rolled = b.rolled_mask;
  *out_seq_num = L->seq_num;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->filled[slot] = false;
  }
  L->cons_slot = slot ^ 1;
  L->cv_free.notify_one();
  return rolled;
}

void evl_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  if (L->producer.joinable()) L->producer.join();
  for (auto& p : L->packs) p.close();
  delete L;
}

}  // extern "C"
