// Native data loader: mmap-backed shuffled batch assembly with prefetch.
//
// The reference feeds training through torch DataLoader worker processes
// (reference: src/data/cyclic_dataset.py:212-249, num_workers from config).
// The TPU-native replacement is this small C++ engine: the dataset lives in
// an mmap'd float32 file, and a background thread gathers shuffled sample
// rows into a ring of ready batch buffers so the host critical path during
// training is a single memcpy-free pointer handoff. Exposed through a C ABI
// for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdataloader.so dataloader.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Batch {
  std::vector<float> data;
  bool ready = false;
};

struct Loader {
  // mapped dataset
  int fd = -1;
  const float *base = nullptr;
  void *map_ptr = nullptr; // original mmap address (base is offset into it)
  size_t map_bytes = 0;
  int64_t n_samples = 0;
  int64_t sample_elems = 0;  // floats per sample
  int64_t header_offset = 0; // bytes to skip (e.g. .npy header)

  // batching
  int64_t batch_size = 0;
  bool drop_remainder = true;

  // epoch state
  std::vector<int64_t> order;
  int64_t next_batch_idx = 0;
  int64_t n_batches = 0;

  // prefetch ring
  std::vector<Batch> ring;
  size_t ring_head = 0; // consumer position
  size_t ring_tail = 0; // producer position
  size_t ring_filled = 0;
  std::mutex mu;
  std::condition_variable cv_producer, cv_consumer;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<bool> epoch_active{false};
  int64_t produced = 0;

  ~Loader() {
    stop.store(true);
    {
      std::lock_guard<std::mutex> lk(mu);
      epoch_active = true; // wake the worker so it can observe stop
    }
    cv_producer.notify_all();
    cv_consumer.notify_all();
    if (worker.joinable()) worker.join();
    // unmap the ORIGINAL pointer: reconstructing it from `base` with
    // float-unit arithmetic breaks for header offsets not divisible by 4
    if (map_ptr) munmap(map_ptr, map_bytes);
    if (fd >= 0) close(fd);
  }
};

void assemble(Loader *ld, int64_t batch_idx, float *out) {
  const int64_t start = batch_idx * ld->batch_size;
  const int64_t end = std::min(start + ld->batch_size, (int64_t)ld->order.size());
  for (int64_t i = start; i < end; ++i) {
    const float *src = ld->base + ld->order[i] * ld->sample_elems;
    std::memcpy(out + (i - start) * ld->sample_elems, src,
                ld->sample_elems * sizeof(float));
  }
  // zero-pad a short final batch (only when drop_remainder == false)
  for (int64_t i = end; i < start + ld->batch_size; ++i)
    std::memset(out + (i - start) * ld->sample_elems, 0,
                ld->sample_elems * sizeof(float));
}

void worker_loop(Loader *ld) {
  while (!ld->stop.load()) {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->cv_producer.wait(lk, [&] {
      return ld->stop.load() ||
             (ld->epoch_active.load() && ld->ring_filled < ld->ring.size() &&
              ld->produced < ld->n_batches);
    });
    if (ld->stop.load()) return;
    if (!ld->epoch_active.load() || ld->produced >= ld->n_batches) continue;
    size_t slot = ld->ring_tail;
    int64_t batch_idx = ld->produced++;
    ld->ring_tail = (ld->ring_tail + 1) % ld->ring.size();
    lk.unlock();

    assemble(ld, batch_idx, ld->ring[slot].data.data());

    lk.lock();
    ld->ring[slot].ready = true;
    ld->ring_filled++;
    lk.unlock();
    ld->cv_consumer.notify_one();
  }
}

} // namespace

extern "C" {

// Open a raw float32 dataset: n_samples rows of sample_elems floats starting
// at byte header_offset. Returns nullptr on failure.
void *rl_loader_create(const char *path, int64_t n_samples, int64_t sample_elems,
                       int64_t header_offset, int64_t batch_size,
                       int32_t n_prefetch, int32_t drop_remainder) {
  auto ld = new Loader();
  ld->fd = open(path, O_RDONLY);
  if (ld->fd < 0) { delete ld; return nullptr; }
  struct stat st;
  if (fstat(ld->fd, &st) != 0) { delete ld; return nullptr; }
  size_t need = header_offset + (size_t)n_samples * sample_elems * sizeof(float);
  if ((size_t)st.st_size < need) { delete ld; return nullptr; }
  ld->map_bytes = st.st_size;
  void *m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, ld->fd, 0);
  if (m == MAP_FAILED) { delete ld; return nullptr; }
  madvise(m, st.st_size, MADV_WILLNEED);
  ld->map_ptr = m;
  ld->base = reinterpret_cast<const float *>((const char *)m + header_offset);
  ld->header_offset = header_offset;
  ld->n_samples = n_samples;
  ld->sample_elems = sample_elems;
  ld->batch_size = batch_size;
  ld->drop_remainder = drop_remainder != 0;
  int np = n_prefetch < 1 ? 1 : n_prefetch;
  ld->ring.resize(np);
  for (auto &b : ld->ring) b.data.resize((size_t)batch_size * sample_elems);
  ld->worker = std::thread(worker_loop, ld);
  return ld;
}

// Begin an epoch: deterministic shuffle by seed (seed < 0 -> no shuffle).
// Returns the number of batches this epoch.
int64_t rl_loader_start_epoch(void *handle, int64_t seed) {
  auto ld = static_cast<Loader *>(handle);
  std::lock_guard<std::mutex> lk(ld->mu);
  ld->order.resize(ld->n_samples);
  for (int64_t i = 0; i < ld->n_samples; ++i) ld->order[i] = i;
  if (seed >= 0) {
    std::mt19937_64 rng(static_cast<uint64_t>(seed));
    for (int64_t i = ld->n_samples - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> dist(0, i);
      std::swap(ld->order[i], ld->order[dist(rng)]);
    }
  }
  ld->n_batches = ld->drop_remainder
                      ? ld->n_samples / ld->batch_size
                      : (ld->n_samples + ld->batch_size - 1) / ld->batch_size;
  ld->next_batch_idx = 0;
  ld->produced = 0;
  ld->ring_head = ld->ring_tail = 0;
  ld->ring_filled = 0;
  for (auto &b : ld->ring) b.ready = false;
  ld->epoch_active.store(true);
  ld->cv_producer.notify_all();
  return ld->n_batches;
}

// Copy the next ready batch into out [batch_size * sample_elems].
// Returns 1 on success, 0 at epoch end.
int32_t rl_loader_next(void *handle, float *out) {
  auto ld = static_cast<Loader *>(handle);
  std::unique_lock<std::mutex> lk(ld->mu);
  if (ld->next_batch_idx >= ld->n_batches) {
    ld->epoch_active.store(false);
    return 0;
  }
  size_t slot = ld->ring_head;
  ld->cv_consumer.wait(lk, [&] { return ld->stop.load() || ld->ring[slot].ready; });
  if (ld->stop.load()) return 0;
  // copy out BEFORE releasing the slot: releasing first would let a
  // (spuriously or stale-notify) woken producer claim this slot and
  // assemble the next batch into it while the memcpy is still reading
  lk.unlock();
  std::memcpy(out, ld->ring[slot].data.data(),
              (size_t)ld->batch_size * ld->sample_elems * sizeof(float));
  lk.lock();
  ld->ring[slot].ready = false;
  ld->ring_head = (ld->ring_head + 1) % ld->ring.size();
  ld->ring_filled--;
  ld->next_batch_idx++;
  lk.unlock();
  ld->cv_producer.notify_one();
  return 1;
}

int64_t rl_loader_n_batches(void *handle) {
  return static_cast<Loader *>(handle)->n_batches;
}

void rl_loader_destroy(void *handle) { delete static_cast<Loader *>(handle); }

} // extern "C"
