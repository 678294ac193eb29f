// fastio: native data-loading runtime for nicer_slam_tpu.
//
// The reference's data layer decompresses lzma-wrapped .npy cue files and
// decodes images on the Python main thread per frame
// (code/datasets/scene_dataset.py:141-212) — at Replica scale (2000 frames
// x ~8 MB of xz per frame) that is the host-side bottleneck feeding the
// TPU. This library provides:
//   * multi-threaded xz (lzma) stream decoding into caller buffers
//   * a prefetch pool: enqueue frame paths, collect decoded buffers later
// exposed through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC fastio.cpp -llzma).

#include <lzma.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// xz decode
// ---------------------------------------------------------------------------

// Decode a complete .xz stream from `in` into `out` (capacity out_cap).
// Returns decoded size, or -1 on error / overflow.
int64_t xz_decode(const uint8_t* in, size_t in_len, uint8_t* out,
                  size_t out_cap) {
  lzma_stream strm = LZMA_STREAM_INIT;
  if (lzma_stream_decoder(&strm, UINT64_MAX, LZMA_CONCATENATED) != LZMA_OK)
    return -1;
  strm.next_in = in;
  strm.avail_in = in_len;
  strm.next_out = out;
  strm.avail_out = out_cap;
  lzma_ret ret;
  do {
    ret = lzma_code(&strm, LZMA_FINISH);
    if (ret != LZMA_OK && ret != LZMA_STREAM_END) {
      lzma_end(&strm);
      return -1;
    }
  } while (ret != LZMA_STREAM_END && strm.avail_out > 0);
  int64_t produced = static_cast<int64_t>(out_cap - strm.avail_out);
  bool done = (ret == LZMA_STREAM_END);
  lzma_end(&strm);
  return done ? produced : -1;
}

bool read_file(const std::string& path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(static_cast<size_t>(n));
  size_t got = fread(buf->data(), 1, buf->size(), f);
  fclose(f);
  return got == buf->size();
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push_back(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop_front();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_;
};

struct Job {
  std::vector<uint8_t> data;  // decoded bytes (npy payload incl. header)
  int64_t size = -2;          // -2 pending, -1 error, >=0 done
};

struct Prefetcher {
  Pool pool;
  std::mutex mu;
  std::condition_variable cv;
  std::unordered_map<int64_t, Job> jobs;
  std::atomic<int64_t> next_id{0};
  explicit Prefetcher(int threads) : pool(threads) {}
};

}  // namespace

extern "C" {

// One-shot synchronous decode: path -> caller buffer. Returns decoded size
// or -1. If the file is not xz (magic mismatch), copies raw bytes instead —
// mirroring the reference's lzma-or-raw fallback (scene_dataset.py:149-153).
int64_t fastio_decode_file(const char* path, uint8_t* out, int64_t out_cap) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  static const uint8_t kXzMagic[6] = {0xFD, '7', 'z', 'X', 'Z', 0x00};
  if (raw.size() >= 6 && memcmp(raw.data(), kXzMagic, 6) == 0)
    return xz_decode(raw.data(), raw.size(),
                     out, static_cast<size_t>(out_cap));
  if (static_cast<int64_t>(raw.size()) > out_cap) return -1;
  memcpy(out, raw.data(), raw.size());
  return static_cast<int64_t>(raw.size());
}

void* fastio_pool_create(int threads) { return new Prefetcher(threads); }

void fastio_pool_destroy(void* pool) {
  delete static_cast<Prefetcher*>(pool);
}

// Enqueue an async decode; returns a job id.
int64_t fastio_pool_submit(void* pool, const char* path) {
  auto* p = static_cast<Prefetcher*>(pool);
  int64_t id = p->next_id++;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs[id];  // create pending entry
  }
  std::string path_s(path);
  p->pool.Submit([p, id, path_s] {
    std::vector<uint8_t> raw;
    Job result;
    if (read_file(path_s, &raw)) {
      static const uint8_t kXzMagic[6] = {0xFD, '7', 'z', 'X', 'Z', 0x00};
      if (raw.size() >= 6 && memcmp(raw.data(), kXzMagic, 6) == 0) {
        // grow until it fits (xz streams don't always carry sizes)
        size_t cap = raw.size() * 8 + (1 << 20);
        for (int attempt = 0; attempt < 6; ++attempt, cap *= 4) {
          result.data.resize(cap);
          int64_t n = xz_decode(raw.data(), raw.size(), result.data.data(), cap);
          if (n >= 0 && static_cast<size_t>(n) < cap) {
            result.data.resize(static_cast<size_t>(n));
            result.size = n;
            break;
          }
          result.size = -1;
        }
      } else {
        result.data = std::move(raw);
        result.size = static_cast<int64_t>(result.data.size());
      }
    } else {
      result.size = -1;
    }
    {
      std::lock_guard<std::mutex> lk(p->mu);
      p->jobs[id] = std::move(result);
    }
    p->cv.notify_all();
  });
  return id;
}

// Blocking: wait for a job, copy into out (if it fits), erase it.
// Returns decoded size, or -1 on error / insufficient capacity.
int64_t fastio_pool_collect(void* pool, int64_t id, uint8_t* out,
                            int64_t out_cap) {
  auto* p = static_cast<Prefetcher*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv.wait(lk, [p, id] {
    auto it = p->jobs.find(id);
    return it != p->jobs.end() && it->second.size != -2;
  });
  Job job = std::move(p->jobs[id]);
  p->jobs.erase(id);
  lk.unlock();
  if (job.size < 0 || job.size > out_cap) return -1;
  memcpy(out, job.data.data(), static_cast<size_t>(job.size));
  return job.size;
}

// Non-blocking size query: -2 pending, -1 error, >=0 ready.
int64_t fastio_pool_peek(void* pool, int64_t id) {
  auto* p = static_cast<Prefetcher*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  auto it = p->jobs.find(id);
  if (it == p->jobs.end()) return -1;
  return it->second.size;
}

}  // extern "C"
