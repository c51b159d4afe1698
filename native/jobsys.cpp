// Job system: work-stealing worker pool with dependency graphs and a
// grained parallel-for.
//
// TPU-native equivalent of the reference's fiber-less job system
// (reference: source/utils/job_system.h:239 `launch`, :256 `parallelFor`,
// parent counters + intrusive dependency chains; per-worker Chase-Lev
// deques, source/utils/work_stealing_queue.h:10). The reference feeds
// Vulkan from frame threads; here the pool drives the offline asset
// pipeline (batch Nanite builds, texture mips) and any host-side work the
// Python layer offloads through ctypes callbacks.
//
// Independent implementation: standard Chase-Lev deque (Chase & Lev,
// "Dynamic Circular Work-Stealing Deque", SPAA'05) with a fixed ring +
// global overflow queue; jobs carry a pending counter (own run +
// unfinished children) and a dependent list released when the counter
// retires — the same *contract* as the reference (children complete
// before the parent, dependents run after), different code.

#include <array>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace jobsys {

struct Job {
  void (*fn)(void*) = nullptr;
  void* user = nullptr;
  // own run + unfinished children; job retires when this hits 0
  std::atomic<int> pending{1};
  Job* parent = nullptr;
  // dependencies not yet retired; enqueued when this hits 0
  std::atomic<int> unsatisfied{0};
  std::mutex m;                    // guards finished + dependents
  std::vector<Job*> dependents;
  bool finished = false;
  bool enqueued = false;           // debug guard: enqueue exactly once
};

// ----------------------------------------------------------------------
// Chase-Lev work-stealing deque (owner: push/pop at bottom, thieves:
// steal at top). Fixed capacity; callers fall back to the global queue
// when full.
class WSDeque {
 public:
  static constexpr long kCap = 8192;  // power of two

  bool push(Job* j) {  // owner thread only
    long b = bottom_.load(std::memory_order_relaxed);
    long t = top_.load(std::memory_order_acquire);
    if (b - t >= kCap - 1) return false;
    buf_[b & (kCap - 1)].store(j, std::memory_order_relaxed);
    std::atomic_thread_fence(std::memory_order_release);
    bottom_.store(b + 1, std::memory_order_relaxed);
    return true;
  }

  Job* pop() {  // owner thread only (LIFO end)
    long b = bottom_.load(std::memory_order_relaxed) - 1;
    bottom_.store(b, std::memory_order_relaxed);
    std::atomic_thread_fence(std::memory_order_seq_cst);
    long t = top_.load(std::memory_order_relaxed);
    if (t > b) {  // empty
      bottom_.store(b + 1, std::memory_order_relaxed);
      return nullptr;
    }
    Job* j = buf_[b & (kCap - 1)].load(std::memory_order_relaxed);
    if (t == b) {  // last element: race the thieves for it
      if (!top_.compare_exchange_strong(t, t + 1,
                                        std::memory_order_seq_cst,
                                        std::memory_order_relaxed))
        j = nullptr;
      bottom_.store(b + 1, std::memory_order_relaxed);
    }
    return j;
  }

  Job* steal() {  // any thread (FIFO end)
    long t = top_.load(std::memory_order_acquire);
    std::atomic_thread_fence(std::memory_order_seq_cst);
    long b = bottom_.load(std::memory_order_acquire);
    if (t >= b) return nullptr;
    Job* j = buf_[t & (kCap - 1)].load(std::memory_order_relaxed);
    if (!top_.compare_exchange_strong(t, t + 1,
                                      std::memory_order_seq_cst,
                                      std::memory_order_relaxed))
      return nullptr;
    return j;
  }

 private:
  std::array<std::atomic<Job*>, kCap> buf_{};
  std::atomic<long> top_{0}, bottom_{0};
};

// ----------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int workers) {
    if (workers <= 0) workers = (int)std::thread::hardware_concurrency();
    n_workers_ = std::max(workers, 1);
    deques_.resize(n_workers_);
    for (int i = 0; i < n_workers_; ++i)
      deques_[i] = std::make_unique<WSDeque>();
    for (int i = 0; i < n_workers_; ++i)
      threads_.emplace_back([this, i] { run(i); });
  }

  ~Pool() {
    stop_.store(true);
    {
      std::lock_guard<std::mutex> lk(sleep_m_);
      sleep_cv_.notify_all();
    }
    for (auto& t : threads_) t.join();
  }

  int workers() const { return n_workers_; }

  Job* create(void (*fn)(void*), void* user, Job* parent,
              Job* const* deps, int n_deps) {
    Job* j;
    {
      std::lock_guard<std::mutex> lk(reg_m_);
      registry_.push_back(std::make_unique<Job>());
      j = registry_.back().get();
    }
    j->fn = fn;
    j->user = user;
    j->parent = parent;
    if (parent) parent->pending.fetch_add(1, std::memory_order_relaxed);
    live_.fetch_add(1, std::memory_order_relaxed);
    // register against unfinished deps; finished deps count for nothing
    int waits = 0;
    for (int k = 0; k < n_deps; ++k) {
      Job* d = deps[k];
      std::lock_guard<std::mutex> lk(d->m);
      if (!d->finished) {
        d->dependents.push_back(j);
        ++waits;
      }
    }
    // +1 sentinel stops a dep retiring mid-registration from enqueueing
    // j before all deps are registered
    j->unsatisfied.store(waits + 1, std::memory_order_release);
    if (j->unsatisfied.fetch_sub(1, std::memory_order_acq_rel) == 1)
      enqueue(j);
    return j;
  }

  void enqueue(Job* j) {
    if (worker_index_ >= 0 && deques_[worker_index_]->push(j)) {
      // woken thieves can steal it
    } else {
      std::lock_guard<std::mutex> lk(global_m_);
      global_.push_back(j);
    }
    std::lock_guard<std::mutex> lk(sleep_m_);
    sleep_cv_.notify_one();
  }

  void wait(Job* j) {
    // external threads block; worker threads help-execute to avoid
    // deadlocking the pool when a job waits on another job
    if (worker_index_ >= 0) {
      while (!is_finished(j)) {
        if (!work_once()) std::this_thread::yield();
      }
      return;
    }
    std::unique_lock<std::mutex> lk(done_m_);
    done_cv_.wait(lk, [&] { return is_finished(j); });
  }

  void drain() {
    if (worker_index_ >= 0) {
      while (live_.load(std::memory_order_acquire) > 0)
        if (!work_once()) std::this_thread::yield();
    } else {
      std::unique_lock<std::mutex> lk(done_m_);
      done_cv_.wait(lk, [&] {
        return live_.load(std::memory_order_acquire) == 0;
      });
    }
    std::lock_guard<std::mutex> lk(reg_m_);
    registry_.clear();
  }

  static bool is_finished(Job* j) {
    std::lock_guard<std::mutex> lk(j->m);
    return j->finished;
  }

  static thread_local int worker_index_;

 private:
  // run one available job; false if none found anywhere
  bool work_once() {
    Job* j = nullptr;
    if (worker_index_ >= 0) j = deques_[worker_index_]->pop();
    if (!j) {
      std::lock_guard<std::mutex> lk(global_m_);
      if (!global_.empty()) {
        j = global_.front();
        global_.pop_front();
      }
    }
    if (!j) {
      // steal sweep from a random start
      int start = (int)(rng_() % (unsigned)n_workers_);
      for (int k = 0; k < n_workers_ && !j; ++k)
        j = deques_[(start + k) % n_workers_]->steal();
    }
    if (!j) return false;
    execute(j);
    return true;
  }

  void execute(Job* j) {
    if (j->fn) j->fn(j->user);
    if (j->pending.fetch_sub(1, std::memory_order_acq_rel) == 1) retire(j);
  }

  void retire(Job* j) {
    std::vector<Job*> deps;
    {
      std::lock_guard<std::mutex> lk(j->m);
      j->finished = true;
      deps.swap(j->dependents);
    }
    for (Job* d : deps)
      if (d->unsatisfied.fetch_sub(1, std::memory_order_acq_rel) == 1)
        enqueue(d);
    Job* p = j->parent;
    if (p && p->pending.fetch_sub(1, std::memory_order_acq_rel) == 1)
      retire(p);
    live_.fetch_sub(1, std::memory_order_acq_rel);
    std::lock_guard<std::mutex> lk(done_m_);
    done_cv_.notify_all();
  }

  void run(int index) {
    worker_index_ = index;
    int idle = 0;
    while (!stop_.load(std::memory_order_acquire)) {
      if (work_once()) {
        idle = 0;
        continue;
      }
      if (++idle < 64) {
        std::this_thread::yield();
        continue;
      }
      std::unique_lock<std::mutex> lk(sleep_m_);
      sleep_cv_.wait_for(lk, std::chrono::milliseconds(1));
    }
  }

  int n_workers_ = 0;
  std::vector<std::thread> threads_;
  std::vector<std::unique_ptr<WSDeque>> deques_;
  std::deque<Job*> global_;
  std::mutex global_m_;
  std::mutex sleep_m_, done_m_;
  std::condition_variable sleep_cv_, done_cv_;
  std::atomic<bool> stop_{false};
  std::atomic<long> live_{0};
  std::mutex reg_m_;
  std::vector<std::unique_ptr<Job>> registry_;
  static thread_local std::mt19937 rng_;
};

thread_local int Pool::worker_index_ = -1;
thread_local std::mt19937 Pool::rng_{std::random_device{}()};

Pool& pool() {
  static Pool p(0);
  return p;
}

}  // namespace jobsys

// ----------------------------------------------------------------------
// C ABI (ctypes). Job handles are raw pointers packed in int64.

extern "C" {

typedef void (*chord_job_fn)(void* user);

int chord_job_workers() { return jobsys::pool().workers(); }

// Launch a job after `deps` (ids) retire; 0 deps => runs immediately.
// Returns an opaque handle valid until chord_jobs_drain().
int64_t chord_job_launch(chord_job_fn fn, void* user,
                         const int64_t* deps, int n_deps) {
  std::vector<jobsys::Job*> d(std::max(n_deps, 0));
  for (int i = 0; i < n_deps; ++i) d[i] = (jobsys::Job*)deps[i];
  return (int64_t)jobsys::pool().create(fn, user, nullptr,
                                        d.data(), n_deps);
}

// Launch a child under `parent`: the parent's wait also covers the child
// (reference job_system.h parent counters). Call from the parent's fn
// or before waiting on it.
int64_t chord_job_launch_child(int64_t parent, chord_job_fn fn,
                               void* user) {
  return (int64_t)jobsys::pool().create(fn, user, (jobsys::Job*)parent,
                                        nullptr, 0);
}

void chord_job_wait(int64_t job) {
  jobsys::pool().wait((jobsys::Job*)job);
}

int chord_job_finished(int64_t job) {
  return jobsys::Pool::is_finished((jobsys::Job*)job) ? 1 : 0;
}

// Wait for ALL outstanding jobs, then free the job registry (handles
// become invalid).
void chord_jobs_drain() { jobsys::pool().drain(); }

// Generic parallel-for: fn(i, user) for i in [0, n). Kept for the Nanite
// batch driver; atomic index share-out over the pool.
typedef void (*chord_for_fn)(int i, void* user);
void chord_parallel_for(int n, chord_for_fn fn, void* user) {
  if (n <= 0) return;
  struct Ctx {
    std::atomic<int> next{0};
    int n;
    chord_for_fn fn;
    void* user;
  } ctx;
  ctx.n = n;
  ctx.fn = fn;
  ctx.user = user;
  auto body = +[](void* u) {
    Ctx* c = (Ctx*)u;
    for (;;) {
      int i = c->next.fetch_add(1, std::memory_order_relaxed);
      if (i >= c->n) return;
      c->fn(i, c->user);
    }
  };
  int lanes = std::min(jobsys::pool().workers(), n);
  std::vector<int64_t> jobs(lanes);
  for (int w = 0; w < lanes; ++w)
    jobs[w] = chord_job_launch(body, &ctx, nullptr, 0);
  for (int w = 0; w < lanes; ++w) chord_job_wait(jobs[w]);
}

// Grained parallel-for: fn(start, end, user) over [0, n) in chunks of
// `grain` (reference job_system.h:256 parallelFor semantics).
typedef void (*chord_range_fn)(long start, long end, void* user);
void chord_parallel_for_grain(long n, long grain, chord_range_fn fn,
                              void* user) {
  if (n <= 0) return;
  if (grain <= 0) grain = 1;
  struct Ctx {
    std::atomic<long> next{0};
    long n, grain;
    chord_range_fn fn;
    void* user;
  } ctx;
  ctx.n = n;
  ctx.grain = grain;
  ctx.fn = fn;
  ctx.user = user;
  auto body = +[](void* u) {
    Ctx* c = (Ctx*)u;
    for (;;) {
      long s = c->next.fetch_add(c->grain, std::memory_order_relaxed);
      if (s >= c->n) return;
      c->fn(s, std::min(s + c->grain, c->n), c->user);
    }
  };
  long chunks = (n + grain - 1) / grain;
  int lanes = (int)std::min<long>(jobsys::pool().workers(), chunks);
  std::vector<int64_t> jobs(lanes);
  for (int w = 0; w < lanes; ++w)
    jobs[w] = chord_job_launch(body, &ctx, nullptr, 0);
  for (int w = 0; w < lanes; ++w) chord_job_wait(jobs[w]);
}

}  // extern "C"
