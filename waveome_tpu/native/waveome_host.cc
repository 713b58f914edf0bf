// waveome_host — native host-side runtime for the TPU framework.
//
// The reference's "runtime" is Ray worker processes + joblib pools
// (model_search.py:434-500, SURVEY.md §2.8): task scheduling, an object
// store, progress tracking and retries, all around per-outcome model fits.
// On TPU the fits themselves are one batched XLA program, so what remains
// for the host runtime is everything AROUND the device: loading big omics
// matrices, scheduling outcome chunks so host prep overlaps device compute,
// and streaming results to disk off the critical path. This library
// provides those pieces natively:
//
//   * a work-stealing-free fixed thread pool with a task queue
//     (wv_pool_*) used for parallel CSV parsing and background writes;
//   * a fast numeric CSV/TSV reader (wv_read_csv) — multithreaded row
//     parsing into a dense column-major double matrix;
//   * an asynchronous result sink (wv_sink_*): fit results are enqueued
//     as (name, bytes) and written by a background thread with an
//     atomically-updated manifest, so checkpointing never blocks the
//     device loop (the reference loses all in-flight work on a crash —
//     SURVEY.md §5.3);
//   * atomic progress counters (wv_counter_*) replacing tqdm_ray
//     (utilities.py:1287-1390).
//
// Exposed as a plain C ABI for ctypes binding (runtime.py).

#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int nthreads) : stop_(false) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    for (int i = 0; i < nthreads; ++i) {
      workers_.emplace_back([this] { Worker(); });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push_back(std::move(fn));
      pending_++;
    }
    cv_.notify_one();
  }

  void Wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

  int size() const { return (int)workers_.size(); }

 private:
  void Worker() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = std::move(queue_.front());
        queue_.pop_front();
      }
      task();
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::deque<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  long pending_ = 0;
  bool stop_;
};

// ---------------------------------------------------------------------------
// CSV reader
// ---------------------------------------------------------------------------

struct CsvResult {
  std::vector<double> data;  // row-major
  int64_t rows = 0;
  int64_t cols = 0;
  std::string header;  // comma-joined column names (may be empty)
  std::string error;
};

// Parse one chunk of lines [begin, end) into out (pre-sized).
void ParseRows(const char* buf, const std::vector<size_t>& line_starts,
               size_t row_begin, size_t row_end, int64_t cols, char sep,
               double* out, std::atomic<int>* bad) {
  for (size_t r = row_begin; r < row_end; ++r) {
    const char* p = buf + line_starts[r];
    double* dst = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      char* endp = nullptr;
      double v = strtod(p, &endp);
      if (endp == p) {
        // non-numeric field → NaN (caller decides policy)
        v = NAN;
        while (*endp && *endp != sep && *endp != '\n' && *endp != '\r')
          ++endp;
      }
      dst[c] = v;
      p = endp;
      if (*p == sep) ++p;
    }
  }
  (void)bad;
}

CsvResult ReadCsv(const char* path, int has_header, char sep, int nthreads) {
  CsvResult res;
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    res.error = "cannot open file";
    return res;
  }
  std::streamsize size = f.tellg();
  f.seekg(0);
  std::string buf;
  buf.resize((size_t)size);
  if (!f.read(&buf[0], size)) {
    res.error = "read failed";
    return res;
  }

  // index line starts
  std::vector<size_t> line_starts;
  line_starts.reserve((size_t)(size / 16) + 1);
  size_t pos = 0;
  while (pos < buf.size()) {
    line_starts.push_back(pos);
    size_t nl = buf.find('\n', pos);
    if (nl == std::string::npos) break;
    pos = nl + 1;
  }
  if (line_starts.empty()) {
    res.error = "empty file";
    return res;
  }

  size_t first_row = 0;
  if (has_header) {
    size_t hdr_end = buf.find('\n', line_starts[0]);
    res.header = buf.substr(
        line_starts[0],
        (hdr_end == std::string::npos ? buf.size() : hdr_end) -
            line_starts[0]);
    while (!res.header.empty() &&
           (res.header.back() == '\r' || res.header.back() == '\n'))
      res.header.pop_back();
    first_row = 1;
  }

  // drop trailing blank line
  while (line_starts.size() > first_row) {
    size_t ls = line_starts.back();
    size_t le = buf.find('\n', ls);
    size_t len = (le == std::string::npos ? buf.size() : le) - ls;
    bool blank = true;
    for (size_t i = 0; i < len; ++i) {
      if (!isspace((unsigned char)buf[ls + i])) {
        blank = false;
        break;
      }
    }
    if (blank)
      line_starts.pop_back();
    else
      break;
  }

  int64_t rows = (int64_t)(line_starts.size() - first_row);
  if (rows <= 0) {
    res.error = "no data rows";
    return res;
  }

  // count columns from the first data row
  {
    size_t ls = line_starts[first_row];
    size_t le = buf.find('\n', ls);
    if (le == std::string::npos) le = buf.size();
    int64_t cols = 1;
    for (size_t i = ls; i < le; ++i)
      if (buf[i] == sep) ++cols;
    res.cols = cols;
  }
  res.rows = rows;
  res.data.resize((size_t)(rows * res.cols));

  std::vector<size_t> data_starts(line_starts.begin() + first_row,
                                  line_starts.end());
  std::atomic<int> bad{0};
  if (nthreads <= 1 || rows < 4096) {
    ParseRows(buf.data(), data_starts, 0, (size_t)rows, res.cols, sep,
              res.data.data(), &bad);
  } else {
    ThreadPool pool(nthreads);
    size_t chunk = ((size_t)rows + pool.size() - 1) / pool.size();
    for (size_t start = 0; start < (size_t)rows; start += chunk) {
      size_t end = std::min(start + chunk, (size_t)rows);
      pool.Submit([&, start, end] {
        ParseRows(buf.data(), data_starts, start, end, res.cols, sep,
                  res.data.data(), &bad);
      });
    }
    pool.Wait();
  }
  return res;
}

// ---------------------------------------------------------------------------
// async result sink
// ---------------------------------------------------------------------------

class ResultSink {
 public:
  explicit ResultSink(const std::string& dir) : dir_(dir), stop_(false) {
    writer_ = std::thread([this] { WriterLoop(); });
  }

  ~ResultSink() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    writer_.join();
  }

  void Put(const std::string& name, const void* data, size_t len) {
    std::vector<char> copy((const char*)data, (const char*)data + len);
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.emplace_back(name, std::move(copy));
    }
    cv_.notify_one();
  }

  void Flush() {
    std::unique_lock<std::mutex> lk(mu_);
    flush_cv_.wait(lk, [this] { return queue_.empty() && !writing_; });
  }

  int64_t written() const { return written_.load(); }

 private:
  void WriterLoop() {
    for (;;) {
      std::pair<std::string, std::vector<char>> item;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        item = std::move(queue_.front());
        queue_.pop_front();
        writing_ = true;
      }
      WriteOne(item.first, item.second);
      {
        std::unique_lock<std::mutex> lk(mu_);
        writing_ = false;
        written_++;
        if (queue_.empty()) flush_cv_.notify_all();
      }
    }
  }

  void WriteOne(const std::string& name, const std::vector<char>& bytes) {
    // atomic write: tmp file + rename, then append to manifest
    std::string safe;
    for (char c : name)
      safe += (isalnum((unsigned char)c) || c == '-' || c == '_' ||
               c == '.')
                  ? c
                  : '_';
    std::string path = dir_ + "/" + safe + ".bin";
    std::string tmp = path + ".tmp";
    {
      std::ofstream out(tmp, std::ios::binary);
      out.write(bytes.data(), (std::streamsize)bytes.size());
    }
    rename(tmp.c_str(), path.c_str());
    {
      std::ofstream mf(dir_ + "/manifest.log", std::ios::app);
      mf << name << "\t" << safe << ".bin\t" << bytes.size() << "\n";
    }
  }

  std::string dir_;
  std::thread writer_;
  std::deque<std::pair<std::string, std::vector<char>>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable flush_cv_;
  std::atomic<int64_t> written_{0};
  bool writing_ = false;
  bool stop_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// --- thread pool ---
void* wv_pool_create(int nthreads) { return new ThreadPool(nthreads); }
void wv_pool_destroy(void* pool) { delete (ThreadPool*)pool; }
int wv_pool_size(void* pool) { return ((ThreadPool*)pool)->size(); }

// --- csv ---
struct WvCsv {
  CsvResult res;
};

void* wv_csv_read(const char* path, int has_header, char sep,
                  int nthreads) {
  auto* h = new WvCsv;
  h->res = ReadCsv(path, has_header, sep, nthreads);
  return h;
}
int64_t wv_csv_rows(void* h) { return ((WvCsv*)h)->res.rows; }
int64_t wv_csv_cols(void* h) { return ((WvCsv*)h)->res.cols; }
const double* wv_csv_data(void* h) { return ((WvCsv*)h)->res.data.data(); }
const char* wv_csv_header(void* h) {
  return ((WvCsv*)h)->res.header.c_str();
}
const char* wv_csv_error(void* h) { return ((WvCsv*)h)->res.error.c_str(); }
void wv_csv_free(void* h) { delete (WvCsv*)h; }

// --- result sink ---
void* wv_sink_create(const char* dir) { return new ResultSink(dir); }
void wv_sink_put(void* sink, const char* name, const void* data,
                 int64_t len) {
  ((ResultSink*)sink)->Put(name, data, (size_t)len);
}
void wv_sink_flush(void* sink) { ((ResultSink*)sink)->Flush(); }
int64_t wv_sink_written(void* sink) {
  return ((ResultSink*)sink)->written();
}
void wv_sink_destroy(void* sink) { delete (ResultSink*)sink; }

// --- progress counters ---
void* wv_counter_create() { return new std::atomic<int64_t>(0); }
void wv_counter_add(void* c, int64_t n) {
  ((std::atomic<int64_t>*)c)->fetch_add(n);
}
int64_t wv_counter_get(void* c) {
  return ((std::atomic<int64_t>*)c)->load();
}
void wv_counter_destroy(void* c) { delete (std::atomic<int64_t>*)c; }

}  // extern "C"
