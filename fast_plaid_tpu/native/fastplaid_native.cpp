// fastplaid_native — host-side native kernels (C ABI, loaded via ctypes).
//
// The TPU framework's device math lives in XLA/Pallas; this library owns the
// host-side data-plane work the reference implements in Rust:
//   * IVF construction: dedup of (cell, pid) pairs + CSR assembly
//     (reference: rust/index/create.rs:55-132 optimize_ivf + sort/bincount)
//   * jagged token-window row gather for the low_memory streaming path
//     (reference: rust/search/tensor.rs:299-355 StridedTensor::lookup on CPU)
//
// Build: see build.py (g++ -O3 -shared -fPIC -std=c++17 -pthread).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// IVF construction.
//
// codes:        [total_tokens] int32 centroid id per token (document order)
// doc_lengths:  [n_docs] int64 tokens per document
// Returns the number of (cell, pid) unique pairs written. Two-call protocol:
// first call with ivf_out == nullptr to get the size, then allocate and call
// again (the dedup work is repeated; still far cheaper than Python).
// ivf_out:          [n_pairs] int32 pids grouped by cell, pid-ascending
// ivf_lengths_out:  [n_partitions] int64
// ---------------------------------------------------------------------------
int64_t fp_build_ivf(const int32_t* codes, int64_t total_tokens,
                     const int64_t* doc_lengths, int64_t n_docs,
                     int64_t n_partitions, int32_t* ivf_out,
                     int64_t* ivf_lengths_out) {
  std::vector<uint64_t> keys(static_cast<size_t>(total_tokens));
  // key = cell * n_docs + pid  (fits: cells < 2^24, docs < 2^32)
  {
    int64_t t = 0;
    for (int64_t pid = 0; pid < n_docs; ++pid) {
      const int64_t len = doc_lengths[pid];
      for (int64_t i = 0; i < len; ++i, ++t) {
        keys[static_cast<size_t>(t)] =
            static_cast<uint64_t>(codes[t]) * static_cast<uint64_t>(n_docs) +
            static_cast<uint64_t>(pid);
      }
    }
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  const int64_t n_pairs = static_cast<int64_t>(keys.size());
  if (ivf_out == nullptr) return n_pairs;

  std::memset(ivf_lengths_out, 0,
              sizeof(int64_t) * static_cast<size_t>(n_partitions));
  for (int64_t i = 0; i < n_pairs; ++i) {
    const uint64_t key = keys[static_cast<size_t>(i)];
    const int64_t cell = static_cast<int64_t>(key / n_docs);
    ivf_out[i] = static_cast<int32_t>(key % n_docs);
    if (cell >= 0 && cell < n_partitions) ivf_lengths_out[cell] += 1;
  }
  return n_pairs;
}

// ---------------------------------------------------------------------------
// Jagged row gather (multi-threaded memcpy).
//
// For each of n_windows documents, copy doc_cap rows of row_bytes each from
// src (clamped to [0, n_rows)), zero-filling rows past the doc's length.
// indices: [n_windows] int64 start row per window
// lengths: [n_windows] int32 valid rows per window
// out:     [n_windows * doc_cap * row_bytes] bytes
// ---------------------------------------------------------------------------
void fp_gather_windows_u8(const uint8_t* src, int64_t n_rows,
                          int64_t row_bytes, const int64_t* indices,
                          const int32_t* lengths, int64_t n_windows,
                          int64_t doc_cap, uint8_t* out) {
  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  const int n_threads = std::max(1, std::min(hw, 16));
  std::atomic<int64_t> next{0};
  const int64_t block = std::max<int64_t>(1, n_windows / (n_threads * 8));

  auto worker = [&]() {
    for (;;) {
      const int64_t start = next.fetch_add(block);
      if (start >= n_windows) break;
      const int64_t end = std::min(start + block, n_windows);
      for (int64_t w = start; w < end; ++w) {
        const int64_t base = std::min(std::max<int64_t>(indices[w], 0),
                                      std::max<int64_t>(n_rows - 1, 0));
        const int64_t valid =
            std::min<int64_t>(std::max<int32_t>(lengths[w], 0), doc_cap);
        const int64_t avail = std::min<int64_t>(valid, n_rows - base);
        uint8_t* dst = out + w * doc_cap * row_bytes;
        if (avail > 0) {
          std::memcpy(dst, src + base * row_bytes,
                      static_cast<size_t>(avail * row_bytes));
        }
        if (avail < doc_cap) {
          std::memset(dst + avail * row_bytes, 0,
                      static_cast<size_t>((doc_cap - avail) * row_bytes));
        }
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int i = 0; i < n_threads; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
