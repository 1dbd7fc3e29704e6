// Native host-side runtime for reverso-tpu.
//
// The reference's retrieval fallback is qdrant-client's embedded local
// mode: a pure-Python/numpy brute-force scan (SURVEY.md §2.2 Qdrant row).
// This library is its C++ replacement for hosts without an accelerator
// and for the ingest/serving data path:
//
//   * exact cosine top-k scan, multithreaded, blocked for cache reuse;
//   * memory-mapped vector file access (zero-copy reads of the
//     append-only vectors.bin store files);
//   * float32 -> bfloat16 conversion for device upload staging.
//
// Built as a plain shared library (no Python headers); bound via ctypes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Exact cosine top-k (scores = dot products; inputs pre-normalized)
// ---------------------------------------------------------------------------

struct HeapEntry {
  float score;
  int64_t idx;
};

// Comparator for std::push_heap/pop_heap: "a ranks ABOVE b". The STL
// builds a max-heap under its comparator, so with rank-order as "less"
// the FRONT is the minimum-ranked entry — the eviction candidate — which
// is exactly what a running top-k needs. Rank: higher score wins; equal
// score -> lower idx wins (the framework's (-score, idx) tie order).
static inline bool rank_above(const HeapEntry& a, const HeapEntry& b) {
  if (a.score != b.score) return a.score > b.score;
  return a.idx < b.idx;
}

static void topk_range(const float* db, int64_t n0, int64_t n1, int d,
                       const float* query, int k, HeapEntry* heap,
                       int* heap_size) {
  int hs = *heap_size;
  for (int64_t i = n0; i < n1; ++i) {
    const float* row = db + i * d;
    float s = 0.f;
    int j = 0;
    // 4-wide unrolled dot product (autovectorizes under -O3)
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    for (; j + 4 <= d; j += 4) {
      s0 += row[j] * query[j];
      s1 += row[j + 1] * query[j + 1];
      s2 += row[j + 2] * query[j + 2];
      s3 += row[j + 3] * query[j + 3];
    }
    for (; j < d; ++j) s0 += row[j] * query[j];
    s = (s0 + s1) + (s2 + s3);

    HeapEntry e{s, i};
    if (hs < k) {
      heap[hs++] = e;
      std::push_heap(heap, heap + hs, rank_above);
    } else if (rank_above(e, heap[0])) {
      std::pop_heap(heap, heap + hs, rank_above);
      heap[hs - 1] = e;
      std::push_heap(heap, heap + hs, rank_above);
    }
  }
  *heap_size = hs;
}

// db [n, d] fp32 (L2-normalized), queries [q, d] fp32.
// out_scores [q, k] fp32, out_idx [q, k] int64 (-1 padding when k > n).
// Deterministic: results ordered by (-score, idx). Work is a
// (query, row-range) grid: small query counts — q=1 is the primary
// host-search shape — still use every core by splitting the row range,
// with a per-query merge of the per-range sorted top-k lists. Per-row
// dot products are computed identically regardless of the split, so
// the output is bit-identical to the single-thread scan.
void reverso_topk_f32(const float* db, int64_t n, int d, const float* queries,
                      int q, int k, float* out_scores, int64_t* out_idx,
                      int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, n_threads);
  if (q < 1 || k < 1) return;

  int splits = std::max(1, n_threads / q);
  const int64_t kMinRows = 32768;  // amortize the merge
  while (splits > 1 && n / splits < kMinRows) --splits;
  const int64_t chunk = (n + splits - 1) / splits;
  const int total = q * splits;

  std::vector<HeapEntry> partial((size_t)total * k);
  std::vector<int> sizes(total, 0);
  std::atomic<int> next_task{0};
  auto worker = [&]() {
    for (;;) {
      int t = next_task.fetch_add(1);
      if (t >= total) break;
      const int qi = t / splits, si = t % splits;
      const int64_t lo = (int64_t)si * chunk;
      const int64_t hi = std::min(n, lo + chunk);
      HeapEntry* heap = partial.data() + (size_t)t * k;
      int hs = 0;
      topk_range(db, lo, hi, d, queries + (int64_t)qi * d, k, heap, &hs);
      // sort_heap under rank_above yields best-first directly
      std::sort_heap(heap, heap + hs, rank_above);
      sizes[t] = hs;
    }
  };

  const int workers = std::min(n_threads, total);
  std::vector<std::thread> threads;
  for (int t = 1; t < workers; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();

  std::vector<HeapEntry> merged;
  for (int qi = 0; qi < q; ++qi) {
    merged.clear();
    for (int si = 0; si < splits; ++si) {
      const int t = qi * splits + si;
      const HeapEntry* p = partial.data() + (size_t)t * k;
      merged.insert(merged.end(), p, p + sizes[t]);
    }
    std::sort(merged.begin(), merged.end(), rank_above);
    const int hs = (int)std::min<size_t>(merged.size(), (size_t)k);
    for (int j = 0; j < k; ++j) {
      if (j < hs) {
        out_scores[(int64_t)qi * k + j] = merged[j].score;
        out_idx[(int64_t)qi * k + j] = merged[j].idx;
      } else {
        out_scores[(int64_t)qi * k + j] = -INFINITY;
        out_idx[(int64_t)qi * k + j] = -1;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Memory-mapped vector file access
// ---------------------------------------------------------------------------

struct MappedFile {
  void* addr;
  int64_t size;
  int fd;
};

// Returns an opaque handle (or null). rows = size / (4 * dim).
void* reverso_mmap_open(const char* path, int64_t* out_size) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* addr = nullptr;
  if (st.st_size > 0) {
    addr = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
    if (addr == MAP_FAILED) {
      close(fd);
      return nullptr;
    }
    madvise(addr, st.st_size, MADV_SEQUENTIAL);
  }
  auto* mf = new MappedFile{addr, (int64_t)st.st_size, fd};
  if (out_size) *out_size = mf->size;
  return mf;
}

const float* reverso_mmap_data(void* handle) {
  auto* mf = (MappedFile*)handle;
  return (const float*)mf->addr;
}

void reverso_mmap_close(void* handle) {
  auto* mf = (MappedFile*)handle;
  if (mf->addr && mf->size > 0) munmap(mf->addr, mf->size);
  close(mf->fd);
  delete mf;
}

// ---------------------------------------------------------------------------
// fp32 -> bf16 staging (round-to-nearest-even), multithreaded
// ---------------------------------------------------------------------------

void reverso_f32_to_bf16(const float* src, uint16_t* dst, int64_t count,
                         int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, n_threads);
  int64_t chunk = (count + n_threads - 1) / n_threads;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t bits;
      std::memcpy(&bits, &src[i], 4);
      // NaN first: the rounding carry would overflow a small mantissa
      // payload into the exponent, turning NaN into +/-Inf.
      if ((bits & 0x7f800000u) == 0x7f800000u && (bits & 0x7fffffu)) {
        dst[i] = (uint16_t)((bits >> 16) | 0x0040u);  // quiet NaN
        continue;
      }
      uint32_t lsb = (bits >> 16) & 1;
      bits += 0x7fffu + lsb;  // round to nearest even
      dst[i] = (uint16_t)(bits >> 16);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(count, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
