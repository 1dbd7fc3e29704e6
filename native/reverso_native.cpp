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
#include <cstdlib>
#include <cstring>
#include <string_view>
#include <thread>
#include <unordered_map>
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
// Payload JSONL column scan
// ---------------------------------------------------------------------------
// One multithreaded pass over payloads.jsonl extracting the top-level
// values of selected keys per row — the native engine behind
// store/filter.py::PayloadColumns (the payload-index role of the
// reference's embedded qdrant, core_system.py:608-622). The Python
// path json-parses every full line; this walker touches each byte
// once and only materializes the requested keys.
//
// Per (row, key) output: a type tag in `types` plus either a number in
// `numbers` or a byte span (str_off/str_len into `buf`):
//   0 missing   1 null   2 false   3 true
//   4 int    -> numbers (always exact: |v| <= 2^53 here)
//   5 float  -> numbers
//   6 string, no escapes -> span excludes the quotes (raw UTF-8)
//   7 string with escapes -> span excludes the quotes (caller decodes)
//   8 object/array/big int -> raw token span (caller json-parses;
//     ints beyond +-2^53 route here so exact-match semantics survive)
// A line that fails to parse end-to-end commits NOTHING (every key
// stays missing) — the Python path's torn-line semantics.

namespace {

struct Span {
  int64_t off = 0, len = 0;
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end &&
         (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  return p;
}

// p at the opening quote; returns past the closing quote or nullptr.
const char* scan_string(const char* p, const char* end, const char* base,
                        Span* s, bool* esc) {
  ++p;
  const char* start = p;
  *esc = false;
  while (p < end) {
    if (*p == '\\') {
      *esc = true;
      p += 2;
      continue;
    }
    if (*p == '"') {
      s->off = start - base;
      s->len = p - start;
      return p + 1;
    }
    ++p;
  }
  return nullptr;
}

// Any JSON value; returns past it or nullptr. tag/num/span per header.
const char* scan_value(const char* p, const char* end, const char* base,
                       uint8_t* tag, double* num, Span* span) {
  p = skip_ws(p, end);
  if (p >= end) return nullptr;
  const char c = *p;
  if (c == '"') {
    bool esc;
    const char* q = scan_string(p, end, base, span, &esc);
    if (!q) return nullptr;
    *tag = esc ? 7 : 6;
    return q;
  }
  if (c == '{' || c == '[') {
    const char* start = p;
    int depth = 0;
    bool in_str = false;
    while (p < end) {
      const char d = *p;
      if (in_str) {
        if (d == '\\') {
          p += 2;
          continue;
        }
        if (d == '"') in_str = false;
      } else if (d == '"') {
        in_str = true;
      } else if (d == '{' || d == '[') {
        ++depth;
      } else if (d == '}' || d == ']') {
        if (--depth == 0) {
          ++p;
          *tag = 8;
          span->off = start - base;
          span->len = p - start;
          return p;
        }
      }
      ++p;
    }
    return nullptr;
  }
  if (c == 't')
    return (end - p >= 4 && !memcmp(p, "true", 4)) ? (*tag = 3, p + 4)
                                                   : nullptr;
  if (c == 'f')
    return (end - p >= 5 && !memcmp(p, "false", 5)) ? (*tag = 2, p + 5)
                                                    : nullptr;
  if (c == 'n')
    return (end - p >= 4 && !memcmp(p, "null", 4)) ? (*tag = 1, p + 4)
                                                   : nullptr;
  // Python's json emits/accepts the non-standard NaN/Infinity literals
  if (c == 'N')
    return (end - p >= 3 && !memcmp(p, "NaN", 3))
               ? (*tag = 5, *num = NAN, p + 3)
               : nullptr;
  if (c == 'I')
    return (end - p >= 8 && !memcmp(p, "Infinity", 8))
               ? (*tag = 5, *num = INFINITY, p + 8)
               : nullptr;
  // number: scan the token, validate with strtod on a bounded copy
  const char* start = p;
  bool is_float = false;
  if (*p == '-') ++p;
  if (p < end && *p == 'I')
    return (end - p >= 8 && !memcmp(p, "Infinity", 8))
               ? (*tag = 5, *num = -INFINITY, p + 8)
               : nullptr;
  while (p < end) {
    const char d = *p;
    if (d >= '0' && d <= '9') {
      ++p;
    } else if (d == '.' || d == 'e' || d == 'E') {
      is_float = true;
      ++p;
    } else if (d == '-' || d == '+') {
      ++p;  // exponent signs; strtod validates placement
    } else {
      break;
    }
  }
  const int64_t len = p - start;
  char tmp[64];
  if (len <= 0 || len >= (int64_t)sizeof(tmp)) return nullptr;
  memcpy(tmp, start, len);
  tmp[len] = 0;
  char* endp = nullptr;
  const double v = strtod(tmp, &endp);
  if (endp != tmp + len) return nullptr;
  if (!is_float && !(v > -9007199254740992.0 && v < 9007199254740992.0)) {
    // int at or beyond +-2^53: the double may have ROUNDED ONTO the
    // bound (2^53+1 -> 2^53 passes an inclusive check), so bounds are
    // strict and the exact token goes back as a span for the caller
    // to json-parse (tag 8 — json.loads of a bare number literal
    // yields the exact int; +-2^53 itself routes there harmlessly)
    *tag = 8;
    span->off = start - base;
    span->len = len;
    return p;
  }
  *tag = is_float ? 5 : 4;
  *num = v;
  return p;
}

// Parse one top-level JSON object line into per-key scratch slots.
// Returns true only when the whole object parses cleanly.
bool parse_line(const char* line, const char* end, const char* base,
                const char* const* keys, const int* key_lens, int n_keys,
                uint8_t* types, double* numbers, Span* spans) {
  const char* p = skip_ws(line, end);
  if (p >= end || *p != '{') return false;
  p = skip_ws(p + 1, end);
  if (p < end && *p == '}')  // {} — valid only if nothing trails it
    return skip_ws(p + 1, end) == end;
  for (;;) {
    p = skip_ws(p, end);
    if (p >= end || *p != '"') return false;
    Span kspan;
    bool kesc;
    p = scan_string(p, end, base, &kspan, &kesc);
    if (!p) return false;
    p = skip_ws(p, end);
    if (p >= end || *p != ':') return false;
    uint8_t tag = 0;
    double num = 0;
    Span vspan;
    p = scan_value(p + 1, end, base, &tag, &num, &vspan);
    if (!p) return false;
    if (!kesc) {  // payload keys are plain identifiers; escaped = no match
      for (int j = 0; j < n_keys; ++j) {
        if (key_lens[j] == (int)kspan.len &&
            !memcmp(base + kspan.off, keys[j], key_lens[j])) {
          types[j] = tag;  // duplicate key: last wins, like json.loads
          numbers[j] = num;
          spans[j] = vspan;
        }
      }
    }
    p = skip_ws(p, end);
    if (p >= end) return false;
    if (*p == '}') return skip_ws(p + 1, end) == end;  // no trailing junk
    if (*p != ',') return false;
    ++p;
  }
}

}  // namespace

// buf: the whole payloads.jsonl. offsets/ends: [rows] line byte ranges.
// Outputs are [rows, n_keys] row-major, caller-zeroed (0 = missing).
void reverso_payload_scan(const char* buf, int64_t buf_size,
                          const int64_t* offsets, const int64_t* ends,
                          int64_t rows, const char* const* keys,
                          const int* key_lens, int n_keys, uint8_t* types,
                          double* numbers, int64_t* str_off, int64_t* str_len,
                          int n_threads) {
  if (rows < 1 || n_keys < 1) return;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, n_threads);
  const int64_t kBlock = 4096;
  std::atomic<int64_t> next_block{0};
  auto worker = [&]() {
    std::vector<uint8_t> t(n_keys);
    std::vector<double> nm(n_keys);
    std::vector<Span> sp(n_keys);
    for (;;) {
      const int64_t lo = next_block.fetch_add(1) * kBlock;
      if (lo >= rows) break;
      const int64_t hi = std::min(rows, lo + kBlock);
      for (int64_t i = lo; i < hi; ++i) {
        const int64_t b = offsets[i];
        const int64_t e = std::min(ends[i], buf_size);
        if (b < 0 || b >= e) continue;
        std::fill(t.begin(), t.end(), (uint8_t)0);
        if (!parse_line(buf + b, buf + e, buf, keys, key_lens, n_keys,
                        t.data(), nm.data(), sp.data()))
          continue;  // malformed line -> all keys missing
        uint8_t* trow = types + i * n_keys;
        double* nrow = numbers + i * n_keys;
        int64_t* orow = str_off + i * n_keys;
        int64_t* lrow = str_len + i * n_keys;
        for (int j = 0; j < n_keys; ++j) {
          trow[j] = t[j];
          nrow[j] = nm[j];
          orow[j] = sp[j].off;
          lrow[j] = sp[j].len;
        }
      }
    }
  };
  const int workers =
      (int)std::min<int64_t>(n_threads, (rows + kBlock - 1) / kBlock);
  std::vector<std::thread> threads;
  for (int w = 1; w < workers; ++w) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

// Dictionary-encode byte spans (the string values a payload_scan pass
// produced for one key): rows with identical bytes share a dense code,
// first-occurrence order. The Python side then decodes each UNIQUE
// value once and gathers — O(unique) decodes instead of O(rows).
// codes[i] receives the span's code. Returns the number of unique
// values; uniq_off/uniq_len (caller-sized to `rows`) hold one
// representative span per code.
int64_t reverso_intern_spans(const char* buf, const int64_t* offs,
                             const int64_t* lens, int64_t rows,
                             int32_t* codes, int64_t* uniq_off,
                             int64_t* uniq_len) {
  std::unordered_map<std::string_view, int32_t> seen;
  seen.reserve(1024);
  int64_t n_uniq = 0;
  for (int64_t i = 0; i < rows; ++i) {
    const std::string_view sv(buf + offs[i], (size_t)lens[i]);
    auto it = seen.find(sv);
    if (it == seen.end()) {
      it = seen.emplace(sv, (int32_t)n_uniq).first;
      uniq_off[n_uniq] = offs[i];
      uniq_len[n_uniq] = lens[i];
      ++n_uniq;
    }
    codes[i] = it->second;
  }
  return n_uniq;
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

// ---------------------------------------------------------------------------
// Sparse inverted-index scoring (store/sparse.py hot loop).
//
// One query touches nseg postings segments (one per matched query
// term); each segment's rows are SORTED ascending (the build is a
// stable argsort by term with row order preserved). Threads partition
// the ROW space [0, n_rows): every thread binary-searches its row
// range inside each segment and accumulates only its own rows, so
// there are no write races, total work stays exactly E touched
// postings, and per-row accumulation order is segment order — bit-
// identical (f64 adds in the same order) to the single-thread and
// numpy reference paths.
void reverso_sparse_score(const int32_t* rows, const float* vals,
                          const int64_t* seg_lo, const int64_t* seg_hi,
                          const float* qv, int nseg, int64_t n_rows,
                          double* scores, uint8_t* touched,
                          int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, n_threads);
  // tiny queries: threading overhead dominates under ~64k postings
  int64_t total = 0;
  for (int s = 0; s < nseg; ++s) total += seg_hi[s] - seg_lo[s];
  if (total < 65536) n_threads = 1;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  auto worker = [&](int64_t r0, int64_t r1) {
    for (int s = 0; s < nseg; ++s) {
      const int32_t* b = rows + seg_lo[s];
      const int32_t* e = rows + seg_hi[s];
      const int32_t* lo = std::lower_bound(b, e, (int32_t)r0);
      const int32_t* hi = std::lower_bound(lo, e, (int32_t)r1);
      const float* v = vals + (lo - rows);
      const double q = (double)qv[s];
      for (const int32_t* p = lo; p != hi; ++p, ++v) {
        scores[*p] += (double)*v * q;
        touched[*p] = 1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) {
    int64_t r0 = t * chunk, r1 = std::min(n_rows, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(worker, r0, r1);
  }
  worker(0, std::min(n_rows, chunk));
  for (auto& th : threads) th.join();
}

}  // extern "C"
