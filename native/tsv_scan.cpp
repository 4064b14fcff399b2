// Native line/field scanner for tab-separated text formats (VCF, GFF,
// BED, SAM): one threaded pass finds line boundaries and the first K
// delimiter positions of each line, replacing the numpy flatnonzero +
// searchsorted + bincount cascade in textutil.split_fields. Also a
// native decimal-int field parser (textutil.parse_int_fields analog).
//
// Role analog in the reference: the per-record noodles text parsers
// (e.g. noodles-vcf record parsing behind exon-vcf's LazyVCFArrayBuilder,
// exon-vcf/src/array_builder/lazy_array_builder.rs:39-116).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// First line start at or after `from` (0 is a line start; otherwise the
// byte after a newline).
int64_t next_line_start(const uint8_t *data, int64_t n, int64_t from) {
  if (from <= 0) return 0;
  const void *p = memchr(data + from - 1, '\n', (size_t)(n - from + 1));
  if (!p) return n;
  return (const uint8_t *)p - data + 1;
}

struct Region {
  int64_t lo, hi;  // line starts in [lo, hi)
  int64_t count;   // lines kept (non-empty, non-comment)
};

// Count kept lines whose start is in [lo, hi).
int64_t count_lines(const uint8_t *data, int64_t n, int64_t lo, int64_t hi,
                    uint8_t comment, int32_t keep_empty) {
  int64_t count = 0, pos = lo;
  while (pos < hi) {
    const void *p = memchr(data + pos, '\n', (size_t)(n - pos));
    int64_t end = p ? (const uint8_t *)p - data : n;
    int64_t e = end;
    if (e > pos && data[e - 1] == '\r') e--;
    if ((keep_empty || e > pos) &&
        (comment == 0 || e == pos || data[pos] != comment))
      count++;
    pos = end + 1;
  }
  return count;
}

void fill_lines(const uint8_t *data, int64_t n, int64_t lo, int64_t hi,
                uint8_t comment, uint8_t delim, int32_t n_delims,
                int32_t keep_empty, int64_t *line_start, int64_t *line_end,
                int64_t *dpos, int64_t out_base) {
  int64_t i = out_base, pos = lo;
  while (pos < hi) {
    const void *p = memchr(data + pos, '\n', (size_t)(n - pos));
    int64_t end = p ? (const uint8_t *)p - data : n;
    int64_t e = end;
    if (e > pos && data[e - 1] == '\r') e--;
    if ((keep_empty || e > pos) &&
        (comment == 0 || e == pos || data[pos] != comment)) {
      line_start[i] = pos;
      line_end[i] = e;
      if (n_delims > 0) {
        int64_t *dp = dpos + i * n_delims;
        int64_t q = pos;
        int32_t k = 0;
        while (k < n_delims) {
          const void *d = memchr(data + q, delim, (size_t)(e - q));
          if (!d) break;
          dp[k++] = (const uint8_t *)d - data;
          q = (const uint8_t *)d - data + 1;
        }
        for (; k < n_delims; k++) dp[k] = -1;
      }
      i++;
    }
    pos = end + 1;
  }
}

}  // namespace

extern "C" {

// Scan [start, n): line boundaries (CR-stripped, empty and
// comment-prefixed lines skipped) + first n_delims delimiter positions
// per line (-1 padded). Returns total kept lines; caller re-calls with a
// larger table if it exceeds max_lines.
int64_t exon_tsv_scan(const uint8_t *data, int64_t n, int64_t start,
                      uint8_t comment, uint8_t delim, int32_t n_delims,
                      int32_t keep_empty, int64_t *line_start,
                      int64_t *line_end, int64_t *dpos, int64_t max_lines,
                      int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if ((n - start) < (4 << 20)) nt = 1;
  std::vector<int64_t> bounds(nt + 1);
  bounds[0] = next_line_start(data, n, start);
  for (int t = 1; t < nt; t++)
    bounds[t] = next_line_start(data, n,
                                start + (n - start) * t / nt);
  bounds[nt] = n;
  for (int t = 1; t < nt; t++)
    if (bounds[t] < bounds[t - 1]) bounds[t] = bounds[t - 1];

  std::vector<int64_t> counts(nt, 0);
  auto count_worker = [&](int t) {
    counts[t] = count_lines(data, n, bounds[t], bounds[t + 1], comment,
                            keep_empty);
  };
  if (nt == 1) {
    count_worker(0);
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; t++) ts.emplace_back(count_worker, t);
    for (auto &t : ts) t.join();
  }
  int64_t total = 0;
  std::vector<int64_t> base(nt);
  for (int t = 0; t < nt; t++) {
    base[t] = total;
    total += counts[t];
  }
  if (total > max_lines) return total;

  auto fill_worker = [&](int t) {
    fill_lines(data, n, bounds[t], bounds[t + 1], comment, delim, n_delims,
               keep_empty, line_start, line_end, dpos, base[t]);
  };
  if (nt == 1) {
    fill_worker(0);
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; t++) ts.emplace_back(fill_worker, t);
    for (auto &t : ts) t.join();
  }
  return total;
}

// Count SDF records: lines that are exactly "$$$$" (CR-stripped)
// terminate a record (exon-sdf/src/io.rs:34-46 ends_with "$$$$\n");
// trailing non-blank lines after the last terminator form one more.
// Threaded; thread boundaries snap to line starts.
int64_t exon_sdf_count(const uint8_t *data, int64_t n, int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (n < (4 << 20)) nt = 1;
  std::vector<int64_t> bounds(nt + 1);
  bounds[0] = 0;
  for (int t = 1; t < nt; t++)
    bounds[t] = next_line_start(data, n, n * t / nt);
  bounds[nt] = n;
  std::vector<int64_t> counts(nt, 0);
  std::vector<int64_t> last_term_end(nt, -1);  // end of last terminator line
  auto worker = [&](int t) {
    int64_t pos = bounds[t], hi = bounds[t + 1], c = 0, lt = -1;
    while (pos < hi) {
      const void *p = memchr(data + pos, '\n', (size_t)(n - pos));
      int64_t end = p ? (const uint8_t *)p - data : n;
      int64_t e = end;
      if (e > pos && data[e - 1] == '\r') e--;
      if (e - pos == 4 && data[pos] == '$' && data[pos + 1] == '$' &&
          data[pos + 2] == '$' && data[pos + 3] == '$') {
        c++;
        lt = end + 1;
      }
      pos = end + 1;
    }
    counts[t] = c;
    last_term_end[t] = lt;
  };
  if (nt == 1) {
    worker(0);
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; t++) ts.emplace_back(worker, t);
    for (auto &t : ts) t.join();
  }
  int64_t total = 0, tail_from = 0;
  for (int t = 0; t < nt; t++) {
    total += counts[t];
    if (last_term_end[t] >= 0) tail_from = last_term_end[t];
  }
  // tail record iff any non-blank line after the last terminator
  for (int64_t pos = tail_from; pos < n; pos++) {
    uint8_t ch = data[pos];
    if (ch != '\n' && ch != '\r' && ch != ' ' && ch != '\t') {
      total++;
      break;
    }
  }
  return total;
}

// Mark lines (given a line table) that are exactly "$$$$".
int64_t exon_sdf_terms(const uint8_t *data, int64_t n, const int64_t *starts,
                       const int64_t *ends, int64_t nl, uint8_t *is_term) {
  for (int64_t i = 0; i < nl; i++) {
    int64_t s = starts[i];
    is_term[i] = (ends[i] - s == 4 && data[s] == '$' && data[s + 1] == '$' &&
                  data[s + 2] == '$' && data[s + 3] == '$')
                     ? 1
                     : 0;
  }
  return nl;
}

// Parse decimal ints (optional leading '-') from byte slices
// [starts[i], ends[i]). out_ok[i]=0 for empty/non-numeric. Returns count.
int64_t exon_parse_ints(const uint8_t *data, int64_t n,
                        const int64_t *starts, const int64_t *ends,
                        int64_t count, int64_t *out, uint8_t *out_ok) {
  for (int64_t i = 0; i < count; i++) {
    int64_t s = starts[i], e = ends[i];
    int64_t v = 0;
    bool neg = false, ok = s < e && e <= n;
    if (ok && data[s] == '-') {
      neg = true;
      s++;
      ok = s < e;
    }
    for (int64_t p = s; p < e; p++) {
      uint8_t d = data[p] - '0';
      if (d > 9) {
        ok = false;
        break;
      }
      v = v * 10 + d;
    }
    out[i] = ok ? (neg ? -v : v) : 0;
    out_ok[i] = ok ? 1 : 0;
  }
  return count;
}

}  // extern "C"

extern "C" {

// Trim ASCII whitespace (space \t \v \f \r) from both ends of each span.
int64_t exon_strip_spans(const uint8_t *data, int64_t n,
                         const int64_t *starts, const int64_t *ends,
                         int64_t count, int64_t *out_s, int64_t *out_e) {
  auto is_ws = [](uint8_t c) {
    return c == ' ' || c == '\t' || c == '\v' || c == '\f' || c == '\r';
  };
  for (int64_t i = 0; i < count; i++) {
    int64_t s = starts[i], e = ends[i];
    if (s < 0 || e > n || s > e) return -1;
    while (s < e && is_ws(data[s])) s++;
    while (e > s && is_ws(data[e - 1])) e--;
    out_s[i] = s;
    out_e[i] = e;
  }
  return count;
}

// Parse SDF property key lines: '>' WS* '<' key '>' (key = bytes to the
// FIRST '>' after '<', matching the reference's non-greedy regex). Emits
// the key span, a 64-bit FNV-1a hash of the key bytes, and ok per line.
int64_t exon_sdf_keys(const uint8_t *data, int64_t n, const int64_t *starts,
                      const int64_t *ends, int64_t count, int64_t *ks,
                      int64_t *ke, uint64_t *hash, uint8_t *ok) {
  for (int64_t i = 0; i < count; i++) {
    int64_t s = starts[i], e = ends[i];
    ks[i] = ke[i] = 0;
    hash[i] = 0;
    ok[i] = 0;
    if (s < 0 || e > n || s >= e || data[s] != '>') continue;
    int64_t p = s + 1;
    while (p < e && (data[p] == ' ' || data[p] == '\t')) p++;
    if (p >= e || data[p] != '<') continue;
    int64_t k0 = p + 1, k1 = k0;
    while (k1 < e && data[k1] != '>') k1++;
    if (k1 >= e) continue;
    uint64_t h = 1469598103934665603ULL;
    for (int64_t q = k0; q < k1; q++) {
      h = (h ^ (uint64_t)data[q]) * 1099511628211ULL;
    }
    ks[i] = k0;
    ke[i] = k1;
    hash[i] = h;
    ok[i] = 1;
  }
  return count;
}

}  // extern "C"
