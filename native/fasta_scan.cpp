// Native FASTA scanner: single-pass decode of record structure.
//
// The TPU engine's host-side ingest kernel (the role noodles' Rust parsers
// play in the reference, exon-fasta/src/batch_reader.rs) — one pass over the
// buffer produces, per record:
//   * header start/end offsets (name/description split at first space)
//   * sequence prefix bytes (first K, newline-spliced) + true length
//   * (full mode) compacted sequence bytes + offsets
//
// Exposed via a plain C ABI for ctypes. Build: see native/build.sh.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>

extern "C" {

struct FastaIndex {
  int64_t n_records;
  // per record, arrays of length n_records (+1 for offsets)
  int64_t* header_start;   // offset of '>'
  int64_t* name_start;     // after '>'
  int64_t* name_end;       // first space or line end
  int64_t* desc_start;     // after first space (== desc_end if none)
  int64_t* desc_end;       // header line end (no \r)
  int64_t* seq_length;     // true sequence length (newlines removed)
};

// Count '>' line starts (cheap pre-pass to size allocations).
int64_t fasta_count_records(const uint8_t* data, int64_t n) {
  int64_t count = 0;
  if (n == 0) return 0;
  if (data[0] == '>') count++;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while ((p = (const uint8_t*)memchr(p, '\n', end - p)) != nullptr) {
    p++;
    if (p < end && *p == '>') count++;
  }
  return count;
}

// Single-pass structural scan. Caller allocates arrays sized by
// fasta_count_records. Returns number of records written, or -1 on error.
int64_t fasta_scan(const uint8_t* data, int64_t n, FastaIndex* idx,
                   uint8_t* prefix_out, int64_t prefix_k) {
  int64_t rec = -1;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  int64_t cur_len = 0;
  int64_t cur_prefix = 0;

  while (p < end) {
    const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
    const uint8_t* line_end = nl ? nl : end;
    const uint8_t* content_end = line_end;
    if (content_end > p && content_end[-1] == '\r') content_end--;

    if (*p == '>') {
      // close previous record
      if (rec >= 0) idx->seq_length[rec] = cur_len;
      rec++;
      cur_len = 0;
      cur_prefix = 0;
      idx->header_start[rec] = p - data;
      const uint8_t* sp =
          (const uint8_t*)memchr(p + 1, ' ', content_end - (p + 1));
      idx->name_start[rec] = (p + 1) - data;
      if (sp) {
        idx->name_end[rec] = sp - data;
        idx->desc_start[rec] = (sp + 1) - data;
        idx->desc_end[rec] = content_end - data;
      } else {
        idx->name_end[rec] = content_end - data;
        idx->desc_start[rec] = content_end - data;
        idx->desc_end[rec] = content_end - data;
      }
    } else if (rec >= 0) {
      int64_t line_len = content_end - p;
      if (cur_prefix < prefix_k && line_len > 0) {
        int64_t take = prefix_k - cur_prefix;
        if (take > line_len) take = line_len;
        memcpy(prefix_out + rec * prefix_k + cur_prefix, p, (size_t)take);
        cur_prefix += take;
      }
      cur_len += line_len;
    } else if (content_end > p) {
      return -1;  // sequence data before first header
    }
    p = nl ? nl + 1 : end;
  }
  if (rec >= 0) idx->seq_length[rec] = cur_len;
  return rec + 1;
}

// Full-materialization pass: copy sequence bytes (newline-free) into out,
// using seq_offsets computed from seq_length (exclusive prefix sum, caller
// provides). Returns total bytes written or -1.
int64_t fasta_fill_sequences(const uint8_t* data, int64_t n,
                             const int64_t* header_start, int64_t n_records,
                             const int64_t* seq_offsets, uint8_t* out) {
  int64_t rec = -1;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  uint8_t* w = out;

  while (p < end) {
    const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
    const uint8_t* line_end = nl ? nl : end;
    const uint8_t* content_end = line_end;
    if (content_end > p && content_end[-1] == '\r') content_end--;

    if (*p == '>') {
      rec++;
      if (rec < n_records) w = out + seq_offsets[rec];
    } else if (rec >= 0 && content_end > p) {
      memcpy(w, p, (size_t)(content_end - p));
      w += content_end - p;
    }
    p = nl ? nl + 1 : end;
  }
  return w - out;
}

// --------------------------------------------------------------------------
// Multithreaded FASTA scan: split the buffer at record ('\n>') boundaries,
// count + scan each shard in parallel, write shard s's records at the
// shard's global record offset. Host ingest is the engine's noodles-analog
// hot loop; this keeps a 2-core host ahead of the TPU.

static int64_t next_record_boundary(const uint8_t* data, int64_t n,
                                    int64_t from) {
  if (from <= 0) return 0;
  const uint8_t* p = data + from - 1;
  const uint8_t* end = data + n;
  while ((p = (const uint8_t*)memchr(p, '\n', end - p)) != nullptr) {
    p++;
    if (p >= end) break;
    if (*p == '>') return p - data;
  }
  return n;
}

int64_t fasta_count_records_mt(const uint8_t* data, int64_t n,
                               int64_t n_threads) {
  if (n_threads < 2 || n < (4 << 20)) return fasta_count_records(data, n);
  std::vector<int64_t> bounds(n_threads + 1);
  bounds[0] = 0;
  for (int64_t t = 1; t < n_threads; t++)
    bounds[t] = next_record_boundary(data, n, t * (n / n_threads));
  bounds[n_threads] = n;
  std::vector<int64_t> counts(n_threads, 0);
  std::vector<std::thread> threads;
  for (int64_t t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t] {
      counts[t] = fasta_count_records(data + bounds[t],
                                      bounds[t + 1] - bounds[t]);
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (auto c : counts) total += c;
  return total;
}

int64_t fasta_scan_mt(const uint8_t* data, int64_t n, FastaIndex* idx,
                      uint8_t* prefix_out, int64_t prefix_k,
                      int64_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || n < (4 << 20)) {
    return fasta_scan(data, n, idx, prefix_out, prefix_k);
  }
  std::vector<int64_t> bounds(n_threads + 1);
  bounds[0] = 0;
  for (int64_t t = 1; t < n_threads; t++) {
    bounds[t] = next_record_boundary(data, n, t * (n / n_threads));
  }
  bounds[n_threads] = n;
  // leading bytes before the first '>' are an error unless whitespace-only
  if (n > 0 && data[0] != '>') {
    const uint8_t* q = data;
    while (q < data + n && (*q == '\n' || *q == '\r')) q++;
    if (q < data + n && *q != '>') return -1;
    bounds[0] = next_record_boundary(data, n, 1);
  }
  std::vector<int64_t> counts(n_threads, 0);
  {
    std::vector<std::thread> threads;
    for (int64_t t = 0; t < n_threads; t++) {
      threads.emplace_back([&, t] {
        counts[t] = fasta_count_records(data + bounds[t],
                                        bounds[t + 1] - bounds[t]);
      });
    }
    for (auto& th : threads) th.join();
  }
  std::vector<int64_t> rec_off(n_threads + 1, 0);
  for (int64_t t = 0; t < n_threads; t++)
    rec_off[t + 1] = rec_off[t] + counts[t];
  std::vector<int64_t> written(n_threads, 0);
  {
    std::vector<std::thread> threads;
    for (int64_t t = 0; t < n_threads; t++) {
      threads.emplace_back([&, t] {
        FastaIndex sub;
        int64_t off = rec_off[t];
        sub.header_start = idx->header_start + off;
        sub.name_start = idx->name_start + off;
        sub.name_end = idx->name_end + off;
        sub.desc_start = idx->desc_start + off;
        sub.desc_end = idx->desc_end + off;
        sub.seq_length = idx->seq_length + off;
        written[t] = fasta_scan(data + bounds[t], bounds[t + 1] - bounds[t],
                                &sub, prefix_out + off * prefix_k, prefix_k);
        // shard-local offsets → global
        if (written[t] > 0 && bounds[t] != 0) {
          for (int64_t i = 0; i < written[t]; i++) {
            sub.header_start[i] += bounds[t];
            sub.name_start[i] += bounds[t];
            sub.name_end[i] += bounds[t];
            sub.desc_start[i] += bounds[t];
            sub.desc_end[i] += bounds[t];
          }
        }
      });
    }
    for (auto& th : threads) th.join();
  }
  int64_t total = 0;
  for (int64_t t = 0; t < n_threads; t++) {
    if (written[t] < 0) return -1;
    total += written[t];
  }
  return total;
}

// Integer-encode DNA in place over a byte buffer (A,C,G,T,N → 1..5).
// Returns index of first invalid byte, or -1 if all valid.
int64_t encode_dna(uint8_t* buf, int64_t n) {
  static int8_t table[256];
  static bool init = false;
  if (!init) {
    memset(table, 0, sizeof(table));
    table['A'] = 1; table['C'] = 2; table['G'] = 3; table['T'] = 4;
    table['N'] = 5;
    init = true;
  }
  for (int64_t i = 0; i < n; i++) {
    int8_t v = table[buf[i]];
    if (v == 0) return i;
    buf[i] = (uint8_t)v;
  }
  return -1;
}

// --------------------------------------------------------------------------
// Generic line-structure scan shared by TSV formats: emit line start/end
// offsets, skipping lines that begin with `comment` (0 = keep all).
int64_t scan_lines(const uint8_t* data, int64_t n, uint8_t comment,
                   int64_t* starts, int64_t* ends, int64_t max_lines) {
  int64_t count = 0;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while (p < end && count < max_lines) {
    const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
    const uint8_t* line_end = nl ? nl : end;
    const uint8_t* content_end = line_end;
    if (content_end > p && content_end[-1] == '\r') content_end--;
    if (content_end > p && (comment == 0 || *p != comment)) {
      starts[count] = p - data;
      ends[count] = content_end - data;
      count++;
    }
    p = nl ? nl + 1 : end;
  }
  return count;
}

}  // extern "C"
