// Standalone C-ABI consumer of an Arrow C stream (ArrowArrayStream).
//
// Proves the engine's FFI export (exon_tpu/ffi.py __arrow_c_stream__) is
// consumable by a non-Python runtime through nothing but the Arrow C data
// interface — the exact path the reference's R binding takes
// (exon-r/exonr/src/rust/src/lib.rs:31-57 hands an FFI_ArrowArrayStream
// pointer to R arrow). Struct layouts follow the Arrow C data interface
// specification (stable public ABI).

#include <cstdint>

extern "C" {

struct ArrowSchema {
  const char *format;
  const char *name;
  const char *metadata;
  int64_t flags;
  int64_t n_children;
  ArrowSchema **children;
  ArrowSchema *dictionary;
  void (*release)(ArrowSchema *);
  void *private_data;
};

struct ArrowArray {
  int64_t length;
  int64_t null_count;
  int64_t offset;
  int64_t n_buffers;
  int64_t n_children;
  const void **buffers;
  ArrowArray **children;
  ArrowArray *dictionary;
  void (*release)(ArrowArray *);
  void *private_data;
};

struct ArrowArrayStream {
  int (*get_schema)(ArrowArrayStream *, ArrowSchema *out);
  int (*get_next)(ArrowArrayStream *, ArrowArray *out);
  const char *(*get_last_error)(ArrowArrayStream *);
  void (*release)(ArrowArrayStream *);
  void *private_data;
};

// Drain the stream: count batches/rows, read the column count from the
// schema, release everything. Returns 0 on success, a nonzero errno-style
// code on failure.
int exon_consume_arrow_stream(ArrowArrayStream *stream, int64_t *out_batches,
                              int64_t *out_rows, int64_t *out_cols) {
  if (!stream || !stream->get_schema || !stream->get_next) return 1;
  ArrowSchema schema = {};
  if (stream->get_schema(stream, &schema) != 0) return 2;
  *out_cols = schema.n_children;
  if (schema.release) schema.release(&schema);

  int64_t batches = 0, rows = 0;
  for (;;) {
    ArrowArray arr = {};
    if (stream->get_next(stream, &arr) != 0) {
      if (stream->release) stream->release(stream);
      return 3;
    }
    if (arr.release == nullptr) break;  // end of stream
    batches++;
    rows += arr.length;
    arr.release(&arr);
  }
  if (stream->release) stream->release(stream);
  *out_batches = batches;
  *out_rows = rows;
  return 0;
}

}  // extern "C"
