"""Arrow C-ABI interop: export query results as Arrow C streams.

Parity with the reference FFI layer (exon-core/src/ffi/mod.rs:25-73 exports
an FFI_ArrowArrayStream; exon-r consumes it): here a DataFrame exports
through the Arrow PyCapsule interface (``__arrow_c_stream__``) so any
C-ABI consumer (R arrow, polars, duckdb, nanoarrow, …) can ingest results
zero-copy, batch by batch.
"""

from __future__ import annotations

from typing import Iterator, Optional


def record_batch_reader(df):
    """Stream a DataFrame's result batches as a pyarrow.RecordBatchReader.

    Batches are produced lazily — each ``read_next_batch`` pulls one device
    batch through the pipeline (the per-batch ``rt.block_on`` analog of
    ffi/mod.rs:40-73).
    """
    import pyarrow as pa

    from .batch import arrow_type
    from .plan.planner import create_physical_plan, optimize

    plan = create_physical_plan(optimize(df.logical_plan()))
    schema = plan.schema()
    pa_schema = pa.schema([
        pa.field(f.name, arrow_type(f.dtype), f.nullable)
        for f in schema.all_fields])

    def gen() -> Iterator:
        for b in plan.batches():
            rb = b.to_arrow()
            if rb.num_rows:
                # align field types exactly with the declared schema
                yield rb.cast(pa_schema) if rb.schema != pa_schema else rb

    return pa.RecordBatchReader.from_batches(pa_schema, gen())


def to_arrow_c_stream(df, requested_schema=None):
    """PyCapsule export (Arrow C stream ABI)."""
    reader = record_batch_reader(df)
    return reader.__arrow_c_stream__(requested_schema)


def export_to_c(df, stream_ptr: int) -> None:
    """Write the DataFrame's result stream into a caller-allocated
    ``ArrowArrayStream`` struct at address ``stream_ptr``.

    This is the reference's exact FFI mechanism
    (exon-core/src/ffi/mod.rs:58-73 writes an FFI_ArrowArrayStream at the
    pointer the R side allocated): R calls it in-process through
    reticulate — allocate the struct with
    ``nanoarrow::nanoarrow_allocate_array_stream()``, pass
    ``nanoarrow_pointer_addr_chr(...)`` here, then import with R arrow or
    nanoarrow. See bindings/r/exonr.R read_exon_inprocess()."""
    reader = record_batch_reader(df)
    reader._export_to_c(int(stream_ptr))


def read_inferred_exon_table(path: str, session=None):
    """Infer the format from the extension and stream the table
    (reference: exon-r read_inferred_exon_table, exonr/src/rust/src/lib.rs:31-57)."""
    if session is None:
        from .session import ExonSession

        session = ExonSession.new_exon()
    return record_batch_reader(session.read_inferred_exon_table(path))
