"""COPY TO execution: serialize batches to object-store files.

Parity: SimpleRecordSink + FASTA/FASTQSerializer
(exon-core/src/sinks/simple_record_sink.rs:81-140, fasta_serializer.rs:29);
FASTA sequences wrap at 80 columns like noodles' writer. CSV/Parquet ride
pyarrow (the stock-DataFusion analog). Compression inferred from the target
extension (.gz/.zst/.bgz).
"""

from __future__ import annotations

import dataclasses
import io
from typing import Iterator

import numpy as np

from .. import datatypes as dt
from ..batch import Batch, FixedColumn, Schema
from ..errors import ExecutionError
from ..io.compression import Compression, compress, infer_compression
from ..io.object_store import get_store
from ..plan.physical import PhysicalPlan


def _wrap80(seq: str) -> str:
    if len(seq) <= 80:
        return seq
    return "\n".join(seq[i:i + 80] for i in range(0, len(seq), 80))


def serialize_fasta(table) -> bytes:
    cols = {name: table.column(name).to_pylist() for name in table.column_names}
    if "id" not in cols or "sequence" not in cols:
        raise ExecutionError(
            "COPY ... STORED AS FASTA requires id and sequence columns")
    descs = cols.get("description", [None] * table.num_rows)
    out = io.StringIO()
    for i in range(table.num_rows):
        d = descs[i]
        header = f">{cols['id'][i]}" + (f" {d}" if d else "")
        out.write(header + "\n" + _wrap80(cols["sequence"][i] or "") + "\n")
    return out.getvalue().encode()


def serialize_fastq(table) -> bytes:
    cols = {name: table.column(name).to_pylist() for name in table.column_names}
    for need in ("name", "sequence", "quality_scores"):
        if need not in cols:
            raise ExecutionError(
                f"COPY ... STORED AS FASTQ requires {need} column")
    descs = cols.get("description", [None] * table.num_rows)
    out = io.StringIO()
    for i in range(table.num_rows):
        d = descs[i]
        header = f"@{cols['name'][i]}" + (f" {d}" if d else "")
        out.write(header + "\n" + (cols["sequence"][i] or "") + "\n+\n" +
                  (cols["quality_scores"][i] or "") + "\n")
    return out.getvalue().encode()


@dataclasses.dataclass
class CopyToExec(PhysicalPlan):
    input: PhysicalPlan
    input_schema: Schema
    target_url: str
    file_format: str
    options: dict

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        return Schema.of(dt.Field("count", dt.int64, False))

    def batches(self) -> Iterator[Batch]:
        """Streaming write: each input batch serializes and flows through
        an incremental compressor into store.put_stream — peak memory is
        O(batch), not O(result) (the reference's SimpleRecordSink streams
        the same way, simple_record_sink.rs:81-140)."""
        import jax
        import pyarrow as pa

        from ..io.compression import stream_compressor
        from ..plan.physical import _empty_batch

        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-host: operators produce identical replicated results on
            # every process; only process 0 writes the file (concurrent
            # writers would race on the same target). All processes still
            # drain the input so collective-bearing plans stay in lockstep.
            n = 0
            for b in self.input.batches():
                n += b.num_rows_host()
            yield Batch(self.schema(),
                        [FixedColumn(np.asarray([n], np.int64),
                                     np.ones(1, bool))], np.int32(1))
            return

        fmt = self.file_format.upper()
        store, path = get_store(self.target_url)
        _stem, comp = infer_compression(self.target_url)
        n = 0

        def tables() -> Iterator:
            nonlocal n
            any_rows = False
            for b in self.input.batches():
                rb = b.to_arrow()
                if rb.num_rows == 0:
                    continue
                any_rows = True
                n += rb.num_rows
                yield pa.Table.from_batches([rb])
            if not any_rows:
                yield pa.Table.from_batches(
                    [_empty_batch(self.input_schema).to_arrow()])

        if fmt == "PARQUET":
            import pyarrow.parquet as pq

            buf = io.BytesIO()
            writer = None
            for t in tables():
                if writer is None:
                    writer = pq.ParquetWriter(buf, t.schema)
                writer.write_table(t)
            writer.close()
            store.put(path, buf.getvalue())
        elif fmt in ("FASTA", "FASTQ", "CSV", "JSON"):
            co = stream_compressor(comp)

            def chunks() -> Iterator[bytes]:
                first = True
                for t in tables():
                    if fmt == "FASTA":
                        payload = serialize_fasta(t)
                    elif fmt == "FASTQ":
                        payload = serialize_fastq(t)
                    elif fmt == "CSV":
                        import pyarrow.csv as pacsv

                        buf = io.BytesIO()
                        pacsv.write_csv(
                            t, buf, write_options=pacsv.WriteOptions(
                                include_header=first))
                        payload = buf.getvalue()
                    else:
                        import json

                        payload = "".join(
                            json.dumps(row) + "\n"
                            for row in t.to_pylist()).encode()
                    first = False
                    out = co.compress(payload)
                    if out:
                        yield out
                tail = co.flush()
                if tail:
                    yield tail

            store.put_stream(path, chunks())
        else:
            raise ExecutionError(f"COPY format {fmt} not supported")

        from ..batch import batch_from_host, fixed_column

        yield batch_from_host(self.schema(),
                              [fixed_column(np.asarray([n], np.int64))],
                              1).to_device(capacity=128)
