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
from ..batch import Batch, Schema
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
        import pyarrow as pa

        rbs = [b.to_arrow() for b in self.input.batches()]
        rbs = [rb for rb in rbs if rb.num_rows]
        if rbs:
            table = pa.Table.from_batches(rbs)
        else:
            from ..plan.physical import _empty_batch

            table = pa.Table.from_batches([_empty_batch(self.input_schema).to_arrow()])
        n = table.num_rows
        fmt = self.file_format.upper()
        store, path = get_store(self.target_url)
        _stem, comp = infer_compression(self.target_url)

        if fmt == "FASTA":
            payload = compress(serialize_fasta(table), comp)
            store.put(path, payload)
        elif fmt == "FASTQ":
            payload = compress(serialize_fastq(table), comp)
            store.put(path, payload)
        elif fmt == "CSV":
            import pyarrow.csv as pacsv

            buf = io.BytesIO()
            pacsv.write_csv(table, buf)
            store.put(path, compress(buf.getvalue(), comp))
        elif fmt == "PARQUET":
            import pyarrow.parquet as pq

            buf = io.BytesIO()
            pq.write_table(table, buf)
            store.put(path, buf.getvalue())
        elif fmt == "JSON":
            buf = io.StringIO()
            for row in table.to_pylist():
                import json

                buf.write(json.dumps(row) + "\n")
            store.put(path, compress(buf.getvalue().encode(), comp))
        else:
            raise ExecutionError(f"COPY format {fmt} not supported")

        from ..batch import batch_from_host, fixed_column

        yield batch_from_host(self.schema(),
                              [fixed_column(np.asarray([n], np.int64))],
                              1).to_device(capacity=128)
