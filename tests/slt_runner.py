"""sqllogictest-style golden runner.

Executes the reference's .slt corpus in place
(exon-core/tests/sqllogictests/slt/*.slt) against our engine — the parity
mechanism SURVEY.md §4 calls for. Directives: ``control substitution on``,
``statement ok``, ``statement error [msg]``, ``query <types>`` with a
``----``-delimited expected block. Value rendering mirrors the DataFusion
sqllogictest normalizer: NULL for nulls, ``(empty)`` for empty strings,
floats in Rust Display form, arrow-style ``[..]`` / ``{k: v}`` for
lists/structs, cells joined by single spaces.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class SltRecord:
    kind: str                 # 'statement_ok' | 'statement_error' | 'query'
    sql: str
    expected: Optional[list[str]] = None
    error_message: Optional[str] = None
    line: int = 0
    sort_mode: Optional[str] = None


@dataclass
class SltResult:
    path: str
    passed: int = 0
    failures: list = field(default_factory=list)  # (line, sql, reason)

    @property
    def ok(self) -> bool:
        return not self.failures


def parse_slt(text: str) -> tuple[list[SltRecord], bool]:
    records: list[SltRecord] = []
    substitution = False
    lines = text.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("control substitution"):
            substitution = line.endswith("on")
            i += 1
            continue
        if line.startswith("statement") or line.startswith("query"):
            header = line
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            sql = "\n".join(sql_lines).strip()
            expected = None
            if i < n and lines[i].strip() == "----":
                i += 1
                expected = []
                while i < n and lines[i].strip():
                    expected.append(lines[i].rstrip())
                    i += 1
            start_line = i - len(sql_lines) - (len(expected) + 1
                                               if expected is not None else 0)
            if header.startswith("statement ok") or header == "query ok":
                records.append(SltRecord("statement_ok", sql, expected,
                                         line=start_line))
            elif header.startswith("statement error"):
                msg = header[len("statement error"):].strip() or None
                records.append(SltRecord("statement_error", sql,
                                         error_message=msg, line=start_line))
            else:
                parts = header.split()
                sort_mode = parts[2] if len(parts) > 2 else None
                records.append(SltRecord("query", sql, expected or [],
                                         line=start_line,
                                         sort_mode=sort_mode))
        else:
            i += 1
    return records, substitution


# ---------------------------------------------------------------------------
# value rendering (DataFusion sqllogictest normalization)
# ---------------------------------------------------------------------------


def fmt_value(v, dtype=None, nested=False) -> str:
    import pyarrow as pa

    if v is None:
        # arrow's nested Display renders nulls as empty; top-level is NULL
        return "" if nested else "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Float32 columns render at f32 precision (Rust Display), not the
        # exact f64 widening
        if dtype is not None and pa.types.is_float32(dtype):
            import numpy as np

            f = float(np.float32(v))
            if f == int(f) and abs(f) < 1e15:
                return str(int(f)) + (".0" if nested else "")
            return np.format_float_positional(np.float32(v), unique=True,
                                              trim="-")
        if v == int(v) and abs(v) < 1e15:
            # nested floats use Rust Debug form (0.0), top-level Display (0)
            return str(int(v)) + (".0" if nested else "")
        return repr(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, str):
        # the sqllogictest normalizer maps control chars to spaces
        v = v.replace("\t", "    ")
        return v if (v or nested) else "(empty)"
    if isinstance(v, dict):
        fields = {}
        if dtype is not None and pa.types.is_struct(dtype):
            fields = {dtype.field(i).name: dtype.field(i).type
                      for i in range(dtype.num_fields)}
        # DataFusion renders top-level struct cells as k:v joined by ","
        # but structs nested in lists as {k: v, ...}
        if nested:
            inner = ", ".join(
                f"{k}: {fmt_value(x, fields.get(k), nested=True)}"
                for k, x in v.items())
        else:
            inner = ",".join(
                f"{k}:{fmt_value(x, fields.get(k), nested=True)}"
                for k, x in v.items())
        return "{" + inner + "}"
    if isinstance(v, (list, tuple)):
        child = dtype.value_type if dtype is not None and (
            pa.types.is_list(dtype) or pa.types.is_large_list(dtype)) \
            else None
        return "[" + ", ".join(fmt_value(x, child, nested=True)
                               for x in v) + "]"
    return str(v)


def format_table(table) -> list[str]:
    cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
    types = [table.schema.field(i).type for i in range(table.num_columns)]
    out = []
    for r in range(table.num_rows):
        out.append(" ".join(fmt_value(c[r], t) for c, t in zip(cols, types)))
    return out


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def run_slt(session, path: str, substitutions: dict[str, str],
            skip_sql: Optional[list[str]] = None) -> SltResult:
    text = open(path).read()
    records, substitution = parse_slt(text)
    result = SltResult(path)
    skip_sql = skip_sql or []
    for rec in records:
        sql = rec.sql
        if substitution:
            for k, v in substitutions.items():
                sql = sql.replace(k, v)
        if any(re.search(p, sql) for p in skip_sql):
            continue
        if rec.kind == "statement_ok":
            try:
                df = session.sql(sql)
                # statements must be executable end-to-end (COPY etc.)
                if sql.upper().startswith(("SELECT", "COPY")):
                    df.collect_arrow()
                result.passed += 1
            except Exception as e:  # noqa: BLE001
                result.failures.append((rec.line, sql, f"error: {e}"))
        elif rec.kind == "statement_error":
            try:
                session.sql(sql).collect_arrow()
                result.failures.append((rec.line, sql,
                                        "expected error, got success"))
            except Exception:  # noqa: BLE001
                result.passed += 1
        elif rec.kind == "query":
            try:
                table = session.sql(sql).collect_arrow()
                got = format_table(table)
            except Exception as e:  # noqa: BLE001
                result.failures.append((rec.line, sql, f"error: {e}"))
                continue
            want = list(rec.expected or [])
            got_cmp, want_cmp = got, want
            if rec.sort_mode == "rowsort":
                got_cmp, want_cmp = sorted(got), sorted(want)
            if [g.strip() for g in got_cmp] != [w.strip() for w in want_cmp]:
                result.failures.append(
                    (rec.line, sql,
                     f"rows mismatch:\n  got: {got_cmp}\n want: {want_cmp}"))
            else:
                result.passed += 1
    return result
