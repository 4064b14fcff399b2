"""DataFrame API over logical plans (the read_*/df surface of the reference,
exon-core/src/session_context/exon_context_ext.rs:103-721)."""

from __future__ import annotations

from typing import Optional

from .plan import logical as L
from .plan.expressions import (AggregateCall, Alias, ColumnRef, Expr, col,
                               lit)
from .plan.planner import create_physical_plan, infer_expr_field, optimize


class DataFrame:
    def __init__(self, session, plan: L.LogicalPlan):
        self._session = session
        self._plan = plan

    def __arrow_c_stream__(self, requested_schema=None):
        """Arrow PyCapsule stream export: any C-ABI consumer (R arrow,
        polars, duckdb, nanoarrow) ingests results zero-copy — the engine's
        exon-r substrate (exon-r/exonr/src/rust/src/lib.rs:31-57)."""
        from .ffi import to_arrow_c_stream

        return to_arrow_c_stream(self, requested_schema)

    # -- transforms ---------------------------------------------------------

    def filter(self, predicate: Expr) -> "DataFrame":
        return DataFrame(self._session, L.Filter(predicate, self._plan))

    def select(self, *exprs) -> "DataFrame":
        exprs = [col(e) if isinstance(e, str) else e for e in exprs]
        return DataFrame(self._session, L.Project(list(exprs), self._plan))

    def select_columns(self, *names: str) -> "DataFrame":
        return self.select(*[col(n) for n in names])

    def aggregate(self, group_exprs: list, agg_exprs: list) -> "DataFrame":
        group_exprs = [col(e) if isinstance(e, str) else e for e in group_exprs]
        calls, names = [], []
        for e in agg_exprs:
            if isinstance(e, Alias) and isinstance(e.child, AggregateCall):
                calls.append(e.child)
                names.append(e.name)
            elif isinstance(e, AggregateCall):
                calls.append(e)
                names.append(e.display_name())
            else:
                raise TypeError(f"not an aggregate expression: {e}")
        return DataFrame(self._session,
                         L.Aggregate(group_exprs, calls, names, self._plan))

    def sort(self, *keys) -> "DataFrame":
        norm = []
        for k in keys:
            if isinstance(k, tuple):
                norm.append((col(k[0]) if isinstance(k[0], str) else k[0], k[1]))
            else:
                norm.append((col(k) if isinstance(k, str) else k, True))
        return DataFrame(self._session, L.Sort(norm, self._plan))

    def limit(self, fetch: int, skip: int = 0) -> "DataFrame":
        return DataFrame(self._session, L.Limit(skip, fetch, self._plan))

    def join(self, right: "DataFrame", on, how: str = "inner") -> "DataFrame":
        pairs = []
        for item in on:
            if isinstance(item, str):
                pairs.append((col(item), col(item)))
            else:
                l, r = item
                pairs.append((col(l) if isinstance(l, str) else l,
                              col(r) if isinstance(r, str) else r))
        return DataFrame(self._session,
                         L.Join(self._plan, right._plan, pairs, how))

    def union(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self._session, L.Union([self._plan, other._plan]))

    # -- sinks --------------------------------------------------------------

    def count(self) -> int:
        agg = L.Aggregate([], [AggregateCall("count", None)], ["count(*)"],
                          self._plan)
        table = self._execute(agg).collect_arrow()
        return int(table.column(0)[0].as_py())

    def collect_arrow(self):
        return self._execute(self._plan).collect_arrow()

    def collect(self):
        return self.collect_arrow()

    def to_pandas(self):
        return self.collect_arrow().to_pandas()

    def show(self, n: int = 20) -> None:
        print(self.limit(n).to_pandas().to_string())

    def explain(self) -> str:
        return L.display_plan(optimize(self._plan))

    def logical_plan(self) -> L.LogicalPlan:
        return self._plan

    def schema(self):
        return self._plan.schema()

    def write_fasta(self, url: str, **options) -> int:
        return self._copy_to(url, "FASTA", options)

    def write_fastq(self, url: str, **options) -> int:
        return self._copy_to(url, "FASTQ", options)

    def write_csv(self, url: str, **options) -> int:
        return self._copy_to(url, "CSV", options)

    def write_parquet(self, url: str, **options) -> int:
        return self._copy_to(url, "PARQUET", options)

    def _copy_to(self, url: str, fmt: str, options: dict) -> int:
        plan = L.CopyTo(self._plan, url, fmt, options)
        table = self._execute(plan).collect_arrow()
        return int(table.column(0)[0].as_py())

    # -- execution ----------------------------------------------------------

    def _execute(self, plan: L.LogicalPlan):
        config = getattr(self._session, "config", None)
        return create_physical_plan(optimize(plan), config)
