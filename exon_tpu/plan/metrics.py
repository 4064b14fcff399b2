"""Per-operator execution metrics + plan instrumentation.

The analog of DataFusion's ExecutionPlanMetricsSet threaded into every
FileStream (reference: fasta/scanner.rs:50,175, surfaced via
``EXPLAIN ANALYZE``): wrap a physical plan tree so every operator records
output rows, batches, and elapsed wall time while the query runs.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, Optional

from ..batch import Batch, Schema
from .physical import PhysicalPlan

_CHILD_FIELDS = ("input", "child", "left", "right")


@dataclasses.dataclass
class OperatorMetrics:
    output_rows: int = 0
    output_batches: int = 0
    elapsed_seconds: float = 0.0


class InstrumentedExec(PhysicalPlan):
    """Delegating wrapper that measures one operator's emission."""

    def __init__(self, inner: PhysicalPlan):
        self.inner = inner
        self.metrics = OperatorMetrics()

    def schema(self) -> Schema:
        return self.inner.schema()

    def children(self):
        return self.inner.children()

    def batches(self) -> Iterator[Batch]:
        t0 = time.perf_counter()
        for b in self.inner.batches():
            self.metrics.elapsed_seconds += time.perf_counter() - t0
            self.metrics.output_rows += b.num_rows_host()
            self.metrics.output_batches += 1
            yield b
            t0 = time.perf_counter()
        self.metrics.elapsed_seconds += time.perf_counter() - t0

    def display_name(self) -> str:
        return type(self.inner).__name__


def instrument(plan: PhysicalPlan) -> PhysicalPlan:
    """Rebuild the tree with every operator wrapped in InstrumentedExec."""
    if isinstance(plan, InstrumentedExec):
        return plan
    if dataclasses.is_dataclass(plan):
        updates = {}
        for f in dataclasses.fields(plan):
            v = getattr(plan, f.name)
            if isinstance(v, PhysicalPlan):
                updates[f.name] = instrument(v)
            elif isinstance(v, list) and v and \
                    all(isinstance(x, PhysicalPlan) for x in v):
                updates[f.name] = [instrument(x) for x in v]
        if updates:
            plan = dataclasses.replace(plan, **updates)
    return InstrumentedExec(plan)


def render_metrics(plan: PhysicalPlan, indent: int = 0) -> list[str]:
    """EXPLAIN ANALYZE text: one line per operator with its metrics."""
    lines = []
    if isinstance(plan, InstrumentedExec):
        m = plan.metrics
        lines.append(
            "  " * indent + f"{plan.display_name()}: "
            f"metrics=[output_rows={m.output_rows}, "
            f"output_batches={m.output_batches}, "
            f"elapsed_ms={m.elapsed_seconds * 1e3:.2f}]")
        inner = plan.inner
    else:
        lines.append("  " * indent + type(plan).__name__)
        inner = plan
    if dataclasses.is_dataclass(inner):
        for f in dataclasses.fields(inner):
            v = getattr(inner, f.name)
            if isinstance(v, PhysicalPlan):
                lines.extend(render_metrics(v, indent + 1))
            elif isinstance(v, list) and v and \
                    all(isinstance(x, PhysicalPlan) for x in v):
                for x in v:
                    lines.extend(render_metrics(x, indent + 1))
    return lines
