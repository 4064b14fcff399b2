"""Logical plan nodes.

A deliberately small relational algebra mirroring what the reference engine
uses from DataFusion: Scan / Filter / Project / Aggregate / Sort / Limit /
Join / Union / Values. Plans are immutable trees; the planner lowers them to
physical streaming operators over device batches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from ..datatypes import Schema, Field
from .expressions import AggregateCall, Alias, Expr, expr_columns


class LogicalPlan:
    def children(self) -> list["LogicalPlan"]:
        return []

    def schema(self) -> Schema:
        raise NotImplementedError


@dataclasses.dataclass
class Scan(LogicalPlan):
    provider: Any  # TableProvider
    table_name: str
    projection: Optional[list[str]] = None
    filters: tuple[Expr, ...] = ()
    fetch: Optional[int] = None
    # column → K: stage only K-byte prefixes + lengths (late materialization)
    prefix_hints: Optional[dict] = None

    def schema(self) -> Schema:
        s = self.provider.schema()
        if self.projection is not None:
            return s.project(self.projection)
        return s


@dataclasses.dataclass
class Filter(LogicalPlan):
    predicate: Expr
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        return self.input.schema()


@dataclasses.dataclass
class Project(LogicalPlan):
    exprs: list[Expr]
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        from .planner import infer_expr_field

        in_schema = self.input.schema()
        return Schema(tuple(infer_expr_field(e, in_schema) for e in self.exprs))


@dataclasses.dataclass
class Aggregate(LogicalPlan):
    group_exprs: list[Expr]
    agg_exprs: list[AggregateCall]
    agg_names: list[str]
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        from .planner import infer_expr_field
        from .. import datatypes as dt

        in_schema = self.input.schema()
        fields = [infer_expr_field(e, in_schema) for e in self.group_exprs]
        for call, name in zip(self.agg_exprs, self.agg_names):
            if call.fn == "count":
                fields.append(Field(name, dt.int64, False))
            elif call.fn == "avg":
                fields.append(Field(name, dt.float64, True))
            elif call.fn in ("stddev", "stddev_samp", "stddev_pop", "var",
                             "variance", "var_samp", "var_pop"):
                fields.append(Field(name, dt.float64, True))
            elif call.fn == "string_agg":
                fields.append(Field(name, dt.utf8, True))
            elif call.fn == "array_agg":
                f = infer_expr_field(call.child, in_schema)
                fields.append(Field(name, dt.list_(f.dtype), True))
            elif call.child is not None:
                f = infer_expr_field(call.child, in_schema)
                fields.append(Field(name, f.dtype, True))
            else:
                fields.append(Field(name, dt.int64, True))
        return Schema(tuple(fields))


@dataclasses.dataclass
class Sort(LogicalPlan):
    keys: list[tuple[Expr, bool]]  # (expr, ascending)
    input: LogicalPlan
    fetch: Optional[int] = None

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        return self.input.schema()


@dataclasses.dataclass
class Limit(LogicalPlan):
    skip: int
    fetch: Optional[int]
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        return self.input.schema()


@dataclasses.dataclass
class Join(LogicalPlan):
    left: LogicalPlan
    right: LogicalPlan
    on: list[tuple[Expr, Expr]]
    how: str = "inner"  # inner | left
    filter: Optional[Expr] = None
    # right-child column → output name, pinned at plan time so projection
    # pushdown can't shift the collision suffixes downstream refs rely on
    right_names: Optional[dict] = None

    def children(self):
        return [self.left, self.right]

    def schema(self) -> Schema:
        from .join_exec import join_schema

        out, _ = join_schema(self.left.schema(), self.right.schema(),
                             self.right_names)
        return out


@dataclasses.dataclass
class Window(LogicalPlan):
    """Append window-function result columns (names) to the input."""

    calls: list  # [WindowCall]
    names: list[str]
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        from .planner import infer_window_field

        in_schema = self.input.schema()
        fields = list(in_schema.all_fields)
        for call, name in zip(self.calls, self.names):
            fields.append(infer_window_field(call, name, in_schema))
        return Schema(tuple(fields))


@dataclasses.dataclass
class Union(LogicalPlan):
    inputs: list[LogicalPlan]

    def children(self):
        return list(self.inputs)

    def schema(self) -> Schema:
        return self.inputs[0].schema()


@dataclasses.dataclass
class Repeat(LogicalPlan):
    """Emit each input row ``count_expr`` times (clipped at 0) — the
    multiset expansion behind INTERSECT ALL / EXCEPT ALL (DataFusion emits
    the same shape from its set-op planner)."""

    count_expr: object  # Expr
    input: LogicalPlan

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        return self.input.schema()


@dataclasses.dataclass
class Values(LogicalPlan):
    """Literal rows (for SELECT without FROM and test fixtures)."""

    out_schema: Schema
    rows: list[tuple]

    def schema(self) -> Schema:
        return self.out_schema


@dataclasses.dataclass
class CopyTo(LogicalPlan):
    """COPY (query) TO 'url' STORED AS <format>
    (reference: ExonDataSinkLogicalPlanNode, logical_plan/exon_data_sink_node.rs)."""

    input: LogicalPlan
    target_url: str
    file_format: str  # FASTA | FASTQ | CSV | PARQUET ...
    options: dict

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        from .. import datatypes as dt

        return Schema.of(Field("count", dt.int64, False))


@dataclasses.dataclass
class Explain(LogicalPlan):
    input: LogicalPlan
    analyze: bool = False

    def children(self):
        return [self.input]

    def schema(self) -> Schema:
        from .. import datatypes as dt

        return Schema.of(Field("plan_type", dt.utf8, False),
                         Field("plan", dt.utf8, False))


def display_plan(plan: LogicalPlan, indent: int = 0) -> str:
    pad = "  " * indent
    if isinstance(plan, Scan):
        proj = f", projection={plan.projection}" if plan.projection else ""
        return f"{pad}Scan: {plan.table_name}{proj}\n"
    if isinstance(plan, Filter):
        return f"{pad}Filter: {plan.predicate.display_name()}\n" + \
            display_plan(plan.input, indent + 1)
    if isinstance(plan, Project):
        names = ", ".join(e.display_name() for e in plan.exprs)
        return f"{pad}Projection: {names}\n" + display_plan(plan.input, indent + 1)
    if isinstance(plan, Aggregate):
        g = ", ".join(e.display_name() for e in plan.group_exprs)
        a = ", ".join(e.display_name() for e in plan.agg_exprs)
        return f"{pad}Aggregate: groupBy=[{g}], aggr=[{a}]\n" + \
            display_plan(plan.input, indent + 1)
    if isinstance(plan, Sort):
        k = ", ".join(f"{e.display_name()} {'ASC' if asc else 'DESC'}"
                      for e, asc in plan.keys)
        return f"{pad}Sort: {k}\n" + display_plan(plan.input, indent + 1)
    if isinstance(plan, Limit):
        return f"{pad}Limit: skip={plan.skip}, fetch={plan.fetch}\n" + \
            display_plan(plan.input, indent + 1)
    if isinstance(plan, Join):
        on = ", ".join(f"{l.display_name()} = {r.display_name()}" for l, r in plan.on)
        return f"{pad}{plan.how.capitalize()} Join: {on}\n" + \
            display_plan(plan.left, indent + 1) + display_plan(plan.right, indent + 1)
    out = f"{pad}{type(plan).__name__}\n"
    for c in plan.children():
        out += display_plan(c, indent + 1)
    return out
