"""Logical → physical lowering + basic optimizer passes.

Passes (mirroring the reference's use of DataFusion's optimizer plus its own
rules, exon-core/src/physical_optimizer/):
  1. projection pushdown into scans
  2. filter pushdown into scans (providers declare exact/inexact/none, like
     supports_filters_pushdown in vcf/table_provider.rs:299-320); exact
     filters are removed from the residual FilterExec
  3. lowering to streaming physical operators
"""

from __future__ import annotations

from typing import Optional

from .. import datatypes as dt
from ..datatypes import Field, Schema
from ..errors import PlanError
from . import logical as L
from . import physical as P
from .expressions import (AggregateCall, Alias, BinaryOp, Cast, ColumnRef,
                          Expr, FunctionCall, InList, IsNull, Like, Literal,
                          Not, conjoin, expr_columns, split_conjunction)

# return-dtype registry for scalar functions (populated by udfs module)
_FUNCTION_RETURN_TYPES: dict[str, callable] = {}


def register_function_type(name: str, fn) -> None:
    """fn(arg_fields: list[Field]) -> DataType"""
    _FUNCTION_RETURN_TYPES[name.lower()] = fn


def infer_expr_field(expr: Expr, schema: Schema) -> Field:
    if isinstance(expr, Alias):
        inner = infer_expr_field(expr.child, schema)
        return Field(expr.name, inner.dtype, inner.nullable)
    if isinstance(expr, ColumnRef):
        return schema.field(expr.name)
    if isinstance(expr, Literal):
        v = expr.value
        if isinstance(v, bool):
            return Field(expr.display_name(), dt.bool_, False)
        if isinstance(v, int):
            return Field(expr.display_name(), dt.int64, False)
        if isinstance(v, float):
            return Field(expr.display_name(), dt.float64, False)
        if isinstance(v, str):
            return Field(expr.display_name(), dt.utf8, False)
        if v is None:
            return Field("NULL", dt.utf8, True)
        raise PlanError(f"literal type {type(v)}")
    if isinstance(expr, (Like, IsNull, InList, Not)):
        return Field(expr.display_name(), dt.bool_, True)
    if isinstance(expr, Cast):
        return Field(expr.display_name(), expr.dtype, True)
    if isinstance(expr, BinaryOp):
        if expr.op in ("=", "!=", "<", "<=", ">", ">=", "and", "or"):
            return Field(expr.display_name(), dt.bool_, True)
        lf = infer_expr_field(expr.left, schema)
        rf = infer_expr_field(expr.right, schema)
        if expr.op == "/":
            out = lf.dtype if lf.dtype.kind.value.startswith("float") else (
                rf.dtype if rf.dtype.kind.value.startswith("float") else dt.int64)
        else:
            ranked = [lf.dtype, rf.dtype]
            order = ["int8", "int16", "int32", "int64", "float32", "float64"]
            out = max(ranked, key=lambda d: order.index(d.kind.value)
                      if d.kind.value in order else 0)
        return Field(expr.display_name(), out, True)
    if isinstance(expr, FunctionCall):
        fn = _FUNCTION_RETURN_TYPES.get(expr.name.lower())
        if fn is None:
            return Field(expr.display_name(), dt.float64, True)
        args = [infer_expr_field(a, schema) for a in expr.args
                if not isinstance(a, Literal)]
        return Field(expr.display_name(), fn(args), True)
    from .expressions import FieldAccess

    if isinstance(expr, FieldAccess):
        # table-qualified ref (a.seqname) before resolution: the qualifier
        # is not a column of the schema — type as the bare column
        if isinstance(expr.child, ColumnRef) and \
                not schema.has_field(expr.child.name) and \
                schema.has_field(expr.field):
            return schema.field(expr.field)
        child = infer_expr_field(expr.child, schema)
        if child.dtype.kind == dt.TypeKind.STRUCT:
            for f in child.dtype.children:
                if f.name == expr.field:
                    return Field(expr.field, f.dtype, True)
            raise PlanError(f"no field named {expr.field!r} in struct "
                            f"{child.name!r}")
        if child.dtype.kind == dt.TypeKind.MAP:
            # map value lookup: attributes.ID → value type, nullable
            kv = child.dtype.value_type
            val = next(f.dtype for f in kv.children
                       if f.name in ("value", "values"))
            return Field(expr.field, val, True)
        raise PlanError(f"field access on non-struct column {child.name!r}")
    from .expressions import Subscript

    if isinstance(expr, Subscript):
        child = infer_expr_field(expr.child, schema)
        iv = expr.index.value if isinstance(expr.index, Literal) else None
        if child.dtype.kind == dt.TypeKind.MAP and isinstance(iv, str):
            kv = child.dtype.value_type
            val = next(f.dtype for f in kv.children
                       if f.name in ("value", "values"))
            return Field(expr.display_name(), val, True)
        if child.dtype.kind == dt.TypeKind.LIST:
            return Field(expr.display_name(), child.dtype.value_type, True)
        if child.dtype.kind == dt.TypeKind.STRUCT and isinstance(iv, str):
            for f in child.dtype.children:
                if f.name == iv:
                    return Field(iv, f.dtype, True)
        raise PlanError(f"cannot type subscript on {child.dtype}")
    from .expressions import Case

    if isinstance(expr, Case):
        results = [t for _w, t in expr.whens]
        if expr.else_ is not None:
            results.append(expr.else_)
        fields = [infer_expr_field(r, schema) for r in results
                  if not (isinstance(r, Literal) and r.value is None)]
        if not fields:
            return Field("case", dt.utf8, True)
        if all(f.dtype.kind.value in ("utf8", "dictionary") for f in fields):
            return Field("case", dt.utf8, True)
        order = ["bool", "int8", "int16", "int32", "int64", "float32",
                 "float64"]
        out = max((f.dtype for f in fields),
                  key=lambda d: order.index(d.kind.value)
                  if d.kind.value in order else 0)
        return Field("case", out, True)
    if isinstance(expr, AggregateCall):
        if expr.fn == "count":
            return Field(expr.display_name(), dt.int64, False)
        if expr.fn == "avg":
            return Field(expr.display_name(), dt.float64, True)
        inner = infer_expr_field(expr.child, schema)
        return Field(expr.display_name(), inner.dtype, True)
    from .expressions import WindowCall

    if isinstance(expr, WindowCall):
        return infer_window_field(expr, expr.display_name(), schema)
    raise PlanError(f"cannot infer type of {expr!r}")


def infer_window_field(call, name: str, schema: Schema) -> Field:
    if call.fn in ("row_number", "rank", "dense_rank", "count", "ntile"):
        return Field(name, dt.int64, False)
    if call.fn in ("percent_rank", "cume_dist"):
        return Field(name, dt.float64, False)
    if call.fn == "avg":
        return Field(name, dt.float64, True)
    inner = infer_expr_field(call.child, schema)
    return Field(name, inner.dtype, True)


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def optimize(plan: L.LogicalPlan) -> L.LogicalPlan:
    plan = _resolve_field_access(plan)
    plan = _push_filters(plan)
    plan = _push_projection(plan)
    plan = _elide_identity_projects(plan)
    plan = _annotate_prefix_hints(plan)
    return plan


def _elide_identity_projects(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Drop Project nodes that are exact identities of their input schema
    (bare ColumnRefs, same names, same order) — after projection pushdown
    the scan already narrows, and breaker operators (Sort, distributed
    routing) fast-path a bare Scan child."""
    from .expressions import ColumnRef

    kids = [_elide_identity_projects(c) for c in plan.children()]
    plan = _with_children(plan, kids)
    if isinstance(plan, L.Project):
        child_names = plan.input.schema().names
        if (len(plan.exprs) == len(child_names)
                and all(isinstance(e, ColumnRef) for e in plan.exprs)
                and [e.name for e in plan.exprs] == list(child_names)):
            return plan.input
    return plan


def _map_plan_exprs(plan: L.LogicalPlan, fn) -> L.LogicalPlan:
    """Rebuild a plan with every embedded expression mapped through fn
    (fn receives the expr and the node's input schema)."""
    import dataclasses as _dc

    kids = [_map_plan_exprs(c, fn) for c in plan.children()]
    if isinstance(plan, L.Scan):
        return plan
    in_schema = kids[0].schema() if kids else None

    def m(e):
        return fn(e, in_schema)

    if isinstance(plan, L.Filter):
        return L.Filter(m(plan.predicate), kids[0])
    if isinstance(plan, L.Project):
        return _dc.replace(plan, exprs=[m(e) for e in plan.exprs],
                           input=kids[0])
    if isinstance(plan, L.Aggregate):
        return _dc.replace(plan, group_exprs=[m(e) for e in plan.group_exprs],
                           agg_exprs=[m(e) for e in plan.agg_exprs],
                           input=kids[0])
    if isinstance(plan, L.Sort):
        keys = [(m(k[0]),) + tuple(k[1:]) for k in plan.keys]
        return _dc.replace(plan, keys=keys, input=kids[0])
    if kids:
        names = [f.name for f in _dc.fields(plan)]
        updates = {}
        ki = 0
        for name in names:
            v = getattr(plan, name)
            if isinstance(v, L.LogicalPlan):
                updates[name] = kids[ki]
                ki += 1
        return _dc.replace(plan, **updates)
    return plan


def _resolve_field_access(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Turn parse-time dotted refs into either struct FieldAccess (child is
    a struct column of the input schema) or a plain ColumnRef (the dot was
    a table qualifier)."""
    from .expressions import FieldAccess

    def resolve(e: Expr, schema) -> Expr:
        if isinstance(e, FieldAccess):
            child = resolve(e.child, schema)
            if isinstance(child, ColumnRef) and schema is not None:
                try:
                    f = schema.field(child.name)
                except Exception:
                    f = None
                if f is not None and f.dtype.kind.value in ("struct", "map"):
                    return FieldAccess(child, e.field)
                # table-qualified column: strip the qualifier
                return ColumnRef(e.field)
            return FieldAccess(child, e.field)
        kids = e.children()
        if not kids:
            return e
        import dataclasses as _dc

        updates = {}
        for fld in _dc.fields(e):
            v = getattr(e, fld.name)
            if isinstance(v, Expr):
                updates[fld.name] = resolve(v, schema)
            elif isinstance(v, list) and v and isinstance(v[0], Expr):
                updates[fld.name] = [resolve(x, schema) for x in v]
        return _dc.replace(e, **updates)

    return _map_plan_exprs(plan, resolve)


# ---------------------------------------------------------------------------
# Late materialization: prefix-bounded string staging
# ---------------------------------------------------------------------------

_PREFIX_CAP = 64


def _expr_prefix_bound(e: Expr, colname: str) -> Optional[int]:
    """Max prefix bytes this expression needs of ``colname``; None = full."""
    if isinstance(e, ColumnRef):
        return None if e.name == colname else 0
    if isinstance(e, Like) and isinstance(e.child, ColumnRef) \
            and e.child.name == colname:
        pat = e.pattern
        if "_" in pat or getattr(e, "escape", None) is not None:
            return None
        parts = pat.split("%")
        if len(parts) == 1:
            return len(parts[0]) if len(parts[0]) <= _PREFIX_CAP else None
        if len(parts) == 2 and parts[1] == "":
            return len(parts[0]) if len(parts[0]) <= _PREFIX_CAP else None
        return None
    if isinstance(e, BinaryOp) and e.op in ("=", "!="):
        lit_side = col_side = None
        if isinstance(e.left, ColumnRef) and e.left.name == colname and \
                isinstance(e.right, Literal) and isinstance(e.right.value, str):
            lit_side = e.right.value
        elif isinstance(e.right, ColumnRef) and e.right.name == colname and \
                isinstance(e.left, Literal) and isinstance(e.left.value, str):
            lit_side = e.left.value
        if lit_side is not None:
            return len(lit_side) if len(lit_side) <= _PREFIX_CAP else None
    if isinstance(e, FunctionCall) and e.name.lower() in ("length", "char_length"):
        if len(e.args) == 1 and isinstance(e.args[0], ColumnRef) \
                and e.args[0].name == colname:
            return 0
    # generic: combine over children; direct ref anywhere else → full
    bound = 0
    for c in e.children():
        b = _expr_prefix_bound(c, colname)
        if b is None:
            return None
        bound = max(bound, b)
    return bound


def _annotate_prefix_hints(plan: L.LogicalPlan) -> L.LogicalPlan:
    """If a scan's var-width column is consumed ONLY by prefix-bounded filter
    predicates, tell the provider to stage prefixes instead of full values."""

    def walk(p: L.LogicalPlan, filters_above: list) -> L.LogicalPlan:
        if isinstance(p, L.Filter):
            return L.Filter(p.predicate, walk(p.input, filters_above + [p.predicate]))
        if isinstance(p, L.Scan):
            schema = p.schema()
            non_filter_cols: set[str] = set()
            # any column in the scan's projection that later ops read comes
            # through the schema; filter-only columns were added by pushdown
            hints: dict[str, int] = {}
            preds = list(filters_above) + [f for f in p.filters]
            for f in schema.all_fields:
                if not f.dtype.is_var_width:
                    continue
                bounds = [_expr_prefix_bound(e, f.name) for e in preds]
                if any(b is None for b in bounds):
                    continue
                used_in_filters = any(f.name in expr_columns(e) for e in preds)
                if not used_in_filters:
                    continue
                if _used_outside_filters(plan, p, f.name):
                    continue
                # a column in the scan's OUTPUT must materialize fully:
                # with exact-pushed scan filters there may be no Project
                # above to witness the read (SELECT * ... WHERE LIKE)
                if p.projection is None or f.name in p.projection:
                    continue
                hints[f.name] = max([b for b in bounds] + [1])
            if hints:
                return L.Scan(p.provider, p.table_name, p.projection,
                              p.filters, p.fetch, prefix_hints=hints)
            return p
        kids = [walk(c, []) for c in p.children()]
        return _with_children(p, kids)

    return walk(plan, [])


def _used_outside_filters(root: L.LogicalPlan, scan: L.LogicalPlan,
                          colname: str) -> bool:
    """Does ``colname`` from this scan feed anything but Filter predicates?"""
    out = [False]

    def exprs_of(p) -> list:
        if isinstance(p, L.Project):
            return list(p.exprs)
        if isinstance(p, L.Aggregate):
            return list(p.group_exprs) + [c for a in p.agg_exprs
                                          for c in a.children()]
        if isinstance(p, L.Sort):
            return [e for e, _ in p.keys]
        if isinstance(p, L.Join):
            es = [x for pair in p.on for x in pair]
            if p.filter is not None:
                es.append(p.filter)
            return es
        return []

    def walk(p):
        for e in exprs_of(p):
            if colname in expr_columns(e):
                out[0] = True
        for c in p.children():
            walk(c)

    walk(root)
    return out[0]


def _push_filters(plan: L.LogicalPlan) -> L.LogicalPlan:
    if isinstance(plan, L.Filter):
        child = _push_filters(plan.input)
        if isinstance(child, L.Scan):
            conjs = split_conjunction(plan.predicate)
            pushed, residual = [], []
            for c in conjs:
                verdict = child.provider.supports_filter_pushdown(c)
                if verdict in ("exact", "inexact"):
                    pushed.append(c)
                if verdict != "exact":
                    residual.append(c)
            if pushed:
                child = L.Scan(child.provider, child.table_name,
                               child.projection, child.filters + tuple(pushed),
                               child.fetch)
            if not residual:
                return child
            from .expressions import conjoin

            return L.Filter(conjoin(residual), child)
        return L.Filter(plan.predicate, child)
    kids = [_push_filters(c) for c in plan.children()]
    return _with_children(plan, kids)


def _push_projection(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Compute required columns top-down; narrow Scan.projection."""

    def required(p: L.LogicalPlan, needed: Optional[set]) -> L.LogicalPlan:
        if isinstance(p, L.Scan):
            if needed is None:
                return p
            schema = p.provider.schema()
            cols = [n for n in schema.names if n in needed]
            for f in p.filters:
                for n in expr_columns(f):
                    if n not in cols and schema.has_field(n):
                        cols.append(n)
            # preserve schema order; COUNT(*)-style plans still need one
            # column so batches keep a row capacity
            cols = [n for n in schema.names if n in cols]
            if not cols and schema.names:
                cols = [_cheapest_column(schema)]
            return L.Scan(p.provider, p.table_name, cols, p.filters, p.fetch)
        if isinstance(p, L.Filter):
            need = None if needed is None else needed | expr_columns(p.predicate)
            return L.Filter(p.predicate, required(p.input, need))
        if isinstance(p, L.Project):
            need = set()
            for e in p.exprs:
                need |= expr_columns(e)
            return L.Project(p.exprs, required(p.input, need))
        if isinstance(p, L.Aggregate):
            need = set()
            for e in list(p.group_exprs) + list(p.agg_exprs):
                need |= expr_columns(e)
            # COUNT(*) over a bare scan needs NO columns at all: the
            # ungrouped-count fast path (physical.py _ungrouped) only reads
            # batch lengths, so the provider can skip field decode entirely
            # (pushed-down Scan.filters are fine: providers that plan a
            # residual FilterExec widen their internal scan projection
            # themselves, e.g. VcfTable chrom/pos)
            if (not p.group_exprs and not need and p.agg_exprs
                    and isinstance(p.input, L.Scan)
                    and all(getattr(e, "fn", None) == "count"
                            and getattr(e, "child", True) is None
                            for e in p.agg_exprs)):
                s = p.input
                scan = L.Scan(s.provider, s.table_name, [], s.filters,
                              s.fetch)
                return L.Aggregate(p.group_exprs, p.agg_exprs, p.agg_names,
                                   scan)
            return L.Aggregate(p.group_exprs, p.agg_exprs, p.agg_names,
                               required(p.input, need))
        if isinstance(p, L.Sort):
            need = None if needed is None else set(needed)
            if need is not None:
                for e, _ in p.keys:
                    need |= expr_columns(e)
            return L.Sort(p.keys, required(p.input, need), p.fetch)
        if isinstance(p, L.Limit):
            return L.Limit(p.skip, p.fetch, required(p.input, needed))
        if isinstance(p, L.Window):
            need = None
            if needed is not None:
                need = {n for n in needed if n not in p.names}
                for call in p.calls:
                    for e in call.children():
                        need |= expr_columns(e)
            return L.Window(p.calls, p.names, required(p.input, need))
        if isinstance(p, L.Join):
            lneed = rneed = None
            if needed is not None:
                lschema = p.left.schema()
                rschema = p.right.schema()
                on_cols = set()
                for le, re in p.on:
                    on_cols |= expr_columns(le) | expr_columns(re)
                if p.filter is not None:
                    on_cols |= expr_columns(p.filter)
                all_need = needed | on_cols
                lneed = {n for n in all_need if lschema.has_field(n)}
                rneed = {n for n in all_need if rschema.has_field(n)}
                # renamed output columns map back to the right child's
                # bare column names (pinned map first, suffix fallback)
                reverse = {v: k for k, v in (p.right_names or {}).items()}
                for n in all_need:
                    if rschema.has_field(n):
                        continue
                    bare = reverse.get(n)
                    if bare is None and n.endswith("_right"):
                        bare = n[:-len("_right")]
                    if bare is not None and rschema.has_field(bare):
                        rneed.add(bare)
            return L.Join(required(p.left, lneed), required(p.right, rneed),
                          p.on, p.how, p.filter, p.right_names)
        kids = [required(c, None) for c in p.children()]
        return _with_children(p, kids)

    return required(plan, None)


def _cheapest_column(schema: Schema) -> str:
    for f in schema.all_fields:
        if f.dtype.is_fixed_width or f.dtype.kind.value == "dictionary":
            return f.name
    return schema.names[0]


def _with_children(plan: L.LogicalPlan, kids: list) -> L.LogicalPlan:
    import dataclasses as dc

    if isinstance(plan, (L.Scan, L.Values)):
        return plan
    if isinstance(plan, L.Filter):
        return L.Filter(plan.predicate, kids[0])
    if isinstance(plan, L.Project):
        return L.Project(plan.exprs, kids[0])
    if isinstance(plan, L.Aggregate):
        return L.Aggregate(plan.group_exprs, plan.agg_exprs, plan.agg_names, kids[0])
    if isinstance(plan, L.Sort):
        return L.Sort(plan.keys, kids[0], plan.fetch)
    if isinstance(plan, L.Limit):
        return L.Limit(plan.skip, plan.fetch, kids[0])
    if isinstance(plan, L.Join):
        return L.Join(kids[0], kids[1], plan.on, plan.how, plan.filter,
                      plan.right_names)
    if isinstance(plan, L.Window):
        return L.Window(plan.calls, plan.names, kids[0])
    if isinstance(plan, L.Union):
        return L.Union(kids)
    if isinstance(plan, L.Repeat):
        return L.Repeat(plan.count_expr, kids[0])
    if isinstance(plan, L.CopyTo):
        return L.CopyTo(kids[0], plan.target_url, plan.file_format, plan.options)
    if isinstance(plan, L.Explain):
        return L.Explain(kids[0], plan.analyze)
    return plan


# ---------------------------------------------------------------------------
# Lowering
# ---------------------------------------------------------------------------


def create_physical_plan(plan: L.LogicalPlan, config=None) -> P.PhysicalPlan:
    if isinstance(plan, L.Scan):
        kwargs = {}
        if getattr(plan, "prefix_hints", None):
            kwargs["prefix_hints"] = plan.prefix_hints
        try:
            return plan.provider.scan(plan.projection, list(plan.filters),
                                      plan.fetch, **kwargs)
        except TypeError:
            return plan.provider.scan(plan.projection, list(plan.filters),
                                      plan.fetch)
    if isinstance(plan, L.Filter):
        return P.FilterExec(plan.predicate,
                            create_physical_plan(plan.input, config))
    if isinstance(plan, L.Project):
        child = create_physical_plan(plan.input, config)
        return P.ProjectExec(plan.exprs, plan.schema(), child)
    if isinstance(plan, L.Aggregate):
        if config is not None and getattr(config, "distributed", False):
            from ..parallel.distributed import plan_distributed_aggregate

            dist = plan_distributed_aggregate(plan, config)
            if dist is not None:
                return dist
        # fuse a directly-underlying Filter into the aggregate: the mask
        # feeds the segment reductions, skipping row materialization
        pre_filter = None
        inner = plan.input
        if isinstance(inner, L.Filter):
            pre_filter = inner.predicate
            inner = inner.input
        child = create_physical_plan(inner, config)
        return P.AggregateExec(plan.group_exprs, plan.agg_exprs, plan.schema(),
                               child, pre_filter=pre_filter)
    if isinstance(plan, L.Sort):
        if plan.fetch is not None and config is not None and \
                getattr(config, "distributed", False):
            from ..parallel.distributed import plan_distributed_topk

            dist = plan_distributed_topk(plan, plan.fetch, config)
            if dist is not None:
                return dist
        if config is not None and getattr(config, "distributed", False):
            # multi-host full ORDER BY: per-process sorted runs + merge
            from ..parallel.distributed import plan_distributed_sort

            dist = plan_distributed_sort(plan, config)
            if dist is not None:
                return dist
        return P.SortExec(plan.keys, create_physical_plan(plan.input, config),
                          plan.fetch)
    if isinstance(plan, L.Limit):
        # Sort+Limit → distributed TopK over the mesh when enabled
        if plan.fetch is not None and isinstance(plan.input, L.Sort) and \
                config is not None and getattr(config, "distributed", False):
            from ..parallel.distributed import plan_distributed_topk

            dist = plan_distributed_topk(plan.input, plan.skip + plan.fetch,
                                         config)
            if dist is not None:
                return P.LimitExec(plan.skip, plan.fetch, dist)
        # Limit(Sort) → SortExec with fetch (TopK): each external-sort run
        # truncates to skip+fetch rows, so LIMIT over a huge ORDER BY stays
        # bounded
        if plan.fetch is not None and isinstance(plan.input, L.Sort) and \
                plan.input.fetch is None:
            child = P.SortExec(plan.input.keys,
                               create_physical_plan(plan.input.input, config),
                               fetch=plan.skip + plan.fetch)
            return P.LimitExec(plan.skip, plan.fetch, child)
        return P.LimitExec(plan.skip, plan.fetch,
                           create_physical_plan(plan.input, config))
    if isinstance(plan, L.Window):
        from .window_exec import WindowExec

        if config is not None and getattr(config, "distributed", False):
            from ..parallel.distributed import plan_distributed_window

            dist = plan_distributed_window(plan, config)
            if dist is not None:
                return dist
        return WindowExec(plan.calls, plan.names, plan.schema(),
                          create_physical_plan(plan.input, config))
    if isinstance(plan, L.Union):
        return P.UnionExec([create_physical_plan(c, config)
                            for c in plan.inputs])
    if isinstance(plan, L.Repeat):
        return P.RepeatExec(plan.count_expr,
                            create_physical_plan(plan.input, config))
    if isinstance(plan, L.Values):
        return P.ValuesExec(plan.out_schema, plan.rows)
    if isinstance(plan, L.Join):
        from .join_exec import JoinExec

        if config is not None and getattr(config, "distributed", False):
            if getattr(config, "partitioned_join", False):
                from ..parallel.distributed import \
                    plan_distributed_partitioned_join

                dist = plan_distributed_partitioned_join(plan, config)
                if dist is not None:
                    return dist
            from ..parallel.distributed import plan_distributed_join

            dist = plan_distributed_join(plan, config)
            if dist is not None:
                return dist
        return JoinExec(create_physical_plan(plan.left, config),
                        create_physical_plan(plan.right, config),
                        plan.on, plan.how, plan.filter,
                        plan.schema())
    if isinstance(plan, L.CopyTo):
        from ..sinks.writers import CopyToExec

        return CopyToExec(create_physical_plan(plan.input, config),
                          plan.input.schema(),
                          plan.target_url, plan.file_format, plan.options)
    raise PlanError(f"cannot lower {type(plan).__name__}")
