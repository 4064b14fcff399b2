"""Region predicate inference + rewriting.

Reimplements the reference's region pushdown surface
(physical_plan/infer_region.rs:25-42, region_physical_expr.rs:46-151, and
the rewrite rules of docs/vcf_expression_rewriting.md):

  * marker UDFs (`vcf_region_filter('17:100-200', chrom, pos)`,
    `bam_region_filter`, …) carry a literal region; providers declare them
    Exact and extract the Region at scan time
  * plain predicates (`chrom = '17' AND pos BETWEEN 100 AND 200`) are
    recognized and rewritten into regions for index pruning
  * each region lowers back to an executable device predicate
    (point semantics for VCF pos; interval-overlap for start/end formats)

Intervals are 1-based inclusive (docs/vcf_expression_rewriting.md:92).
"""

from __future__ import annotations

from typing import Optional

from ..errors import InvalidRegionError
from ..io.indexes import Region
from .expressions import (BinaryOp, ColumnRef, Expr, FunctionCall, Literal,
                          conjoin, split_conjunction)

REGION_FILTER_UDFS = {
    "vcf_region_filter": "point",        # (region, chrom, pos)
    "bcf_region_filter": "point",
    "bam_region_filter": "interval",     # (region, reference[, start, end])
    "cram_region_filter": "interval",
    "sam_region_filter": "interval",
    "gff_region_filter": "interval",
    "bigwig_region_filter": "interval",
    "fasta_region_filter": "name",       # (region, id)
}


def infer_region_from_expr(expr: Expr) -> Optional[Region]:
    """Extract a Region from a marker UDF call (infer_region.rs:25-42)."""
    if isinstance(expr, FunctionCall) and expr.name.lower() in REGION_FILTER_UDFS:
        if not expr.args or not isinstance(expr.args[0], Literal):
            raise InvalidRegionError(
                f"{expr.name} requires a literal region argument")
        return Region.parse(str(expr.args[0].value))
    # `f(...) = true` form
    if isinstance(expr, BinaryOp) and expr.op == "=":
        if isinstance(expr.right, Literal) and expr.right.value is True:
            return infer_region_from_expr(expr.left)
        if isinstance(expr.left, Literal) and expr.left.value is True:
            return infer_region_from_expr(expr.right)
    return None


def is_region_filter(expr: Expr) -> bool:
    try:
        if infer_region_from_expr(expr) is not None:
            return True
    except InvalidRegionError:
        return True  # it *is* one, just malformed — let scan raise
    if isinstance(expr, BinaryOp) and expr.op == "or":
        return is_region_filter(expr.left) and is_region_filter(expr.right)
    return False


def infer_regions_from_filters(filters) -> list[Region]:
    out = []

    def visit(f) -> bool:
        r = infer_region_from_expr(f)
        if r is not None:
            out.append(r)
            return True
        # OR of region markers (region-file expansion) extracts every branch
        if isinstance(f, BinaryOp) and f.op == "or":
            left = visit(f.left)
            return visit(f.right) and left
        return False

    for f in filters:
        visit(f)
    return out


def rewrite_plain_predicates(filters: list[Expr], chrom_col: str,
                             pos_cols: tuple[str, ...]) -> Optional[Region]:
    """Recognize `chrom = 'x' [AND pos >=/<=/= N]` conjunction shapes
    (the ExonChromOptimizer + pos-interval rewrites,
    physical_optimizer/chrom_optimizer_rule.rs:26-88)."""
    name = None
    lo = None
    hi = None
    for f in filters:
        for c in split_conjunction(f):
            if not isinstance(c, BinaryOp):
                continue
            left, right, op = c.left, c.right, c.op
            if isinstance(right, ColumnRef) and isinstance(left, Literal):
                left, right = right, left
                op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
            if not (isinstance(left, ColumnRef) and isinstance(right, Literal)):
                continue
            if left.name == chrom_col and op == "=":
                name = str(right.value)
            elif left.name in pos_cols:
                v = right.value
                if not isinstance(v, int):
                    continue
                if op == "=":
                    lo, hi = v, v
                elif op in (">=",):
                    lo = v
                elif op == ">":
                    lo = v + 1
                elif op in ("<=",):
                    hi = v
                elif op == "<":
                    hi = v - 1
    if name is None:
        return None
    return Region(name, lo, hi)


def region_to_point_expr(region: Region, chrom_col: str, pos_col: str) -> Expr:
    """chrom == name AND pos within [start, end] (VCF/BCF row semantics,
    exon-vcf/src/indexed_async_batch_stream.rs:99-115)."""
    from .expressions import col, lit

    e: Expr = BinaryOp("=", col(chrom_col), lit(region.name))
    if region.start is not None:
        e = BinaryOp("and", e, BinaryOp(">=", col(pos_col), lit(region.start)))
    if region.end is not None:
        e = BinaryOp("and", e, BinaryOp("<=", col(pos_col), lit(region.end)))
    return e


def region_to_interval_expr(region: Region, chrom_col: str, start_col: str,
                            end_col: str) -> Expr:
    """chrom == name AND [start_col, end_col] overlaps region (1-based,
    BAM/GFF semantics — exon-bam/src/indexed_async_batch_stream.rs:66-88)."""
    from .expressions import col, lit

    e: Expr = BinaryOp("=", col(chrom_col), lit(region.name))
    if region.end is not None:
        e = BinaryOp("and", e, BinaryOp("<=", col(start_col), lit(region.end)))
    if region.start is not None:
        e = BinaryOp("and", e, BinaryOp(">=", col(end_col), lit(region.start)))
    return e
