"""Scalar UDF kernels — the bio function library.

TPU re-implementations of the reference's UDFs
(exon-core/src/udfs/sequence/mod.rs:37-69, udfs/sam/samflags.rs:111-135,
udfs/vcf/mod.rs): every function operates on whole device batches as
vectorized jnp ops (gathers + segment reductions over the flat byte
buffers), so they fuse into the surrounding predicate/projection pipeline.

Functions are registered into plan.expressions' function registry and
annotated with return types for the planner.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import datatypes as dt
from .batch import Batch, DictColumn, FixedColumn, VarColumn
from .errors import PlanError
from .ops.layout import byte_row_ids, live_byte_mask, row_lengths
from .plan.expressions import register_function
from .plan.planner import register_function_type


def _require_var(v, fn: str) -> VarColumn:
    if not isinstance(v, VarColumn):
        raise PlanError(f"{fn} expects a string/sequence column")
    return v


def _per_row_count(col: VarColumn, byte_mask: jnp.ndarray) -> jnp.ndarray:
    """Count flagged bytes per row (segment-sum over the flat buffer)."""
    vcap = col.value_capacity
    rid = jnp.clip(byte_row_ids(col.offsets, vcap), 0, col.capacity - 1)
    return jnp.zeros(col.capacity, jnp.int32).at[rid].add(byte_mask.astype(jnp.int32))


# -- gc_content (udfs/sequence/gc_content.rs) -------------------------------


def gc_content(batch: Batch, seq) -> jnp.ndarray:
    col = _require_var(seq, "gc_content")
    v = col.values
    is_gc = (v == ord("G")) | (v == ord("C")) | (v == ord("g")) | (v == ord("c"))
    gc = _per_row_count(col, is_gc)
    lens = row_lengths(col.offsets)
    return jnp.where(lens > 0, gc.astype(jnp.float32) / lens.astype(jnp.float32), 0.0)


# -- reverse_complement (udfs/sequence/reverse_complement.rs) ---------------

_COMPLEMENT = np.arange(256, dtype=np.uint8)
for a, b in [(b"A", b"T"), (b"C", b"G"), (b"G", b"C"), (b"T", b"A"),
             (b"a", b"t"), (b"c", b"g"), (b"g", b"c"), (b"t", b"a"),
             (b"N", b"N"), (b"n", b"n"), (b"U", b"A"), (b"u", b"a")]:
    _COMPLEMENT[a[0]] = b[0]


def reverse_complement(batch: Batch, seq) -> VarColumn:
    col = _require_var(seq, "reverse_complement")
    vcap = col.value_capacity
    rid = jnp.clip(byte_row_ids(col.offsets, vcap), 0, col.capacity - 1)
    starts = col.offsets[:-1][rid]
    ends = col.offsets[1:][rid]
    pos = jnp.arange(vcap, dtype=jnp.int32)
    mirror = jnp.clip(starts + (ends - 1 - pos), 0, vcap - 1)
    comp = jnp.asarray(_COMPLEMENT)
    out_vals = comp[col.values[mirror]]
    return VarColumn(out_vals, col.offsets, col.validity)


# -- integer encodings (udfs/sequence/integer_encoding.rs;
#    encodings per exon-fasta/src/array_builder.rs:144-205) ----------------

from .formats.fasta import DNA_CODE  # A,C,G,T,N → 1..5


def integer_encode_dna(batch: Batch, seq) -> VarColumn:
    col = _require_var(seq, "integer_encode_dna")
    table = jnp.asarray(DNA_CODE)
    return VarColumn(table[col.values], col.offsets, col.validity)


# -- quality scores (udfs/sequence/quality_score_*.rs) ----------------------


def quality_score_string_to_list(batch: Batch, q) -> VarColumn:
    """Phred+33 ASCII string → List<Int64> of scores."""
    col = _require_var(q, "quality_score_string_to_list")
    scores = col.values.astype(jnp.int64) - 33
    return VarColumn(scores, col.offsets, col.validity)


def quality_score_list_to_string(batch: Batch, q) -> VarColumn:
    if not isinstance(q, VarColumn):
        raise PlanError("quality_score_list_to_string expects a list column")
    vals = (q.values.astype(jnp.int32) + 33).astype(jnp.uint8)
    return VarColumn(vals, q.offsets, q.validity)


# -- trim_polya (udfs/sequence/trim_polya.rs): strip trailing A/a run -------


def trim_polya(batch: Batch, seq) -> VarColumn:
    col = _require_var(seq, "trim_polya")
    vcap = col.value_capacity
    v = col.values
    is_a = (v == ord("A")) | (v == ord("a"))
    rid = jnp.clip(byte_row_ids(col.offsets, vcap), 0, col.capacity - 1)
    pos = jnp.arange(vcap, dtype=jnp.int32)
    # within each row, find the last non-A position (scatter-max)
    last_non_a = jnp.full(col.capacity, -1, jnp.int32).at[rid].max(
        jnp.where(is_a, -1, pos - col.offsets[:-1][rid]))
    lens = row_lengths(col.offsets)
    new_lens = jnp.where(lens > 0, last_non_a + 1, 0)
    # new offsets: keep values in place but shorten rows ⇒ must re-lay out
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(new_lens, dtype=jnp.int32)])
    from .ops.layout import relayout_values

    out_vals = relayout_values(col.values, col.offsets[:-1], new_off, vcap)
    return VarColumn(out_vals, new_off, col.validity)


# -- char length ------------------------------------------------------------


def length_fn(batch: Batch, v) -> jnp.ndarray:
    if isinstance(v, VarColumn):
        return row_lengths(v.offsets).astype(jnp.int64)
    raise PlanError("length expects a string column")


# -- SAM flag predicates (udfs/sam/samflags.rs:111-135) ---------------------

SAM_FLAGS = {
    "is_paired": 0x1,
    "is_properly_aligned": 0x2,
    "is_unmapped": 0x4,
    "is_mate_unmapped": 0x8,
    "is_reverse_complemented": 0x10,
    "is_mate_reverse_complemented": 0x20,
    "is_first_segment": 0x40,
    "is_last_segment": 0x80,
    "is_secondary": 0x100,
    "is_qc_fail": 0x200,
    "is_duplicate": 0x400,
    "is_supplementary": 0x800,
}


def _make_flag_fn(bit: int):
    def fn(batch: Batch, flags) -> jnp.ndarray:
        if isinstance(flags, FixedColumn):
            vals = flags.values
        else:
            vals = jnp.asarray(flags)
        return (vals.astype(jnp.int32) & bit) != 0

    return fn


def is_mapped(batch: Batch, flags) -> jnp.ndarray:
    vals = flags.values if isinstance(flags, FixedColumn) else jnp.asarray(flags)
    return (vals.astype(jnp.int32) & 0x4) == 0


# -- registration -----------------------------------------------------------


def _utf8_type(args):
    return dt.utf8


def _f32_type(args):
    return dt.float32


def _i64_type(args):
    return dt.int64


def _bool_type(args):
    return dt.bool_


def _list_i64_type(args):
    return dt.list_(dt.int64)


def _list_i8_type(args):
    return dt.list_(dt.int8)


def _register_all() -> None:
    register_function("gc_content", gc_content)
    register_function_type("gc_content", _f32_type)
    register_function("reverse_complement", reverse_complement)
    register_function_type("reverse_complement", _utf8_type)
    register_function("integer_encode_dna", integer_encode_dna)
    register_function_type("integer_encode_dna", _list_i8_type)
    register_function("quality_score_string_to_list", quality_score_string_to_list)
    register_function_type("quality_score_string_to_list", _list_i64_type)
    register_function("quality_score_list_to_string", quality_score_list_to_string)
    register_function_type("quality_score_list_to_string", _utf8_type)
    register_function("trim_polya", trim_polya)
    register_function_type("trim_polya", _utf8_type)
    register_function("length", length_fn)
    register_function_type("length", _i64_type)
    register_function("char_length", length_fn)
    register_function_type("char_length", _i64_type)
    for name, bit in SAM_FLAGS.items():
        register_function(name, _make_flag_fn(bit))
        register_function_type(name, _bool_type)
    register_function("is_mapped", is_mapped)
    register_function_type("is_mapped", _bool_type)

    # region-filter markers: planned away by providers, never executed
    # (udfs/vcf/vcf_region_filter.rs:42-67)
    from .plan.regions import REGION_FILTER_UDFS

    def _marker(name):
        def fn(batch, *args):
            raise PlanError(
                f"{name} should not be called, check your query "
                "(it must appear as a top-level WHERE conjunct on an "
                "indexed table)")

        return fn

    for name in REGION_FILTER_UDFS:
        register_function(name, _marker(name))
        register_function_type(name, _bool_type)


_register_all()
