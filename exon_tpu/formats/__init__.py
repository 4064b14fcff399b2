"""Host-side format decoders: scientific file formats → columnar batches.

Each module mirrors one reference decode crate (exon/exon-<fmt>) but decodes
with vectorized numpy / Arrow C++ passes instead of per-record parsers, then
stages fixed-capacity device batches (see exon_tpu.batch).
"""
