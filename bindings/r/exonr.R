# exonr — R access to the exon-tpu engine.
#
# Parity target: the reference's exon-r package exposes
# read_inferred_exon_table(path) by handing an Arrow C stream pointer to R
# arrow (exon-r/exonr/src/rust/src/lib.rs:31-57). This engine exports the
# same Arrow C stream (exon_tpu/ffi.py __arrow_c_stream__; a pure-C
# consumer test in native/arrow_consume.cpp proves the ABI), and
# additionally serves query results as Arrow IPC over HTTP
# (python -m exon_tpu.serve), which R arrow reads natively — no compiled
# glue required.
#
# Usage:
#   # one-time: start the engine server
#   #   python -m exon_tpu.serve --port 8815
#   source("exonr.R")
#   tbl <- read_inferred_exon_table("/data/sample.fasta")
#   df  <- exon_sql("SELECT COUNT(*) FROM fasta_scan('/data/sample.fasta')")

library(arrow)
library(httr)

.exon_endpoint <- function() {
  Sys.getenv("EXON_TPU_URL", "http://127.0.0.1:8815")
}

#' Run SQL against the exon-tpu engine; returns an arrow Table.
exon_sql <- function(sql, endpoint = .exon_endpoint()) {
  resp <- httr::POST(paste0(endpoint, "/sql"), body = sql,
                     encode = "raw",
                     httr::content_type("text/plain"))
  if (httr::status_code(resp) != 200) {
    stop(sprintf("exon-tpu error: %s",
                 rawToChar(httr::content(resp, "raw"))))
  }
  arrow::read_ipc_stream(httr::content(resp, "raw"), as_data_frame = FALSE)
}

#' Infer the format from the file extension and read the whole table —
#' the reference exon-r entry point (exonr::read_inferred_exon_table).
read_inferred_exon_table <- function(path, endpoint = .exon_endpoint()) {
  scan <- c(
    fasta = "fasta_scan", fa = "fasta_scan", fna = "fasta_scan",
    faa = "fasta_scan", fastq = "fastq_scan", fq = "fastq_scan",
    sam = "sam_scan", bam = "bam_scan", cram = "cram_scan",
    vcf = "vcf_scan", bcf = "bcf_scan", bed = "bed_scan",
    gff = "gff_scan", gtf = "gtf_scan", gb = "genbank_scan",
    genbank = "genbank_scan", fcs = "fcs_scan", mzml = "mzml_scan",
    sdf = "sdf_scan", bigwig = "bigwig_scan", hmmdomtab = "hmm_dom_tab_scan")
  ext <- tolower(sub(".*\\.(gz|zst|bz2|xz)$", "", path))
  ext <- tolower(tools::file_ext(sub("\\.(gz|zst|bz2|xz)$", "", path)))
  fn <- scan[[ext]]
  if (is.null(fn)) stop(sprintf("cannot infer format from %s", path))
  exon_sql(sprintf("SELECT * FROM %s('%s')", fn, path), endpoint)
}

#' ---- In-process path (reticulate + Arrow C stream ABI) ----------------
#'
#' The reference's exon-r hands R a pointer to a Rust-filled
#' FFI_ArrowArrayStream (exon-r/exonr/src/rust/src/lib.rs:31-57). The
#' same mechanism here: R allocates the ArrowArrayStream struct
#' (nanoarrow), the engine fills it in-process (exon_tpu.ffi.export_to_c),
#' and R imports it zero-copy — no server, no HTTP.
#'
#' Requires: reticulate, nanoarrow, arrow; python env with exon_tpu.

.exon_py <- local({
  sess <- NULL
  function() {
    if (is.null(sess)) {
      ex <- reticulate::import("exon_tpu")
      sess <<- ex$ExonSession$new_exon()
    }
    sess
  }
})

#' Import an exon_tpu DataFrame (reticulate handle) as an arrow Table,
#' in-process through the Arrow C stream ABI.
read_exon_c_stream <- function(py_dataframe) {
  ffi <- reticulate::import("exon_tpu.ffi")
  stream <- nanoarrow::nanoarrow_allocate_array_stream()
  ffi$export_to_c(py_dataframe,
                  nanoarrow::nanoarrow_pointer_addr_chr(stream))
  arrow::as_arrow_table(stream)
}

#' In-process read_inferred_exon_table: format inferred from extension,
#' decoded by the engine in this process, imported over the C ABI.
read_exon_inprocess <- function(path) {
  read_exon_c_stream(.exon_py()$read_inferred_exon_table(path))
}

#' In-process SQL: plan + execute in the embedded engine, import the
#' result table over the C ABI.
exon_sql_inprocess <- function(sql) {
  read_exon_c_stream(.exon_py()$sql(sql))
}
