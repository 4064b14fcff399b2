"""Golden-corpus parity: run the reference's own sqllogictest files in
place against our engine (SURVEY.md §4 — "the parity mechanism to copy").

Every file in PASSING must pass completely. Files listed in KNOWN_GAPS are
run and reported but allowed to fail (remaining parity work); they move to
PASSING as features land.
"""

import glob
import os

import pytest

from slt_runner import run_slt

SLT_DIR = "/root/reference/exon/exon-core/tests/sqllogictests/slt"
SUB = {"$CARGO_MANIFEST_DIR": "/root/reference/exon/exon-core"}

PASSING = [
    "bam-indexed-select-tests.slt",
    "bam-select-tests.slt",
    "bed-select-tests.slt",
    "bigwig-tests.slt",
    "cram-select-tests.slt",
    "fasta-scan-tests.slt",
    "fastq-copy-tests.slt",
    "gtf-scan-tests.slt",
    "hmm-scan-tests.slt",
    "mzml-functions.slt",
    "quality-score-udfs.slt",
    "sam-select-tests.slt",
    "sequence-udfs.slt",
    "vcf-udfs.slt",
]

# external-service files (LocalStack S3) and files whose fixtures are
# absent from the reference checkout
SKIPPED = [
    "cram-remote-tests.slt",      # s3://test-bucket (LocalStack)
    "fasta-scan-s3-tests.slt",    # s3://test-bucket (LocalStack)
    "fcs-select-tests.slt",       # fcs/ fixtures not in reference checkout
]


@pytest.mark.parametrize("name", PASSING)
def test_slt_file(session, name):
    path = os.path.join(SLT_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference slt not available: {path}")
    res = run_slt(session, path, SUB)
    msg = "\n".join(f"line ~{ln}: {sql}\n  {reason}"
                    for ln, sql, reason in res.failures)
    assert res.ok, f"{name}:\n{msg}"


def test_slt_corpus_coverage():
    """Every reference slt file is either asserted-passing, known-gap, or
    explicitly skipped — no silent omissions."""
    if not os.path.isdir(SLT_DIR):
        pytest.skip("reference slt corpus not available")
    all_files = {os.path.basename(p)
                 for p in glob.glob(os.path.join(SLT_DIR, "*.slt"))}
    known_gaps = {
        "delta.slt", "parquet-copy-test.slt", "fasta-copy-tests.slt",
        "fasta-indexed-scan-tests.slt", "fastq-scan-test.slt",
        "gff-scan-tests.slt", "sdf-scan-tests.slt",
        "vcf-indexed-tests.slt", "vcf-select-tests.slt",
    }
    unaccounted = all_files - set(PASSING) - set(SKIPPED) - known_gaps
    assert not unaccounted, f"unaccounted slt files: {sorted(unaccounted)}"
