"""Golden-corpus parity: run the reference's own sqllogictest files in
place against our engine (SURVEY.md §4 — "the parity mechanism to copy").

Every file in PASSING must pass completely. Files listed in KNOWN_GAPS are
run and reported but allowed to fail (remaining parity work); they move to
PASSING as features land.
"""

import glob
import gzip
import os
import shutil

import pytest

from slt_runner import run_slt

SLT_DIR = "/root/reference/exon/exon-core/tests/sqllogictests/slt"
REF_MANIFEST = "/root/reference/exon/exon-core"


@pytest.fixture(scope="session")
def slt_env(tmp_path_factory):
    """Writable copy of the reference fixtures + fake s3://test-bucket —
    the LocalStack analog (reference docker-compose.yml:5-18 +
    bin/test.sh)."""
    root = tmp_path_factory.mktemp("slt_manifest")
    src = os.path.join(REF_MANIFEST, "test-data")
    if not os.path.isdir(src):
        pytest.skip("reference test-data not available")
    dst = os.path.join(root, "test-data")
    shutil.copytree(src, dst)
    # the uncompressed SDF fixture is derived from the checked-in .gz
    sdf_gz = os.path.join(dst, "datasources/sdf/tox_benchmark_N6512.sdf.gz")
    with gzip.open(sdf_gz, "rb") as f:
        data = f.read()
    with open(sdf_gz[:-3], "wb") as f:
        f.write(data)
    # fake s3 bucket contents per bin/test.sh
    bucket = os.path.join(root, "s3-test-bucket")
    os.makedirs(bucket)
    ds = os.path.join(dst, "datasources")
    uploads = {
        "test.fasta": "fasta/test.fasta",
        "test.fa": "fasta/test.fasta",
        "test-indexed.fasta": "fasta-indexed/test.fasta",
        "test-indexed.fasta.gz": "fasta-indexed/test.fasta.gz",
        "test-indexed.fasta.gz.fai": "fasta-indexed/test.fasta.gz.fai",
        "test-indexed.fasta.fai": "fasta-indexed/test.fasta.fai",
        "region.txt": "fasta-indexed/region.txt",
        "rand1k.fa": "two-cram/rand1k.fa",
        "rand1k.fa.fai": "two-cram/rand1k.fa.fai",
        "twolib.sorted.cram": "two-cram/twolib.sorted.cram",
        "twolib.sorted.cram.crai": "two-cram/twolib.sorted.cram.crai",
        "tox_benchmark_N6512.sdf": "sdf/tox_benchmark_N6512.sdf",
    }
    for key, rel in uploads.items():
        p = os.path.join(ds, rel)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(bucket, key))
    # delta table copy (create_delta_table.py analog)
    delta_src = os.path.join(ds, "delta")
    if os.path.isdir(delta_src):
        shutil.copytree(delta_src, os.path.join(bucket, "delta_table"))

    from exon_tpu.io.object_store import LocalStore, register_store

    register_store("s3://test-bucket", LocalStore(bucket))
    return {"$CARGO_MANIFEST_DIR": str(root)}


SUB = {"$CARGO_MANIFEST_DIR": REF_MANIFEST}

PASSING = [
    "bam-indexed-select-tests.slt",
    "bam-select-tests.slt",
    "bed-select-tests.slt",
    "bigwig-tests.slt",
    "cram-remote-tests.slt",
    "cram-select-tests.slt",
    "delta.slt",
    "fasta-copy-tests.slt",
    "fasta-indexed-scan-tests.slt",
    "fasta-scan-s3-tests.slt",
    "fasta-scan-tests.slt",
    "fastq-copy-tests.slt",
    "fastq-scan-test.slt",
    "gff-scan-tests.slt",
    "gtf-scan-tests.slt",
    "hmm-scan-tests.slt",
    "mzml-functions.slt",
    "parquet-copy-test.slt",
    "quality-score-udfs.slt",
    "sam-select-tests.slt",
    "sdf-scan-tests.slt",
    "sequence-udfs.slt",
    "vcf-indexed-tests.slt",
    "vcf-select-tests.slt",
    "vcf-udfs.slt",
]

# files whose fixtures are absent from the reference checkout
SKIPPED = [
    "fcs-select-tests.slt",       # fcs/ fixtures not in reference checkout
]


@pytest.mark.parametrize("name", PASSING)
def test_slt_file(session, name, slt_env, tmp_path, monkeypatch):
    path = os.path.join(SLT_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference slt not available: {path}")
    # __TEST_DIR__ substitution + chdir so relative-path COPY targets land
    # in a sandbox, never the repo root (reference runner does the same,
    # exon-core/tests/sqllogictests/src/main.rs).
    monkeypatch.chdir(tmp_path)
    subs = dict(slt_env)
    subs["${__TEST_DIR__}"] = str(tmp_path) + os.sep
    res = run_slt(session, path, subs)
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
    unaccounted = all_files - set(PASSING) - set(SKIPPED)
    assert not unaccounted, f"unaccounted slt files: {sorted(unaccounted)}"
