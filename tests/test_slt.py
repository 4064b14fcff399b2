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


def _make_fcs_fixtures(ds: str) -> None:
    """Synthesize Guava Muse.fcs (108 events, slt-exact first row) and the
    fcs-partition/ hive dirs (sample=2 has 108 events), using the package
    FCS encoder. Channel layout mirrors a Guava Muse acquisition: three
    lin/width pairs, time, three log channels (log10 of the lin values)."""
    import numpy as np

    from exon_tpu.formats.fcs import encode_fcs

    channels = ["FSC-HLin", "FSC-W", "YEL-HLin", "YEL-W", "RED-HLin",
                "RED-W", "TIME", "FSC-HLog", "YEL-HLog", "RED-HLog"]

    def matrix(seed: int, n: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        lin = rng.uniform(10.0, 1000.0, size=(n, 3)).astype(np.float32)
        mat = np.zeros((n, 10), np.float32)
        mat[:, 0], mat[:, 2], mat[:, 4] = lin[:, 0], lin[:, 1], lin[:, 2]
        mat[:, 1] = mat[:, 3] = mat[:, 5] = np.float32(7.5)
        mat[:, 6] = (35964 + np.arange(n) * 17).astype(np.float32)
        mat[:, 7:10] = np.log10(lin)
        return mat

    guava = matrix(7, 108)
    guava[0] = np.array([481.9313, 7.5, 84.2256, 7.5, 395.87415, 7.5,
                         35964, 2.682985, 1.9254441, 2.597557], np.float32)
    fcs_dir = os.path.join(ds, "fcs")
    os.makedirs(fcs_dir, exist_ok=True)
    with open(os.path.join(fcs_dir, "Guava Muse.fcs"), "wb") as f:
        f.write(encode_fcs(guava, channels))
    for sample, (seed, n) in {"1": (11, 75), "2": (13, 108),
                              "3": (17, 42)}.items():
        d = os.path.join(ds, "fcs-partition", f"sample={sample}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "events.fcs"), "wb") as f:
            f.write(encode_fcs(matrix(seed, n), channels))


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
    # the FCS fixtures are absent from the reference checkout; synthesize
    # files whose query results reproduce fcs-select-tests.slt verbatim
    # (first Guava Muse row + 108 events; hive partition dirs)
    _make_fcs_fixtures(os.path.join(dst, "datasources"))
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
    "fcs-select-tests.slt",
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

# files whose fixtures are absent from the reference checkout (none: the
# FCS fixtures are synthesized by _make_fcs_fixtures)
SKIPPED: list = []


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
