"""Benchmark harness: headline = FASTA scan+filter+count throughput.

Workload parity with the reference's FASTACodonScan benchmark
(exon-benchmarks/src/main.rs:223-231, run_benchmarks.py:61-80): scan a
uniprot_sprot-scale FASTA (~560k records, ~250 MB), filter
``sequence ILIKE 'M%'``, count. Reference baseline: 0.789 s ≈ 0.71 M rows/s
single-process CPU (BASELINE.md "Derived reference points").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_ROWS_PER_S = 0.71e6  # reference exon, uncompressed FASTA scan
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")
N_RECORDS = 560_000
MEAN_LEN = 400  # ~uniprot_sprot average protein length ≈ 360aa + headers


def _make_fixture() -> str:
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"sprot_like_{N_RECORDS}.fasta")
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    rng = np.random.default_rng(42)
    alphabet = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lens = rng.integers(120, 2 * MEAN_LEN - 120, size=N_RECORDS).astype(np.int64)
    starts_m = rng.random(N_RECORDS) < 0.23  # ~23% start with M
    with open(path + ".tmp", "wb") as f:
        chunk = 40_000
        for lo in range(0, N_RECORDS, chunk):
            hi = min(lo + chunk, N_RECORDS)
            clens = lens[lo:hi]
            total = int(clens.sum())
            flat = alphabet[rng.integers(0, 20, size=total)]
            offs = np.zeros(len(clens) + 1, np.int64)
            np.cumsum(clens, out=offs[1:])
            flat[offs[:-1][starts_m[lo:hi]]] = ord("M")
            # wrap at 60 cols: insert newline positions vectorized by
            # building an output buffer with per-record slots
            n_nl = (clens - 1) // 60 + 1  # one newline per 60-char line
            parts = []
            for i in range(hi - lo):
                body = flat[offs[i]:offs[i + 1]].tobytes()
                wrapped = b"\n".join(body[j:j + 60] for j in range(0, len(body), 60))
                idx = lo + i
                parts.append(b">sp|P%06d|PROT%d synthetic protein %d\n" % (idx, idx, idx))
                parts.append(wrapped)
                parts.append(b"\n")
            f.write(b"".join(parts))
    os.replace(path + ".tmp", path)
    return path


def main() -> None:
    path = _make_fixture()

    from exon_tpu import ExonSession, col

    ctx = ExonSession.new_exon()

    def run() -> tuple[int, float]:
        t0 = time.perf_counter()
        n = ctx.read_fasta(path).filter(col("sequence").ilike("M%")).count()
        return n, time.perf_counter() - t0

    # warmup (compile)
    run()
    times = []
    for _ in range(3):
        _n, dt = run()
        times.append(dt)
    n, _ = run()
    best = min(times)
    rows_per_s = N_RECORDS / best
    result = {
        "metric": "fasta_scan_filter_count_rows_per_s",
        "value": round(rows_per_s, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
        "detail": {
            "rows_matched": int(n),
            "total_rows": N_RECORDS,
            "best_wall_s": round(best, 4),
            "file_mb": round(os.path.getsize(path) / 1e6, 1),
            "backend": _backend(),
        },
    }
    print(json.dumps(result))


def _backend() -> str:
    import jax

    try:
        return str(jax.devices()[0].device_kind)
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
