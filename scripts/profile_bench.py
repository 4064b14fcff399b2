"""Profile where the FASTA bench time goes: IO, H2D, phase1, phase2, filter."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench as benchmod

path = benchmod._make_fixture()
size = os.path.getsize(path)
print(f"file: {path} ({size/1e6:.1f} MB)", flush=True)

import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)

# 1. Raw read
t0 = time.perf_counter()
with open(path, "rb") as f:
    data = f.read()
t_read = time.perf_counter() - t0
print(f"read: {t_read:.3f}s ({size/1e9/t_read:.2f} GB/s)", flush=True)

# 2. H2D transfer bandwidth, 128 MiB padded chunk
arr = np.frombuffer(data, np.uint8)
chunk = np.zeros(128 << 20, np.uint8)
chunk[:min(len(arr), 128 << 20)] = arr[:128 << 20]
for trial in range(3):
    t0 = time.perf_counter()
    d = jax.device_put(chunk, dev)
    d.block_until_ready()
    t_h2d = time.perf_counter() - t0
    print(f"H2D 128MiB trial{trial}: {t_h2d:.3f}s ({(128<<20)/1e9/t_h2d:.2f} GB/s)", flush=True)

# 3. device decode phases
from exon_tpu.formats import fasta_device as fd
from exon_tpu.formats.fasta import FastaOptions
from exon_tpu.batch import bucket_capacity

opts = FastaOptions()
spans = fd.split_chunks(data)
print(f"chunks: {len(spans)}", flush=True)

lo, hi = spans[0]
c = np.frombuffer(data, np.uint8, count=hi - lo, offset=lo)
vcap = bucket_capacity(max(len(c), 1), minimum=1024)
buf = np.full(vcap, fd.NL, np.uint8)
buf[:len(c)] = c
print(f"chunk size {len(c)/1e6:.1f}MB padded to {vcap/1e6:.1f}MB", flush=True)

for trial in range(2):
    t0 = time.perf_counter()
    arr_d = jnp.asarray(buf)
    arr_d.block_until_ready()
    t1 = time.perf_counter()
    res = fd._phase1(arr_d, jnp.int32(len(c)), False)
    n_rec, seq_total = int(res[0]), int(res[1])
    t2 = time.perf_counter()
    row_cap = bucket_capacity(n_rec)
    seq_vcap = bucket_capacity(max(seq_total, 1), minimum=1024)
    r2 = fd._phase2(arr_d, jnp.int32(len(c)), row_cap, seq_vcap, 1, 1, False, "utf8")
    jax.block_until_ready(r2)
    t3 = time.perf_counter()
    print(f"trial{trial}: h2d={t1-t0:.3f}s phase1={t2-t1:.3f}s phase2={t3-t2:.3f}s", flush=True)

# 4. end-to-end timing split of the real query
from exon_tpu import ExonSession, col
ctx = ExonSession.new_exon()
for trial in range(3):
    t0 = time.perf_counter()
    n = ctx.read_fasta(path).filter(col("sequence").ilike("M%")).count()
    print(f"e2e trial{trial}: {time.perf_counter()-t0:.3f}s n={n}", flush=True)
