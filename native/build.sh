#!/bin/sh
# Build the native ingest library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -pthread -o libexon_native.so \
    fasta_scan.cpp decomp.cpp tsv_scan.cpp arrow_consume.cpp \
    -ldeflate -lzstd
echo "built $(pwd)/libexon_native.so"
