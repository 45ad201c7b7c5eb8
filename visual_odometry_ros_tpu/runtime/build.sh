#!/bin/sh
# Build the native ingest runtime (libvo_ingest.so) next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC ingest.cpp -o libvo_ingest.so -lz -lpthread
echo "built $(pwd)/libvo_ingest.so"
