#!/bin/bash
# Build the native data-plane library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -fopenmp -shared -fPIC \
    -o libsegment_ops.so segment_ops.cpp
echo "built $(pwd)/libsegment_ops.so"
