#!/bin/sh
# Build the native IO library. Invoked automatically (and cached) by
# deeparc_tpu/io/native.py; safe to run manually.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -Wall -Wextra -shared -fPIC \
    -o build/libdeeparc_io.so deeparc_io.cc
echo "built native/build/libdeeparc_io.so"
