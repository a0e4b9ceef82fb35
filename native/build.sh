#!/bin/sh
# Build the native audio I/O library. Single translation unit, no deps.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libaudiotabs_native.so audiotabs_native.cpp
echo "built $(pwd)/libaudiotabs_native.so"
