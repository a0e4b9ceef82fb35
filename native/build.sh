#!/bin/sh
# Build the native libraries.
#  - libaudiotabs_native.so: audio I/O fast paths (no deps)
#  - libaudiotabs_decode.so: any-container decode via system FFmpeg libs
#    (skipped cleanly when libavformat headers are absent)
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libaudiotabs_native.so audiotabs_native.cpp
echo "built $(pwd)/libaudiotabs_native.so"
if [ -e /usr/include/x86_64-linux-gnu/libavformat/avformat.h ] || [ -e /usr/include/libavformat/avformat.h ]; then
  gcc -O2 -shared -fPIC -o libaudiotabs_decode.so audiotabs_decode.c \
    -lavformat -lavcodec -lavutil -lswresample
  echo "built $(pwd)/libaudiotabs_decode.so"
else
  echo "libavformat headers absent; skipping libaudiotabs_decode.so"
fi
