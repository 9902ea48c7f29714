#!/bin/sh
# Build the native media library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread vd3d_media.cpp -o libvd3d_media.so
echo "built $(pwd)/libvd3d_media.so"
