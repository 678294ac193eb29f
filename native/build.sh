#!/bin/sh
# Build the fastio native library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -o libfastio.so fastio.cpp -llzma -lpthread
echo "built $(pwd)/libfastio.so"
