#!/bin/sh
# Build the native graph-construction library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libcgraph.so cgraph.cpp
echo "built $(pwd)/libcgraph.so"
