#!/bin/sh
# Build the native graph core shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 graph_core.cpp -o libgraph_core.so
echo "built $(pwd)/libgraph_core.so"
