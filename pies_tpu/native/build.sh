#!/bin/sh
# Build the native scene-build library (ctypes-loaded; no pybind11 needed).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -o libpies_native.so tetmesh.cpp
echo "built $(pwd)/libpies_native.so"
