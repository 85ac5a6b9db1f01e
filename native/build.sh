#!/bin/sh
# Build the native geometry reference library (ctypes-loaded).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libgeometry_ref.so src/geometry_ref.cc
echo "built $(pwd)/libgeometry_ref.so"
