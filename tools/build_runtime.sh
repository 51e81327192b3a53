#!/bin/bash
# Build the native host runtime shared library.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O2 -std=c++17 -shared -fPIC -march=native runtime/limg_runtime.cpp \
    -o build/liblimg_runtime.so -lpthread
echo "built build/liblimg_runtime.so"
