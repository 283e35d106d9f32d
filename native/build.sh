#!/bin/bash
# Build the native data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 nifti_native.cpp rotate_native.cpp \
    -lz -o libvsnative.so
echo "built native/libvsnative.so"
