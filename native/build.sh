#!/bin/sh
# Build the host-side native library into the python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=x86-64-v2 -fPIC -shared -std=c++17 \
    neutfem_host.cpp -o ../neutfem_tpu/_libneutfem_host.so
echo "built ../neutfem_tpu/_libneutfem_host.so"
