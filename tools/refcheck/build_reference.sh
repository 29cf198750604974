#!/usr/bin/env bash
# Build the C++ reference (/root/reference) as a single-rank binary with the
# MPI stub (tools/refcheck/mpi_stub.h), for a given compile-time lattice size
# (the reference bakes dims in via CMake configure_file, CMakeLists.txt:17-20;
# we write config.h directly and compile with plain g++ -O3).
#
# Usage: build_reference.sh NS NT BUILD_DIR  ->  BUILD_DIR/SM_NSxNT
set -euo pipefail
NS=$1; NT=$2; DIR=$3
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$DIR/include"
cp "$REF"/src/*.cpp "$DIR/"
cp "$REF"/include/*.h "$DIR/include/"
cp "$HERE/mpi_stub.h" "$DIR/include/mpi.h"
cat > "$DIR/include/config.h" <<EOF
#ifndef CONFIG_H
#define CONFIG_H
#define NS $NS
#define NT $NT
#endif
EOF
g++ -O3 -std=c++20 -I"$DIR/include" "$DIR"/*.cpp -o "$DIR/SM_${NS}x${NT}"
echo "$DIR/SM_${NS}x${NT}"
