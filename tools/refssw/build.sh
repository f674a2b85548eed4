#!/bin/sh
# Build the REFERENCE's own SSW kernel (ssw.c, dependency-free C +
# SSE2) with a tiny stdin/stdout harness, as a bit-exact parity oracle
# for ops/sw_ref.py / ops/sw_jax.py / native/traceback.cpp
# (tests/test_refssw.py).  Nothing is copied into the repo; ssw.c is
# compiled straight from the reference tree, the refindexer way.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/build/refssw}
HERE=$(dirname "$0")
mkdir -p "$OUT"
# -std=gnu11: ssw.h typedefs its own `bool`, which is a keyword in C23
gcc -std=gnu11 -O2 -msse2 "$HERE/harness.c" "$REF/src/sortmerna/ssw.c" \
    -I"$REF/include" -o "$OUT/refssw" -lm
echo "built $OUT/refssw"
