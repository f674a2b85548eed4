#!/bin/sh
# Build the reference's ALIGN PATH (traverse + compute_lis_alignment +
# SSW + index loader + Gumbel/ALP) straight from /root/reference with a
# feed-less harness and an in-memory KVDB shadow -- the full binary
# cannot build here (RocksDB + rapidgzip fetched at build time, no
# network).  Produces a per-read alignment-record oracle for
# tests/test_refalign.py.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/build/refalign}
HERE=$(dirname "$0")
mkdir -p "$OUT"

# stub the Runopts option-handler member pointers (never called)
grep -oE "void opt_[a-zA-Z0-9_]+\s*\([^)]*\)" "$REF/include/options.hpp" \
  | sed 's/void /void Runopts::/; s/$/ {}/' | sort -u > "$OUT/stubs.inc"

CXXFLAGS="-std=c++17 -O1 -ULOCKQUEUE -UCONCURRENTQUEUE -I$HERE -I$OUT -I$REF/include \
  -I$REF/3rdparty/cmph -I$REF/3rdparty/alp"

for f in paralleltraversal alignment traverse_bursttrie bitvector \
         index references refstats read readstats util indexdb izlib; do
  if [ ! -f "$OUT/$f.o" ] || [ "$REF/src/sortmerna/$f.cpp" -nt "$OUT/$f.o" ]; then
    g++ $CXXFLAGS -c "$REF/src/sortmerna/$f.cpp" -o "$OUT/$f.o"
  fi
done
[ -f "$OUT/ssw.o" ] || \
  gcc -std=gnu11 -O2 -msse2 -I"$REF/include" -c \
      "$REF/src/sortmerna/ssw.c" -o "$OUT/ssw.o"
[ -f "$OUT/kseq_load.o" ] || \
  g++ $CXXFLAGS -c "$REF/src/sortmerna/kseq_load.cpp" \
      -o "$OUT/kseq_load.o"
for f in "$REF"/3rdparty/cmph/*.c; do
  o="$OUT/cmph_$(basename "${f%.c}").o"
  [ -f "$o" ] || gcc -O2 -c "$f" -I"$REF/3rdparty/cmph" -o "$o"
done
for f in "$REF"/3rdparty/alp/*.cpp; do
  o="$OUT/alp_$(basename "${f%.cpp}").o"
  [ -f "$o" ] || g++ -std=c++17 -O1 -c "$f" -I"$REF/3rdparty/alp" -o "$o"
done

g++ $CXXFLAGS "$HERE/harness.cpp" "$HERE/kvdb_stub.cpp" "$OUT"/*.o \
    -o "$OUT/refalign" -lz -lm
echo "built $OUT/refalign"
