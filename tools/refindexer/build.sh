#!/bin/sh
# Build the minimal REFERENCE indexer used to produce the golden
# fixture in tests/golden/refidx (indexdb.cpp + cmph from the reference
# tree + harness.cpp; the full reference binary cannot build here --
# RocksDB dependency, no network).  The fixture was produced with:
#
#   ./refindexer /root/reference/data/ref_GQ099317_forward_and_rc.fasta \
#       out/GQ /tmp/refidx_wd
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/build/refidx}
HERE=$(dirname "$0")
mkdir -p "$OUT"
# stubs for the Runopts option-handler member pointers referenced by
# the in-class options table (never called by build_index)
grep -oE "void opt_[a-zA-Z0-9_]+\s*\([^)]*\)" "$REF/include/options.hpp" \
  | sed 's/void /void Runopts::/; s/$/ {}/' | sort -u > "$OUT/stubs.inc"
g++ -std=c++17 -O1 -c "$REF/src/sortmerna/indexdb.cpp" \
  -I"$REF/include" -I"$REF/3rdparty/cmph" -o "$OUT/indexdb.o"
for f in "$REF"/3rdparty/cmph/*.c; do
  gcc -O2 -c "$f" -I"$REF/3rdparty/cmph" \
    -o "$OUT/cmph_$(basename "${f%.c}").o"
done
g++ -std=c++17 -O1 "$HERE/harness.cpp" "$OUT/indexdb.o" \
  "$OUT"/cmph_*.o -I"$REF/include" -I"$REF/3rdparty/cmph" -I"$OUT" \
  -o "$OUT/refindexer"
echo "built $OUT/refindexer"
