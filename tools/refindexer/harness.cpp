// Minimal driver for the REFERENCE's build_index (indexdb.cpp), used
// once to produce a golden index fixture for test_refformat.py.  The
// full reference binary cannot build here (RocksDB dependency, no
// network); build_index itself only needs cmph + a Runopts instance,
// so the constructor is stubbed (in-class field defaults apply) and
// fields are set directly.
//
//   refindexer <ref.fasta> <out_prefix> <workdir> [L] [interval]
//              [max_pos]
#include <cstdint>
#include <cstdlib>
#include <iostream>
#include <string>

#include "indexdb.hpp"
#include "options.hpp"

Runopts::Runopts(int, char**, bool) {}
#include "stubs.inc"

int main(int argc, char** argv) {
    if (argc < 4) {
        std::cerr << "usage: refindexer ref.fasta out_prefix workdir"
                     " [L] [interval] [max_pos]\n";
        return 2;
    }
    Runopts opts(0, nullptr, true);
    opts.is_verbose = true;
    opts.workdir = argv[3];
    if (argc > 4) opts.seed_win_len = (uint32_t)atoi(argv[4]);
    if (argc > 5) opts.interval = (uint32_t)atoi(argv[5]);
    if (argc > 6) opts.max_pos = (uint32_t)atoi(argv[6]);
    opts.indexfiles.emplace_back(argv[1], argv[2]);
    return build_index(opts);
}
