// Align-path oracle driving the REFERENCE's own traverse /
// compute_lis_alignment (paralleltraversal.cpp:81, alignment.cpp:100)
// compiled in place from /root/reference (nothing copied into the
// repo; the refindexer/refssw pattern).  The full reference binary
// cannot build here (RocksDB + rapidgzip fetched at build time, no
// network); this subset replaces the readfeed with a simple fasta
// reader and the KVDB with an in-memory map (kvdb.hpp shadow) while
// keeping the EXACT per-read align2 loop (processor.cpp:93-168):
// fresh Read per (part, read), state round-trip through the
// reference's own binary serialization, strand loop, is_done gates.
//
//   refalign <ref.fasta> <reads.fasta> <workdir> [num_alignments]
//            [max_file_size_mb]
//
// stdout, one record per read:
//   R <read_num> <is_hit> <n_alignments>
//   A <ref_num> <part> <score1> <ref_begin1> <ref_end1> <read_begin1>
//     <read_end1> <strand> <cigar...>          (per alignment)
#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "options.hpp"
#include "indexdb.hpp"
#include "index.hpp"
#include "references.hpp"
#include "refstats.hpp"
#include "readstats.hpp"
#include "read.hpp"
#include "kvdb.hpp"

Runopts::Runopts(int, char**, bool) {}
#include "stubs.inc"

// processor.cpp:85 forward declaration
void traverse(Runopts& opts, Index& index, References& refs,
              Readstats& readstats, Refstats& refstats, Read& read,
              bool isLastStrand);

struct Rec { std::string header, seq; };

static std::vector<Rec> read_fasta(const std::string& path) {
    std::vector<Rec> out;
    std::ifstream f(path);
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty()) continue;
        if (line[0] == '>') {
            out.push_back({line, ""});
        } else if (!out.empty()) {
            out.back().seq += line;
        }
    }
    return out;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::cerr << "usage: refalign ref.fasta reads.fasta workdir"
                     " [num_alignments]\n";
        return 2;
    }
    std::string ref = argv[1], reads_path = argv[2], wd = argv[3];

    Runopts opts(0, nullptr, true);
    opts.workdir = wd;
    opts.readfiles.push_back(reads_path);
    opts.indexfiles.emplace_back(ref, wd + "/idx/db");
    opts.skiplengths.push_back({0, 0, 0});   // refstats fills defaults
    opts.num_alignments = argc > 4 ? atoi(argv[4]) : 1;
    opts.is_best = true;
    // defaults the reference's option layer would apply
    // (options.hpp:567-587); the stub ctor leaves in-class defaults,
    // which already match, but set the load-bearing ones explicitly
    opts.match = 2; opts.mismatch = -3;
    opts.gap_open = 5; opts.gap_extension = 2; opts.score_N = 0;
    opts.evalue = 1.0;
    opts.num_seeds = 2; opts.min_lis = 2;
    opts.edges = 4;
    opts.max_pos = 10000; opts.interval = 1;
    if (argc > 5) opts.max_file_size = atof(argv[5]);

    std::cerr << "[refalign] build_index...\n";
    // 1. the reference's own build_index into wd/idx
    if (build_index(opts) != 0) {
        std::cerr << "build_index failed\n";
        return 3;
    }

    // 2. stats + index machinery, exactly as main()/align() wire them
    auto recs = read_fasta(reads_path);
    uint64_t total_len = 0;
    uint32_t min_len = 0xFFFFFFFFu, max_len = 0;
    for (auto& r : recs) {
        total_len += r.seq.size();
        if (r.seq.size() < min_len) min_len = (uint32_t)r.seq.size();
        if (r.seq.size() > max_len) max_len = (uint32_t)r.seq.size();
    }
    std::cerr << "[refalign] reads=" << recs.size() << "\n";
    KeyValueDatabase kvdb("");
    Readstats readstats((uint64_t)recs.size(), total_len, min_len,
                        max_len, kvdb, opts);
    std::cerr << "[refalign] refstats (ALP)...\n";
    Refstats refstats(opts, readstats);
    std::cerr << "[refalign] index ctor...\n";
    Index index(opts);
    References refs;

    // read strings in the feed's "{file}_{num}\nheader\nseq" shape
    std::vector<std::string> readstrs(recs.size());
    for (size_t i = 0; i < recs.size(); ++i) {
        std::ostringstream ss;
        ss << "0_" << i << "\n" << recs[i].header << "\n"
           << recs[i].seq;
        readstrs[i] = ss.str();
    }

    // 3. align loop (processor.cpp align/align2 minus feed/threads)
    int n_idx = (int)opts.indexfiles.size();
    for (int idx_num = 0; idx_num < n_idx; ++idx_num) {
        for (uint16_t part = 0;
             part < refstats.num_index_parts[idx_num]; ++part) {
            std::cerr << "[refalign] part " << part << " load\n";
            index.load(idx_num, part, opts.indexfiles, refstats);
            refs.load(idx_num, part, opts, refstats);
            std::cerr << "[refalign] aligning part " << part << "\n";
            for (size_t i = 0; i < readstrs.size(); ++i) {
                Read read(readstrs[i]);
                read.init(opts);
                read.is_too_short = read.sequence.size()
                                    < refstats.lnwin[idx_num];
                if (read.is_too_short) {
                    read.isValid = false;
                }
                if (read.isValid) read.load_db(kvdb);
                if (read.isEmpty || !read.isValid || read.is_done)
                    continue;
                bool single = opts.is_forward ^ opts.is_reverse;
                int num_strands = single ? 1 : 2;
                for (int count = 0;
                     count < num_strands && !read.is_done; ++count) {
                    if ((single && opts.is_reverse) || count == 1) {
                        if (!read.reversed) read.revIntStr();
                    }
                    traverse(opts, index, refs, readstats, refstats,
                             read, single || count == 1);
                    read.id_win_hits.clear();   // bug 46
                }
                if (read.isValid && !read.isEmpty && read.is_new_hit)
                    kvdb.put(read.id, read.toBinString());
            }
            index.unload();
            refs.unload();
        }
    }

    // 4. dump final per-read state (the KVDB contents)
    for (size_t i = 0; i < readstrs.size(); ++i) {
        Read read(readstrs[i]);
        read.init(opts);
        bool have = read.isValid && read.load_db(kvdb);
        std::cout << "R " << i << " " << (have && read.is_hit ? 1 : 0)
                  << " " << (have ? read.alignment.alignv.size() : 0)
                  << "\n";
        if (!have) continue;
        for (auto& a : read.alignment.alignv) {
            std::cout << "A " << a.ref_num << " " << a.part << " "
                      << a.score1 << " " << a.ref_begin1 << " "
                      << a.ref_end1 << " " << a.read_begin1 << " "
                      << a.read_end1 << " " << (int)a.strand;
            for (auto c : a.cigar) std::cout << " " << c;
            std::cout << "\n";
        }
    }
    return 0;
}
