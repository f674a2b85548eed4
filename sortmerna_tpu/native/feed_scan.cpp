// Native FASTA/FASTQ block scanners for the streaming reads feed.
//
// The feed (io/feed.py) parses ~64MB decompressed blocks into packed
// caches (concatenated seq/header/quality bytes + per-record lengths).
// The numpy scanners spend most of their time in boolean-mask cumsum
// gathers; these single-pass scanners do the same job with memcpy at
// memory speed, letting the pipelined gzip inflate (readfeed.cpp:1138's
// capability) run on the other core.
//
// Semantics mirror feed.py's _scan_fasta/_scan_fastq exactly:
// * lines end at '\n'; a trailing '\r' is stripped; blank lines skipped
// * FASTA: header = line after '>', sequence lines have ' ' stripped;
//   the last record is withheld unless `final` (it may continue in the
//   next block); `consumed` = start of the withheld header line
//   (or end of the last line when final)
// * FASTQ: complete 4-line records; header must start '@', third line
//   '+'; consumed = end of the last complete record's 4th line
//
// Return: consumed bytes (0 = no complete record yet), or a negative
// error code (-1 data before first header, -2 header malformed).

#include <cstdint>
#include <cstring>

namespace {

struct Line {
    const uint8_t* p;
    int64_t len;       // excluding newline and trailing \r
    int64_t start;     // byte offset of line start in buf
    int64_t end_nl;    // byte offset one past the '\n'
};

// iterate complete ('\n'-terminated) lines; returns false at end
struct LineIter {
    const uint8_t* buf;
    int64_t n, pos = 0;
    bool next(Line& out) {
        while (pos < n) {
            const uint8_t* nl = (const uint8_t*)
                std::memchr(buf + pos, '\n', (size_t)(n - pos));
            if (!nl) return false;
            int64_t ls = pos, le = nl - buf;
            pos = le + 1;
            int64_t len = le - ls;
            if (len > 0 && buf[le - 1] == '\r') --len;
            if (len == 0) continue;           // blank line skipped
            out.p = buf + ls;
            out.len = len;
            out.start = ls;
            out.end_nl = pos;
            return true;
        }
        return false;
    }
};

}  // namespace

extern "C" {

// counts out: [n_rec, seq_bytes, hdr_bytes]
int64_t feed_scan_fasta(const uint8_t* buf, int64_t n, int32_t final_,
                        uint8_t* seq_out, int64_t* seq_len,
                        uint8_t* hdr_out, int64_t* hdr_len,
                        int64_t* counts) {
    LineIter it{buf, n};
    Line ln;
    int64_t n_rec = 0, seq_b = 0, hdr_b = 0;
    int64_t cur_seq = 0;             // bytes of the open record
    bool open = false;
    int64_t last_hdr_start = -1;     // for the non-final withhold
    int64_t last_line_end = 0;

    while (it.next(ln)) {
        last_line_end = ln.end_nl;
        if (ln.p[0] == '>') {
            if (open) {
                seq_len[n_rec] = cur_seq;
                seq_b += cur_seq;
                ++n_rec;
            }
            open = true;
            last_hdr_start = ln.start;
            hdr_len[n_rec] = ln.len - 1;
            std::memcpy(hdr_out + hdr_b, ln.p + 1, (size_t)(ln.len - 1));
            hdr_b += ln.len - 1;
            cur_seq = 0;
        } else {
            if (!open) return -1;    // data before first header
            // sequence line, ' ' stripped
            for (int64_t i = 0; i < ln.len; ++i) {
                uint8_t c = ln.p[i];
                if (c != ' ') seq_out[seq_b + cur_seq++] = c;
            }
        }
    }
    if (!open) return 0;
    int64_t consumed;
    if (final_) {
        seq_len[n_rec] = cur_seq;
        seq_b += cur_seq;
        ++n_rec;
        consumed = last_line_end;
    } else {
        if (n_rec == 0) return 0;    // only the (incomplete) last record
        // withhold the open record; its header bytes were already
        // appended -- trim them back (they are the last hdr_b bytes)
        hdr_b -= hdr_len[n_rec];
        consumed = last_hdr_start;
    }
    counts[0] = n_rec;
    counts[1] = seq_b;
    counts[2] = hdr_b;
    return consumed;
}

// counts out: [n_rec, seq_bytes, hdr_bytes, qual_bytes]
int64_t feed_scan_fastq(const uint8_t* buf, int64_t n,
                        uint8_t* seq_out, int64_t* seq_len,
                        uint8_t* hdr_out, int64_t* hdr_len,
                        uint8_t* qual_out, int64_t* qual_len,
                        int64_t* counts) {
    LineIter it{buf, n};
    Line l0, l1, l2, l3;
    int64_t n_rec = 0, seq_b = 0, hdr_b = 0, qual_b = 0;
    int64_t consumed = 0;
    for (;;) {
        LineIter save = it;
        if (!it.next(l0) || !it.next(l1) || !it.next(l2)
            || !it.next(l3)) {
            it = save;
            break;
        }
        if (l0.p[0] != '@') return -2;   // malformed header line
        if (l2.p[0] != '+') return -3;   // missing '+' line
        hdr_len[n_rec] = l0.len - 1;
        std::memcpy(hdr_out + hdr_b, l0.p + 1, (size_t)(l0.len - 1));
        hdr_b += l0.len - 1;
        seq_len[n_rec] = l1.len;
        std::memcpy(seq_out + seq_b, l1.p, (size_t)l1.len);
        seq_b += l1.len;
        qual_len[n_rec] = l3.len;
        std::memcpy(qual_out + qual_b, l3.p, (size_t)l3.len);
        qual_b += l3.len;
        ++n_rec;
        consumed = l3.end_nl;
    }
    counts[0] = n_rec;
    counts[1] = seq_b;
    counts[2] = hdr_b;
    counts[3] = qual_b;
    return consumed;
}

}  // extern "C"
