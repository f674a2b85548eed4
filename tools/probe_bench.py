#!/usr/bin/env python
"""Offline microbench for the native probe kernel (no device, no
tunnel): loads the bench index, enumerates the pass-1 windows of a set2
subset on both strands, and times probe_windows directly.  Stable
host-side numbers for prefetch/layout experiments that the tunneled
end-to-end bench cannot resolve (run-to-run phase drift is +-30%).

Usage: [N_READS=100000] [REPS=5] python tools/probe_bench.py
"""

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_READS = int(os.environ.get("N_READS", "100000"))
REPS = int(os.environ.get("REPS", "5"))
THREADS = int(os.environ.get("THREADS", "2"))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from sortmerna_tpu.engine.run import prepare
    from sortmerna_tpu.io.fastx import iter_fastx
    from sortmerna_tpu.options import RunOptions
    from sortmerna_tpu.ops.seed_probe import SeedSearcher

    reads_src = ("/root/reference/data/"
                 "set2_environmental_study_550_amplicon.fasta.gz")
    enc = {65: 0, 67: 1, 71: 2, 84: 3}
    seqs = []
    for rec in itertools.islice(iter_fastx(reads_src), N_READS):
        s = np.frombuffer(rec.sequence.encode(), np.uint8)
        v = np.zeros(len(s), np.int64)
        for b, c in enc.items():
            v[s == b] = c
        seqs.append(v)

    opts = RunOptions(
        ref_files=["/root/reference/data/rRNA_databases/"
                   "silva-arc-16s-id95.fasta"],
        reads_files=[reads_src], workdir="/tmp/probe_bench_wd")
    ctx = prepare(opts)
    part = ctx.indexes[0].parts[0]
    pw = getattr(part, "seed_win_len", 18) // 2
    lnwin = 2 * pw
    shift = lnwin // 2          # pass-1 skiplength

    # pass-1 window halves, both strands
    w1l, w2l = [], []
    for v in seqs:
        if len(v) < lnwin:
            continue
        for fwd in (True, False):
            u = v if fwd else (3 - v)[::-1]
            k = np.zeros(len(u) - pw + 1, np.int64)
            acc = 0
            mask = (1 << (2 * pw)) - 1
            for i, c in enumerate(u.tolist()):
                acc = ((acc << 2) | c) & mask
                if i >= pw - 1:
                    k[i - pw + 1] = acc
            numwin = (len(u) - lnwin + shift) // shift
            pos = np.arange(numwin) * shift
            w1l.append(k[pos])
            w2l.append(k[pos + pw])
    w1 = np.ascontiguousarray(np.concatenate(w1l))
    w2 = np.ascontiguousarray(np.concatenate(w2l))
    print(f"{len(w1)} windows ({N_READS} reads, both strands)")

    s = SeedSearcher(part, threads=THREADS)
    assert s._lib is not None, "native library required"
    # warmup (touch the tables)
    s.search_windows(w1[:1000], w2[:1000])
    best = 1e9
    for r in range(REPS):
        t0 = time.time()
        wins, ids = s.search_windows(w1, w2)
        dt = time.time() - t0
        best = min(best, dt)
        print(f"rep {r}: {dt*1e3:.1f} ms  ({len(w1)/dt/1e6:.2f} Mwin/s, "
              f"{len(ids)} hits)")
    print(f"best: {best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
