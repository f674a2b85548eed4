#!/usr/bin/env python
"""One host of a multi-host align (parallel/dist.run_align_multihost).

Launched once per process by tests/test_multihost.py (CPU cluster) or
by a real multi-host deployment driver:

    SMR_COORD=host:port SMR_NPROCS=N SMR_PROC_ID=i \
        python tools/multihost_worker.py <db> <reads> <workdir> <out.json>

Each process aligns its own contiguous pair-aligned shard of the
global read order, allreduces Readstats over every process's devices,
and writes {slice, counters, per-read outcomes of its shard} as JSON.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    db, reads, workdir, out_json = sys.argv[1:5]
    from sortmerna_tpu.engine.run import prepare
    from sortmerna_tpu.options import RunOptions
    from sortmerna_tpu.parallel.dist import (init_multihost,
                                             run_align_multihost)

    pidx, pcount = init_multihost()
    opts = RunOptions(ref_files=[db], reads_files=[reads],
                      workdir=workdir)
    ctx = prepare(opts)
    mine = run_align_multihost(ctx)
    out = {
        "process": pidx,
        "n_processes": pcount,
        "slice": [mine.start, mine.stop],
        "num_aligned": ctx.readstats.num_aligned,
        "reads_matched_per_db": ctx.readstats.reads_matched_per_db,
        "outcomes": [
            (int(st.is_hit), len(st.alignments),
             st.alignments[0].score1 if st.alignments else -1)
            for st in ctx.states[mine.start:mine.stop]],
    }
    with open(out_json, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
