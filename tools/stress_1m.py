#!/usr/bin/env python
"""1M-read stress run (t41-style): batch-partition invariance at scale.

Standalone so it can claim whatever device the ambient environment
provides (the pytest conftest forces CPU in-process; the test wrapper
re-launches this script with the device env restored).  Exit 0 = pass.

Validated on the tunneled v5e 2026-08-21: 438,830/1,000,000 aligned,
100K- and 250K-batch runs byte-identical, ~230s wall.
"""

import itertools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sortmerna_tpu.engine.run import prepare, run_align           # noqa: E402
from sortmerna_tpu.io.fastx import iter_fastx                     # noqa: E402
from sortmerna_tpu.options import RunOptions                      # noqa: E402

DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz"
N = 1_000_000
READS_1M = "/tmp/smr_stress_1m.fasta"

T0 = time.time()


def log(msg):
    print("[stress1m %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def main():
    if (not os.path.exists(READS_1M)
            or os.path.getsize(READS_1M) < 200 << 20):
        with open(READS_1M, "w") as f:
            base = list(itertools.islice(iter_fastx(SET2), 100_000))
            for rep in range(N // len(base)):
                for rec in base:
                    f.write(f">{rep}_{rec.header}\n{rec.sequence}\n")
        log("reads written")

    top = tempfile.mkdtemp(prefix="smr_1m_")

    def outcomes(batch_size):
        opts = RunOptions(ref_files=[DB], reads_files=[READS_1M],
                          workdir=f"{top}/b{batch_size}")
        ctx = prepare(opts)
        run_align(ctx, batch_size=batch_size)
        log(f"align batch_size={batch_size} done")
        return [(st.is_hit, len(st.alignments),
                 st.alignments[0].score1 if st.alignments else -1)
                for st in ctx.states], ctx.readstats

    a, rs_a = outcomes(100_000)
    b, rs_b = outcomes(250_000)
    n_hit = sum(1 for s in a if s[0])
    assert len(a) == N
    assert n_hit > N // 4, n_hit
    assert a == b, "batch partition changed per-read outcomes"
    assert rs_a.num_aligned == rs_b.num_aligned == n_hit
    log(f"OK: {n_hit}/{N} aligned, partitions identical")


if __name__ == "__main__":
    main()
