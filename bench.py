#!/usr/bin/env python
"""Benchmark: reads/s/chip filtering set2 amplicon vs SILVA 16S.

Runs the full align pipeline (seed search + LIS + device SW + traceback)
on a subset of set2_environmental_study_550_amplicon vs
silva-arc-16s-id95 and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R}

Baseline: the reference aligns ~6,240 reads/s on an 8-thread laptop VM
across 8 DBs (docs/trace4.3.2.rst:452, see BASELINE.md); per single DB
that is ~6240 reads/s of end-to-end throughput, which we use as the
vs_baseline denominator.

Env knobs: BENCH_READS (default 4000), BENCH_DB, BENCH_READS_FILE.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_READS_PER_SEC = 6240.0

DB = os.environ.get(
    "BENCH_DB",
    "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta")
READS = os.environ.get(
    "BENCH_READS_FILE",
    "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz")
N_READS = int(os.environ.get("BENCH_READS", "4000"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/smr_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from sortmerna_tpu.constants import scoring_matrix_5x5
    from sortmerna_tpu.engine.run import prepare, run_align
    from sortmerna_tpu.io.fastx import format_record, iter_fastx
    from sortmerna_tpu.options import RunOptions
    from sortmerna_tpu.ops.sw_jax import JaxSwBackend

    # subset the reads
    sub = "/tmp/bench_reads.fasta"
    with open(sub, "w") as f:
        for rec in itertools.islice(iter_fastx(READS), N_READS):
            f.write(format_record(rec))

    opts = RunOptions(ref_files=[DB], reads_files=[sub],
                      workdir="/tmp/bench_wd")
    t_prep0 = time.time()
    ctx = prepare(opts)
    t_prep = time.time() - t_prep0

    mat = scoring_matrix_5x5(opts.match, opts.mismatch, opts.score_n)
    backend = JaxSwBackend(mat, opts.gap_open, opts.gap_ext)

    # warmup pass on a small slice to amortize jit compiles
    warm_n = min(200, len(ctx.reads))
    warm = prepare(RunOptions(ref_files=[DB], reads_files=[sub],
                              workdir="/tmp/bench_wd"))
    warm.reads = warm.reads[:warm_n]
    warm.states = warm.states[:warm_n]
    run_align(warm, sw_backend=backend)

    from sortmerna_tpu.util import TIMERS, timers_enabled, timers_report
    TIMERS.clear()
    t0 = time.time()
    run_align(ctx, sw_backend=backend)
    dt = time.time() - t0
    if timers_enabled():
        print("TIMERS:", timers_report(), file=sys.stderr)

    n_hit = sum(1 for s in ctx.states if s.is_hit)
    rps = len(ctx.reads) / dt
    out = {
        "metric": "reads_per_sec_per_chip_set2_vs_silva16s",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "n_reads": len(ctx.reads),
        "n_aligned": n_hit,
        "align_sec": round(dt, 2),
        "prepare_sec": round(t_prep, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
