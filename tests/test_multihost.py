"""REAL multi-process multi-host align on a 2-process CPU cluster.

Two worker processes form a jax.distributed cluster (gloo collectives),
each aligns its own feed shard (run_align_multihost), and the psum'd
Readstats seen by BOTH processes must equal a single-process baseline;
the concatenated per-read outcomes must match the baseline exactly
(the deterministic host-order merge, report.cpp:56-96 semantics).
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"


def test_two_process_multihost(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)          # no virtual-device forcing
    env["SMR_COORD"] = "localhost:19753"
    env["SMR_NPROCS"] = "2"
    procs = []
    for pid in range(2):
        e = dict(env)
        e["SMR_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_worker.py"),
             REF, READS, str(tmp_path / f"wd{pid}"),
             str(tmp_path / f"out{pid}.json")],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    res = [json.load(open(tmp_path / f"out{pid}.json"))
           for pid in range(2)]

    # baseline: single process, plain align
    from sortmerna_tpu.engine.run import prepare, run_align
    from sortmerna_tpu.options import RunOptions
    opts = RunOptions(ref_files=[REF], reads_files=[READS],
                      workdir=str(tmp_path / "base"))
    ctx = prepare(opts)
    run_align(ctx)
    base_outcomes = [
        (int(st.is_hit), len(st.alignments),
         st.alignments[0].score1 if st.alignments else -1)
        for st in ctx.states]

    # shards tile the read space in process order
    assert res[0]["slice"][0] == 0
    assert res[0]["slice"][1] == res[1]["slice"][0]
    assert res[1]["slice"][1] == len(ctx.states)
    # both processes observed the same GLOBAL psum'd counters
    for r in res:
        assert r["n_processes"] == 2
        assert r["num_aligned"] == ctx.readstats.num_aligned
        assert r["reads_matched_per_db"] == \
            ctx.readstats.reads_matched_per_db
    # deterministic merge: concatenated shard outcomes == baseline
    merged = [tuple(o) for o in res[0]["outcomes"] + res[1]["outcomes"]]
    assert merged == base_outcomes
    assert ctx.readstats.num_aligned > 0
