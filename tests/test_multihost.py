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


def _filter_log(text: str) -> str:
    """Drop the run-specific summary lines by the writer's STRUCTURE
    (summary.py summary_text): the line after ' Command:', the
    ' Process pid' line, and the trailing timestamp (the last non-blank
    line of the file).  Every counter/parameter line is compared
    exactly."""
    out = []
    skip_next = False
    for ln in text.splitlines(True):
        if skip_next:
            skip_next = False
            continue
        if ln.startswith(" Command:"):
            out.append(ln)
            skip_next = True
            continue
        if ln.startswith(" Process pid"):
            continue
        out.append(ln)
    for i in range(len(out) - 1, -1, -1):   # trailing timestamp line
        if out[i].strip():
            del out[i]
            break
    return "".join(out)


def test_multihost_cli_reports(tmp_path):
    """The CLI under SMR_COORD/SMR_NPROCS/SMR_PROC_ID writes per-host
    report sections and process 0 merges them -- the merged
    aligned.blast / aligned.sam / aligned.fa / otu_map.txt /
    aligned.log must be byte-identical to a single-process run
    (report.cpp:56-96).  Runs against TWO databases (a second copy of
    the GQ ref) so blast/sam rows span two global index parts with
    rows from both hosts in each: the part-outer/host-inner section
    merge must reproduce the single process's part-outer row order
    (output.cpp:196-236), not a host-major one."""
    shared = tmp_path / "shared"
    shared.mkdir()
    ref2 = tmp_path / "ref_copy.fasta"
    ref2.write_bytes(pathlib.Path(REF).read_bytes())
    args = ["-ref", REF, "-ref", str(ref2), "-reads", READS, "-fastx",
            "-blast", "1 cigar qcov qstrand", "-sam", "-otu_map",
            "-de_novo_otu", "-num_alignments", "2"]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["SMR_COORD"] = "localhost:19754"
    env["SMR_NPROCS"] = "2"
    procs = []
    for pid in range(2):
        e = dict(env, SMR_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "sortmerna_tpu.cli", *args,
             "-workdir", str(tmp_path / f"wd{pid}"),
             "-aligned", str(shared / "aligned")],
            env=e, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]

    # single-process baseline through the same CLI surface
    base = subprocess.run(
        [sys.executable, "-m", "sortmerna_tpu.cli", *args,
         "-workdir", str(tmp_path / "wd_base"),
         "-aligned", str(tmp_path / "base_aligned")],
        env={**env, "SMR_NPROCS": "0"}, cwd=str(REPO),
        capture_output=True, text=True, timeout=600)
    assert base.returncode == 0, base.stderr[-3000:]

    for suffix in (".blast", ".fa"):
        merged = (shared / ("aligned" + suffix)).read_bytes()
        want = (tmp_path / ("base_aligned" + suffix)).read_bytes()
        assert merged == want, f"aligned{suffix} differs after merge"
    # no stray section files survive the merge
    assert not [p for pid in range(2)
                for p in shared.glob(f"aligned.s{pid}*")]
    # otu map: merged groups == baseline groups
    assert (shared / "otu_map.txt").read_bytes() == \
        (tmp_path / "otu_map.txt").read_bytes()
    # sam: identical modulo the @PG line
    def sam_body(p):
        return [ln for ln in p.read_text().splitlines()
                if not ln.startswith("@PG")]
    assert sam_body(shared / "aligned.sam") == \
        sam_body(tmp_path / "base_aligned.sam")
    # log: global counters identical modulo cmdline/pid/timestamp
    assert _filter_log((shared / "aligned.log").read_text()) == \
        _filter_log((tmp_path / "base_aligned.log").read_text())


@pytest.mark.slow
def test_multihost_cli_reports_gzip(tmp_path):
    """-zip_out sections merge as concatenated gzip members (the same
    raw-byte append the reference's merge does); the DECOMPRESSED
    merged reports must equal a single-process run's."""
    import gzip
    shared = tmp_path / "shared"
    shared.mkdir()
    args = ["-ref", REF, "-reads", READS, "-fastx",
            "-blast", "1 cigar", "-sam", "-zip-out", "1"]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["SMR_COORD"] = "localhost:19755"
    env["SMR_NPROCS"] = "2"
    procs = []
    for pid in range(2):
        e = dict(env, SMR_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "sortmerna_tpu.cli", *args,
             "-workdir", str(tmp_path / f"wd{pid}"),
             "-aligned", str(shared / "aligned")],
            env=e, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
    base = subprocess.run(
        [sys.executable, "-m", "sortmerna_tpu.cli", *args,
         "-workdir", str(tmp_path / "wd_base"),
         "-aligned", str(tmp_path / "base_aligned")],
        env={**env, "SMR_NPROCS": "0"}, cwd=str(REPO),
        capture_output=True, text=True, timeout=600)
    assert base.returncode == 0, base.stderr[-3000:]
    for suffix in (".blast.gz", ".fa.gz"):
        merged = gzip.decompress(
            (shared / ("aligned" + suffix)).read_bytes())
        want = gzip.decompress(
            (tmp_path / ("base_aligned" + suffix)).read_bytes())
        assert merged == want, f"aligned{suffix} differs after merge"
    # gz SAM: decompressed body identical modulo the @PG cmdline line
    # (hosts>0 never write headers; no byte filtering in the merge)
    def sam_body(raw):
        return [ln for ln in gzip.decompress(raw).decode().splitlines()
                if not ln.startswith("@PG")]
    assert sam_body((shared / "aligned.sam.gz").read_bytes()) == \
        sam_body((tmp_path / "base_aligned.sam.gz").read_bytes())


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
