"""Per-read alignment parity against the reference's OWN align path.

tools/refalign compiles the reference's traverse + compute_lis_alignment
+ SSW + index loader + ALP Gumbel straight from /root/reference
(paralleltraversal.cpp:81, alignment.cpp:100) with a feed-less harness:
an in-memory KVDB replaces RocksDB while read state still round-trips
through the reference's own binary serialization, and the per-read loop
is the exact align2 body (processor.cpp:93-168).  These tests byte-diff
our engine's per-read results -- is_hit, alignment count, and every
alignment record (ref, part, score, coordinates, strand, packed CIGAR)
-- against that oracle.

This closes the loop the kernel-level oracles (tools/refssw,
tools/refindexer) cannot: seed-pass scheduling, candidate selection +
LIS, best-N bookkeeping and E-value gating all run end-to-end in the
reference's own compiled code.
"""

import shutil
import subprocess

import numpy as np
import pytest

BUILD = "/root/repo/tools/refalign/build.sh"
BIN = "/root/repo/build/refalign/refalign"

GQ_REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
GQ_READS = "/root/reference/data/illumina_GQ099317.fasta"
TEST_REF = "/root/reference/data/test_ref.fasta"
SET7 = "/root/reference/data/set7_arc_bac_16S.fasta"
DB16 = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"


@pytest.fixture(scope="session")
def refalign():
    if shutil.which("g++") is None:
        pytest.skip("no C++ compiler for the reference align oracle")
    r = subprocess.run(["sh", BUILD], capture_output=True, text=True,
                       timeout=600)
    if r.returncode != 0:
        pytest.skip(f"refalign build failed: {r.stderr[-500:]}")
    return BIN


def run_oracle(binpath, ref, reads, tmp, num_alignments=1,
               max_mb=3072.0):
    wd = tmp / "ref_wd"
    wd.mkdir()
    (wd / "idx").mkdir()
    out = subprocess.run(
        [binpath, ref, reads, str(wd), str(num_alignments),
         str(max_mb)],
        capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-1500:]
    res = {}
    cur = None
    for ln in out.stdout.splitlines():
        # the reference's INFO logging interleaves on stdout
        t = ln.split()
        if not t or t[0] not in ("R", "A"):
            continue
        if t[0] == "R":
            cur = res[int(t[1])] = {"is_hit": int(t[2]),
                                    "n": int(t[3]), "alns": []}
        elif t[0] == "A":
            cur["alns"].append(tuple(int(x) for x in t[1:]))
    return res


def run_ours(ref, reads, tmp, num_alignments=1, max_mb=3072.0):
    from sortmerna_tpu.engine.run import materialize_cigars, prepare, \
        run_align
    from sortmerna_tpu.options import RunOptions

    opts = RunOptions(ref_files=[ref], reads_files=[reads],
                      workdir=str(tmp / "our_wd"),
                      num_alignments=num_alignments,
                      max_file_size=max_mb)
    ctx = prepare(opts)
    run_align(ctx)
    materialize_cigars(ctx)
    res = {}
    for i, st in enumerate(ctx.states):
        res[i] = {
            "is_hit": int(st.is_hit),
            "n": len(st.alignments),
            "alns": [(a.ref_num, a.part, a.score1, a.ref_begin1,
                      a.ref_end1, a.read_begin1, a.read_end1,
                      int(a.strand), *[int(c) for c in a.cigar])
                     for a in st.alignments],
        }
    return res


def check_parity(oracle, ours, min_hits=1):
    assert set(oracle) == set(ours)
    n_hits = 0
    for i in sorted(oracle):
        o, u = oracle[i], ours[i]
        assert u["is_hit"] == o["is_hit"], f"read {i} is_hit"
        assert u["n"] == o["n"], f"read {i} alignment count"
        assert u["alns"] == o["alns"], f"read {i} alignment records"
        n_hits += o["is_hit"]
    assert n_hits >= min_hits


def test_gq_single_read(refalign, tmp_path):
    oracle = run_oracle(refalign, GQ_REF, GQ_READS, tmp_path)
    ours = run_ours(GQ_REF, GQ_READS, tmp_path)
    check_parity(oracle, ours)


def _synth_reads(path, ref_path, n_hits=120, n_junk=40, seed=5):
    from sortmerna_tpu.io.fastx import iter_fastx
    seqs = [r.sequence for r in iter_fastx(ref_path)]
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    rc = bytes.maketrans(b"ACGT", b"TGCA")
    with open(path, "w") as f:
        for i in range(n_hits):
            src = seqs[i % len(seqs)]
            ln = int(rng.integers(60, 151))
            off = int(rng.integers(0, max(1, len(src) - ln)))
            s = bytearray(src[off:off + ln], "ascii")
            for _ in range(int(rng.integers(0, 5))):
                s[int(rng.integers(0, ln))] = int(rng.choice(alpha))
            if i % 3 == 2:      # reverse-complement strand coverage
                s = bytes(s).translate(rc)[::-1]
            f.write(f">r{i}\n{bytes(s).decode()}\n")
        for i in range(n_junk):
            f.write(f">j{i}\n"
                    f"{rng.choice(alpha, size=90).tobytes().decode()}\n")


def test_synthetic_vs_test_ref(refalign, tmp_path):
    """120 mutated windows (both strands) + 40 junk reads vs test_ref:
    seed passes, LIS, SW acceptance, strand handling."""
    reads = tmp_path / "reads.fasta"
    _synth_reads(str(reads), TEST_REF)
    oracle = run_oracle(refalign, TEST_REF, str(reads), tmp_path)
    ours = run_ours(TEST_REF, str(reads), tmp_path)
    check_parity(oracle, ours, min_hits=80)


def test_multipart_sweep(refalign, tmp_path):
    """A 6-sequence synthetic database forced into multiple index parts
    (-m): the sequential part sweep with state round-tripping between
    parts (processor.cpp:219-277; our journal-equivalent path) must
    produce identical records, including lastIndex/lastPart-style
    carry-over effects on is_done."""
    from sortmerna_tpu.io.fastx import iter_fastx
    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    base = next(iter(iter_fastx(TEST_REF))).sequence
    db = tmp_path / "db6.fasta"
    with open(db, "w") as f:
        for i in range(6):
            s = bytearray(base[100 * i:100 * i + 1200].encode())
            for _ in range(220):
                s[int(rng.integers(0, len(s)))] = int(rng.choice(alpha))
            f.write(f">synt_{i}\n{s.decode()}\n")
    reads = tmp_path / "reads.fasta"
    _synth_reads(str(reads), str(db), n_hits=90, n_junk=20, seed=9)
    oracle = run_oracle(refalign, str(db), str(reads), tmp_path,
                        num_alignments=2, max_mb=0.03)
    ours = run_ours(str(db), str(reads), tmp_path, num_alignments=2,
                    max_mb=0.03)
    parts = {a[1] for r in oracle.values() for a in r["alns"]}
    assert len(parts) >= 2, f"sweep not multi-part: {parts}"
    check_parity(oracle, ours, min_hits=60)


def test_synthetic_best4_vs_gq(refalign, tmp_path):
    """--best 4 against the 2-sequence GQ reference (fwd + rc of the
    same gene): multiple alignments per read exercise the best-N
    replace-min bookkeeping (alignment.cpp:411-459)."""
    reads = tmp_path / "reads.fasta"
    _synth_reads(str(reads), GQ_REF, n_hits=80, n_junk=20, seed=11)
    oracle = run_oracle(refalign, GQ_REF, str(reads), tmp_path,
                        num_alignments=4)
    ours = run_ours(GQ_REF, str(reads), tmp_path, num_alignments=4)
    check_parity(oracle, ours, min_hits=60)
