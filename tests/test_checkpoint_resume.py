"""Mid-run crash / resume via the align journal.

The reference checkpoints per-read state to RocksDB after each read
(processor.cpp:154) and skips restored is_done reads on restart
(processor.cpp:117-126).  Here the unit is an (index, part, batch)
sweep journaled in workdir/kvdb; a SIGKILLed align must resume at the
last completed unit and still produce byte-identical outputs.
"""

import pathlib
import subprocess
import sys

import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.engine.state import AlignJournal

HERE = pathlib.Path(__file__).parent
GOLD = HERE / "golden"
DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"

ARGS = ["-ref", DB, "-reads", str(GOLD / "set2_200.fasta"),
        "-fastx", "-other", "-sam", "-blast", "1 cigar qcov qstrand",
        "-otu_map", "-de_novo_otu", "-num_alignments", "2"]


@pytest.fixture(scope="module")
def idx_cache(tmp_path_factory):
    """One shared index build for all tests in this module."""
    return str(tmp_path_factory.mktemp("idx"))

# Crash runner: hard-exit (no cleanup, no consolidated state save)
# after the journal's Nth unit checkpoint -- a faithful SIGKILL stand-in
# at the only boundary a kill can differ from (mid-unit kills lose that
# unit's record and simply redo it).
CRASH_SCRIPT = r"""
import os, sys
from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine import state
from sortmerna_tpu.engine.run import run_all

crash_after = int(sys.argv[1])
orig = state.AlignJournal.append
calls = [0]

def crashing_append(self, *a, **k):
    orig(self, *a, **k)
    calls[0] += 1
    if calls[0] >= crash_after:
        os._exit(9)

state.AlignJournal.append = crashing_append
run_all(parse_args(sys.argv[2:]), batch_size=50)
"""


def _check_outputs(wd):
    for name in ("aligned.blast", "aligned.fa", "other.fa",
                 "otu_map.txt"):
        got = (wd / "out" / name).read_text()
        exp = (GOLD / name).read_text()
        assert got == exp, f"resumed output differs: {name}"


def test_crash_resume_byte_identical(tmp_path, idx_cache):
    wd = tmp_path / "wd"
    argv = ARGS + ["-workdir", str(wd), "-idx-dir", idx_cache]

    # 200 reads / batch 50 -> 4 units; die after unit 2
    p = subprocess.run([sys.executable, "-c", CRASH_SCRIPT, "2"] + argv,
                       capture_output=True, text=True)
    assert p.returncode == 9, p.stderr

    journal = AlignJournal(str(wd / "kvdb"))
    assert journal.exists()
    meta = journal.meta()
    assert meta == {"batch_size": 50, "n_reads": 200}

    # resume in-process: picks up the journal, redoes only units 3-4
    ctx = run_all(parse_args(argv))
    _check_outputs(wd)
    assert not journal.exists()     # consolidated into read_states.bin
    assert ctx.readstats.all_reads_count == 200


def test_resume_tolerates_torn_tail(tmp_path, idx_cache):
    wd = tmp_path / "wd"
    argv = ARGS + ["-workdir", str(wd), "-idx-dir", idx_cache]
    p = subprocess.run([sys.executable, "-c", CRASH_SCRIPT, "3"] + argv,
                       capture_output=True, text=True)
    assert p.returncode == 9, p.stderr

    # simulate a crash mid-record: torn bytes after the last good record
    journal = AlignJournal(str(wd / "kvdb"))
    with open(journal.path, "ab") as f:
        f.write(AlignJournal.MAGIC.to_bytes(4, "little") + b"\x40" * 13)

    run_all(parse_args(argv))
    _check_outputs(wd)


def test_fresh_align_refuses_nonempty_kvdb(tmp_path, idx_cache):
    wd = tmp_path / "wd"
    argv = ARGS + ["-workdir", str(wd), "-idx-dir", idx_cache]
    run_all(parse_args(argv))
    # completed state, no journal: align again -> reference-style error
    # (options.cpp:1313-1326 validate_kvdbdir)
    with pytest.raises(SystemExit, match="not empty"):
        run_all(parse_args(argv))


def test_journal_input_mismatch(tmp_path, idx_cache):
    wd = tmp_path / "wd"
    argv = ARGS + ["-workdir", str(wd), "-idx-dir", idx_cache]
    p = subprocess.run([sys.executable, "-c", CRASH_SCRIPT, "1"] + argv,
                       capture_output=True, text=True)
    assert p.returncode == 9, p.stderr

    other_reads = tmp_path / "one.fasta"
    other_reads.write_text(">r0\nACGTACGTACGTACGTACGTACGT\n")
    argv2 = list(argv)
    argv2[argv2.index(str(GOLD / "set2_200.fasta"))] = str(other_reads)
    with pytest.raises(SystemExit, match="different input"):
        run_all(parse_args(argv2))
