"""Self-golden regression snapshots: the full report suite on 200 set2
reads vs silva-arc-16s must reproduce the checked-in outputs byte-for-
byte (guards the engine + report layers against behavior drift).

Regenerate intentionally with:  python tests/regen_golden.py
"""

import pathlib
import re
import shutil

import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all


HERE = pathlib.Path(__file__).parent
GOLD = HERE / "golden"
DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"


def test_golden_snapshot(tmp_path):
    wd = tmp_path / "wd"
    opts = parse_args([
        "-ref", DB, "-reads", str(GOLD / "set2_200.fasta"),
        "-fastx", "-other", "-sam", "-blast", "1 cigar qcov qstrand",
        "-otu_map", "-de_novo_otu", "-num_alignments", "2",
        "-workdir", str(wd)])
    opts.cmdline = "GOLDEN"
    run_all(opts)
    outd = wd / "out"
    for name in ("aligned.blast", "aligned.sam", "aligned.fa",
                 "other.fa", "otu_map.txt"):
        got = (outd / name).read_text()
        exp = (GOLD / name).read_text()
        assert got == exp, f"snapshot mismatch: {name}"
    log = (outd / "aligned.log").read_text()
    log = re.sub(r" Process pid = \d+", " Process pid = PID", log)
    log = re.sub(r"    Reads file: .*set2_200\.fasta", "    Reads file: READS", log)
    log = "\n".join(log.splitlines()[:-2]) + "\n"
    exp = (GOLD / "aligned.log").read_text()
    if log != exp:
        import difflib
        d = "\n".join(difflib.unified_diff(
            exp.splitlines(), log.splitlines(), lineterm=""))
        raise AssertionError(f"log snapshot mismatch:\n{d}")
