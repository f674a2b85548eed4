"""Error-path and artifact-count tests (reference t10 / t4 analogues,
scripts/run.py:842-859 and :797-814).

The reference validates: (t10) a reference fasta with sequences shorter
than the 19-char window aborts with a specific message; (t4) an index
build leaves the expected number of artifact files on disk.
"""

import subprocess
import sys

import pytest

from sortmerna_tpu.cli import CliError, parse_args
from sortmerna_tpu.index.builder import build_index

SHORT_REF = "/root/reference/data/ref_short_seqs.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"
REF = "/root/reference/data/test_ref.fasta"


def test_ref_shorter_than_seed(tmp_path):
    """t10: exit != 0 with the reference's wording
    (indexdb.cpp seed-length check; scripts/test.jinja:498)."""
    p = subprocess.run(
        [sys.executable, "-m", "sortmerna_tpu.cli",
         "-ref", SHORT_REF, "-reads", READS,
         "-workdir", str(tmp_path / "wd")],
        capture_output=True, text=True,
        env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
             "PATH": "/usr/bin:/bin", "HOME": "/root"})
    assert p.returncode != 0
    msg = p.stderr + p.stdout
    assert "one of your sequences is shorter than the seed length 19" \
        in msg, msg


def test_ref_shorter_inproc():
    with pytest.raises(ValueError, match="shorter than the seed length"):
        build_index(SHORT_REF)


def test_empty_and_missing_inputs(tmp_path):
    """Empty or missing input files exit with a clean message, not a
    parser traceback (reference empty_file.fasta fixture behavior)."""
    from sortmerna_tpu.options import RunOptions
    empty = "/root/reference/data/empty_file.fasta"
    with pytest.raises(SystemExit, match="empty"):
        RunOptions(ref_files=[REF], reads_files=[empty],
                   workdir=str(tmp_path)).finalize()
    with pytest.raises(SystemExit, match="empty"):
        RunOptions(ref_files=[empty], reads_files=[READS],
                   workdir=str(tmp_path)).finalize()
    with pytest.raises(SystemExit, match="does not exist"):
        RunOptions(ref_files=[REF], reads_files=["/nope/missing.fa"],
                   workdir=str(tmp_path)).finalize()


def test_index_artifact_counts(tmp_path):
    """t4 analogue: our artifact layout is one stats json + one dir of
    .npy arrays per part; counts must match the documented invariant."""
    import os

    from sortmerna_tpu.index.artifact import _PART_FIELDS, build_or_load

    # the conftest session fixture reroutes fresh builds into a shared
    # cache; this test asserts the REAL artifact layout, so unwrap
    build_or_load = getattr(build_or_load, "__wrapped__", build_or_load)
    idx = str(tmp_path / "idx")
    built = build_or_load(REF, idx)
    stats_files = [f for f in os.listdir(idx) if f.endswith(".stats.json")]
    part_dirs = [f for f in os.listdir(idx) if ".part" in f]
    assert len(stats_files) == 1
    assert len(part_dirs) == len(built.parts)
    for d in part_dirs:
        names = set(os.listdir(os.path.join(idx, d)))
        assert names == {f"{n}.npy" for n in _PART_FIELDS}

    # second build_or_load must hit the cache (no rebuild): the loaded
    # artifact mtimes stay put
    m0 = {d: os.path.getmtime(os.path.join(idx, d)) for d in part_dirs}
    build_or_load(REF, idx)
    m1 = {d: os.path.getmtime(os.path.join(idx, d)) for d in part_dirs}
    assert m0 == m1


@pytest.mark.parametrize("argv,match", [
    (["-reads", READS], "--ref"),
    (["-ref", REF], "--reads"),
    (["-ref", REF, "-reads", READS, "-reads", READS, "-reads", READS],
     "at most two read files"),
    (["-ref", REF, "-reads", READS, "-gap_open", "2", "-gap_ext", "5"],
     "gap_ext"),
    (["-ref", REF, "-reads", READS, "-task", "7"], "task"),
    (["-ref", REF, "-reads", READS, "-bogus_opt"], "unknown option"),
])
def test_cli_validation_errors(argv, match):
    with pytest.raises(SystemExit, match=match):
        parse_args(argv)


def test_cli_bad_L_warns_and_keeps_default(capsys):
    """Reference behavior: invalid -L warns and uses the default
    (options.cpp opt_L)."""
    opts = parse_args(["-ref", REF, "-reads", READS, "-L", "17"])
    assert opts.seed_win_len == 18
    assert "Positive Even integer" in capsys.readouterr().err
    opts = parse_args(["-ref", REF, "-reads", READS, "-L", "14"])
    assert opts.seed_win_len == 14


def test_missing_reads_file(tmp_path):
    with pytest.raises(SystemExit, match="does not exist"):
        opts = parse_args(
            ["-ref", REF, "-reads", str(tmp_path / "nope.fq"),
             "-workdir", str(tmp_path / "wd")])
        from sortmerna_tpu.engine.run import run_all
        run_all(opts)


def test_paired_count_mismatch(tmp_path):
    r1 = tmp_path / "a.fasta"
    r2 = tmp_path / "b.fasta"
    r1.write_text(">x\n" + "ACGT" * 10 + "\n>y\n" + "ACGT" * 10 + "\n")
    r2.write_text(">x\n" + "ACGT" * 10 + "\n")
    opts = parse_args(["-ref", REF, "-reads", str(r1), "-reads", str(r2),
                       "-workdir", str(tmp_path / "wd")])
    from sortmerna_tpu.engine.run import run_all
    with pytest.raises(ValueError, match="different"):
        run_all(opts)
