"""Multi-chip data-parallel coverage on the virtual 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8).

dryrun_multichip runs the REAL pipeline three ways (single device,
SW waves batch-sharded over the mesh, reads sharded + psum'd stats) and
asserts byte-identical reports -- see __graft_entry__.dryrun_multichip.
"""

import jax
import numpy as np
import pytest


def _synth_reads(path: str, n_hits: int = 300, n_junk: int = 100) -> None:
    """Deterministic mini read set: windows of the bundled test reference
    (some with point mutations) + random non-aligning reads."""
    from sortmerna_tpu.io.fastx import iter_fastx

    rec = next(iter(iter_fastx("/root/reference/data/test_ref.fasta")))
    seq = rec.sequence
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "w") as f:
        for i in range(n_hits):
            ln = int(rng.integers(60, 151))
            off = int(rng.integers(0, max(1, len(seq) - ln)))
            s = bytearray(seq[off:off + ln], "ascii")
            for _ in range(int(rng.integers(0, 4))):   # up to 3 mutations
                s[int(rng.integers(0, ln))] = int(rng.choice(alpha))
            f.write(f">hit_{i}\n{s.decode()}\n")
        for i in range(n_junk):
            s = rng.choice(alpha, size=90).tobytes().decode()
            f.write(f">junk_{i}\n{s}\n")


@pytest.mark.parametrize("n", [8, 3])
def test_dryrun_multichip_pipeline(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip("needs %d virtual devices" % n)
    import __graft_entry__ as g
    g.dryrun_multichip(n)


def test_multihost_degenerate(tmp_path):
    """run_align_multihost's single-process path must equal the plain
    align (the multi-process path differs only in which shard this host
    owns + the allreduce span)."""
    from sortmerna_tpu.cli import parse_args
    from sortmerna_tpu.engine.run import prepare, run_align, run_all
    from sortmerna_tpu.parallel.dist import (init_multihost,
                                             run_align_multihost)

    reads = str(tmp_path / "reads.fasta")
    _synth_reads(reads, n_hits=40, n_junk=10)
    argv = ["-ref", "/root/reference/data/test_ref.fasta",
            "-reads", reads, "-fastx", "-num_alignments", "2",
            "-idx-dir", str(tmp_path / "idx")]

    pidx, pcount = init_multihost()          # no coordinator: (0, 1)
    assert (pidx, pcount) == (0, 1)

    base = run_all(parse_args(argv + ["-workdir", str(tmp_path / "a")]))

    opts = parse_args(argv + ["-workdir", str(tmp_path / "b")])
    opts.finalize()
    ctx = prepare(opts)
    mine = run_align_multihost(ctx)
    assert mine == slice(0, len(ctx.reads))
    assert ctx.readstats.num_aligned == base.readstats.num_aligned
    assert ctx.readstats.reads_matched_per_db == \
        base.readstats.reads_matched_per_db
    got = [(st.is_hit, len(st.alignments),
            [a.score1 for a in st.alignments]) for st in ctx.states]
    want = [(st.is_hit, len(st.alignments),
             [a.score1 for a in st.alignments]) for st in base.states]
    assert got == want
