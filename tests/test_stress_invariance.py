"""Partition invariance at scale (t3/t41-style, scripts/t3.jinja:25-40).

The read partition (which reads align) must not depend on execution
geometry: batch size (unit boundaries + journal checkpoints), host
thread count, or read-shard layout.  set2 reads vs silva-arc-16s-id95
on the CPU backend.  The default suite runs a 10K-read subset (shard
invariance bites well below 100K); ``-m slow`` runs the full 100K file.
"""

import itertools

import numpy as np
import pytest

from sortmerna_tpu.options import RunOptions
from sortmerna_tpu.engine.run import prepare, run_align

DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = ("/root/reference/data/"
        "set2_environmental_study_550_amplicon.fasta.gz")


@pytest.fixture(scope="module")
def idx_cache(tmp_path_factory):
    return str(tmp_path_factory.mktemp("idx"))


@pytest.fixture(scope="module")
def set2_10k(tmp_path_factory):
    from sortmerna_tpu.io.fastx import format_record, iter_fastx
    p = tmp_path_factory.mktemp("reads") / "set2_10k.fasta"
    with open(p, "w") as f:
        for rec in itertools.islice(iter_fastx(SET2), 10000):
            f.write(format_record(rec))
    return str(p)


def _run(idx_cache, reads, batch_size=100000, threads=1, shards=None):
    opts = RunOptions(ref_files=[DB], reads_files=[reads],
                      idx_dir=idx_cache, num_proc_thread=threads)
    ctx = prepare(opts)
    if shards:
        import jax

        from sortmerna_tpu.parallel.dist import run_align_sharded
        from sortmerna_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(shards, devices=jax.devices("cpu")[:shards])
        run_align_sharded(ctx, mesh, n_shards=shards)
    else:
        run_align(ctx, batch_size=batch_size)
    hits = np.fromiter((s.is_hit for s in ctx.states), bool,
                       count=len(ctx.states))
    n_aln = sum(len(s.alignments) for s in ctx.states)
    return hits, n_aln, ctx.readstats


@pytest.fixture(scope="module")
def base_run(idx_cache, set2_10k):
    """One baseline align per xdist worker; the three geometry variants
    are separate tests so the scheduler can spread them."""
    hits, aln, rs = _run(idx_cache, set2_10k)
    assert hits.sum() > 1500, "degenerate workload"
    return hits, aln, rs


def test_invariance_batch_size(idx_cache, set2_10k, base_run):
    # odd batch size -> different unit boundaries
    base_hits, base_aln, _ = base_run
    h2, a2, _ = _run(idx_cache, set2_10k, batch_size=7777)
    np.testing.assert_array_equal(base_hits, h2)
    assert a2 == base_aln


def test_invariance_threads(idx_cache, set2_10k, base_run):
    base_hits, base_aln, base_rs = base_run
    h3, a3, rs3 = _run(idx_cache, set2_10k, threads=4)
    np.testing.assert_array_equal(base_hits, h3)
    assert a3 == base_aln
    assert rs3.num_aligned == base_rs.num_aligned


def test_invariance_shards(idx_cache, set2_10k, base_run):
    # read shards over a 4-device mesh with psum'd stats
    base_hits, base_aln, base_rs = base_run
    h4, a4, rs4 = _run(idx_cache, set2_10k, shards=4)
    np.testing.assert_array_equal(base_hits, h4)
    assert a4 == base_aln
    assert rs4.num_aligned == base_rs.num_aligned
    assert rs4.reads_matched_per_db == base_rs.reads_matched_per_db


@pytest.mark.slow
def test_partition_invariance_100k(idx_cache):
    base_hits, base_aln, base_rs = _run(idx_cache, SET2)
    assert base_hits.sum() > 10000, "degenerate workload"
    for kw in ({"batch_size": 7777}, {"threads": 4}, {"shards": 4}):
        h, a, rs = _run(idx_cache, SET2, **kw)
        np.testing.assert_array_equal(base_hits, h)
        assert a == base_aln
        assert rs.num_aligned == base_rs.num_aligned
