"""Native C++ candidate engine == Python coroutine engine, end to end."""

import itertools

import numpy as np
import pytest

from sortmerna_tpu.constants import scoring_matrix_5x5
from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.io.fastx import format_record, iter_fastx
from sortmerna_tpu.options import RunOptions
from sortmerna_tpu.ops.sw_jax import JaxSwBackend
from sortmerna_tpu import native


DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz"


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    p = tmp_path_factory.mktemp("nat") / "reads.fasta"
    with open(p, "w") as f:
        for rec in itertools.islice(iter_fastx(SET2), 600):
            f.write(format_record(rec))
    return str(p)


def _states(subset, backend, use_native, **kw):
    opts = RunOptions(ref_files=[DB], reads_files=[subset], **kw)
    ctx = prepare(opts)
    import sortmerna_tpu.engine.run as R
    import sortmerna_tpu.engine.align as A
    # route through align_part with the chosen mode
    for idx_num, built in enumerate(ctx.indexes):
        from sortmerna_tpu.engine.candidates import PartContext
        for part_num, part in enumerate(built.parts):
            ref_seqs, ref_headers = R.load_part_refs(
                opts.ref_files[idx_num], part.first_seq, part.numseq_part)
            pctx = PartContext(
                index_num=idx_num, part_num=part_num,
                pos_offsets=part.pos_offsets, pos_seq=part.pos_seq,
                pos_pos=part.pos_pos, ref_seqs=ref_seqs,
                minimal_score=ctx.refstats.minimal_score[idx_num],
                lnwin=ctx.refstats.lnwin[idx_num],
                is_last_index=True, is_last_part=True)
            A.align_part(ctx.reads, ctx.states, part, pctx,
                         ctx.engine_opts, opts.skiplengths[idx_num],
                         backend, ctx.readstats, use_native=use_native)
    R.materialize_cigars(ctx)
    return ctx


@pytest.mark.skipif(not native.have_native(), reason="no compiler")
@pytest.mark.parametrize("kw", [
    {},                                             # best 1 default
    {"is_best": False, "is_num_alignments": True, "num_alignments": 3},
    {"is_best": True, "num_alignments": 2},
])
def test_native_matches_python(subset, kw):
    mat = scoring_matrix_5x5(2, -3, 0)
    jx = JaxSwBackend(mat, 5, 2)
    ctx_py = _states(subset, jx, use_native=False, **kw)
    ctx_nat = _states(subset, jx, use_native=True, **kw)

    assert ctx_py.readstats.num_aligned == ctx_nat.readstats.num_aligned
    assert ctx_py.readstats.reads_matched_per_db == \
        ctx_nat.readstats.reads_matched_per_db
    for i, (a, b) in enumerate(zip(ctx_py.states, ctx_nat.states)):
        assert a.is_hit == b.is_hit, i
        assert a.max_sw_count == b.max_sw_count, i
        assert a.best == b.best, i
        assert len(a.alignments) == len(b.alignments), i
        for x, y in zip(a.alignments, b.alignments):
            assert (x.ref_num, x.score1, x.ref_begin1, x.ref_end1,
                    x.read_begin1, x.read_end1, x.strand,
                    list(x.cigar)) == \
                   (y.ref_num, y.score1, y.ref_begin1, y.ref_end1,
                    y.read_begin1, y.read_end1, y.strand,
                    list(y.cigar)), i
