"""Multi-part index sweep: a memory budget forcing index splits must
produce the same read partition as a single part (t4-style,
scripts/test.jinja:268)."""

import itertools

import pytest

from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.index.builder import build_index
from sortmerna_tpu.io.fastx import format_record, iter_fastx
from sortmerna_tpu.options import RunOptions


DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz"


def test_split_index_parts():
    built = build_index(DB, max_file_size_mb=1.0)
    assert len(built.parts) >= 3
    # part metadata covers all sequences exactly once
    total = sum(p.numseq_part for p in built.parts)
    assert total == built.stats.numseq
    firsts = [p.first_seq for p in built.parts]
    assert firsts == sorted(firsts)


def test_partition_invariant_under_split(tmp_path):
    sub = tmp_path / "reads.fasta"
    with open(sub, "w") as f:
        for rec in itertools.islice(iter_fastx(SET2), 300):
            f.write(format_record(rec))

    def run(max_mb):
        opts = RunOptions(
            ref_files=[DB], reads_files=[str(sub)],
            max_file_size=max_mb)
        ctx = prepare(opts)
        run_align(ctx)
        return ctx

    one = run(3072.0)
    many = run(1.0)
    assert len(many.indexes[0].parts) >= 3
    hits_one = [s.is_hit for s in one.states]
    hits_many = [s.is_hit for s in many.states]
    assert hits_one == hits_many
    assert one.readstats.num_aligned == many.readstats.num_aligned
