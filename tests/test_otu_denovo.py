"""OTU map + de-novo classification e2e invariants (t3-style workload on
a set2 subset; the reference's validation logic is run.py:743-795:
counters in aligned.log must reconcile with otu_map.txt and fastx files).
"""

import itertools
import os

import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.io.fastx import format_record, iter_fastx


DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz"
N = 1500


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    d = tmp_path_factory.mktemp("set2")
    p = d / "set2_subset.fasta"
    with open(p, "w") as f:
        for rec in itertools.islice(iter_fastx(SET2), N):
            f.write(format_record(rec))
    return str(p)


def test_otu_denovo_invariants(subset, tmp_path):
    wd = tmp_path / "wd"
    argv = ["-ref", DB, "-reads", subset, "-fastx", "-otu_map",
            "-de_novo_otu", "-id", "0.97", "-coverage", "0.97",
            "-workdir", str(wd)]
    opts = parse_args(argv)
    ctx = run_all(opts)
    rs = ctx.readstats

    # log counters vs state
    assert rs.all_reads_count == N
    n_hit = sum(1 for s in ctx.states if s.is_hit)
    assert rs.num_aligned == n_hit

    # fastx reconciliation: aligned.fa holds exactly the is_hit reads
    aligned = list(iter_fastx(wd / "out" / "aligned.fa"))
    assert len(aligned) == n_hit

    # denovo file holds exactly the qualifying reads (output.cpp:133-143)
    from sortmerna_tpu.reports.fastx import is_denovo_read
    n_dn_reads = sum(1 for s in ctx.states if is_denovo_read(s))
    dn_path = wd / "out" / "aligned_denovo.fa"
    n_dn_file = len(list(iter_fastx(dn_path))) if os.path.exists(dn_path) \
        else 0
    assert n_dn_file == n_dn_reads

    # otu map groups == readstats.total_otu; every otu read passed id+cov
    otu_lines = open(wd / "out" / "otu_map.txt").read().splitlines()
    assert len(otu_lines) == rs.total_otu
    n_otu_reads = sum(len(l.split("\t")) - 1 for l in otu_lines)
    assert n_otu_reads >= rs.n_yid_ycov  # multi-alignment reads may repeat

    # log text parses and contains the OTU totals
    log = open(wd / "out" / "aligned.log").read()
    assert f"Total OTUs = {rs.total_otu}" in log
    assert f"Total reads for de novo clustering = {rs.num_denovo}" in log

    # classification counters partition all (index,part)-matching
    # alignments
    n_class = (rs.n_yid_ycov + rs.n_yid_ncov + rs.n_nid_ycov
               + rs.num_denovo)
    n_aln = sum(len(s.alignments) for s in ctx.states)
    assert n_class == n_aln
