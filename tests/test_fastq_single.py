"""Single (non-paired) FASTQ input end-to-end: .fq outputs with the
original quality strings (report_fx_base quality passthrough), and the
aligned/other partition tiles the input exactly.
"""

import itertools

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.io.fastx import format_record, iter_fastx

DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
FQ = ("/root/reference/data/"
      "set4_mate_pairs_metatranscriptomics_1.fastq")


def test_fastq_single_roundtrip(tmp_path):
    sub = tmp_path / "reads.fastq"
    recs = list(itertools.islice(iter_fastx(FQ), 500))
    with open(sub, "w") as f:
        for rec in recs:
            f.write(format_record(rec))

    opts = parse_args(["-ref", DB, "-reads", str(sub), "-fastx",
                       "-other", "-workdir", str(tmp_path / "wd")])
    ctx = run_all(opts)
    n_hit = sum(1 for s in ctx.states if s.is_hit)
    assert 0 < n_hit < 500

    def parse_fq(path):
        lines = path.read_text().splitlines()
        assert len(lines) % 4 == 0
        return {lines[i][1:]: (lines[i + 1], lines[i + 3])
                for i in range(0, len(lines), 4)}

    aligned = parse_fq(tmp_path / "wd" / "out" / "aligned.fq")
    other = parse_fq(tmp_path / "wd" / "out" / "other.fq")
    assert len(aligned) == n_hit
    assert len(aligned) + len(other) == 500
    assert not set(aligned) & set(other)
    # sequence and quality strings pass through byte-exact
    orig = {r.header: (r.sequence, r.quality) for r in recs}
    for name, (seq, qual) in itertools.chain(aligned.items(),
                                             other.items()):
        assert orig[name] == (seq, qual), name
