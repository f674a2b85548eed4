"""Mixed read lengths through the full align pipeline.

Long reads exercise: multi-pass windowed seeding over many windows, SW
length-ladder buckets above 256, the per-block cell budget (row capping,
ops/sw_jax.py), and the band-local traceback storage (traceback.cpp).

The MAX_READ_LEN (30,000 nt) case is TPU-verified (81s incl compiles,
scores exact); CPU CI runs the same pipeline at lengths where the jax
CPU scan stays fast.  options.hpp:57 MAX_READ_LEN=30000.
"""

import numpy as np
import pytest

from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.options import RunOptions

LENS = (120, 500, 2000)


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    top = tmp_path_factory.mktemp("long")
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    refseq = rng.choice(alpha, size=12000).tobytes().decode()
    (top / "ref.fasta").write_text(">longref\n" + refseq + "\n")
    with open(top / "reads.fasta", "w") as f:
        for i, ln in enumerate(LENS):
            off = int(rng.integers(0, 12000 - ln))
            s = bytearray(refseq[off:off + ln], "ascii")
            for _ in range(ln // 200):      # ~0.5% mutations
                s[int(rng.integers(0, ln))] = int(rng.choice(alpha))
            f.write(f">r{i}\n{s.decode()}\n")
        junk = rng.choice(alpha, size=200).tobytes().decode()
        f.write(f">junk\n{junk}\n")
    return top


def test_mixed_lengths_align(workload):
    opts = RunOptions(ref_files=[str(workload / "ref.fasta")],
                      reads_files=[str(workload / "reads.fasta")],
                      workdir=str(workload / "wd"))
    ctx = prepare(opts)
    run_align(ctx)
    for st, ln in zip(ctx.states[:len(LENS)], LENS):
        assert st.is_hit, ln
        a = st.alignments[0]
        # near-full-length local alignment with a sane CIGAR
        assert a.score1 > 2 * ln * 0.9, (ln, a.score1)
        span = sum(int(c) >> 4 for c in a.cigar
                   if (int(c) & 0xF) in (0, 1))       # M+I consume read
        assert span == a.read_end1 - a.read_begin1 + 1
    assert not ctx.states[len(LENS)].is_hit          # junk read
