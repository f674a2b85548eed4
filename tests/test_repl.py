"""--cmd debug REPL (cmd.cpp:63-321 CmdSession analogue).

Commands run against the GQ test reference via an io stream; outputs
must carry the inspected read/index/reference facts and bad input must
report-and-continue instead of crashing the session.
"""

import io

from sortmerna_tpu.engine.repl import CmdSession
from sortmerna_tpu.options import RunOptions

REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"


def _session(tmp_path, script):
    opts = RunOptions(ref_files=[REF], reads_files=[READS],
                      workdir=str(tmp_path), is_cmd=True)
    sess = CmdSession(opts)
    import contextlib
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        sess.run(io.StringIO(script))
    return out.getvalue()


def test_read_and_ref_commands(tmp_path):
    out = _session(tmp_path, "read --id=0\nref --idx=0\nexit\n")
    # the single GQ read's id and sequence length appear
    assert "0_0" in out or "read" in out.lower()
    assert "101" in out          # illumina read length
    # ref command reports the part's sequence count (fwd + rc = 2)
    assert "2" in out


def test_index_lookup_and_errors(tmp_path):
    from sortmerna_tpu.io.fastx import iter_fastx
    seq = next(iter(iter_fastx(REF))).sequence
    kmer = seq[:18]
    out = _session(
        tmp_path,
        f"index --idx=0 --kmer={kmer}\n"
        "index --idx=0 --kmer=NOTAVALIDKMER\n"
        "bogus_command\n"
        "quit\n")
    # a real 18-mer from the reference is found with positions
    assert kmer in out or "pos" in out.lower() or "id" in out.lower()
    # bad inputs reported, session continued to the next command
    assert "error" in out.lower() or "unknown" in out.lower()
