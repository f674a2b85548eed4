"""Regenerate the golden snapshots (run from the repo root, CPU env)."""
import os, pathlib, re, shutil, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all

HERE = pathlib.Path(__file__).parent
GOLD = HERE / "golden"
DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
wd = pathlib.Path("/tmp/golden_wd_regen")
shutil.rmtree(wd, ignore_errors=True)
opts = parse_args(["-ref", DB, "-reads", str(GOLD / "set2_200.fasta"),
                   "-fastx", "-other", "-sam", "-blast",
                   "1 cigar qcov qstrand", "-otu_map", "-de_novo_otu",
                   "-num_alignments", "2", "-workdir", str(wd)])
opts.cmdline = "GOLDEN"
run_all(opts)
outd = wd / "out"
for name in ("aligned.blast", "aligned.sam", "aligned.fa", "other.fa",
             "otu_map.txt"):
    shutil.copy(outd / name, GOLD / name)
log = (outd / "aligned.log").read_text()
log = re.sub(r" Process pid = \d+", " Process pid = PID", log)
(GOLD / "aligned.log").write_text("\n".join(log.splitlines()[:-2]) + "\n")
print("golden regenerated")
