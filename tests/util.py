"""Test helpers: ALP Gumbel oracle (built at test time from the reference's
vendored public ALP library) and cached lambda/K values."""

import functools
import os
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE_DIR = REPO / "build" / "alp_oracle"
ORACLE_BIN = ORACLE_DIR / "alp_oracle"
ALP_SRC = pathlib.Path("/root/reference/3rdparty/alp")

_ORACLE_MAIN = r"""
#include <cstdio>
#include <cstdlib>
#include "sls_alignment_evaluer.hpp"
int main(int argc, char** argv) {
    if (argc < 9) { fprintf(stderr, "usage: oracle match mismatch go ge fA fC fG fT\n"); return 2; }
    long match = atol(argv[1]), mismatch = atol(argv[2]);
    long go = atol(argv[3]), ge = atol(argv[4]);
    double f[4] = {atof(argv[5]), atof(argv[6]), atof(argv[7]), atof(argv[8])};
    long n = 4;
    long** mat = new long*[n];
    for (long i = 0; i < n; ++i) { mat[i] = new long[n];
        for (long j = 0; j < n; ++j) mat[i][j] = (i==j) ? match : mismatch; }
    double f1[4], f2[4];
    for (int i = 0; i < 4; ++i) { f1[i] = f[i]; f2[i] = f[i]; }
    Sls::AlignmentEvaluer ev;
    try {
        ev.set_gapped_computation_parameters_simplified(-1, 14112, 39);
        ev.initGapped(n, (const long *const *)mat, f1, f2, go, ge, go, ge,
                      false, 0.001, 0.005, -1, 500, 182345345);
        printf("%.17g %.17g\n", ev.parameters().lambda, ev.parameters().K);
    } catch (Sls::error& e) {
        fprintf(stderr, "Sls error %ld: %s\n", e.error_code, e.st.c_str());
        return 1;
    }
    return 0;
}
"""


def ensure_oracle() -> pathlib.Path:
    if ORACLE_BIN.exists():
        return ORACLE_BIN
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    (ORACLE_DIR / "oracle.cpp").write_text(_ORACLE_MAIN)
    srcs = sorted(str(p) for p in ALP_SRC.glob("*.cpp"))
    subprocess.run(
        ["g++", "-O2", f"-I{ALP_SRC}", "-o", str(ORACLE_BIN),
         str(ORACLE_DIR / "oracle.cpp")] + srcs,
        check=True, capture_output=True)
    return ORACLE_BIN


@functools.lru_cache(maxsize=None)
def alp_gumbel(match, mismatch, go, ge, fa, fc, fg, ft):
    """Reference-identical (lambda, K) via the vendored ALP simulation."""
    out = subprocess.run(
        [str(ensure_oracle()), str(match), str(mismatch), str(go), str(ge),
         "%.17g" % fa, "%.17g" % fc, "%.17g" % fg, "%.17g" % ft],
        check=True, capture_output=True, text=True)
    lam, k = out.stdout.split()
    return float(lam), float(k)


def gumbel_for_db(db_path, match=2, mismatch=-3, go=5, ge=2):
    from sortmerna_tpu.index.builder import scan_reference
    _, bg, _, _, _ = scan_reference(str(db_path))
    f = bg / bg.sum()
    return alp_gumbel(match, mismatch, go, ge, f[0], f[1], f[2], f[3])
