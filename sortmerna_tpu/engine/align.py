"""Alignment task driver: batched multi-pass seed search + SW waves.

Port of the reference control flow (processor.cpp `align`/`align2`,
paralleltraversal.cpp `traverse`) restructured for batch execution:

* reference: per-thread loop over reads, per read a sequential multi-pass
  window search with inline trie traversal and inline SSW.
* here: all reads of a batch advance through the SAME pass together; each
  pass issues ONE bulk seed-probe (device-friendly), then all reads whose
  seed count reached the threshold run their candidate coroutines, whose
  SW jobs are executed in batched waves (engine/candidates.py).

Per-read semantics (pass scheduling, skiplengths, hit accumulation,
is_done conditions) follow paralleltraversal.cpp:95-297 exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import NT_TABLE, PARTIAL_WIN, SEED_WIN_LEN, scoring_matrix_5x5
from ..index.builder import BuiltIndex, IndexPart
from ..ops.seed_probe import SeedSearcher
from ..ops import sw_ref
from .candidates import (Opts, PartContext, Readstats, SwJob,
                         compute_lis_alignment)
from .read import ReadSeq, ReadState


# ---------------------------------------------------------------------------
# SW backends


class NumpySwBackend:
    """Host fallback backend: per-job align_full (ops/sw_ref.py)."""

    def __init__(self, mat: np.ndarray, gap_open: int, gap_ext: int):
        self.mat = mat.astype(np.int64)
        self.gap_open = gap_open
        self.gap_ext = gap_ext

    def batch(self, jobs: Sequence[SwJob]) -> List[dict]:
        out = []
        for j in jobs:
            out.append(sw_ref.align_full(
                np.asarray(j.query, dtype=np.int64),
                np.asarray(j.ref, dtype=np.int64),
                self.mat, self.gap_open, self.gap_ext, j.minimal_score))
        return out


# ---------------------------------------------------------------------------
# per-read traversal state


@dataclass
class _TravState:
    win_shift: int
    pass_n: int = 0
    search: bool = True
    hits: List[Tuple[int, int]] = field(default_factory=list)
    searched: Optional[np.ndarray] = None


def pack9_all(seq03: np.ndarray) -> np.ndarray:
    """Packed 9-mers at every start position 0..len-9 (MSB first)."""
    n = len(seq03) - PARTIAL_WIN + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for k in range(PARTIAL_WIN):
        acc = (acc << 2) | seq03[k:k + n].astype(np.int64)
    return acc


def run_candidate_waves(gens: List[Tuple[int, object]], backend
                        ) -> Dict[int, bool]:
    """Drive candidate coroutines in SW waves.

    gens: list of (read_ordinal, generator).  Returns {ordinal: search}.
    """
    search_flags: Dict[int, bool] = {}
    active: List[Tuple[int, object, SwJob]] = []
    for ordn, gen in gens:
        try:
            job = gen.send(None)
            active.append((ordn, gen, job))
        except StopIteration as e:
            search_flags[ordn] = e.value
    while active:
        results = backend.batch([job for (_, _, job) in active])
        nxt = []
        for (ordn, gen, _), res in zip(active, results):
            try:
                job = gen.send(res)
                nxt.append((ordn, gen, job))
            except StopIteration as e:
                search_flags[ordn] = e.value
        active = nxt
    return search_flags


def traverse_strand(
    reads: List[ReadSeq],
    states: List[ReadState],
    ordinals: List[int],
    forward: bool,
    searcher: SeedSearcher,
    ctx: PartContext,
    opts: Opts,
    skiplengths: Sequence[int],
    backend,
    readstats: Readstats,
    is_last_strand: bool,
    native_engine=None,
) -> None:
    """One strand of one index part for a batch of reads
    (traverse, paralleltraversal.cpp:81-297)."""
    lnwin = ctx.lnwin
    trav: Dict[int, _TravState] = {}
    p9cache: Dict[int, np.ndarray] = {}

    for i in ordinals:
        states[i].last_index = ctx.index_num
        states[i].last_part = ctx.part_num
        trav[i] = _TravState(
            win_shift=skiplengths[0],
            searched=np.zeros(len(reads[i]), dtype=bool))

    live = [i for i in ordinals]
    while live:
        # ---- collect this pass's unsearched windows over all live reads
        probe_read: List[int] = []
        probe_pos: List[int] = []
        for i in live:
            t = trav[i]
            L = len(reads[i])
            numwin = (L - lnwin + t.win_shift) // t.win_shift
            win_pos = 0
            for w in range(numwin):
                if not t.searched[win_pos]:
                    t.searched[win_pos] = True
                    probe_read.append(i)
                    probe_pos.append(win_pos)
                if w != numwin - 1:
                    win_pos += t.win_shift

        if probe_read:
            w1 = np.empty(len(probe_read), dtype=np.int64)
            w2 = np.empty(len(probe_read), dtype=np.int64)
            for n, (i, pos) in enumerate(zip(probe_read, probe_pos)):
                p9 = p9cache.get(i)
                if p9 is None:
                    p9 = pack9_all(reads[i].strand03(forward))
                    p9cache[i] = p9
                w1[n] = p9[pos]
                w2[n] = p9[pos + PARTIAL_WIN]
            hw, hid = searcher.search_windows(w1, w2)
            # attribute hits to reads/windows; one hit_seeds increment per
            # window with >=1 id (paralleltraversal.cpp:242-249)
            if len(hw):
                prev_w = -1
                for w, kid in zip(hw.tolist(), hid.tolist()):
                    i = probe_read[w]
                    pos = probe_pos[w]
                    trav[i].hits.append((kid, pos))
                    if w != prev_w:
                        states[i].hit_seeds += 1
                        prev_w = w

        # ---- LIS/SW stage for reads whose seed count reaches threshold
        if native_engine is not None:
            items = [(i, trav[i].hits) for i in live
                     if states[i].hit_seeds >= opts.num_seeds]
            flags = native_engine.run_pass(items, states, backend,
                                           readstats)
        else:
            gens = []
            for i in live:
                if states[i].hit_seeds >= opts.num_seeds:
                    max_sw = len(reads[i]) * opts.match
                    gens.append((i, compute_lis_alignment(
                        reads[i], states[i], trav[i].hits, forward, ctx,
                        opts, readstats, max_sw)))
            flags = run_candidate_waves(gens, backend)
        for i, sflag in flags.items():
            trav[i].search = sflag

        # ---- pass advance (paralleltraversal.cpp:259-283)
        nxt_live = []
        for i in live:
            t = trav[i]
            if t.search:
                if t.pass_n == 2:
                    t.search = False
                else:
                    while (t.pass_n < 3
                           and skiplengths[t.pass_n]
                           == skiplengths[min(t.pass_n + 1, 2)]
                           and t.pass_n + 1 <= 2):
                        t.pass_n += 1
                    t.pass_n += 1
                    if t.pass_n > 2:
                        t.search = False
                    else:
                        t.win_shift = skiplengths[t.pass_n]
            if t.search:
                nxt_live.append(i)
        live = nxt_live

    # ---- done conditions (paralleltraversal.cpp:285-297)
    for i in ordinals:
        st = states[i]
        if opts.num_alignments > 0:
            if ((opts.is_best and opts.num_alignments == st.max_sw_count)
                    or (not opts.is_best
                        and len(st.alignments) == opts.num_alignments)):
                st.is_done = True
        else:
            if (ctx.is_last_index and ctx.is_last_part and is_last_strand
                    and len(st.alignments) > 0):
                st.is_done = True


def align_part(
    reads: List[ReadSeq],
    states: List[ReadState],
    part: IndexPart,
    ctx: PartContext,
    opts: Opts,
    skiplengths: Sequence[int],
    backend,
    readstats: Readstats,
    use_native: bool = True,
) -> None:
    """Process one index part for a batch of reads: both strands
    (align2, processor.cpp:128-147)."""
    searcher = SeedSearcher(part, opts.minoccur, opts.is_full_search)

    single = opts.is_forward ^ opts.is_reverse
    num_strands = 1 if single else 2

    native_ok = use_native and hasattr(backend, "batch_coords")
    if native_ok:
        from .. import native
        native_ok = native.have_native()

    for count in range(num_strands):
        forward = not ((single and opts.is_reverse) or count == 1)
        is_last = single or count == 1
        ordinals = [i for i in range(len(reads))
                    if not states[i].is_done
                    and len(reads[i]) >= ctx.lnwin]
        if not ordinals:
            break
        engine = None
        if native_ok:
            from ..constants import scoring_matrix_5x5
            from .native_driver import NativeCandidateEngine
            mat = scoring_matrix_5x5(opts.match, opts.mismatch,
                                     opts.score_n)
            engine = NativeCandidateEngine(ctx, opts, reads, forward, mat)
        try:
            traverse_strand(reads, states, ordinals, forward, searcher,
                            ctx, opts, skiplengths, backend, readstats,
                            is_last, native_engine=engine)
        finally:
            if engine is not None:
                engine.finalize_stats(readstats)
                engine.close()


def load_part_refs(fasta_path: str, first_seq: int, numseq_part: int
                   ) -> Tuple[List[np.ndarray], List[str]]:
    """References::load equivalent: the part's sequences in the alignment
    encoding (NT_TABLE: ambiguous -> 4; references.cpp:60-160)."""
    from ..io.fastx import iter_fastx
    seqs: List[np.ndarray] = []
    headers: List[str] = []
    for i, rec in enumerate(iter_fastx(fasta_path)):
        if i < first_seq:
            continue
        if i >= first_seq + numseq_part:
            break
        raw = np.frombuffer(rec.sequence.replace(" ", "").encode("ascii"),
                            dtype=np.uint8)
        seqs.append(NT_TABLE[raw])
        headers.append(rec.header)
    return seqs, headers
