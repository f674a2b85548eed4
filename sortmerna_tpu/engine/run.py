"""End-to-end run orchestration (main.cpp:59-115 task graph).

Pipeline: load reads -> readstats -> build/load indexes -> refstats ->
align (index x part sweep over batches) -> denovo stats -> otu map ->
summary -> reports.

The reference streams reads per thread from byte-range feed slots
(readfeed.cpp); this engine loads reads in batches and keeps the per-read
alignment state in memory (spilled to the state store for task-split
resume, engine/state.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import scoring_matrix_5x5
from ..index.builder import BuiltIndex, build_index
from ..io.fastx import iter_fastx
from ..options import RunOptions
from ..stats.refstats import Refstats, compute_refstats
from .align import NumpySwBackend, align_part, load_part_refs
from .candidates import Opts, PartContext, Readstats
from .read import ReadSeq, ReadState


def load_reads(opts: RunOptions) -> List[ReadSeq]:
    """Load reads in the reference's processing order: paired files are
    interleaved fwd/rev (processor.cpp:161, readfeed slot toggling)."""
    per_file: List[List[ReadSeq]] = []
    for fi, path in enumerate(opts.reads_files):
        lst = []
        for num, rec in enumerate(iter_fastx(path)):
            lst.append(ReadSeq(rec.header, rec.sequence, rec.quality,
                               fi, num))
        per_file.append(lst)
    if len(per_file) == 1:
        return per_file[0]
    assert len(per_file) == 2
    if len(per_file[0]) != len(per_file[1]):
        raise ValueError("paired reads files have different read counts")
    out: List[ReadSeq] = []
    for a, b in zip(per_file[0], per_file[1]):
        out.append(a)
        out.append(b)
    return out


@dataclass
class RunContext:
    opts: RunOptions
    reads: List[ReadSeq]
    states: List[ReadState]
    readstats: Readstats
    indexes: List[BuiltIndex]
    refstats: Refstats
    engine_opts: Opts


def prepare(opts: RunOptions) -> RunContext:
    opts.finalize()
    reads = load_reads(opts)
    readstats = Readstats(len(opts.ref_files))
    readstats.all_reads_count = len(reads)
    lens = [len(r) for r in reads]
    readstats.all_reads_len = int(sum(lens))
    readstats.min_read_len = int(min(lens)) if lens else 0
    readstats.max_read_len = int(max(lens)) if lens else 0

    indexes = [build_index(p, opts.interval, opts.max_pos,
                           opts.max_file_size)
               for p in opts.ref_files]

    refstats = compute_refstats(
        indexes, readstats.all_reads_count, readstats.all_reads_len,
        opts.evalue, opts.match, opts.mismatch, opts.gap_open, opts.gap_ext,
        gumbel_override=opts.gumbel_override)

    states = [ReadState() for _ in reads]
    for st in states:
        if opts.min_lis > 0:
            st.best = opts.min_lis       # read.cpp:267

    eopts = Opts(
        num_alignments=opts.num_alignments,
        is_best=opts.is_best,
        num_seeds=opts.num_seeds,
        min_lis=opts.min_lis,
        edges=opts.edges,
        is_as_percent=opts.is_as_percent,
        match=opts.match,
        mismatch=opts.mismatch,
        gap_open=opts.gap_open,
        gap_ext=opts.gap_ext,
        score_n=opts.score_n,
        is_full_search=opts.is_full_search,
        is_forward=opts.is_forward,
        is_reverse=opts.is_reverse,
        minoccur=opts.minoccur,
    )
    return RunContext(opts, reads, states, readstats, indexes, refstats,
                      eopts)


def run_align(ctx: RunContext, sw_backend=None, batch_size: int = 100000
              ) -> None:
    """The align task (processor.cpp:173-285)."""
    opts = ctx.opts
    if sw_backend is None:
        mat = scoring_matrix_5x5(opts.match, opts.mismatch, opts.score_n)
        sw_backend = NumpySwBackend(mat, opts.gap_open, opts.gap_ext)

    n_idx = len(ctx.indexes)
    for idx_num, built in enumerate(ctx.indexes):
        skips = opts.skiplengths[idx_num]
        for part_num, part in enumerate(built.parts):
            ref_seqs, ref_headers = load_part_refs(
                opts.ref_files[idx_num], part.first_seq, part.numseq_part)
            pctx = PartContext(
                index_num=idx_num,
                part_num=part_num,
                pos_offsets=part.pos_offsets,
                pos_seq=part.pos_seq,
                pos_pos=part.pos_pos,
                ref_seqs=ref_seqs,
                minimal_score=ctx.refstats.minimal_score[idx_num],
                lnwin=ctx.refstats.lnwin[idx_num],
                is_last_index=(idx_num == n_idx - 1),
                is_last_part=(part_num == len(built.parts) - 1),
            )
            for b0 in range(0, len(ctx.reads), batch_size):
                batch = ctx.reads[b0:b0 + batch_size]
                bstates = ctx.states[b0:b0 + batch_size]
                # too-short accounting (processor.cpp:109-114)
                for r, s in zip(batch, bstates):
                    if len(r) < pctx.lnwin:
                        ctx.readstats.num_short += 1
                align_part(batch, bstates, part, pctx, ctx.engine_opts,
                           skips, sw_backend, ctx.readstats)


def part_ref_context(ctx: RunContext, idx_num: int, part_num: int):
    """(ref_seqs, ref_headers) for a report pass."""
    part = ctx.indexes[idx_num].parts[part_num]
    return load_part_refs(ctx.opts.ref_files[idx_num], part.first_seq,
                          part.numseq_part)
