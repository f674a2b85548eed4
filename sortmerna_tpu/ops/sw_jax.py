"""Batched Smith-Waterman scoring on device (JAX/XLA, TPU-first).

Replaces the reference's per-thread SIMD SSW (ssw.c sw_sse2_byte/word) with
a batch-parallel column-scan DP:

* the scan runs over reference columns (lax.scan, static length);
* each step is pure VPU work over [B, Lq] int32 lanes;
* the within-column gap recurrence (F) is closed-form via a prefix max
  (valid because gap_open >= gap_ext, enforced by option validation),
  computed with an associative scan -- no sequential inner loop;
* tie-breaking matches ssw.c exactly: earliest max column (strict '>'
  update, ssw.c:310-318), minimal row within it (ssw.c:327-336).

The byte->word escalation of the reference (ssw.c:860-871) is subsumed:
int32 lanes never saturate, which equals the word-mode result wherever the
reference escalates and the byte-mode result elsewhere.

The begin-coordinate pass (ssw_align's reverse alignment, ssw.c:900-918)
reuses the same kernel on host-reversed prefixes with the 'terminate at
known score' semantics expressed as masked updates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(1 << 30)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_ext",
                                             "terminate"))
def sw_score_batch(query: jnp.ndarray,    # [B, Lq] int32 (0..4)
                   qlen: jnp.ndarray,     # [B] int32
                   ref: jnp.ndarray,      # [B, Lr] int32 (0..4)
                   rlen: jnp.ndarray,     # [B] int32
                   mat: jnp.ndarray,      # [5, 5] int32
                   gap_open: int, gap_ext: int,
                   terminate: bool = False,
                   tscore: jnp.ndarray = None,   # [B] int32 (terminate mode)
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (score[B], end_ref[B], end_read[B]).

    In terminate mode the scan stops updating once a column's max equals
    ``tscore`` (the reverse/begin pass), reproducing ssw.c:324.
    """
    B, Lq = query.shape
    Lr = ref.shape[1]
    rows = jnp.arange(Lq, dtype=jnp.int32)
    qmask = rows[None, :] < qlen[:, None]            # [B, Lq]

    # per-pair substitution profile [B, Lq, 5]: score of query pos vs char c
    prof = mat.T[query]                              # [B, Lq, 5]
    prof = jnp.where(qmask[:, :, None], prof, NEG)

    if tscore is None:
        tscore = jnp.zeros((B,), dtype=jnp.int32)

    def step(carry, j):
        Hprev, E, best, end_ref, end_read, done = carry
        rj = ref[:, j]                               # [B]
        sub = jnp.take_along_axis(
            prof, rj[:, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        diag = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), Hprev[:, :-1]], axis=1) + sub
        E = jnp.maximum(E - gap_ext, Hprev - gap_open)
        Hpre = jnp.maximum(0, jnp.maximum(diag, E))
        g = Hpre - gap_open + rows[None, :] * gap_ext
        gmax = jax.lax.associative_scan(jnp.maximum, g, axis=1)
        F = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), gmax[:, :-1]], axis=1) \
            - (rows[None, :] - 1) * gap_ext
        H = jnp.maximum(Hpre, F)
        H = jnp.where(qmask, H, 0)

        colmax = H.max(axis=1)
        valid = (j < rlen) & ~done
        improved = (colmax > best) & valid
        row = jnp.argmax(H == colmax[:, None], axis=1).astype(jnp.int32)
        best = jnp.where(improved, colmax, best)
        end_ref = jnp.where(improved, j, end_ref)
        end_read = jnp.where(improved, row, end_read)
        if terminate:
            done = done | ((colmax == tscore) & valid)
        return (H, E, best, end_ref, end_read, done), None

    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.full((B, Lq), NEG, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        qlen - 1,                       # end_read init (ssw.c:171)
        jnp.zeros((B,), bool),
    )
    (H, E, best, end_ref, end_read, done), _ = jax.lax.scan(
        step, init, jnp.arange(Lr, dtype=jnp.int32))
    return best, end_ref, end_read


def pad_batch(seqs, lens, width, dtype=np.int32):
    out = np.zeros((len(seqs), width), dtype=dtype)
    for i, s in enumerate(seqs):
        out[i, :lens[i]] = s
    return out


@functools.partial(jax.jit, static_argnames=("lq", "lr", "gap_open",
                                             "gap_ext"))
def sw_full_resident(reads_dev, refs_dev, q_off, q_len, r_off, r_len,
                     minimal, mat, lq: int, lr: int,
                     gap_open: int, gap_ext: int):
    """Fused device step over HBM-resident sequence buffers.

    Gathers the (read-window, ref-window) pairs on device, runs the
    forward scoring pass AND the reverse begin pass (terminate-at-score
    semantics), returning only scalars per pair -- the only host traffic
    is the offset arrays in and 5 int vectors out.  This keeps the
    reference data resident in HBM exactly as the reference keeps its
    index in RAM per part (processor.cpp:224-230).
    """
    B = q_off.shape[0]
    posq = jnp.arange(lq, dtype=jnp.int32)[None, :]
    posr = jnp.arange(lr, dtype=jnp.int32)[None, :]

    nq = reads_dev.shape[0]
    nr = refs_dev.shape[0]
    qidx = jnp.minimum(q_off[:, None] + posq, nq - 1)
    ridx = jnp.minimum(r_off[:, None] + posr, nr - 1)
    Q = jnp.where(posq < q_len[:, None], reads_dev[qidx].astype(jnp.int32),
                  0)
    R = jnp.where(posr < r_len[:, None], refs_dev[ridx].astype(jnp.int32),
                  0)

    score, end_ref, end_read = sw_score_batch(
        Q, q_len, R, r_len, mat, gap_open, gap_ext)

    # reverse (begin) pass on reversed prefixes, all pairs
    qidx2 = jnp.clip(q_off[:, None] + end_read[:, None] - posq, 0, nq - 1)
    ridx2 = jnp.clip(r_off[:, None] + end_ref[:, None] - posr, 0, nr - 1)
    Q2 = jnp.where(posq <= end_read[:, None],
                   reads_dev[qidx2].astype(jnp.int32), 0)
    R2 = jnp.where(posr <= end_ref[:, None],
                   refs_dev[ridx2].astype(jnp.int32), 0)
    ql2 = jnp.maximum(end_read + 1, 1)
    rl2 = jnp.maximum(end_ref + 1, 1)
    s2, ec2, er2 = sw_score_batch(
        Q2, ql2, R2, rl2, mat, gap_open, gap_ext,
        terminate=True, tscore=score)
    ok = (score >= minimal) & (end_ref >= 0)
    beg_ref = jnp.where(ok, end_ref - ec2, -1)
    beg_read = jnp.where(ok, end_read - er2, -1)
    return score, beg_ref, end_ref, beg_read, end_read


class JaxSwBackend:
    """Device backend for the engine's SW waves.

    Scoring + begin-coordinate passes run on device in padded shape
    buckets; CIGAR traceback runs on the host (banded, only for accepted
    alignments) via the native C++ kernel when available.
    """

    def __init__(self, mat: np.ndarray, gap_open: int, gap_ext: int,
                 use_native: bool = True):
        self.mat = jnp.asarray(mat, dtype=jnp.int32)
        self.mat_np = np.asarray(mat, dtype=np.int64)
        self.gap_open = int(gap_open)
        self.gap_ext = int(gap_ext)
        self.native = None
        if use_native:
            from .. import native
            if native.have_native():
                self.native = native

    def _traceback_many(self, refs, queries, scores, bands):
        if self.native is not None:
            return self.native.traceback_batch(
                refs, queries, scores, bands, self.gap_open, self.gap_ext,
                self.mat_np)
        from . import sw_ref
        return [sw_ref.banded_sw_traceback(
                    r, q, s, self.gap_open, self.gap_ext, b, self.mat_np)
                for r, q, s, b in zip(refs, queries, scores, bands)]

    # Shape discipline: sequence lengths snap to a coarse geometric ladder
    # and the batch dim is a single fixed block size, so the number of
    # compiled programs stays tiny (important through slow-compile paths
    # such as a tunneled device).
    _LEN_LADDER = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
                   65536)
    BLOCK = 1024

    @classmethod
    def _len_bucket(cls, n: int) -> int:
        for b in cls._LEN_LADDER:
            if n <= b:
                return b
        return cls._LEN_LADDER[-1]

    @classmethod
    def _min_block(cls, n: int) -> int:
        for b in (64, 256, cls.BLOCK):
            if n <= b:
                return b
        return cls.BLOCK

    # ladder for device-resident buffer sizes (recompile per rung)
    _BUF_LADDER = tuple(1 << s for s in range(16, 33))

    @classmethod
    def _buf_bucket(cls, n: int) -> int:
        for b in cls._BUF_LADDER:
            if n <= b:
                return b
        return cls._BUF_LADDER[-1]

    def _resident(self, data: np.ndarray, cache_slot: str):
        """device_put `data` (u8) padded to a size rung, cached by id."""
        key = (id(data), len(data))
        cached = getattr(self, cache_slot, None)
        if cached is not None and cached[0] == key:
            return cached[1]
        size = self._buf_bucket(max(len(data), 1))
        padded = np.zeros(size, np.uint8)
        padded[:len(data)] = data
        dev = jax.device_put(padded)
        setattr(self, cache_slot, (key, dev))
        return dev

    def batch_coords(self, q_data: np.ndarray, q_off, q_len,
                     r_data: np.ndarray, r_off, r_len, minimal):
        """Coordinate-based scoring with device-resident buffers.

        The read/ref concatenated buffers are uploaded once (cached by
        object identity); per call only offsets travel to the device and
        five int vectors return.  Returns (score, rb, re, qb, qe)."""
        reads_dev = self._resident(np.asarray(q_data, np.uint8),
                                   "_reads_cache")
        refs_dev = self._resident(np.asarray(r_data, np.uint8),
                                  "_refs_cache")
        q_off = np.asarray(q_off, np.int32)
        q_len = np.asarray(q_len, np.int32)
        r_off = np.asarray(r_off, np.int32)
        r_len = np.asarray(r_len, np.int32)
        minimal = np.asarray(minimal, np.int32)
        n = len(q_off)
        score = np.zeros(n, np.int32)
        end_ref = np.full(n, -1, np.int32)
        end_read = np.zeros(n, np.int32)
        beg_ref = np.full(n, -1, np.int32)
        beg_read = np.full(n, -1, np.int32)
        groups = {}
        for i in range(n):
            key = (self._len_bucket(int(q_len[i])),
                   self._len_bucket(int(r_len[i])))
            groups.setdefault(key, []).append(i)
        for (lq, lr), idxs in groups.items():
            ia = np.asarray(idxs, np.int64)
            for b0 in range(0, len(idxs), self.BLOCK):
                ba = ia[b0:b0 + self.BLOCK]
                B = self.BLOCK if len(idxs) > self.BLOCK else \
                    self._min_block(len(ba))
                qo = np.zeros(B, np.int32)
                qlen_ = np.ones(B, np.int32)
                ro = np.zeros(B, np.int32)
                rlen_ = np.ones(B, np.int32)
                mn = np.full(B, 1 << 30, np.int32)
                qo[:len(ba)] = q_off[ba]
                qlen_[:len(ba)] = q_len[ba]
                ro[:len(ba)] = r_off[ba]
                rlen_[:len(ba)] = r_len[ba]
                mn[:len(ba)] = minimal[ba]
                s, br, er, bq, eq = sw_full_resident(
                    reads_dev, refs_dev, jnp.asarray(qo), jnp.asarray(qlen_),
                    jnp.asarray(ro), jnp.asarray(rlen_), jnp.asarray(mn),
                    self.mat, lq, lr, self.gap_open, self.gap_ext)
                s = np.asarray(s)[:len(ba)]
                score[ba] = s
                beg_ref[ba] = np.asarray(br)[:len(ba)]
                end_ref[ba] = np.asarray(er)[:len(ba)]
                beg_read[ba] = np.asarray(bq)[:len(ba)]
                end_read[ba] = np.asarray(eq)[:len(ba)]
        return score, beg_ref, end_ref, beg_read, end_read

    def batch_coords_hostgather(self, q_data: np.ndarray, q_off, q_len,
                                r_data: np.ndarray, r_off, r_len, minimal):
        """Host-gather variant (kept as the fallback/reference path)."""
        n = len(q_off)
        score = np.zeros(n, np.int32)
        end_ref = np.full(n, -1, np.int32)
        end_read = np.zeros(n, np.int32)
        beg_ref = np.full(n, -1, np.int32)
        beg_read = np.full(n, -1, np.int32)
        order = list(range(n))
        # group by length bucket
        groups = {}
        for i in order:
            key = (self._len_bucket(int(q_len[i])),
                   self._len_bucket(int(r_len[i])))
            groups.setdefault(key, []).append(i)
        q_off = np.asarray(q_off, np.int64)
        q_len = np.asarray(q_len, np.int64)
        r_off = np.asarray(r_off, np.int64)
        r_len = np.asarray(r_len, np.int64)

        def gather_rows(data, off, lens, B, L):
            """[B, L] padded gather from a concatenated buffer."""
            n_ = len(off)
            pos = np.arange(L, dtype=np.int64)[None, :]
            idx = np.minimum(off[:, None] + pos, len(data) - 1)
            M = data[idx].astype(np.int32)
            M[pos >= lens[:, None]] = 0
            out = np.zeros((B, L), np.int32)
            out[:n_] = M
            lo = np.ones(B, np.int32)
            lo[:n_] = np.maximum(lens, 1)
            return out, lo

        for (lq, lr), idxs in groups.items():
            ia = np.asarray(idxs, np.int64)
            for b0 in range(0, len(idxs), self.BLOCK):
                bidx = idxs[b0:b0 + self.BLOCK]
                ba = ia[b0:b0 + self.BLOCK]
                B = self.BLOCK if len(idxs) > self.BLOCK else \
                    self._min_block(len(bidx))
                Q, ql = gather_rows(q_data, q_off[ba], q_len[ba], B, lq)
                R, rl = gather_rows(r_data, r_off[ba], r_len[ba], B, lr)
                s, er, eq = sw_score_batch(
                    jnp.asarray(Q), jnp.asarray(ql), jnp.asarray(R),
                    jnp.asarray(rl), self.mat, self.gap_open, self.gap_ext)
                s = np.asarray(s)
                er = np.asarray(er)
                eq = np.asarray(eq)
                for k, i in enumerate(bidx):
                    score[i] = s[k]
                    end_ref[i] = er[k]
                    end_read[i] = eq[k]
            # begin pass (reversed prefixes gathered in one shot)
            need = [i for i in idxs
                    if score[i] >= minimal[i] and end_ref[i] >= 0]
            na = np.asarray(need, np.int64)

            def gather_rev(data, off, ends, B, L):
                n_ = len(off)
                pos = np.arange(L, dtype=np.int64)[None, :]
                idx = off[:, None] + ends[:, None] - pos
                valid = pos <= ends[:, None]
                idx = np.clip(idx, 0, len(data) - 1)
                M = data[idx].astype(np.int32)
                M[~valid] = 0
                out = np.zeros((B, L), np.int32)
                out[:n_] = M
                lo = np.ones(B, np.int32)
                lo[:n_] = ends + 1
                return out, lo

            for b0 in range(0, len(need), self.BLOCK):
                bneed = need[b0:b0 + self.BLOCK]
                ba = na[b0:b0 + self.BLOCK]
                B2 = self.BLOCK if len(need) > self.BLOCK else \
                    self._min_block(len(bneed))
                Q2, ql2 = gather_rev(q_data, q_off[ba],
                                     end_read[ba].astype(np.int64), B2, lq)
                R2, rl2 = gather_rev(r_data, r_off[ba],
                                     end_ref[ba].astype(np.int64), B2, lr)
                ts = np.zeros(B2, np.int32)
                ts[:len(bneed)] = score[ba]
                s2, ec2, er2 = sw_score_batch(
                    jnp.asarray(Q2), jnp.asarray(ql2), jnp.asarray(R2),
                    jnp.asarray(rl2), self.mat, self.gap_open, self.gap_ext,
                    terminate=True, tscore=jnp.asarray(ts))
                ec2 = np.asarray(ec2)
                er2 = np.asarray(er2)
                for k2, i in enumerate(bneed):
                    beg_ref[i] = end_ref[i] - ec2[k2]
                    beg_read[i] = end_read[i] - er2[k2]
        return score, beg_ref, end_ref, beg_read, end_read

    def batch(self, jobs):
        if not jobs:
            return []
        results = [None] * len(jobs)
        # group by padded length bucket
        groups = {}
        for i, j in enumerate(jobs):
            key = (self._len_bucket(len(j.query)),
                   self._len_bucket(len(j.ref)))
            groups.setdefault(key, []).append(i)

        for (lq, lr), idxs in groups.items():
            qs = [np.asarray(jobs[i].query, dtype=np.int32) for i in idxs]
            rs = [np.asarray(jobs[i].ref, dtype=np.int32) for i in idxs]
            n = len(idxs)
            score = np.zeros(n, dtype=np.int32)
            end_ref = np.zeros(n, dtype=np.int32)
            end_read = np.zeros(n, dtype=np.int32)
            for b0 in range(0, n, self.BLOCK):
                bidx = range(b0, min(b0 + self.BLOCK, n))
                B = self.BLOCK if n > self.BLOCK else \
                    self._min_block(len(bidx))
                Q = np.zeros((B, lq), dtype=np.int32)
                R = np.zeros((B, lr), dtype=np.int32)
                ql = np.ones(B, dtype=np.int32)
                rl = np.ones(B, dtype=np.int32)
                for k, i in enumerate(bidx):
                    Q[k, :len(qs[i])] = qs[i]
                    R[k, :len(rs[i])] = rs[i]
                    ql[k] = len(qs[i])
                    rl[k] = len(rs[i])
                s, er, eq = sw_score_batch(
                    jnp.asarray(Q), jnp.asarray(ql), jnp.asarray(R),
                    jnp.asarray(rl), self.mat, self.gap_open, self.gap_ext)
                s = np.asarray(s)
                er = np.asarray(er)
                eq = np.asarray(eq)
                for k, i in enumerate(bidx):
                    score[i] = s[k]
                    end_ref[i] = er[k]
                    end_read[i] = eq[k]

            # begin pass for jobs meeting the threshold (flag=2 semantics,
            # ssw.c:897)
            need = [k for k in range(n)
                    if score[k] >= jobs[idxs[k]].minimal_score
                    and end_ref[k] >= 0]
            beg_ref = np.full(n, -1, dtype=np.int64)
            beg_read = np.full(n, -1, dtype=np.int64)
            for b0 in range(0, len(need), self.BLOCK):
                bneed = need[b0:b0 + self.BLOCK]
                B2 = self.BLOCK if len(need) > self.BLOCK else \
                    self._min_block(len(bneed))
                Q2 = np.zeros((B2, lq), dtype=np.int32)
                R2 = np.zeros((B2, lr), dtype=np.int32)
                ql2 = np.ones(B2, dtype=np.int32)
                rl2 = np.ones(B2, dtype=np.int32)
                ts = np.zeros(B2, dtype=np.int32)
                for k2, k in enumerate(bneed):
                    rq = qs[k][end_read[k]::-1]
                    rr = rs[k][end_ref[k]::-1]
                    Q2[k2, :len(rq)] = rq
                    R2[k2, :len(rr)] = rr
                    ql2[k2] = len(rq)
                    rl2[k2] = len(rr)
                    ts[k2] = score[k]
                s2, ec2, er2 = sw_score_batch(
                    jnp.asarray(Q2), jnp.asarray(ql2), jnp.asarray(R2),
                    jnp.asarray(rl2), self.mat, self.gap_open, self.gap_ext,
                    terminate=True, tscore=jnp.asarray(ts))
                ec2 = np.asarray(ec2)
                er2 = np.asarray(er2)
                for k2, k in enumerate(bneed):
                    beg_ref[k] = end_ref[k] - ec2[k2]
                    beg_read[k] = end_read[k] - er2[k2]

            tb_refs, tb_qs, tb_scores, tb_bands, tb_at = [], [], [], [], []
            for k, i in enumerate(idxs):
                res = {"score1": int(score[k]),
                       "ref_end1": int(end_ref[k]),
                       "read_end1": int(end_read[k]),
                       "ref_begin1": int(beg_ref[k]),
                       "read_begin1": int(beg_read[k]),
                       "cigar": None}
                if beg_ref[k] >= 0:
                    refw = rs[k][beg_ref[k]:end_ref[k] + 1]
                    qw = qs[k][beg_read[k]:end_read[k] + 1]
                    tb_refs.append(refw.astype(np.uint8))
                    tb_qs.append(qw.astype(np.uint8))
                    tb_scores.append(int(score[k]))
                    tb_bands.append(abs(len(refw) - len(qw)) + 1)
                    tb_at.append(i)
                results[i] = res
            if tb_at:
                cigars = self._traceback_many(tb_refs, tb_qs, tb_scores,
                                              tb_bands)
                for i, cg in zip(tb_at, cigars):
                    results[i]["cigar"] = cg
        return results
