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
import os
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


def _sw_scan(Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
             terminate, tscore):
    """Shared column-scan DP over padded tiles with explicit validity
    masks (int32 lanes, cummax F recurrence; see sw_score_batch
    docstring for the semantics).

    TPU-tuned formulation: the per-column substitution row comes from a
    5-way select over precomputed per-character profiles (no gathers in
    the scan body); ref columns stream in as scan xs (no dynamic
    slices); and the (max score, earliest column, minimal row)
    tie-breaking folds into ONE max-reduction per column by packing
    ``H << s | (Lq-1-row)`` into a single lane.
    """
    B, Lq = Q.shape
    Lr = R.shape[1]
    rows = jnp.arange(Lq, dtype=jnp.int32)

    prof = mat.T[Q]                                  # [B, Lq, 5]
    prof = jnp.where(row_valid[:, :, None], prof, NEG)
    p0, p1, p2, p3, p4 = (prof[:, :, c] for c in range(5))

    # key packing: H values are bounded by Lq * max(mat) (local alignment
    # over <=Lq query chars), so H << s fits int32 for tiles up to
    # Lq=2048 even at |mat|=127; wider tiles use a 3-reduction tie-break
    # instead (jnp int64 downcasts to int32 without x64 mode).
    s = max((Lq - 1).bit_length(), 1)
    packed = (Lq << s) < (1 << 24)
    kdt = jnp.int32
    revrow = (Lq - 1 - rows)[None, :].astype(kdt)    # [1, Lq]
    f_ofs = (rows * gap_ext)[None, :]                # [1, Lq]
    f_sub = ((rows - 1) * gap_ext)[None, :]

    def step(carry, xs):
        Hprev, E, bestscore, bestkey, end_ref, done = carry
        rj, cvj, j = xs                              # [B], [B], []
        rj = rj[:, None]
        sub = jnp.where(rj == 0, p0,
                        jnp.where(rj == 1, p1,
                                  jnp.where(rj == 2, p2,
                                            jnp.where(rj == 3, p3, p4))))
        sub = jnp.where(cvj[:, None], sub, NEG)
        diag = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), Hprev[:, :-1]], axis=1) + sub
        E = jnp.maximum(E - gap_ext, Hprev - gap_open)
        Hpre = jnp.maximum(0, jnp.maximum(diag, E))
        g = Hpre - gap_open + f_ofs
        gmax = jax.lax.cummax(g, axis=1)
        F = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), gmax[:, :-1]], axis=1) \
            - f_sub
        H = jnp.maximum(Hpre, F)
        H = jnp.where(row_valid, H, 0)

        if packed:
            key = (H << s) | revrow
            colkey = key.max(axis=1)                 # [B]
            colmax = colkey >> s
        else:
            colmax = H.max(axis=1)
            colrow = jnp.where(H == colmax[:, None], revrow, -1) \
                .max(axis=1)
            colkey = colrow                          # row bits only
        valid = cvj & ~done
        improved = (colmax > bestscore) & valid
        bestscore = jnp.where(improved, colmax, bestscore)
        bestkey = jnp.where(improved, colkey, bestkey)
        end_ref = jnp.where(improved, j, end_ref)
        if terminate:
            done = done | ((colmax == tscore) & valid)
        return (H, E, bestscore, bestkey, end_ref, done), None

    # init end_read = last valid row (ssw.c:171 readLen-1 semantics)
    last_valid = (Lq - 1
                  - jnp.argmax(row_valid[:, ::-1], axis=1).astype(jnp.int32))
    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.full((B, Lq), NEG, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        (Lq - 1 - last_valid).astype(kdt),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), bool),
    )
    xs = (R.T, col_valid.T, jnp.arange(Lr, dtype=jnp.int32))
    (H, E, best, bestkey, end_ref, done), _ = jax.lax.scan(step, init, xs)
    if packed:
        end_read = Lq - 1 - (bestkey & ((1 << s) - 1))
    else:
        end_read = Lq - 1 - bestkey
    return best, end_ref, end_read


def _use_pallas() -> bool:
    import os
    return os.environ.get("SMR_PALLAS") in ("1", "2")


def _scan_dispatch(Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
                   terminate, tscore):
    """Column scan via the XLA lax.scan (default) or a Pallas kernel
    (SMR_PALLAS=1 lane-batch v1, =2 sublane-batch v2; both bit-exact --
    ops/sw_pallas.py parity tests)."""
    if _use_pallas():
        import os as _os
        from .sw_pallas import sw_scan_pallas, sw_scan_pallas2
        fn = sw_scan_pallas2 if _os.environ.get("SMR_PALLAS") == "2" \
            else sw_scan_pallas
        return fn(Q, row_valid, R, col_valid, mat,
                  gap_open, gap_ext, terminate, tscore)
    return _sw_scan(Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
                    terminate, tscore)


def sw_buf_len(lq: int, lr: int) -> int:
    """Bytes per upload row: 4-bit-packed windows + 3 int32 scalars.

    The tunneled link is transfer-bound (device compute is ~0.14ms per
    block vs ~2MB/block uploads), so the sequence windows ship packed
    two chars per byte (chars are 0..4) and unpack on device."""
    return lq // 2 + lr // 2 + 12


@functools.partial(jax.jit, static_argnames=("B", "lq", "lr", "gap_open",
                                             "gap_ext"))
def sw_fused_call(buf, mat, B: int, lq: int, lr: int,
                  gap_open: int, gap_ext: int):
    """One-upload / one-download fused SW step.

    buf: uint8 [B, sw_buf_len(lq, lr)] -- per row: the read window and
    the ref window packed two chars per byte (high nibble first), then
    (q_len, r_len, minimal) as little-endian int32 bytes.
    Returns int32 [5, B]: score, beg_ref, end_ref, beg_read, end_read.

    The begin pass uses FLIPPED padded tiles with per-pair start masks
    instead of per-row dynamic shifts (TPU-hostile gathers): the reverse
    word of ssw_align (ssw.c:900-918) occupies a contiguous run of the
    flipped tile starting at L-1-end, so masking columns before the run
    start reproduces the backward scan exactly, and the begin coordinate
    is (L-1) - argcolumn.
    """
    hq, hr = lq // 2, lr // 2

    def unpack(p):            # [B, L/2] packed -> [B, L] chars
        hi = (p >> 4) & 0xF
        lo = p & 0xF
        return jnp.stack([hi, lo], axis=2).reshape(p.shape[0], -1)

    Q = unpack(buf[:, :hq].astype(jnp.int32))
    R = unpack(buf[:, hq:hq + hr].astype(jnp.int32))
    ints = buf[:, hq + hr:].astype(jnp.int32)

    def i32(k):
        b = ints[:, 4 * k:4 * k + 4]
        return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)

    q_len = i32(0)
    r_len = i32(1)
    minimal = i32(2)

    posq = jnp.arange(lq, dtype=jnp.int32)[None, :]
    posr = jnp.arange(lr, dtype=jnp.int32)[None, :]

    row_valid = posq < q_len[:, None]
    col_valid = posr < r_len[:, None]
    score, end_ref, end_read = _scan_dispatch(
        Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
        terminate=False, tscore=None)
    # ssw init semantics: end_read defaults to qlen-1 when nothing scored
    end_read = jnp.where(end_ref >= 0, end_read, q_len - 1)

    # ---- begin pass on flipped tiles
    Qf = Q[:, ::-1]
    Rf = R[:, ::-1]
    q_start = lq - 1 - end_read        # first valid flipped row
    r_start = lr - 1 - end_ref
    row_valid2 = posq >= q_start[:, None]
    col_valid2 = posr >= r_start[:, None]
    s2, jstar, istar = _scan_dispatch(
        Qf, row_valid2, Rf, col_valid2, mat, gap_open, gap_ext,
        terminate=True, tscore=score)
    ok = (score >= minimal) & (end_ref >= 0)
    beg_ref = jnp.where(ok, lr - 1 - jstar, -1)
    beg_read = jnp.where(ok, lq - 1 - istar, -1)
    return jnp.stack([score, beg_ref, end_ref, beg_read, end_read])


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

    def _device_call(self, buf: np.ndarray, B: int, lq: int, lr: int):
        """One fused SW dispatch; overridden by parallel.dist.MeshSwBackend
        to shard the batch dim over a device mesh."""
        return sw_fused_call(jnp.asarray(buf), self.mat, B, lq, lr,
                             self.gap_open, self.gap_ext)

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
    # such as a tunneled device).  The ladder floors at 256: narrower
    # int32 tiles compile to SLOWER programs on TPU (measured 2x at
    # B=4096), and each call's fixed link latency (~30-45ms tunneled)
    # rewards large blocks.
    _LEN_LADDER = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
                   65536)
    # Block size is a dispatch-count / pipeline-granularity tradeoff:
    # 8192-row blocks halve the per-wave dispatch count but were
    # measured consistently SLOWER end-to-end (42K vs 47-49K reads/s,
    # warm cache) -- coarser blocks delay the first results of every
    # wave and the grouped scheduler loses post/pump overlap.  4096
    # stands; SMR_SW_BLOCK overrides for re-tuning on other links.
    BLOCK = int(os.environ.get("SMR_SW_BLOCK", "4096"))
    # per-block cell budget rows*(lq+lr): full blocks up to ~1024-char
    # tiles; 30K-nt (32768-bucket) jobs drop to 64 rows --
    # (256, 32768, 32768) was measured to crash the TPU worker (working
    # set ~170MB/op), (64, 32768, 32768) computes fine.  Scales with
    # BLOCK so the row ladder keeps the same per-length proportions.
    BLOCK_CELLS = BLOCK * 1024

    @classmethod
    def _len_bucket(cls, n: int) -> int:
        for b in cls._LEN_LADDER:
            if n <= b:
                return b
        return cls._LEN_LADDER[-1]

    @classmethod
    def _min_block(cls, n: int) -> int:
        for b in (64, 256, 1024, 4096, cls.BLOCK):
            if n <= b:
                return min(b, cls.BLOCK)   # SMR_SW_BLOCK may be < 4096
        return cls.BLOCK

    @property
    def _pad_full_block(self) -> bool:
        """On accelerators every wave pads to the one fixed BLOCK so the
        compiled-shape set stays minimal (warmup shapes == measurement
        shapes; a padded 4096x256x256 tile computes in ~15ms, far below
        one extra JIT compile through a tunneled link).  CPU runs (tests)
        keep the small-block ladder -- padding is pure cost there."""
        v = getattr(self, "_pad_full_cached", None)
        if v is None:
            import jax
            v = jax.default_backend() != "cpu"
            self._pad_full_cached = v
        return v

    def batch_coords(self, q_data: np.ndarray, q_off, q_len,
                     r_data: np.ndarray, r_off, r_len, minimal):
        """Coordinate-based scoring via the fused one-upload /
        one-download device call.  Returns (score, rb, re, qb, qe)."""
        return self.batch_coords_fetch(self.batch_coords_submit(
            q_data, q_off, q_len, r_data, r_off, r_len, minimal))

    def batch_coords_submit(self, q_data: np.ndarray, q_off, q_len,
                            r_data: np.ndarray, r_off, r_len, minimal):
        """Asynchronous half of batch_coords: dispatches every block's
        device call (and its device->host copy) without blocking, so a
        caller can run host work for OTHER reads while the device
        computes.  Returns an opaque wave handle for batch_coords_fetch.
        """
        q_data = np.asarray(q_data, np.uint8)
        r_data = np.asarray(r_data, np.uint8)
        q_off = np.asarray(q_off, np.int64)
        q_len = np.asarray(q_len, np.int32)
        r_off = np.asarray(r_off, np.int64)
        r_len = np.asarray(r_len, np.int32)
        minimal = np.asarray(minimal, np.int32)
        n = len(q_off)
        score = np.zeros(n, np.int32)
        end_ref = np.full(n, -1, np.int32)
        end_read = np.zeros(n, np.int32)
        beg_ref = np.full(n, -1, np.int32)
        beg_read = np.full(n, -1, np.int32)

        def gather_rows_u8(data, off, lens, B, L):
            n_ = len(off)
            pos = np.arange(L, dtype=np.int64)[None, :]
            idx = np.minimum(off[:, None] + pos, len(data) - 1)
            M = data[idx]
            M[pos >= lens[:, None]] = 0
            out = np.zeros((B, L), np.uint8)
            out[:n_] = M
            return out

        # One device call per BLOCK of jobs: each call costs a fixed
        # ~30-45ms link round-trip through the tunnel, which dwarfs the
        # compute wasted by padding short jobs up to their block's max
        # bucket (a full 1024x256x512 tile computes in ~15ms).  Jobs
        # sort by size so each block's padded shape tracks its own max;
        # calls are dispatched asynchronously and downloaded after all
        # blocks are in flight.
        order = np.lexsort((q_len, r_len))[::-1] if n else \
            np.zeros(0, np.int64)
        pending = []
        from ..util import timed
        b0 = 0
        while b0 < n:
            tent = order[b0:b0 + self.BLOCK]
            lq = self._len_bucket(int(q_len[tent].max()))
            lr = self._len_bucket(int(r_len[tent].max()))
            # long jobs (30K-nt reads) shrink the row count so one
            # block's device working set stays bounded; jobs are sorted
            # by size, so long jobs cluster in their own blocks and the
            # short-read path (lq+lr <= 1024) keeps the full BLOCK
            rows = self.BLOCK
            while rows > 64 and rows * (lq + lr) > self.BLOCK_CELLS:
                rows //= 4
            ba = tent[:rows]
            b0 += len(ba)
            if len(ba) < len(tent):
                lq = self._len_bucket(int(q_len[ba].max()))
                lr = self._len_bucket(int(r_len[ba].max()))
            if self._pad_full_block:
                # accelerator: pad to a SHORT block ladder (256/1024/
                # 4096) instead of always the full block -- late small
                # waves (pass 2/3, strand 2) otherwise pay a whole
                # 4096-row tile (~12ms device) for a few hundred jobs.
                # Three shapes per length bucket keeps the compiled set
                # tiny and the persistent JIT cache makes each a
                # one-time cost.
                B = max(self._min_block(len(ba)), 256)
                B = min(B, rows)           # long-read cell-budget cap
            else:
                B = rows if n > rows else self._min_block(len(ba))
            hq, hr = lq // 2, lr // 2
            buf = np.empty((B, hq + hr + 12), np.uint8)
            if self.native is not None:
                # one C++ pass: gather + 4-bit pack + scalar tail
                # (chars are 0..4; the link is transfer-bound, so
                # windows ship two chars per byte).  `sel` MUST stay
                # bound to a local for the duration of the call:
                # .ctypes.data on a temporary yields a pointer into
                # memory CPython frees before the foreign call runs
                # (the round-3 segfault).
                sel = np.ascontiguousarray(ba, np.int64)
                self.native.get_lib().sw_fill_block(
                    q_data.ctypes.data, len(q_data), q_off.ctypes.data,
                    q_len.ctypes.data,
                    r_data.ctypes.data, len(r_data), r_off.ctypes.data,
                    r_len.ctypes.data, minimal.ctypes.data,
                    sel.ctypes.data,
                    len(ba), B, lq, lr, buf.ctypes.data)
                del sel
            else:
                qrows = gather_rows_u8(
                    q_data, q_off[ba], q_len[ba].astype(np.int64), B, lq)
                rrows = gather_rows_u8(
                    r_data, r_off[ba], r_len[ba].astype(np.int64), B, lr)
                buf[:, :hq] = (qrows[:, ::2] << 4) | qrows[:, 1::2]
                buf[:, hq:hq + hr] = (rrows[:, ::2] << 4) \
                    | rrows[:, 1::2]
                ints = np.ones((B, 3), np.int32)
                ints[:, 2] = 1 << 30
                ints[:len(ba), 0] = q_len[ba]
                ints[:len(ba), 1] = r_len[ba]
                ints[:len(ba), 2] = minimal[ba]
                buf[:, hq + hr:] = ints.view(np.uint8).reshape(B, 12)
            with timed(f"sw_submit[{B}x{lq}x{lr}]"):
                dev = self._device_call(buf, B, lq, lr)
            pending.append((ba, dev))
        # Downloads are issued asynchronously for every block up front
        # (copy_to_host_async), so transfers overlap both the remaining
        # device compute and each other; np.asarray then only waits.
        # (A device-side concatenate was measured WORSE: each distinct
        # block count compiled a fresh concat program through the
        # tunneled link.)
        for _, dev in pending:
            try:
                dev.copy_to_host_async()
            except AttributeError:       # non-jax backend arrays
                pass
        return pending, (score, beg_ref, end_ref, beg_read, end_read)

    @staticmethod
    def batch_coords_fetch(handle):
        """Blocking half of batch_coords: waits for the wave's device
        results and scatters them into the job-order output arrays."""
        from ..util import timed
        pending, (score, beg_ref, end_ref, beg_read, end_read) = handle
        with timed("sw_fetch"):
            for ba, dev in pending:
                out = np.asarray(dev)
                score[ba] = out[0, :len(ba)]
                beg_ref[ba] = out[1, :len(ba)]
                end_ref[ba] = out[2, :len(ba)]
                beg_read[ba] = out[3, :len(ba)]
                end_read[ba] = out[4, :len(ba)]
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
