"""Pallas TPU kernel for the Smith-Waterman column scan.

Drop-in replacement for ops/sw_jax._sw_scan (same inputs, same outputs,
same ssw tie-breaking -- see that docstring for the semantics): the
whole DP runs as ONE kernel with the H/E carries resident in VMEM,
instead of an XLA `lax.scan` that materializes per-step HLO.

Layout is TRANSPOSED relative to the XLA version: the batch rides the
LANE dimension (128 pairs per grid block) and the query positions ride
sublanes.  That makes every per-column operation Mosaic-natural:

* reading ref column j is a dynamic SUBLANE slice (lane-dim dynamic
  slices must be 128-aligned and single-column lane reads are
  untileable);
* the [1, B] column values broadcast against [Lq, B] tiles along the
  singleton sublane dim (no cross-lane relayout);
* the diagonal shift and the F-recurrence's prefix max run along
  sublanes via ``pltpu.roll`` + a log-step doubling max (lax.cummax
  does not lower inside kernels).

Enabled with SMR_PALLAS=1 (ops/sw_jax._scan_dispatch); the CPU
interpreter path (``interpret=True``) backs the parity tests.

STATUS (re-measured on the v5e, round 4): bit-exact and **1.3x FASTER
than the XLA scan** at the bench shape under like-for-like
device-resident timing -- (4096, 256, 256) in 6.3 ms vs XLA's 8.2 ms
(42 vs 33 Gcells/s; 30 chained iterations with a real inter-iteration
data dependency, best of 3).  The round-3 "40x slower / XLA 0.14 ms"
comparison was a measurement artifact (the XLA number timed a
loop-hoisted scan).  The XLA scan remains the DEFAULT because first
use of the Pallas path through the tunneled dev chip pays minutes of
Mosaic compiles and per-call dispatch that swamp the 2 ms/block win;
on a non-tunneled deployment SMR_PALLAS=1 is the recommended setting.
A v2 layout (batch on sublanes, Lq on lanes -- the XLA layout
hand-scheduled, SMR_PALLAS=2) measured 17.9 ms: wider ops but the
per-column sequential dependence leaves them idle; kept for the
record.  Full numbers + MFU analysis: BENCH_NOTES.md round 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 29)

LANE_B = 128     # pairs per grid block (lane dimension)


def _scan_kernel(p_ref, r_ref, colv_ref, rowv_ref, initkey_ref,
                 tscore_ref, out_ref, H_ref, E_ref, st_ref, *,
                 Lq, Lr, gap_open, gap_ext, packed, s_bits, terminate):
    """Carries live in VMEM scratch refs (H_ref/E_ref [Lq,B]; st_ref
    [4,B] = best/bestkey/end_ref/done) -- fori_loop VALUE carries
    initialized from splat constants trip Mosaic's layout unification
    ("replicated in destination but not in source")."""
    B = LANE_B
    rows = jax.lax.broadcasted_iota(jnp.int32, (Lq, B), 0)
    rowv = rowv_ref[:] != 0                       # [Lq, B]
    revrow = Lq - 1 - rows
    f_ofs = rows * gap_ext
    f_sub = (rows - 1) * gap_ext
    # the five per-character profiles, stacked along sublanes
    profs = [p_ref[pl.ds(c * Lq, Lq), :] for c in range(5)]

    H_ref[:] = jnp.zeros((Lq, B), jnp.int32)
    E_ref[:] = jnp.full((Lq, B), NEG, jnp.int32)
    st_ref[0:1, :] = jnp.zeros((1, B), jnp.int32)          # best
    st_ref[1:2, :] = initkey_ref[:]                        # bestkey
    st_ref[2:3, :] = jnp.full((1, B), -1, jnp.int32)       # end_ref
    st_ref[3:4, :] = jnp.zeros((1, B), jnp.int32)          # done

    def step(j, _):
        Hprev = H_ref[:]
        rj = r_ref[pl.ds(j, 1), :]                # [1, B]
        cvj = colv_ref[pl.ds(j, 1), :] != 0       # [1, B]
        sub = profs[0]
        for c in range(1, 5):
            sub = jnp.where(rj == c, profs[c], sub)
        sub = jnp.where(cvj, sub, NEG)
        diag = jnp.where(rows == 0, 0,
                         pltpu.roll(Hprev, 1, axis=0)) + sub
        E = jnp.maximum(E_ref[:] - gap_ext, Hprev - gap_open)
        E_ref[:] = E
        Hpre = jnp.maximum(0, jnp.maximum(diag, E))
        g = Hpre - gap_open + f_ofs
        # inclusive prefix max along sublanes by shift doubling
        sh = 1
        while sh < Lq:
            g = jnp.maximum(
                g, jnp.where(rows >= sh, pltpu.roll(g, sh, axis=0),
                             NEG))
            sh *= 2
        F = jnp.where(rows == 0, NEG,
                      pltpu.roll(g, 1, axis=0)) - f_sub
        H = jnp.maximum(Hpre, F)
        H = jnp.where(rowv, H, 0)
        H_ref[:] = H

        if packed:
            key = (H << s_bits) | revrow
            colkey = jnp.max(key, axis=0, keepdims=True)   # [1, B]
            colmax = colkey >> s_bits
        else:
            colmax = jnp.max(H, axis=0, keepdims=True)
            colkey = jnp.max(jnp.where(H == colmax, revrow, -1),
                             axis=0, keepdims=True)
        best = st_ref[0:1, :]
        done = st_ref[3:4, :] != 0
        valid = cvj & jnp.logical_not(done)
        improved = (colmax > best) & valid
        st_ref[0:1, :] = jnp.where(improved, colmax, best)
        st_ref[1:2, :] = jnp.where(improved, colkey, st_ref[1:2, :])
        st_ref[2:3, :] = jnp.where(improved, j, st_ref[2:3, :])
        if terminate:
            done = done | ((colmax == tscore_ref[:]) & valid)
            st_ref[3:4, :] = done.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, Lr, step, 0)
    out_ref[0:4, :] = st_ref[0:4, :]
    out_ref[4:8, :] = jnp.zeros((4, LANE_B), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "Lq", "Lr", "gap_open", "gap_ext", "terminate", "interpret"))
def _scan_call(prof5, R_T, colv_T, rowv_T, initkey, tscore, *,
               Lq, Lr, gap_open, gap_ext, terminate, interpret=False):
    B = prof5.shape[1]
    s_bits = max((Lq - 1).bit_length(), 1)
    packed = (Lq << s_bits) < (1 << 24)
    grid = (pl.cdiv(B, LANE_B),)

    def lane_block(i):
        return (0, i)

    kernel = functools.partial(
        _scan_kernel, Lq=Lq, Lr=Lr, gap_open=gap_open, gap_ext=gap_ext,
        packed=packed, s_bits=s_bits, terminate=terminate)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5 * Lq, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lr, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lr, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_B), lane_block,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE_B), lane_block,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Lq, LANE_B), jnp.int32),
            pltpu.VMEM((Lq, LANE_B), jnp.int32),
            pltpu.VMEM((8, LANE_B), jnp.int32),
        ],
        interpret=interpret,
    )(prof5, R_T, colv_T, rowv_T, initkey, tscore)
    return out[0], out[1], out[2]


# ---------------------------------------------------------------------------
# v2: batch on SUBLANES, query positions on LANES (the XLA scan's own
# layout, hand-scheduled).  Addresses the v1 bottleneck -- per-column
# ops on [Lq, 128] tiles under a 32-deep sequential grid -- by widening
# every op to [SUB_B, Lq] and cutting the grid to B/SUB_B blocks.  The
# lane-dim "read column j" restriction is sidestepped by encoding
# col_valid into the ref chars (invalid -> 7) and extracting column j
# from a 128-aligned lane chunk with a masked max-reduction.

SUB_B = 512      # pairs per grid block (sublane dimension)


def _scan_kernel2(p_ref, r_ref, rowv_ref, initkey_ref, tscore_ref,
                  out_ref, H_ref, E_ref, st_ref, *,
                  Lq, Lr, gap_open, gap_ext, packed, s_bits, terminate):
    Bs = SUB_B
    cols = jax.lax.broadcasted_iota(jnp.int32, (Bs, Lq), 1)
    rowv = rowv_ref[:] != 0                       # [Bs, Lq]
    revcol = Lq - 1 - cols
    f_ofs = cols * gap_ext
    f_sub = (cols - 1) * gap_ext
    profs = [p_ref[pl.ds(c * Bs, Bs), :] for c in range(5)]
    CK = 128 if Lr >= 128 else Lr      # lane-aligned ref chunk width
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (Bs, CK), 1)

    H_ref[:] = jnp.zeros((Bs, Lq), jnp.int32)
    E_ref[:] = jnp.full((Bs, Lq), NEG, jnp.int32)
    st_ref[:, 0:1] = jnp.zeros((Bs, 1), jnp.int32)         # best
    st_ref[:, 1:2] = initkey_ref[:]                        # bestkey
    st_ref[:, 2:3] = jnp.full((Bs, 1), -1, jnp.int32)      # end_ref
    st_ref[:, 3:4] = jnp.zeros((Bs, 1), jnp.int32)         # done

    def step(j, _):
        # extract ref column j (char 0..4, 7 = invalid column) from its
        # 128-aligned lane chunk via a masked lane reduction
        jc = (j // CK) * CK
        chunk = r_ref[:, pl.ds(jc, CK)]
        rj = jnp.max(jnp.where(lane128 == (j - jc), chunk, 0),
                     axis=1, keepdims=True)       # [Bs, 1]
        cvj = rj < 5
        Hprev = H_ref[:]
        sub = profs[0]
        for c in range(1, 5):
            sub = jnp.where(rj == c, profs[c], sub)
        sub = jnp.where(cvj, sub, NEG)
        diag = jnp.where(cols == 0, 0,
                         pltpu.roll(Hprev, 1, axis=1)) + sub
        E = jnp.maximum(E_ref[:] - gap_ext, Hprev - gap_open)
        E_ref[:] = E
        Hpre = jnp.maximum(0, jnp.maximum(diag, E))
        g = Hpre - gap_open + f_ofs
        sh = 1
        while sh < Lq:                 # inclusive prefix max over lanes
            g = jnp.maximum(
                g, jnp.where(cols >= sh, pltpu.roll(g, sh, axis=1),
                             NEG))
            sh *= 2
        F = jnp.where(cols == 0, NEG,
                      pltpu.roll(g, 1, axis=1)) - f_sub
        H = jnp.maximum(Hpre, F)
        H = jnp.where(rowv, H, 0)
        H_ref[:] = H

        if packed:
            key = (H << s_bits) | revcol
            colkey = jnp.max(key, axis=1, keepdims=True)   # [Bs, 1]
            colmax = colkey >> s_bits
        else:
            colmax = jnp.max(H, axis=1, keepdims=True)
            colkey = jnp.max(jnp.where(H == colmax, revcol, -1),
                             axis=1, keepdims=True)
        best = st_ref[:, 0:1]
        done = st_ref[:, 3:4] != 0
        valid = cvj & jnp.logical_not(done)
        improved = (colmax > best) & valid
        st_ref[:, 0:1] = jnp.where(improved, colmax, best)
        st_ref[:, 1:2] = jnp.where(improved, colkey, st_ref[:, 1:2])
        st_ref[:, 2:3] = jnp.where(improved, j, st_ref[:, 2:3])
        if terminate:
            done = done | ((colmax == tscore_ref[:]) & valid)
            st_ref[:, 3:4] = done.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, Lr, step, 0)
    out_ref[:, 0:4] = st_ref[:, 0:4]
    out_ref[:, 4:128] = jnp.zeros((Bs, 124), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "Lq", "Lr", "gap_open", "gap_ext", "terminate", "interpret"))
def _scan_call2(prof5, R_enc, rowv, initkey, tscore, *,
                Lq, Lr, gap_open, gap_ext, terminate, interpret=False):
    B = R_enc.shape[0]
    s_bits = max((Lq - 1).bit_length(), 1)
    packed = (Lq << s_bits) < (1 << 24)
    grid = (pl.cdiv(B, SUB_B),)

    def sub_block(i):
        return (i, 0)

    kernel = functools.partial(
        _scan_kernel2, Lq=Lq, Lr=Lr, gap_open=gap_open,
        gap_ext=gap_ext, packed=packed, s_bits=s_bits,
        terminate=terminate)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5 * SUB_B, Lq), sub_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_B, Lr), sub_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_B, Lq), sub_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_B, 1), sub_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_B, 1), sub_block,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB_B, 128), sub_block,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUB_B, Lq), jnp.int32),
            pltpu.VMEM((SUB_B, Lq), jnp.int32),
            pltpu.VMEM((SUB_B, 128), jnp.int32),
        ],
        interpret=interpret,
    )(prof5, R_enc, rowv, initkey, tscore)
    return out[:, 0], out[:, 1], out[:, 2]


def sw_scan_pallas2(Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
                    terminate, tscore, interpret=False):
    """v2 wrapper: batch-on-sublanes layout (see module header)."""
    B, Lq = Q.shape
    Lr = R.shape[1]
    s_bits = max((Lq - 1).bit_length(), 1)
    prof = mat.T[Q]                                   # [B, Lq, 5]
    prof = jnp.where(row_valid[:, :, None], prof, NEG)
    # [5*B, Lq]: per-character profiles stacked along sublanes in
    # SUB_B-sized groups so each grid block sees its own five
    prof5 = (prof.astype(jnp.int32)
             .reshape(-1, SUB_B, Lq, 5)
             .transpose(0, 3, 1, 2)
             .reshape(-1, Lq)) if B % SUB_B == 0 else None
    if prof5 is None:
        raise ValueError(f"B={B} must be a multiple of {SUB_B}")
    R_enc = jnp.where(col_valid, R, 7).astype(jnp.int32)
    last_valid = (Lq - 1
                  - jnp.argmax(row_valid[:, ::-1], axis=1)
                  .astype(jnp.int32))
    initkey = (Lq - 1 - last_valid)[:, None].astype(jnp.int32)
    tscore_col = (jnp.zeros((B, 1), jnp.int32) if tscore is None
                  else tscore.astype(jnp.int32)[:, None])
    best, bestkey, end_ref = _scan_call2(
        prof5, R_enc, row_valid.astype(jnp.int32), initkey, tscore_col,
        Lq=Lq, Lr=Lr, gap_open=int(gap_open), gap_ext=int(gap_ext),
        terminate=bool(terminate), interpret=interpret)
    packed = (Lq << s_bits) < (1 << 24)
    if packed:
        end_read = Lq - 1 - (bestkey & ((1 << s_bits) - 1))
    else:
        end_read = Lq - 1 - bestkey
    return best, end_ref, end_read


def sw_scan_pallas(Q, row_valid, R, col_valid, mat, gap_open, gap_ext,
                   terminate, tscore, interpret=False):
    """_sw_scan-compatible wrapper: returns (best, end_ref, end_read)."""
    B, Lq = Q.shape
    Lr = R.shape[1]
    s_bits = max((Lq - 1).bit_length(), 1)
    # five per-character substitution profiles, transposed + stacked
    prof = mat.T[Q]                                   # [B, Lq, 5]
    prof = jnp.where(row_valid[:, :, None], prof, NEG)
    prof5 = jnp.concatenate([prof[:, :, c].T for c in range(5)],
                            axis=0).astype(jnp.int32)  # [5*Lq, B]
    last_valid = (Lq - 1
                  - jnp.argmax(row_valid[:, ::-1], axis=1)
                  .astype(jnp.int32))
    initkey = (Lq - 1 - last_valid)[None, :].astype(jnp.int32)
    tscore_row = (jnp.zeros((1, B), jnp.int32) if tscore is None
                  else tscore.astype(jnp.int32)[None, :])
    best, bestkey, end_ref = _scan_call(
        prof5, R.T.astype(jnp.int32),
        col_valid.T.astype(jnp.int32), row_valid.T.astype(jnp.int32),
        initkey, tscore_row,
        Lq=Lq, Lr=Lr, gap_open=int(gap_open), gap_ext=int(gap_ext),
        terminate=bool(terminate), interpret=interpret)
    packed = (Lq << s_bits) < (1 << 24)
    if packed:
        end_read = Lq - 1 - (bestkey & ((1 << s_bits) - 1))
    else:
        end_read = Lq - 1 - bestkey
    return best, end_ref, end_read
