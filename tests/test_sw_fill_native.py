"""Native sw_fill_block vs the numpy pack path (regression for the
round-3 dangling-pointer crash and the unchecked-gather OOB hazard).

The C++ fill (native/feed_scan.cpp sw_fill_block) must produce byte-
identical upload blocks to the numpy fallback in ops/sw_jax.py
batch_coords_submit, including the end-of-buffer clamp semantics of
gather_rows_u8 (min(off + pos, len(data) - 1): windows overrunning
their buffer repeat the final byte).  Reference anchor for the gather
invariant: alignment.cpp:271-357 (window extraction around seed hits).
"""
import ctypes

import numpy as np
import pytest

from sortmerna_tpu import native
from sortmerna_tpu.ops.sw_jax import JaxSwBackend

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="no native library")


def numpy_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
               sel, B, lq, lr):
    """The numpy-else-branch of batch_coords_submit, verbatim layout."""
    hq, hr = lq // 2, lr // 2
    buf = np.empty((B, hq + hr + 12), np.uint8)

    def gather_rows_u8(data, off, lens, B, L):
        n_ = len(off)
        pos = np.arange(L, dtype=np.int64)[None, :]
        idx = np.minimum(off[:, None] + pos, len(data) - 1)
        M = data[idx]
        M[pos >= lens[:, None]] = 0
        out = np.zeros((B, L), np.uint8)
        out[:n_] = M
        return out

    qrows = gather_rows_u8(q_data, q_off[sel],
                           q_len[sel].astype(np.int64), B, lq)
    rrows = gather_rows_u8(r_data, r_off[sel],
                           r_len[sel].astype(np.int64), B, lr)
    buf[:, :hq] = (qrows[:, ::2] << 4) | qrows[:, 1::2]
    buf[:, hq:hq + hr] = (rrows[:, ::2] << 4) | rrows[:, 1::2]
    ints = np.ones((B, 3), np.int32)
    ints[:, 2] = 1 << 30
    ints[:len(sel), 0] = q_len[sel]
    ints[:len(sel), 1] = r_len[sel]
    ints[:len(sel), 2] = minimal[sel]
    buf[:, hq + hr:] = ints.view(np.uint8).reshape(B, 12)
    return buf


def native_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
                sel, B, lq, lr):
    buf = np.empty((B, lq // 2 + lr // 2 + 12), np.uint8)
    sel_c = np.ascontiguousarray(sel, np.int64)
    native.get_lib().sw_fill_block(
        q_data.ctypes.data, len(q_data), q_off.ctypes.data,
        q_len.ctypes.data,
        r_data.ctypes.data, len(r_data), r_off.ctypes.data,
        r_len.ctypes.data, minimal.ctypes.data,
        sel_c.ctypes.data, len(sel), B, lq, lr, buf.ctypes.data)
    del sel_c
    return buf


def make_jobs(rng, n, data_len, max_len):
    data = rng.integers(0, 5, data_len, dtype=np.uint8)
    off = rng.integers(0, data_len - 1, n, dtype=np.int64)
    lens = rng.integers(1, max_len + 1, n, dtype=np.int32)
    return data, off, lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fill_parity_random(seed):
    rng = np.random.default_rng(seed)
    n = 200
    q_data, q_off, q_len = make_jobs(rng, n, 50_000, 200)
    r_data, r_off, r_len = make_jobs(rng, n, 200_000, 400)
    minimal = rng.integers(1, 100, n).astype(np.int32)
    # non-contiguous reversed lexsort slice: the exact round-3 crasher
    order = np.lexsort((q_len, r_len))[::-1]
    sel = order[: n // 2]
    B, lq, lr = 128, 256, 512
    a = numpy_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
                   sel, B, lq, lr)
    b = native_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
                    sel, B, lq, lr)
    np.testing.assert_array_equal(a, b)


def test_fill_parity_clamped_windows():
    """Windows that overrun the data buffer must clamp exactly like the
    numpy gather (repeat the final byte), never read OOB."""
    rng = np.random.default_rng(7)
    q_data = rng.integers(0, 5, 1000, dtype=np.uint8)
    r_data = rng.integers(0, 5, 1000, dtype=np.uint8)
    # offsets deliberately within a window-length of the end
    q_off = np.array([990, 999, 500, 0], np.int64)
    q_len = np.array([100, 64, 120, 250], np.int32)
    r_off = np.array([950, 999, 998, 900], np.int64)
    r_len = np.array([300, 2, 400, 101], np.int32)
    minimal = np.full(4, 5, np.int32)
    sel = np.arange(4, dtype=np.int64)[::-1]
    B, lq, lr = 8, 256, 512
    a = numpy_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
                   sel, B, lq, lr)
    b = native_fill(q_data, q_off, q_len, r_data, r_off, r_len, minimal,
                    sel, B, lq, lr)
    np.testing.assert_array_equal(a, b)


def test_submit_native_vs_numpy_end_to_end():
    """batch_coords through the native fill equals the numpy fill:
    exercises the real call site (temporary lifetime + arg marshalling),
    not just the kernel."""
    rng = np.random.default_rng(3)
    n = 300
    q_data, q_off, q_len = make_jobs(rng, n, 30_000, 150)
    r_data, r_off, r_len = make_jobs(rng, n, 100_000, 300)
    minimal = np.full(n, 1, np.int32)
    mat = np.full((5, 5), -3, np.int64)
    np.fill_diagonal(mat, 2)
    mat[4, :] = mat[:, 4] = 0
    be_native = JaxSwBackend(mat, 5, 2, use_native=True)
    be_numpy = JaxSwBackend(mat, 5, 2, use_native=False)
    assert be_native.native is not None
    got = be_native.batch_coords(q_data, q_off, q_len,
                                 r_data, r_off, r_len, minimal)
    want = be_numpy.batch_coords(q_data, q_off, q_len,
                                 r_data, r_off, r_len, minimal)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
