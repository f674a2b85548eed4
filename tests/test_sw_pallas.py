"""Pallas SW column-scan == XLA lax.scan implementation, bit for bit.

Runs the Pallas kernel in interpreter mode (CPU backend) against
_sw_scan over random padded tiles, both passes (forward and
terminate-at-score), both tie-break variants (packed key and
3-reduction).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sortmerna_tpu.constants import scoring_matrix_5x5      # noqa: E402
from sortmerna_tpu.ops.sw_jax import _sw_scan               # noqa: E402
from sortmerna_tpu.ops.sw_pallas import (sw_scan_pallas,    # noqa: E402
                                         sw_scan_pallas2)

MAT = None


def _mat():
    global MAT
    if MAT is None:
        MAT = jnp.asarray(scoring_matrix_5x5(2, -3, 0), jnp.int32)
    return MAT


@pytest.mark.parametrize("shape", [(64, 256, 256), (64, 128, 256),
                                   (32, 64, 128)])
@pytest.mark.parametrize("terminate", [False, True])
def test_pallas_scan_parity(shape, terminate):
    B, Lq, Lr = shape
    rng = np.random.default_rng(B + Lq + terminate)
    Q = jnp.asarray(rng.integers(0, 5, (B, Lq)), jnp.int32)
    R = jnp.asarray(rng.integers(0, 5, (B, Lr)), jnp.int32)
    qlen = jnp.asarray(rng.integers(1, Lq + 1, B), jnp.int32)
    rlen = jnp.asarray(rng.integers(1, Lr + 1, B), jnp.int32)
    rowv = jnp.arange(Lq)[None, :] < qlen[:, None]
    colv = jnp.arange(Lr)[None, :] < rlen[:, None]
    ts = None
    if terminate:
        ts, _, _ = _sw_scan(Q, rowv, R, colv, _mat(), 5, 2, False, None)
    exp = _sw_scan(Q, rowv, R, colv, _mat(), 5, 2, terminate, ts)
    got = sw_scan_pallas(Q, rowv, R, colv, _mat(), 5, 2, terminate, ts,
                         interpret=True)
    for name, e, g in zip(("best", "end_ref", "end_read"), exp, got):
        assert np.array_equal(np.asarray(e), np.asarray(g)), name


@pytest.mark.parametrize("terminate", [False, True])
def test_pallas_v2_scan_parity(terminate):
    """The sublane-batch v2 kernel (SMR_PALLAS=2) matches the XLA scan
    bit for bit (B must be a SUB_B multiple; small Lq/Lr keep the
    interpreter affordable)."""
    B, Lq, Lr = 512, 32, 64
    rng = np.random.default_rng(7 + terminate)
    Q = jnp.asarray(rng.integers(0, 5, (B, Lq)), jnp.int32)
    R = jnp.asarray(rng.integers(0, 5, (B, Lr)), jnp.int32)
    qlen = jnp.asarray(rng.integers(1, Lq + 1, B), jnp.int32)
    rlen = jnp.asarray(rng.integers(1, Lr + 1, B), jnp.int32)
    rowv = jnp.arange(Lq)[None, :] < qlen[:, None]
    colv = jnp.arange(Lr)[None, :] < rlen[:, None]
    ts = None
    if terminate:
        ts, _, _ = _sw_scan(Q, rowv, R, colv, _mat(), 5, 2, False, None)
    exp = _sw_scan(Q, rowv, R, colv, _mat(), 5, 2, terminate, ts)
    got = sw_scan_pallas2(Q, rowv, R, colv, _mat(), 5, 2, terminate, ts,
                          interpret=True)
    for name, e, g in zip(("best", "end_ref", "end_read"), exp, got):
        assert np.array_equal(np.asarray(e), np.asarray(g)), name
