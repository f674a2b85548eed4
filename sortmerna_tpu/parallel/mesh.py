"""Multi-chip data-parallel execution (jax.sharding over a device Mesh).

The reference is single-process multithreaded: each thread owns a byte
range of the reads file (processor.cpp:248-253, readfeed.cpp:1104-1282).
The TPU-native equivalent: reads are sharded over a 1-D 'dp' mesh axis
(pairs kept on one shard), the reference index is replicated per device,
and run counters are psum-reduced over ICI -- replacing the reference's
std::atomic counters (readstats.cpp:65-80).

Components:
* make_mesh(n): 1-D data-parallel mesh over the first n local devices.
* sharded_sw_step: the full device step of the align pipeline -- batched
  SW scoring over a sharded batch + global stat reduction.  This is the
  step dry-run-compiled for N virtual devices by __graft_entry__.
* shard_reads / unshard: host-side batch partitioning helpers (pair
  aligned, deterministic order for byte-identical merged reports).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sw_jax import sw_score_batch


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # the default platform is short (e.g. one tunneled TPU while
            # a virtual multi-device CPU platform is forced for tests)
            devices = jax.devices("cpu")
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_ext", "mesh"))
def _sharded_step(query, qlen, ref, rlen, mat, minimal,
                  gap_open: int, gap_ext: int, mesh: Mesh):
    """One data-parallel align device step.

    All batch-dim inputs are sharded over 'dp'; the index-side constants
    (mat) are replicated.  Returns per-pair scores/ends (sharded) and the
    global count of threshold-passing alignments (replicated, via psum
    inside shard_map -- the Readstats equivalent).
    """
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P(), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P()),
        check_vma=False,
    )
    def step(q, ql, r, rl, m, ms):
        score, end_ref, end_read = sw_score_batch(
            q, ql, r, rl, m, gap_open, gap_ext)
        n_pass = jnp.sum((score > ms).astype(jnp.int32))
        n_pass = jax.lax.psum(n_pass, "dp")
        return score, end_ref, end_read, n_pass

    return step(query, qlen, ref, rlen, mat, minimal)


def sharded_sw_step(query, qlen, ref, rlen, mat, minimal, gap_open, gap_ext,
                    mesh: Mesh):
    """Public wrapper: pads the batch to a multiple of the mesh size and
    places the arrays with the right shardings."""
    n = query.shape[0]
    d = mesh.devices.size
    npad = pad_to_multiple(max(n, d), d)

    def padb(a, fill=0):
        out = np.full((npad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    args = (
        jax.device_put(padb(np.asarray(query, np.int32)), dp),
        jax.device_put(padb(np.asarray(qlen, np.int32), 1), dp),
        jax.device_put(padb(np.asarray(ref, np.int32)), dp),
        jax.device_put(padb(np.asarray(rlen, np.int32), 1), dp),
        jax.device_put(jnp.asarray(mat, jnp.int32), rep),
        jax.device_put(padb(np.asarray(minimal, np.int32), 1 << 30), dp),
    )
    score, er, eq, n_pass = _sharded_step(*args, gap_open=gap_open,
                                          gap_ext=gap_ext, mesh=mesh)
    return (np.asarray(score)[:n], np.asarray(er)[:n],
            np.asarray(eq)[:n], int(n_pass))


def shard_reads(n_reads: int, n_shards: int, paired: bool) -> List[slice]:
    """Deterministic contiguous read partition; pair-aligned when paired
    (readfeed.cpp:1110-1114 chunking semantics)."""
    unit = 2 if paired else 1
    n_units = n_reads // unit
    base = n_units // n_shards
    rem = n_units % n_shards
    out = []
    start = 0
    for s in range(n_shards):
        cnt = (base + (1 if s < rem else 0)) * unit
        out.append(slice(start, start + cnt))
        start += cnt
    return out
