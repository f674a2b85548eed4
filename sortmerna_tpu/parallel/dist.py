"""Distributed (data-parallel) align orchestration.

The reference parallelizes one way: N host threads, each owning a
record-aligned byte range of the reads file, sharing the index and
atomic counters (processor.cpp:248-253, readstats.cpp:65-80).  The
TPU-native equivalents implemented here:

* ``MeshSwBackend`` -- chip-level data parallelism: every SW wave's job
  batch is sharded over a 1-D device mesh (batch-dim ``dp`` sharding of
  the fused one-upload/one-download call, sw_jax.sw_fused_call); the
  scoring matrix is replicated.  Collectives ride ICI; the host sees the
  same (score, begin, end) arrays as the single-chip backend.
* ``run_align_sharded`` -- host/shard-level data parallelism: reads are
  partitioned into contiguous pair-aligned shards (mesh.shard_reads),
  each shard runs the full align sweep independently (the multi-host
  layout: one shard per host), per-shard Readstats counters are merged
  with a genuine ``psum`` over the mesh, and reports are produced from
  the globally-ordered merged state -- byte-identical to a single-shard
  run.

Both paths are exercised against the single-device pipeline by
``__graft_entry__.dryrun_multichip`` (byte-diffed outputs).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.candidates import Readstats
from ..ops.sw_jax import JaxSwBackend, sw_fused_call
from .mesh import shard_reads


class MeshSwBackend(JaxSwBackend):
    """JaxSwBackend whose device waves run batch-sharded over a mesh.

    The fused SW call is elementwise over the batch dim, so a ``dp``
    sharding splits every wave across all chips with zero comms; the
    wave results gather back to the host exactly as in the single-chip
    backend (traceback stays on host, survivors only).
    """

    def __init__(self, mat: np.ndarray, gap_open: int, gap_ext: int,
                 mesh: Mesh, use_native: bool = True):
        super().__init__(mat, gap_open, gap_ext, use_native=use_native)
        self.mesh = mesh
        self._dp = NamedSharding(mesh, P("dp"))
        self._rep = NamedSharding(mesh, P())
        self._ndev = mesh.devices.size
        self.mat = jax.device_put(self.mat, self._rep)

    def _device_call(self, buf: np.ndarray, B: int, lq: int, lr: int):
        d = self._ndev
        Bp = ((B + d - 1) // d) * d
        if Bp != B:
            pad = np.zeros((Bp - B, buf.shape[1]), buf.dtype)
            # padded rows: q_len=r_len=1, minimal=max (never passes)
            ints = np.ones((Bp - B, 3), np.int32)
            ints[:, 2] = 1 << 30
            pad[:, lq + lr:] = ints.view(np.uint8).reshape(-1, 12)
            buf = np.concatenate([buf, pad], axis=0)
        dev = sw_fused_call(
            jax.device_put(jnp.asarray(buf), self._dp), self.mat,
            Bp, lq, lr, self.gap_open, self.gap_ext)
        return dev[:, :B]


# ---------------------------------------------------------------------------
# Readstats psum merge (the std::atomic counters equivalent,
# readstats.cpp:65-80 -> lax.psum over the mesh)

_COUNTER_FIELDS = ("num_aligned", "num_short", "num_denovo",
                   "n_yid_ycov", "n_yid_ncov", "n_nid_ycov")


def psum_readstats(mesh: Mesh, shard_stats: List[Readstats],
                   out: Readstats) -> Readstats:
    """Reduce per-shard counters into ``out`` with a real mesh psum.

    Each shard's counters form one row of a [n_shards, K] matrix laid
    out over the ``dp`` axis; lax.psum over ICI produces the global row.
    Rows beyond len(shard_stats) (mesh bigger than shard count) are
    zero.
    """
    d = mesh.devices.size
    n_db = len(shard_stats[0].reads_matched_per_db)
    K = len(_COUNTER_FIELDS) + n_db
    rows = np.zeros((d, K), np.int64)
    for i, rs in enumerate(shard_stats):
        rows[i, :len(_COUNTER_FIELDS)] = [
            getattr(rs, f) for f in _COUNTER_FIELDS]
        rows[i, len(_COUNTER_FIELDS):] = rs.reads_matched_per_db

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("dp"),
                       out_specs=P(), check_vma=False)
    def reduce(r):
        return jax.lax.psum(jnp.sum(r, axis=0), "dp")

    tot = np.asarray(reduce(jax.device_put(
        rows, NamedSharding(mesh, P("dp")))))
    for k, f in enumerate(_COUNTER_FIELDS):
        setattr(out, f, int(tot[k]))
    out.reads_matched_per_db = [int(x) for x in
                                tot[len(_COUNTER_FIELDS):]]
    return out


def run_align_sharded(ctx, mesh: Mesh, sw_backend=None,
                      n_shards: int = None) -> None:
    """Align ``ctx`` as n_shards independent read shards, then psum the
    stats (multi-host data-parallel layout on one controller).

    Shards share the prepared index/refstats (each host replicates the
    index; refstats derive from GLOBAL read totals -- the stats pass is
    global, docs/statistics.rst), own a contiguous pair-aligned read
    slice, and accumulate a private Readstats.  States live in the
    global list so the merged context feeds the normal report path in
    global read order (the deterministic merge, report.cpp:56-96
    semantics).
    """
    from ..engine.run import run_align

    n_shards = n_shards or mesh.devices.size
    slices = shard_reads(len(ctx.reads), n_shards, ctx.opts.is_paired)
    shard_stats: List[Readstats] = []
    base_stats = ctx.readstats
    for sl in slices:
        rs = Readstats(len(ctx.opts.ref_files))
        sub = dataclasses.replace(
            ctx, reads=ctx.reads[sl],
            states=ctx.states[sl.start:sl.stop], readstats=rs)
        if len(sub.reads):
            run_align(sub, sw_backend=sw_backend)
        shard_stats.append(rs)
    psum_readstats(mesh, shard_stats, base_stats)
