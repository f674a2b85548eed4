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
import os
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
            pad[:, lq // 2 + lr // 2:] = ints.view(np.uint8).reshape(-1, 12)
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
                      n_shards: int = None,
                      concurrent: bool = True) -> None:
    """Align ``ctx`` as n_shards independent read shards, then psum the
    stats (multi-host data-parallel layout on one controller).

    Shards share the prepared index/refstats (each host replicates the
    index; refstats derive from GLOBAL read totals -- the stats pass is
    global, docs/statistics.rst), own a contiguous pair-aligned read
    slice, and accumulate a private Readstats.  States live in the
    global list so the merged context feeds the normal report path in
    global read order (the deterministic merge, report.cpp:56-96
    semantics).

    Shards execute CONCURRENTLY (one host thread each, like the
    reference's per-thread feed slots, processor.cpp:248-253): every
    shard owns disjoint reads/states/stats, the shared SW backend is
    called from all shards (JAX dispatch is thread-safe; each wave is an
    independent program), so results are byte-identical regardless of
    interleaving.  ``concurrent=False`` keeps the sequential sweep.
    """
    from ..engine.run import run_align

    n_shards = n_shards or mesh.devices.size
    slices = shard_reads(len(ctx.reads), n_shards, ctx.opts.is_paired)
    shard_stats: List[Readstats] = [
        Readstats(len(ctx.opts.ref_files)) for _ in slices]
    base_stats = ctx.readstats

    def one_shard(sl, rs):
        sub = dataclasses.replace(
            ctx, reads=ctx.reads[sl],
            states=ctx.states[sl.start:sl.stop], readstats=rs)
        if len(sub.reads):
            run_align(sub, sw_backend=sw_backend)

    if concurrent and len(slices) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(slices)) as ex:
            futs = [ex.submit(one_shard, sl, rs)
                    for sl, rs in zip(slices, shard_stats)]
            for f in futs:
                f.result()
    else:
        for sl, rs in zip(slices, shard_stats):
            one_shard(sl, rs)
    psum_readstats(mesh, shard_stats, base_stats)


# ---------------------------------------------------------------------------
# multi-host (DCN) orchestration


def init_multihost(coordinator: str = None, num_processes: int = None,
                   process_id: int = None) -> tuple:
    """``jax.distributed.initialize`` wrapper for multi-host runs.

    On a multi-host TPU deployment (GKE/TPU-VM) the env provides the
    coordinator automatically; explicit args support manual launch
    (one process per host: SMR_COORD, SMR_NPROCS, SMR_PROC_ID).
    Returns (process_index, process_count).  Single-process runs (no
    coordinator) skip initialization and report (0, 1).
    """
    import os as _os
    coordinator = coordinator or _os.environ.get("SMR_COORD")
    num_processes = num_processes or int(_os.environ.get("SMR_NPROCS", 0))
    process_id = (process_id if process_id is not None
                  else int(_os.environ.get("SMR_PROC_ID", -1)))
    if coordinator and num_processes > 1 and process_id >= 0:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def run_align_multihost(ctx, sw_backend=None) -> slice:
    """Multi-host align: each host aligns its OWN contiguous pair-aligned
    shard of the global read order (per-host feed shard -- the DCN
    analogue of the per-thread byte-range slots, readfeed.cpp:1104-1282),
    then Readstats counters allreduce over every chip of every host.

    The returned slice is this host's read range.  This is the align
    step only; ``run_all_multihost`` is the full pipeline (it writes the
    per-host report sections for the range and merges them in host
    order, report.cpp:56-96 semantics).  With one process this
    degenerates to the plain single-host align.
    """
    from ..engine.run import run_align

    pidx, pcount = jax.process_index(), jax.process_count()
    slices = shard_reads(len(ctx.reads), pcount, ctx.opts.is_paired)
    mine = slices[pidx]
    rs = Readstats(len(ctx.opts.ref_files))
    sub = dataclasses.replace(
        ctx, reads=ctx.reads[mine],
        states=ctx.states[mine.start:mine.stop], readstats=rs)
    if len(sub.reads):
        run_align(sub, sw_backend=sw_backend)

    psum_readstats_multihost(rs, ctx.readstats)
    return mine


def _barrier() -> None:
    """Cross-process sync point: a tiny psum over every device (gloo/ICI
    collectives block until all processes arrive)."""
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    rows = np.ones((jax.local_device_count(), 1), np.int32)
    sh = NamedSharding(mesh, P("dp"))
    arr = jax.make_array_from_process_local_data(
        sh, rows, (mesh.devices.size, 1))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("dp"),
                       out_specs=P(), check_vma=False)
    def reduce(r):
        return jax.lax.psum(jnp.sum(r, axis=0), "dp")

    np.asarray(reduce(arr))


def _merge_sections(final_pfx: str, n_hosts: int) -> None:
    """Concatenate per-host report sections into ``<pfx><suffix>`` --
    the split-file merge of report.cpp:56-96.

    Two section shapes exist (written by ``run_reports``):

    * plain ``<pfx>.s{i}<suffix>`` (fastx/other/denovo): each section
      covers one host's contiguous read range; appending in host order
      reproduces the global read order.
    * part-sectioned ``<pfx>.s{i}.g{g:04d}<ext>`` (blast/sam): g
      numbers the (db, part) sweep, g=0 is the host-0-only SAM header
      section.  Merging part-outer/host-inner reproduces the part-outer
      row order a single process writes over all reads
      (output.cpp:196-236).

    No content filtering happens here -- hosts other than the header
    owner never write SAM headers, so raw byte appends are exact (and
    gzip sections concatenate into a valid multi-member stream, as the
    reference's byte-append merge does).  Section files are removed
    after the merge."""
    import glob as _glob
    import re as _re

    sec_re = _re.compile(
        _re.escape(final_pfx) + r"\.s(\d+)(\.g(\d{4}))?((\.|_).*)$")
    plain: dict = {}                 # suffix -> {host: path}
    parts: dict = {}                 # ext -> {(g, host): path}
    for path in _glob.glob(_glob.escape(final_pfx) + ".s*"):
        m = sec_re.match(path)
        if not m:
            continue
        host, gtag, g, suffix = (int(m.group(1)), m.group(2),
                                 m.group(3), m.group(4))
        if suffix.endswith(".otu.json"):
            continue
        if gtag is not None:
            parts.setdefault(suffix, {})[(int(g), host)] = path
        else:
            plain.setdefault(suffix, {})[host] = path

    def _append(out, path):
        with open(path, "rb") as f:
            out.write(f.read())
        os.remove(path)

    for suffix, by_host in sorted(plain.items()):
        with open(final_pfx + suffix, "wb") as out:
            for i in range(n_hosts):
                if i in by_host:
                    _append(out, by_host[i])
    for suffix, by_key in sorted(parts.items()):
        with open(final_pfx + suffix, "wb") as out:
            for key in sorted(by_key):      # (g, host) ascending
                _append(out, by_key[key])


def _merge_otu_sections(final_pfx: str, n_hosts: int) -> dict:
    """Key-wise merge of per-host OTU maps in host order: a reference
    group keeps the position of its first-seen host and later hosts'
    reads append to it -- the single-process insertion order
    (otumap.cpp:192-281) for contiguous read shards."""
    import json as _json
    merged: dict = {}
    for i in range(n_hosts):
        sec = f"{final_pfx}.s{i}.otu.json"
        if not os.path.exists(sec):
            continue
        with open(sec) as f:
            for ref, read_ids in _json.load(f):
                merged.setdefault(ref, []).extend(read_ids)
        os.remove(sec)
    return merged


def run_all_multihost(opts, sw_backend=None):
    """Full multi-host run: each process aligns + postprocesses its own
    contiguous pair-aligned read shard, writes its reports as section
    files, counters allreduce over every process's devices, and process
    0 merges the sections into the final reports + writes the summary --
    byte-identical to a single-process run over the same reads.

    Trigger from the CLI: SMR_COORD/SMR_NPROCS/SMR_PROC_ID in the env
    (cli.py main).  Each process needs its own workdir (kvdb/readb are
    per-process) but a SHARED -aligned/-other prefix on a common
    filesystem for the sections to merge.

    Ordering: blast/sam sections are written per (host, index part) and
    merged part-outer/host-inner, matching the part-outer row order a
    single process writes over all reads (output.cpp:169-272) -- byte
    parity holds for multi-part and multi-DB sweeps, not just the
    single-part case.
    """
    from ..engine.run import (prepare, run_align, run_postprocess,
                              run_reports)
    from ..engine.postprocess import write_otu_map
    from ..reports.summary import write_summary

    pidx, pcount = init_multihost()
    if pcount <= 1:
        from ..engine.run import run_all
        return run_all(opts, sw_backend=sw_backend)

    opts.finalize()
    if opts.task != 4:
        raise SystemExit(
            "ERROR: --task splitting is a single-host workflow (the "
            "per-task state store is per-process); multi-host runs "
            "execute the full pipeline (--task 4).")
    ctx = prepare(opts)
    slices = shard_reads(len(ctx.reads), pcount, opts.is_paired)
    mine = slices[pidx]
    local_rs = Readstats(len(opts.ref_files))
    sub = dataclasses.replace(
        ctx, reads=ctx.reads[mine],
        states=ctx.states[mine.start:mine.stop], readstats=local_rs)
    if len(sub.reads):
        run_align(sub, sw_backend=sw_backend)
    otu_map = run_postprocess(sub)      # shard denovo/otu counters

    # one allreduce covers align AND postprocess counters
    psum_readstats_multihost(local_rs, ctx.readstats)

    # per-host report sections over this host's slice
    import copy as _copy
    import json as _json
    sopts = _copy.copy(opts)
    sopts.aligned_pfx = opts.aligned_pfx + f".s{pidx}"
    if opts.is_other:
        sopts.other_pfx = opts.other_pfx + f".s{pidx}"
    rsub = dataclasses.replace(sub, opts=sopts, readstats=ctx.readstats)
    out_dir = os.path.dirname(opts.aligned_pfx) or "."
    os.makedirs(out_dir, exist_ok=True)
    run_reports(rsub, otu_map, part_sections=True,
                sam_header_out=(pidx == 0))
    if opts.is_otu_map:
        with open(opts.aligned_pfx + f".s{pidx}.otu.json", "w") as f:
            _json.dump(list(otu_map.items()), f)

    _barrier()                          # every section is on disk
    if pidx == 0:
        _merge_sections(opts.aligned_pfx, pcount)
        if opts.is_other:
            _merge_sections(opts.other_pfx, pcount)
        merged_otu = _merge_otu_sections(opts.aligned_pfx, pcount)
        if opts.is_otu_map:
            ctx.readstats.total_otu = len(merged_otu)
            write_otu_map(merged_otu,
                          os.path.join(out_dir, "otu_map.txt"))
        write_summary(opts, ctx.refstats, ctx.readstats,
                      len(merged_otu))
    _barrier()                          # merge visible everywhere
    return ctx


def psum_readstats_multihost(local: Readstats, out: Readstats) -> None:
    """Allreduce one host's counters over ALL processes' devices.

    Each process contributes its counters in the first of its local
    device rows of a global [n_devices, K] array
    (make_array_from_process_local_data -- only addressable shards are
    provided locally); a psum over the global mesh yields the cluster
    totals, replicated back to every host.
    """
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    n_db = len(local.reads_matched_per_db)
    K = len(_COUNTER_FIELDS) + n_db
    d_local = jax.local_device_count()
    rows = np.zeros((d_local, K), np.int64)
    rows[0, :len(_COUNTER_FIELDS)] = [
        getattr(local, f) for f in _COUNTER_FIELDS]
    rows[0, len(_COUNTER_FIELDS):] = local.reads_matched_per_db
    sh = NamedSharding(mesh, P("dp"))
    arr = jax.make_array_from_process_local_data(
        sh, rows, (mesh.devices.size, K))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("dp"),
                       out_specs=P(), check_vma=False)
    def reduce(r):
        return jax.lax.psum(jnp.sum(r, axis=0), "dp")

    tot = np.asarray(reduce(arr))
    for k, f in enumerate(_COUNTER_FIELDS):
        setattr(out, f, int(tot[k]))
    out.reads_matched_per_db = [int(x) for x in
                                tot[len(_COUNTER_FIELDS):]]
