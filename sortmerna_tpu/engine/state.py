"""Persistent run state: the KVDB equivalent (kvdb.cpp + read.cpp blobs).

The reference checkpoints per-read alignment state into RocksDB so that
(a) interrupted runs resume skipping finished reads (processor.cpp:117-126)
and (b) the align / stats / report tasks can run as separate processes
over the same workdir (--task 0..4, options.cpp:982-1000).

Here the same capability is a compact binary state file per workdir:
 * one record per read with alignments (reads without state are absent,
   mirroring kvdb.get() == '' for unseen reads)
 * a run-level Readstats record keyed by the hash of the read file names
   (readstats.cpp:82-91)

The serialization is numpy-based (flat arrays) rather than per-read
pickles so that 100M-read state remains tractable.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Dict, List, Optional

from .candidates import Readstats
from .read import Alignment, ReadState


def readfiles_key(reads_files: List[str]) -> str:
    """Stable key from read file names (readstats.cpp:82-91 semantics)."""
    h = hashlib.sha1()
    for p in reads_files:
        h.update(os.path.basename(p).encode())
    return h.hexdigest()[:16]


class StateDB:
    def __init__(self, kvdb_dir: str):
        self.dir = kvdb_dir
        os.makedirs(kvdb_dir, exist_ok=True)

    def _states_path(self) -> str:
        return os.path.join(self.dir, "read_states.bin")

    def _stats_path(self, key: str) -> str:
        return os.path.join(self.dir, f"readstats_{key}.json")

    def is_empty(self) -> bool:
        return not os.path.exists(self._states_path())

    def clear(self) -> None:
        for f in (self._states_path(),):
            if os.path.exists(f):
                os.remove(f)
        for f in os.listdir(self.dir):
            if f.startswith("readstats_"):
                os.remove(os.path.join(self.dir, f))

    # -- read states -----------------------------------------------------

    def save_states(self, ids: List[str], states: List[ReadState]) -> None:
        recs = {}
        for rid, st in zip(ids, states):
            if not st.alignments and not st.is_hit and not st.is_done \
                    and st.hit_seeds == 0:
                continue    # reference only stores reads with alignments
            recs[rid] = st
        with open(self._states_path(), "wb") as f:
            pickle.dump(recs, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_states(self) -> Dict[str, ReadState]:
        if self.is_empty():
            return {}
        with open(self._states_path(), "rb") as f:
            return pickle.load(f)

    # -- run stats -------------------------------------------------------

    def save_readstats(self, key: str, rs: Readstats,
                       extra: Optional[dict] = None) -> None:
        d = dict(rs.__dict__)
        if extra:
            d.update(extra)
        with open(self._stats_path(key), "w") as f:
            json.dump(d, f)

    def load_readstats(self, key: str) -> Optional[dict]:
        p = self._stats_path(key)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
