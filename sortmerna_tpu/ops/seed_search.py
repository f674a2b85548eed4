"""On-device window seed search (JAX, HBM-resident tables).

The device twin of ops/seed_probe.py's enumerate-and-probe scheme
(replacing the reference's burst-trie walk, paralleltraversal.cpp:114-250
+ traverse_bursttrie.cpp): for every 18-char read window w = w1.w2 the
d<=1-accepted reference tails are enumerated in closed form as a STATIC
set of 165 hash probes per window -- 1+37+9+36 for subsearch 1a (exact
w1) and 1+37+9+36 for subsearch 1b (exact w2) -- against open-addressing
tables living in HBM (index/hashtab.py layout; keys split into uint32
halves because TPUs have no u64 lanes).

Everything through per-window dedup runs inside one jit:
  probe (gather loops) -> 0-error mode selection -> bounded group
  expansion (F-prefix ranges <=4, R-exact <=4, R-prefix <=16 members)
  -> per-window sort + unique -> flat compaction to a fixed cap.
The host downloads only the compacted (window, id) pairs, so device
output is O(hits), not O(windows x probes).

Bit-exactness against the host/native probers is asserted by
tests/test_seed_search_device.py; the engine enables this path with
--device_probe (or SMR_DEVICE_PROBE=1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.builder import IndexPart
from ..index.hashtab import MAX_PROBES

_M1 = np.uint32(0x9E3779B1)
_M2 = np.uint32(0x85EBCA77)
M26 = (1 << 26) - 1

# group-size caps (guaranteed by the index layout: an 18-mer group over a
# 17-char prefix has <=4 members; R exact groups <=4; R prefix <=16 --
# index/builder.py finish_part).  Verified against the loaded part at
# searcher construction; violation falls back to the host prober.
CAP_FDEL = 4
CAP_RSUB = 4
CAP_RDEL = 16


def _split_keys_u64(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """u64 table keys -> (lo32, hi32) uint32 halves (EMPTY stays all-1s,
    distinguishable from any real <=54-bit key whose hi32 < 2^22)."""
    k = keys.astype(np.uint64)
    return ((k & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (k >> np.uint64(32)).astype(np.uint32))


def _hash26(lo26, hi26, bits: int):
    """jit twin of index/hashtab.hash_u64 (32-bit wrapping mixes over the
    26/26 key-half split)."""
    h = (lo26.astype(jnp.uint32) * _M1) ^ (hi26.astype(jnp.uint32) * _M2)
    h = h ^ (h >> 15)
    h = h * _M1
    h = h ^ (h >> 13)
    return (h & jnp.uint32((1 << bits) - 1)).astype(jnp.int32)


def _probe_table(tk_lo, tk_hi, tv, lo26, hi26):
    """Vectorized linear-probe lookup.

    lo26/hi26: int32[N] query key halves (key & M26, key >> 26); hi26
    carries every bit above 26 exactly (matches hash_u64's split).
    Returns (found bool[N], val rows of tv[N]).
    """
    size = tk_lo.shape[0]
    bits = int(size).bit_length() - 1
    klo32 = lo26.astype(jnp.uint32) | (hi26.astype(jnp.uint32) << 26)
    khi32 = (hi26 >> 6).astype(jnp.uint32)
    cur = _hash26(lo26, hi26, bits)
    n = lo26.shape[0]
    found0 = jnp.zeros(n, bool)
    val0 = jnp.zeros((n,) + tv.shape[1:], tv.dtype)

    def cond(st):
        i, done_all, *_ = st
        return jnp.logical_and(i < MAX_PROBES, ~done_all)

    def body(st):
        i, _, cur, done, found, val = st
        slot_lo = tk_lo[cur]
        slot_hi = tk_hi[cur]
        hit = (~done) & (slot_lo == klo32) & (slot_hi == khi32)
        empty = (slot_lo == jnp.uint32(0xFFFFFFFF)) \
            & (slot_hi == jnp.uint32(0xFFFFFFFF))
        if tv.ndim == 1:
            val = jnp.where(hit, tv[cur], val)
        else:
            val = jnp.where(hit[:, None], tv[cur], val)
        found = found | hit
        done = done | hit | empty
        cur = jnp.where(done, cur, (cur + 1) & (size - 1))
        return (i + 1, done.all(), cur, done, found, val)

    st = (jnp.int32(0), jnp.array(False), cur,
          jnp.zeros(n, bool), found0, val0)
    *_, found, val = jax.lax.while_loop(cond, body, st)
    return found, val


# ---------------------------------------------------------------------------
# variant enumeration (jit twins of seed_probe.sub/del/ins9_variants_vec)


def _sub_variants(p, pw):
    """[nw, 4*pw+1] int32: original + single-char substitutions."""
    cols = [p]
    for i in range(pw):
        shift = 2 * (pw - 1 - i)
        cleared = p & ~(3 << shift)
        for c in range(4):
            cols.append(cleared | (c << shift))
    return jnp.stack(cols, axis=1)


def _del_variants(p, pw):
    """[nw, pw] int32 packed (pw-1)-char deletions."""
    cols = []
    for k in range(pw):
        hi = p >> (2 * (pw - k))
        lo = p & ((1 << (2 * (pw - 1 - k))) - 1)
        cols.append((hi << (2 * (pw - 1 - k))) | lo)
    return jnp.stack(cols, axis=1)


def _ins9_variants(p, pw):
    """[nw, 4*pw] int32 first-pw-chars of single insertions."""
    cols = []
    for k in range(pw):
        hi = p >> (2 * (pw - k))
        mid = (p >> 2) & ((1 << (2 * (pw - 1 - k))) - 1)
        for c in range(4):
            cols.append((((hi << 2) | c) << (2 * (pw - 1 - k))) | mid)
    return jnp.stack(cols, axis=1)


def _rev(p, width):
    out = jnp.zeros_like(p)
    x = p
    for _ in range(width):
        out = (out << 2) | (x & 3)
        x = x >> 2
    return out


def _bcast(lo, hi):
    lo, hi = jnp.broadcast_arrays(lo, hi)
    return lo, hi


def _shift_halves(hi_part, lo_part, s):
    """(lo26, hi26) of key = hi_part << s | lo_part, s <= 26 and
    lo_part < 2^s."""
    t = 26 - s
    return _bcast(((hi_part & ((1 << t) - 1)) << s) | lo_part,
                  hi_part >> t)


def _k18_halves(w1, w2, pw):
    """key = w1 << 2pw | w2 (4pw bits)."""
    return _shift_halves(w1, w2, 2 * pw)


def _fpref_halves(w1, d8, pw):
    """key = w1 << (2pw-2) | d8 (deletion tail)."""
    return _shift_halves(w1, d8, 2 * pw - 2)


def _fins_halves(w1, v9, c, pw):
    """key = w1 << (2pw+2) | v9 << 2 | c."""
    s = 2 * pw + 2
    L0 = (v9 << 2) | c            # <= 2pw+2 <= 28 bits, fits int32
    if s <= 26:
        return _shift_halves(w1, L0, s)
    return _bcast(L0 & M26, (w1 << (s - 26)) | (L0 >> 26))


def _rdel_halves(d8r, w2, pw):
    """key = d8r << 2pw | w2."""
    return _shift_halves(d8r, w2, 2 * pw)


def _rins_halves(c0, rv9, w2, pw):
    """key = c0 << 4pw | rv9 << 2pw | w2 (4pw+2 bits)."""
    s = 2 * pw
    if 4 * pw + 2 <= 26:
        return _bcast((c0 << (2 * s)) | (rv9 << s) | w2,
                      jnp.zeros_like(w2))
    m_lo, m_hi = _shift_halves(rv9, w2, s)      # M0 = rv9<<s | w2
    return _bcast(m_lo, (c0 << (2 * s - 26)) | m_hi)


# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("pw", "full_search", "minoccur", "cap"))
def _probe_kernel(tabs, w1, w2, n_real, pw: int, full_search: bool,
                  minoccur: int, cap: int):
    """The full window search for a padded window batch.

    tabs: dict of device table arrays (see DeviceSeedSearcher).
    w1, w2: int32[NW] packed pw-mer halves (padded; rows >= n_real are
    discarded by validity masking).
    Returns (out_win int32[cap], out_id int32[cap], total int32).
    """
    nw = w1.shape[0]
    n_sub = 4 * pw + 1
    n_del = pw
    n_ins = 4 * pw
    counts = tabs["kmer_counts"]
    gate_f = counts[w1] > minoccur
    gate_r = counts[w2] > minoccur

    # ---------- subsearch 1a ----------
    lo, hi = _k18_halves(w1, w2, pw)
    zf, zid = _probe_table(tabs["fx_lo"], tabs["fx_hi"], tabs["fx_val"],
                           lo, hi)
    zero_a = zf & gate_f

    subs = _sub_variants(w2, pw)                    # [nw, n_sub]
    lo, hi = _k18_halves(w1[:, None], subs, pw)
    sf, sid = _probe_table(tabs["fx_lo"], tabs["fx_hi"], tabs["fx_val"],
                           lo.ravel(), hi.ravel())
    sf = sf.reshape(nw, n_sub) & gate_f[:, None]
    sid = sid.reshape(nw, n_sub)

    dels = _del_variants(w2, pw)                    # [nw, n_del]
    lo, hi = _fpref_halves(w1[:, None], dels, pw)
    df, dval = _probe_table(tabs["fp_lo"], tabs["fp_hi"], tabs["fp_val"],
                            lo.ravel(), hi.ravel())
    df = df.reshape(nw, n_del) & gate_f[:, None]
    dstart = dval[:, 0].reshape(nw, n_del).astype(jnp.int32)
    dcount = jnp.where(
        df, dval[:, 1].reshape(nw, n_del).astype(jnp.int32), 0)

    ins9 = _ins9_variants(w2, pw)                   # [nw, n_ins]
    lo, hi = _fins_halves(w1[:, None], ins9, (w2 & 3)[:, None], pw)
    inf, inid = _probe_table(tabs["k19_lo"], tabs["k19_hi"],
                             tabs["k19_val"], lo.ravel(), hi.ravel())
    inf = inf.reshape(nw, n_ins) & gate_f[:, None]
    inid = inid.reshape(nw, n_ins)

    # ---------- subsearch 1b ----------
    p_r = _rev(w1, pw)
    lo, hi = _k18_halves(w1, w2, pw)
    rzf, rzval = _probe_table(tabs["rx_lo"], tabs["rx_hi"], tabs["rx_val"],
                              lo, hi)
    zero_b = rzf & gate_r

    rsubs = _rev(_sub_variants(p_r, pw), pw)        # [nw, n_sub]
    lo, hi = _k18_halves(rsubs, w2[:, None], pw)
    rsf, rsval = _probe_table(tabs["rx_lo"], tabs["rx_hi"], tabs["rx_val"],
                              lo.ravel(), hi.ravel())
    rsf = rsf.reshape(nw, n_sub) & gate_r[:, None]
    rs_start = rsval[:, 0].reshape(nw, n_sub).astype(jnp.int32)
    rs_count = jnp.where(
        rsf, rsval[:, 1].reshape(nw, n_sub).astype(jnp.int32), 0)

    rdels = _rev(_del_variants(p_r, pw), pw - 1)    # [nw, n_del]
    lo, hi = _rdel_halves(rdels, w2[:, None], pw)
    rdf, rdval = _probe_table(tabs["rp_lo"], tabs["rp_hi"], tabs["rp_val"],
                              lo.ravel(), hi.ravel())
    rdf = rdf.reshape(nw, n_del) & gate_r[:, None]
    rd_start = rdval[:, 0].reshape(nw, n_del).astype(jnp.int32)
    rd_count = jnp.where(
        rdf, rdval[:, 1].reshape(nw, n_del).astype(jnp.int32), 0)

    rins9 = _rev(_ins9_variants(p_r, pw), pw)       # [nw, n_ins]
    lo, hi = _rins_halves((w1 >> (2 * pw - 2))[:, None], rins9,
                          w2[:, None], pw)
    rinf, rinid = _probe_table(tabs["k19_lo"], tabs["k19_hi"],
                               tabs["k19_val"], lo.ravel(), hi.ravel())
    rinf = rinf.reshape(nw, n_ins) & gate_r[:, None]
    rinid = rinid.reshape(nw, n_ins)

    # ---------- combine (0-error short-circuit semantics) ----------
    if full_search:
        mode_a = jnp.zeros(nw, bool)
        mode_b = jnp.zeros(nw, bool)
    else:
        mode_a = zero_a
        mode_b = zero_b & ~mode_a
    mode_c = ~(mode_a | mode_b)

    r_ids = tabs["r_ids"]
    cm = mode_c[:, None]
    BIG = jnp.int32(0x7FFFFFFF)

    def masked(ids, valid):
        return jnp.where(valid, ids.astype(jnp.int32), BIG)

    cols = [
        masked(zid, mode_a)[:, None],
        masked(rzval[:, 2], mode_b)[:, None],
        masked(sid, sf & cm),
        masked(inid, inf & cm),
        masked(rinid, rinf & cm),
    ]
    # bounded group expansions
    j = jnp.arange(CAP_FDEL, dtype=jnp.int32)
    ids = dstart[:, :, None] + j
    cols.append(masked(ids, (j < dcount[:, :, None]) & cm[:, :, None])
                .reshape(nw, -1))
    j = jnp.arange(CAP_RSUB, dtype=jnp.int32)
    idx = jnp.minimum(rs_start[:, :, None] + j, r_ids.shape[0] - 1)
    ids = r_ids[idx].astype(jnp.int32)
    cols.append(masked(ids, (j < rs_count[:, :, None]) & cm[:, :, None])
                .reshape(nw, -1))
    j = jnp.arange(CAP_RDEL, dtype=jnp.int32)
    idx = jnp.minimum(rd_start[:, :, None] + j, r_ids.shape[0] - 1)
    ids = r_ids[idx].astype(jnp.int32)
    cols.append(masked(ids, (j < rd_count[:, :, None]) & cm[:, :, None])
                .reshape(nw, -1))

    mat = jnp.concatenate(cols, axis=1)             # [nw, K] ids or BIG
    mat = jnp.sort(mat, axis=1)
    dup = jnp.zeros_like(mat, dtype=bool).at[:, 1:].set(
        mat[:, 1:] == mat[:, :-1])
    valid = (mat != BIG) & ~dup
    valid = valid & (jnp.arange(nw)[:, None] < n_real)

    # ---------- flat compaction ----------
    K = mat.shape[1]
    vflat = valid.ravel()
    ids_flat = mat.ravel()
    win_flat = jnp.repeat(jnp.arange(nw, dtype=jnp.int32), K)
    pos = jnp.cumsum(vflat) - 1
    total = jnp.sum(vflat.astype(jnp.int32))
    tgt = jnp.where(vflat, pos, cap).astype(jnp.int32)
    out_win = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(
        win_flat, mode="drop")[:cap]
    out_id = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(
        ids_flat, mode="drop")[:cap]
    return out_win, out_id, total


class DeviceSeedSearcher:
    """Device-backed twin of seed_probe.SeedSearcher for one IndexPart."""

    # capped at 64K windows/call: the [nw, 439] expansion matrix is the
    # peak intermediate (115 MB int32 at 64K); bigger batches split
    NW_LADDER = (4096, 16384, 65536)

    def __init__(self, part: IndexPart, minoccur: int = 0,
                 full_search: bool = False):
        self.minoccur = int(minoccur)
        self.full_search = bool(full_search)
        self.pw = getattr(part, "seed_win_len", 18) // 2
        # cap verification (fall back handled by caller)
        if ((len(part.f_pref_count) and
             int(part.f_pref_count.max()) > CAP_FDEL)
                or (len(part.r_exact_count) and
                    int(part.r_exact_count.max()) > CAP_RSUB)
                or (len(part.r_pref_count) and
                    int(part.r_pref_count.max()) > CAP_RDEL)):
            raise ValueError("index group sizes exceed device probe caps")
        put = jax.device_put

        def split(keys):
            lo, hi = _split_keys_u64(keys)
            return put(lo), put(hi)

        fx_lo, fx_hi = split(part.f_exact_keys)
        fp_lo, fp_hi = split(part.f_pref_keys)
        rx_lo, rx_hi = split(part.r_exact_keys)
        rp_lo, rp_hi = split(part.r_pref_keys)
        k19_lo, k19_hi = split(part.k19_keys)
        self.tabs = {
            "fx_lo": fx_lo, "fx_hi": fx_hi,
            "fx_val": put(np.asarray(part.f_exact_vals, np.uint32)),
            "fp_lo": fp_lo, "fp_hi": fp_hi,
            "fp_val": put(np.stack(
                [part.f_pref_start, part.f_pref_count],
                axis=1).astype(np.uint32)),
            "rx_lo": rx_lo, "rx_hi": rx_hi,
            "rx_val": put(np.stack(
                [part.r_exact_start, part.r_exact_count,
                 part.r_exact_zero], axis=1).astype(np.uint32)),
            "rp_lo": rp_lo, "rp_hi": rp_hi,
            "rp_val": put(np.stack(
                [part.r_pref_start, part.r_pref_count],
                axis=1).astype(np.uint32)),
            "k19_lo": k19_lo, "k19_hi": k19_hi,
            "k19_val": put(np.asarray(part.k19_vals, np.uint32)),
            "r_ids": put(np.asarray(
                part.r_ids if len(part.r_ids) else np.zeros(1, np.uint32),
                np.uint32)),
            "kmer_counts": put(np.asarray(part.kmer_counts, np.uint32)),
        }

    def _nw_pad(self, n: int) -> int:
        for b in self.NW_LADDER:
            if n <= b:
                return b
        return self.NW_LADDER[-1]

    def search_windows(self, w1: np.ndarray, w2: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        nw = len(w1)
        if nw == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        if nw > self.NW_LADDER[-1]:
            # split oversized batches; windows are independent
            mid = nw // 2
            wA, iA = self.search_windows(w1[:mid], w2[:mid])
            wB, iB = self.search_windows(w1[mid:], w2[mid:])
            return np.concatenate([wA, wB + mid]), np.concatenate([iA, iB])
        NW = self._nw_pad(nw)
        w1p = np.zeros(NW, np.int32)
        w2p = np.zeros(NW, np.int32)
        w1p[:nw] = w1
        w2p[:nw] = w2
        w1j = jnp.asarray(w1p)
        w2j = jnp.asarray(w2p)
        cap = max(4 * NW, 4096)
        while True:
            ow, oi, total = _probe_kernel(
                self.tabs, w1j, w2j, jnp.int32(nw), self.pw,
                self.full_search, self.minoccur, cap)
            total = int(total)
            if total <= cap:
                break
            cap = max(2 * cap, total)
        return (np.asarray(ow[:total]).astype(np.int64),
                np.asarray(oi[:total]).astype(np.int64))
