"""Longest increasing subsequence, faithful to the reference.

Patience-style O(n log k) LIS over (ref_pos, read_pos) pairs comparing the
READ position with strict '<' (find_lis, alignment.cpp:58-98).  The exact
reconstruction matters: the engine anchors the SW window on the FIRST
element of the returned subsequence (alignment.cpp:268-269).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def find_lis(a: Sequence[Tuple[int, int]]) -> List[int]:
    if not a:
        return []
    n = len(a)
    p = [0] * n
    b = [0]
    for i in range(1, n):
        if a[b[-1]][1] < a[i][1]:
            p[i] = b[-1]
            b.append(i)
            continue
        u, v = 0, len(b) - 1
        while u < v:
            c = (u + v) // 2
            if a[b[c]][1] < a[i][1]:
                u = c + 1
            else:
                v = c
        if a[i][1] < a[b[u]][1]:
            if u > 0:
                p[i] = b[u - 1]
            b[u] = i
    u = len(b)
    v = b[-1]
    out = [0] * u
    while u:
        u -= 1
        out[u] = v
        v = p[v]
    return out
