"""Suffix-array longest-common-substring — the ST3 numeric kernel.

[spec BASELINE.json:6] names "a suffix-array substring stage for exact
near-containment". This module provides the exact machinery:

- suffix_array: prefix-doubling construction (Manber–Myers '90 [public]),
  vectorized with numpy argsort/lexsort — O(n log n), no per-suffix Python.
- lcs_len: longest common substring of two byte strings via the classic
  SA-over-concatenation + adjacent-cross-document-LCP scan (Kasai LCP).

Near-containment criterion (SURVEY.md §7 hard part 2 — the spec names the
stage but not its threshold, so it is pinned in config):
    lcs_len(short, long) / len(short) >= cfg.containment_lcs_ratio
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array via prefix doubling (numpy)."""
    n = s.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]) — second key -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # recompute ranks
        r_ord = rank[order]
        s_ord = second[order]
        new_head = np.concatenate(
            ([True], (r_ord[1:] != r_ord[:-1]) | (s_ord[1:] != s_ord[:-1])))
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(new_head) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0.
    O(n) sequential (Kasai et al. 2001 [public]) — fine for per-pair doc
    sizes (KBs); this runs inside a distributed verify task."""
    n = s.size
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def lcs_len(a: bytes, b: bytes) -> int:
    """Length of the longest common substring of byte strings a and b."""
    if not a or not b:
        return 0
    # concat with a separator byte value outside uint8 range (use int16 array)
    sa_ = np.frombuffer(a, dtype=np.uint8).astype(np.int16)
    sb_ = np.frombuffer(b, dtype=np.uint8).astype(np.int16)
    s = np.concatenate((sa_, np.array([256], dtype=np.int16), sb_))
    na = sa_.size
    sa = suffix_array(s)
    lcp = _kasai_lcp(s, sa)
    # adjacent suffixes from different documents; the separator value 256
    # differs from every byte, so common prefixes never span it
    side_a = sa < na
    cross = side_a[1:] != side_a[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def containment_ratio(short: bytes, long_: bytes) -> float:
    """lcs_len(short, long) / len(short) — 1.0 means the shorter doc appears
    verbatim inside the longer one."""
    if not short:
        return 1.0
    # fast path: exact substring (C-speed two-way search)
    if short in long_:
        return 1.0
    return lcs_len(short, long_) / len(short)
