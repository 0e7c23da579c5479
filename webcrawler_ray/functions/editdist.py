"""Exact Levenshtein distance via Myers' bit-parallel algorithm
(G. Myers, "A fast bit-vector algorithm for approximate string matching
based on dynamic programming", JACM 46(3), 1999, with Hyyrö's 2001
cleanup of the horizontal/vertical delta recurrences). One arbitrary-
precision integer holds each DP column's delta bits, so the inner loop
is O(|b|) bigint steps instead of the O(|a|*|b|) scalar DP — ~100x
faster on the ~300-char documents this repo verifies, and exactly equal
to the classic DP (property-tested against it in
tests/test_editdist.py).

Used by the edit-distance similarity join (pipelines/dedup.py), whose
candidate filters (length + q-gram count, Gravano et al., "Approximate
string joins in a database (almost) for free", VLDB 2001) are LOSSLESS:
every pair they admit is verified here, every pair they prune provably
exceeds the threshold.
"""

from __future__ import annotations


def myers_distance(a: str, b: str) -> int:
    """Exact (unit-cost) Levenshtein distance between ``a`` and ``b``.

    Python's unbounded ints serve as the bit vector, so any pattern
    length works without blocking; all complements are masked to the
    pattern width.
    """
    if len(a) > len(b):          # pattern = shorter string (fewer bits)
        a, b = b, a
    m = len(a)
    if m == 0:
        return len(b)
    peq: dict[str, int] = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    full = (1 << m) - 1
    last = 1 << (m - 1)
    pv, mv, score = full, 0, m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (full & ~(xh | pv))
        mh = pv & xh
        if ph & last:
            score += 1
        if mh & last:
            score -= 1
        ph = ((ph << 1) | 1) & full
        mh = (mh << 1) & full
        pv = mh | (full & ~(xv | ph))
        mv = ph & xv
    return score


def dp_distance(a: str, b: str) -> int:
    """Classic O(n*m) two-row DP — the independent reference
    implementation the property test checks ``myers_distance``
    against (kept here so oracle and test share one spelling)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
