"""Levenshtein edit distance and alignment.

Used for token-error-rate monitoring during training and WER scoring
(reference: src/util/edit-distance{,-inl}.h, src/decoderbin/compute-wer.cc:69).
"""

from __future__ import annotations

from typing import Hashable, List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence[Hashable], hyp: Sequence[Hashable]) -> int:
    """Plain Levenshtein distance (ins/del/sub all cost 1)."""
    return edit_distance_stats(ref, hyp)[0]


def edit_distance_stats(
    ref: Sequence[Hashable], hyp: Sequence[Hashable]
) -> Tuple[int, int, int, int]:
    """Return (total, insertions, deletions, substitutions).

    Tie-breaking mirrors the reference (src/util/edit-distance-inl.h:29-113):
    among equal-cost paths prefer substitutions, then deletions, then
    insertions, which is what compute-wer reports.
    """
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, ins, del, sub) for ref[:i], hyp[:j]
    dp = [(j, j, 0, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        prev_diag = dp[0]
        dp[0] = (i, 0, i, 0)
        for j in range(1, m + 1):
            up = dp[j]          # ref[:i-1], hyp[:j]   -> deletion of ref token
            left = dp[j - 1]    # ref[:i],   hyp[:j-1] -> insertion of hyp token
            diag = prev_diag    # ref[:i-1], hyp[:j-1] -> match / substitution
            if ref[i - 1] == hyp[j - 1]:
                cand = diag
            else:
                cand = (diag[0] + 1, diag[1], diag[2], diag[3] + 1)
            dcand = (up[0] + 1, up[1], up[2] + 1, up[3])
            icand = (left[0] + 1, left[1] + 1, left[2], left[3])
            best = cand
            if dcand[0] < best[0]:
                best = dcand
            if icand[0] < best[0]:
                best = icand
            prev_diag = dp[j]
            dp[j] = best
    return dp[m]


def align_pair(
    ref: Sequence[Hashable], hyp: Sequence[Hashable], eps: Hashable = None
) -> List[Tuple[Hashable, Hashable]]:
    """Return the aligned (ref, hyp) pairs; `eps` marks ins/del gaps.

    Mirrors LevenshteinAlignment (reference: src/util/edit-distance-inl.h:117+),
    used for per-utterance alignment output and sclite-style scoring.
    """
    n, m = len(ref), len(hyp)
    cost = np.zeros((n + 1, m + 1), dtype=np.int32)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = cost[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1])
            dele = cost[i - 1, j] + 1
            ins = cost[i, j - 1] + 1
            cost[i, j] = min(sub, dele, ins)
    # traceback
    out: List[Tuple[Hashable, Hashable]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + (
            ref[i - 1] != hyp[j - 1]
        ):
            out.append((ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            out.append((ref[i - 1], eps))
            i -= 1
        else:
            out.append((eps, hyp[j - 1]))
            j -= 1
    out.reverse()
    return out
