"""Blank-frame skipping (phone-synchronous) decode compaction.

CTC acoustic models are blank-dominated: on converged models 60-90% of
frames carry blank posterior ~1.0.  Phone-synchronous decoding (Chen,
Zhang, Yan, Qian — Interspeech 2016) exploits this by evaluating the
search only on informative frames.  The reference has no equivalent
(its CPU decoder walks every frame: src/decoder/lattice-faster-decoder
.cc:77-90 Decode loop); on TPU the win is direct — the batched search
costs ~2.4 ms per frame regardless of content, so compacting a
blank-dominated utterance multiplies decode throughput by the blank
rate.

Semantics: every blank RUN is merged into its LAST frame, whose column
c becomes

    sum over the run of ll[blank]  +  max over the run of (ll[c] - ll[blank])

i.e. the exact cost of consuming the run with blanks everywhere except
one optimally-placed transition of label c (for c = blank the max term
is 0 and the run cost is the exact blank sum).  This makes the
compacted search equivalent to the full search restricted to paths
that change state at most ONCE inside each blank run:

- pure-blank consumption pays exactly what it pays frame by frame, so
  all well-evidenced paths keep their full-decode scores and margins
  (naive frame DROPPING erases the skipped-frame penalties of WRONG
  alignments: margins compress and the truth falls out of the beam —
  measured 1.1% -> 4%+ WER on the flagship corpus);
- one label transition inside a run costs its true best-position price
  — the full search routinely recovers weakly-evidenced words this way
  (LM gain vs a small acoustic penalty on a near-blank frame), and a
  pure run-SUM forbids it (measured +3.5% WER, all deletions/subs of
  weak words);
- keeping one frame per run preserves the blank separator CTC needs
  between two occurrences of the same unit (dropping whole runs
  deleted repeated-phone words: 4% -> 14% WER).

Paths needing >= 2 state changes inside one blank run remain
unrepresentable; threshold -> 1 recovers the exact search.

The compaction is a stable partition on the device ([B, T, V] with
run-merged columns, merged frames moved to the back), then a host-side
slice of the kept prefix rounded up to a shape bucket (few compile
variants).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class CompactFrames(NamedTuple):
    loglikes: Array      # [B, T', V] kept frames (run-summed), packed front
    lengths: Array       # [B] int32 kept-frame count
    time_map: Array      # [B, T'] int32 original frame index of slot t
    #                      (a blank run maps to its last frame)


@functools.partial(jax.jit, static_argnames=("min_run",))
def _partition(loglikes: Array, lengths: Array, log_thresh: Array,
               min_run: int) -> Tuple[Array, Array, Array]:
    b, t, _ = loglikes.shape
    ts = jnp.arange(t, dtype=jnp.int32)[None, :]
    active = ts < lengths[:, None]
    blank_lp = loglikes[:, :, 0]
    bd = active & (blank_lp >= log_thresh)      # blank-dominated
    if min_run > 1:
        # optional conservatism: only merge runs of >= min_run frames.
        # With the insertion-max column semantics this made no measured
        # difference (flagship grid: min_run 1 == 4 == exact parity),
        # but a caller can keep short blank dips as verbatim frames if
        # a corpus ever proves sensitive to the one-transition-per-run
        # restriction.
        prev_bd = jnp.concatenate(
            [jnp.zeros((b, 1), bool), bd[:, :-1]], axis=1
        )
        start_t = jnp.where(bd & ~prev_bd, ts, -1)
        run_start = jax.lax.cummax(start_t, axis=1)       # per bd frame
        nxt_bd = jnp.concatenate(
            [bd[:, 1:], jnp.zeros((b, 1), bool)], axis=1
        )
        end_t = jnp.where(bd & ~nxt_bd, ts, t + 1)
        run_end = jax.lax.cummin(end_t, axis=1, reverse=True)
        run_len = run_end - run_start + 1
        bd = bd & (run_len >= min_run)
    next_bd = jnp.concatenate(
        [bd[:, 1:], jnp.zeros((b, 1), bool)], axis=1
    )
    run_tail = bd & ~next_bd                    # last frame of each run
    keep = (active & ~bd) | run_tail
    count = jnp.sum(keep, axis=1, dtype=jnp.int32)
    # stable partition: kept frames first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.int32),
                        axis=1, stable=True)
    # kept slot j covers the contiguous segment (order[j-1], order[j]]
    # — each merged frame lies between two kept frames and belongs to
    # the LATER one's run.  Its columns combine:
    #   packed[j, c] = sum_{t in seg} blank[t] + max_{t in seg} rel[t, c]
    # where rel = ll - blank: a path consuming the segment with one
    # transition of label c pays the blank score everywhere except its
    # best single position (the search transition that emits c there);
    # for c = blank the max term is 0 and the run sum is exact.
    blank_act = jnp.where(active, blank_lp, 0.0)
    cs = jnp.cumsum(blank_act, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
    hi = jnp.take_along_axis(cs, order + 1, axis=1)
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, order.dtype), order[:, :-1]], axis=1
    )
    lo = jnp.take_along_axis(cs, prev + 1, axis=1)
    seg_blank = hi - lo                          # [B, T]
    # segmented cummax of rel within each segment (segments are
    # contiguous, so a start-flagged associative scan does it in log T)
    rel = jnp.where(
        active[:, :, None], loglikes - blank_lp[:, :, None], -jnp.inf
    )
    prev_keep = jnp.concatenate(
        [jnp.ones((b, 1), bool), keep[:, :-1]], axis=1
    )

    def comb(a, c):
        fa, va = a
        fc, vc = c
        return fa | fc, jnp.where(fc, vc, jnp.maximum(va, vc))

    flags = jnp.broadcast_to(prev_keep[:, :, None], rel.shape)
    _, segmax = jax.lax.associative_scan(comb, (flags, rel), axis=1)
    seg_rel = jnp.take_along_axis(segmax, order[:, :, None], axis=1)
    # beyond `count` the order holds merged frames (garbage segments);
    # those slots are masked off by `lengths` in the search
    packed = seg_blank[:, :, None] + seg_rel
    return packed, count, order


def compact_blank_frames(
    loglikes: Array,
    lengths: Array,
    threshold: float,
    acoustic_scale: float = 1.0,   # kept for API compat; costs are now
    #                                carried in the summed frames
    bucket: int = 64,
    min_run: int = 1,
) -> CompactFrames:
    """Merge each blank-dominated run into one run-summed frame.

    loglikes [B, T, V] log-softmax outputs (column 0 = blank), lengths
    [B].  Returns frames packed to the front and sliced to the smallest
    multiple of `bucket` >= the longest kept count (shape-bucketed so
    repeated calls reuse a few compiled search programs).  Path costs
    match the full decode exactly for run-spanning paths (see module
    docstring).
    """
    del acoustic_scale
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    t = loglikes.shape[1]
    packed, count, order = _partition(
        jnp.asarray(loglikes), jnp.asarray(lengths, jnp.int32),
        jnp.float32(math.log(threshold)), min_run,
    )
    t_keep = int(np.asarray(jnp.max(count))) if count.shape[0] else 0
    t_new = min(max(bucket, -(-t_keep // bucket) * bucket), t)
    return CompactFrames(packed[:, :t_new], count, order[:, :t_new])
