"""Blank-frame skipping (phone-synchronous) decode compaction.

CTC acoustic models are blank-dominated: on converged models 60-90% of
frames carry blank posterior ~1.0, and during such a frame every
surviving WFST token takes a blank transition whose acoustic cost is
(to within the threshold) identical for all of them — the frame shifts
every path by a constant and changes no ranking.  Phone-synchronous
decoding (Chen, Zhang, Yan, Qian — Interspeech 2016) exploits this by
evaluating the search only on non-blank frames.

The reference has no equivalent (its CPU decoder walks every frame:
src/decoder/lattice-faster-decoder.cc:77-90 Decode loop); on TPU the
win is direct — the batched search costs ~2.5 ms per frame regardless
of content, so compacting a blank-dominated utterance to its informative
frames multiplies decode throughput by the blank rate.

The compaction is a stable partition on the device ([B, T, V] ->
blank-dominated frames moved to the back), then a host-side slice of
the kept prefix rounded up to a shape bucket (few compile variants).
The per-utterance sum of skipped blank acoustic costs is returned so
callers can report totals comparable to a full decode; it is a
path-independent constant, so WER, lattice ranking, and acwt sweeps
are unaffected by dropping it (every path through the utterance pays
it once).

Exactness: a skipped frame's non-blank alternatives cost at least
-log(1 - threshold) * acoustic_scale more than blank; with
threshold >= 0.98 those alternatives lose by >= ~3.5 nats and would be
beam-pruned anyway, so hypotheses are unchanged in practice (the e2e
tests assert equality on peaked posteriors).  threshold -> 1 recovers
the exact search.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class CompactFrames(NamedTuple):
    loglikes: Array      # [B, T', V] kept frames packed to the front
    lengths: Array       # [B] int32 kept-frame count
    time_map: Array      # [B, T'] int32 original frame index of slot t
    skipped_cost: Array  # [B] float32 sum of acoustic_scale * -ll[blank]
    #                      over skipped frames (path-independent constant)


@jax.jit
def _partition(loglikes: Array, lengths: Array, log_thresh: Array,
               scale: Array) -> Tuple[Array, Array, Array, Array]:
    b, t, _ = loglikes.shape
    ts = jnp.arange(t, dtype=jnp.int32)[None, :]
    active = ts < lengths[:, None]
    blank_lp = loglikes[:, :, 0]
    keep = active & (blank_lp < log_thresh)
    count = jnp.sum(keep, axis=1, dtype=jnp.int32)
    # an all-blank utterance keeps its first frame so downstream shapes
    # and tracebacks stay well-formed (hypothesis: empty word sequence)
    force0 = (count == 0) & (lengths > 0)
    keep = keep | (force0[:, None] & (ts == 0))
    count = jnp.maximum(count, (lengths > 0).astype(jnp.int32))
    # stable partition: kept frames first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.int32),
                        axis=1, stable=True)
    packed = jnp.take_along_axis(loglikes, order[:, :, None], axis=1)
    skipped = jnp.where(active & ~keep, -blank_lp, 0.0)
    return packed, count, order, scale * jnp.sum(skipped, axis=1)


def compact_blank_frames(
    loglikes: Array,
    lengths: Array,
    threshold: float,
    acoustic_scale: float = 1.0,
    bucket: int = 64,
) -> CompactFrames:
    """Drop frames whose blank posterior exceeds `threshold`.

    loglikes [B, T, V] log-softmax outputs (column 0 = blank), lengths
    [B].  Returns frames packed to the front and sliced to the smallest
    multiple of `bucket` >= the longest kept count (shape-bucketed so
    repeated calls reuse a few compiled search programs).
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    t = loglikes.shape[1]
    packed, count, order, cost = _partition(
        jnp.asarray(loglikes), jnp.asarray(lengths, jnp.int32),
        jnp.float32(math.log(threshold)), jnp.float32(acoustic_scale),
    )
    t_keep = int(np.asarray(jnp.max(count))) if count.shape[0] else 0
    t_new = min(max(bucket, -(-t_keep // bucket) * bucket), t)
    return CompactFrames(
        packed[:, :t_new], count, order[:, :t_new], cost
    )
