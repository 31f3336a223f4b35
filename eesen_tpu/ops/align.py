"""CTC forced alignment (Viterbi over the expanded label lattice).

The reference aligns by composing a transcript FST with the token FST and
decoding (reference: asr_egs/wsj/steps/align_ctc_single_utt.sh +
utils/training_trans_fst.py).  Equivalently — and TPU-natively — this is
the max-product version of the CTC forward recursion over the 2L+1
expanded-label states, with backpointers; one `lax.scan` per batch, then a
host traceback.  Produces per-frame label ids (blank = 0), i.e. the same
frame alignment the reference's composed-FST decode yields.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.ops.ctc import expand_labels, _shift_right
from eesen_tpu.utils.math import LOG_ZERO

Array = jax.Array


def ctc_viterbi(
    log_probs: Array,
    logit_lengths: Array,
    labels: Array,
    label_lengths: Array,
    blank_id: int = 0,
) -> Tuple[Array, Array]:
    """Max-product forward pass.

    log_probs: [B, T, V] log-softmax outputs.
    Returns (delta [B, T, S], psi [B, T, S] backpointer offsets in {0,1,2}).
    """
    elab = expand_labels(labels.astype(jnp.int32), blank_id)
    b, s = elab.shape
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    is_label = (s_iota % 2) == 1
    prev2 = _shift_right(elab.astype(jnp.float32), 2, -1.0).astype(jnp.int32)
    can_skip = is_label & (elab != prev2) & (s_iota >= 2)
    valid_s = s_iota < (2 * label_lengths[:, None] + 1)

    lp_e = jnp.take_along_axis(log_probs, elab[:, None, :], axis=2)
    lp_e = jnp.where(valid_s[:, None, :], lp_e, LOG_ZERO)
    neg = jnp.float32(LOG_ZERO)

    delta0 = jnp.where(s_iota <= 1, lp_e[:, 0, :], neg)

    def step(delta, inp):
        lp_t, t = inp
        c0 = delta
        c1 = _shift_right(delta, 1, LOG_ZERO)
        c2 = jnp.where(can_skip, _shift_right(delta, 2, LOG_ZERO), neg)
        stacked = jnp.stack([c0, c1, c2])           # [3, B, S]
        best = jnp.max(stacked, axis=0)
        psi_t = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new = lp_t + best
        active = (t < logit_lengths)[:, None]
        new = jnp.where(active, new, delta)
        return new, (new, psi_t)

    ts = jnp.arange(1, log_probs.shape[1], dtype=jnp.int32)
    _, (deltas, psis) = jax.lax.scan(
        step, delta0, (jnp.moveaxis(lp_e[:, 1:, :], 1, 0), ts)
    )
    delta = jnp.concatenate(
        [delta0[:, None, :], jnp.moveaxis(deltas, 0, 1)], axis=1
    )
    psi = jnp.concatenate(
        [jnp.zeros((b, 1, s), jnp.int8), jnp.moveaxis(psis, 0, 1)], axis=1
    )
    return delta, psi


def ctc_align(
    log_probs: Array,
    logit_lengths: Array,
    labels: Array,
    label_lengths: Array,
    blank_id: int = 0,
) -> List[np.ndarray]:
    """Frame-level forced alignment.

    Returns per-utterance int32 arrays of length logit_length with the
    aligned label id (blank_id at blank frames)."""
    delta, psi = ctc_viterbi(
        log_probs, logit_lengths, labels, label_lengths, blank_id
    )
    delta = np.asarray(delta)
    psi = np.asarray(psi)
    elab = np.asarray(expand_labels(np.asarray(labels, np.int32), blank_id))
    lens = np.asarray(logit_lengths)
    lab_lens = np.asarray(label_lengths)
    out = []
    for i in range(delta.shape[0]):
        t_last = int(lens[i]) - 1
        if t_last < 0:
            out.append(np.zeros(0, np.int32))
            continue
        last_blank = 2 * int(lab_lens[i])
        last_label = max(last_blank - 1, 0)
        s = (
            last_blank
            if delta[i, t_last, last_blank] >= delta[i, t_last, last_label]
            else last_label
        )
        states = np.zeros(t_last + 1, np.int32)
        states[t_last] = s
        for t in range(t_last, 0, -1):
            s = s - int(psi[i, t, s])
            states[t - 1] = s
        out.append(elab[i, states].astype(np.int32))
    return out


def align_to_segments(
    alignment: np.ndarray, blank_id: int = 0
) -> List[Tuple[int, int, int]]:
    """Collapse a frame alignment into (label, start_frame, end_frame+1)
    segments, dropping blanks (for CTM-style output)."""
    segs: List[Tuple[int, int, int]] = []
    prev = None
    start = 0
    for t, l in enumerate(alignment):
        l = int(l)
        if l != prev:
            if prev is not None and prev != blank_id:
                segs.append((prev, start, t))
            prev, start = l, t
    if prev is not None and prev != blank_id:
        segs.append((prev, start, len(alignment)))
    return segs
