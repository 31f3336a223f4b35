"""Frame-level cross-entropy loss (for hybrid-style training).

Mirrors the reference's CE objective (reference: src/net/ce-loss.{h,cc}:
CE::Eval/EvalParallel — per-frame softmax cross-entropy against frame
labels, with padded frames masked, plus frame-accuracy monitoring; used by
the train-ce{,-parallel} binaries)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def ce_loss(
    logits: Array,
    logit_lengths: Array,
    frame_labels: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """logits [B, T, V], frame_labels [B, T] int32 -> (mean loss per frame,
    metrics {frames, correct, obj_sum})."""
    b, t_max, v = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
        < logit_lengths[:, None]
    )
    picked = jnp.take_along_axis(
        lp, frame_labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    nll = -jnp.where(mask, picked, 0.0)
    frames = jnp.maximum(jnp.sum(logit_lengths), 1)
    loss = jnp.sum(nll) / frames.astype(nll.dtype)
    pred = jnp.argmax(lp, axis=-1)
    correct = jnp.sum((pred == frame_labels) & mask)
    return loss, {
        "obj_sum": jnp.sum(nll),
        "frames": frames,
        "correct": correct,
    }
