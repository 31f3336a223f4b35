"""Greedy (best-path) CTC decoding.

The simplest decoder: frame-level argmax, collapse repeats, drop blanks —
the reference uses this for token-error-rate monitoring
(reference: src/net/ctc-loss.cc:196-299) and `decode-faster`-style quick
checks.  The argmax runs on device over the whole batch; the collapse is a
cheap host loop.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.training.metrics import collapse_ctc_path

Array = jax.Array


def greedy_decode_logits(
    logits: Array, lengths: Array, blank: int = 0
) -> List[List[int]]:
    """logits [B, T, V] -> list of collapsed label sequences."""
    argmax = np.asarray(jnp.argmax(logits, axis=-1))
    lens = np.asarray(lengths)
    return [
        collapse_ctc_path(argmax[i, : int(lens[i])], blank)
        for i in range(argmax.shape[0])
    ]


def greedy_decode(
    log_probs: np.ndarray, blank: int = 0
) -> List[int]:
    """Single-utterance [T, V] log-probs -> collapsed labels."""
    return collapse_ctc_path(np.argmax(log_probs, axis=-1), blank)
