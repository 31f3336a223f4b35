"""Class priors: posterior -> pseudo-likelihood conversion for WFST decode.

Mirrors the reference's ClassPrior (reference: src/net/class-prior.{h,cc}:
26-92): load label frame counts, floor low counts at `prior_cutoff` and
mask them out (+FLT_MAX/2 so they get zero likelihood without NaNs), scale
the blank count by `blank_scale`, normalize, take logs, and subtract
`prior_scale * log_prior` from log-posteriors before decoding
(netbin/net-output-extract.cc:101-109).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(np.finfo(np.float32).max / 2)


@dataclasses.dataclass(frozen=True)
class ClassPriorOptions:
    prior_scale: float = 1.0
    prior_cutoff: float = 1e-10
    blank_scale: float = 1.0


def compute_log_priors(
    counts: np.ndarray, opts: ClassPriorOptions = ClassPriorOptions()
) -> np.ndarray:
    """counts: [V] label frame counts (blank = index 0) -> [V] masked
    log-priors ready for `subtract_priors`."""
    counts = np.asarray(counts, dtype=np.float64).copy()
    mask = counts < opts.prior_cutoff
    counts[mask] = opts.prior_cutoff
    if opts.blank_scale != 1.0:
        counts[0] *= opts.blank_scale
    priors = counts / counts.sum()
    log_priors = np.log(priors).astype(np.float32)
    log_priors[mask] += BIG  # cut-off classes get ~zero likelihood
    return log_priors


def subtract_priors(
    log_posteriors: jax.Array,
    log_priors: Union[np.ndarray, jax.Array],
    prior_scale: float = 1.0,
) -> jax.Array:
    """log p(x|k) ∝ log p(k|x) - scale * log p(k)."""
    return log_posteriors - prior_scale * jnp.asarray(log_priors)


def counts_from_labels(label_seqs, num_targets: int) -> np.ndarray:
    """Label occurrence counts as the recipe computes them
    (steps/train_ctc_parallel.sh:119-120: awk interleaves a blank `0`
    after every label — "a b" -> "a 0 b 0" — then
    src/decoderbin/analyze-counts.cc:78 counts occurrences, with +1 added
    to zero counts so decoding never sees a zero prior)."""
    counts = np.zeros(num_targets, dtype=np.float64)
    for seq in label_seqs:
        for l in seq:
            counts[int(l)] += 1.0
            counts[0] += 1.0  # interleaved blank
    counts[counts == 0] += 1.0  # analyze-counts counts_nozero
    return counts
