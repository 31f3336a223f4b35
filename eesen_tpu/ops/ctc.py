"""CTC loss: batched log-space forward-backward, TPU-first.

Reimplements the semantics of the reference's CTC objective
(reference: src/net/ctc-loss.cc:101-195 EvalParallel and the CUDA kernels
src/gpucompute/cuda-kernels.cu:1332-1664 compute_ctc_{alpha,beta,error}),
re-designed for XLA:

- The reference launches one CUDA kernel per time step t, with one thread per
  expanded-label position, over time-interleaved rows (t*S + s).  Here the
  whole recursion is a single `lax.scan` over time on a batch-major
  [B, S] state, traced once and fused by XLA.
- The reference's gradient is y_k - (alpha*beta)/(y*pzx) composed with the
  softmax backprop (src/net/ctc-loss.cc:156-167), i.e. the gradient of the
  negative log-likelihood w.r.t. the *pre-softmax logits*:
      dL/dlogit[v] = softmax[v] - gamma[v].
  We expose exactly that through a custom VJP, so the model's output layer
  is a plain linear projection (no explicit Softmax layer needed on the
  forward path).
- Labels are expanded with interleaved blanks to the standard 2L+1 state
  lattice (src/net/ctc-loss.cc:117-131); the skip transition s-2 -> s is
  allowed only for label states whose label differs from the one two states
  back (the CTC repeat rule).

Everything is static-shape: labels are padded to a common Lmax, activations
to a common T; per-sequence lengths are carried as int arrays and applied
as masks, which is the XLA-friendly equivalent of the reference's
per-sequence length checks in the kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eesen_tpu.utils.math import LOG_ZERO, LOG_ZERO_THRESHOLD

Array = jax.Array


def expand_labels(labels: Array, blank_id: int = 0) -> Array:
    """Insert blanks: [l1..lL] (padded) -> [blank, l1, blank, l2, ..., blank].

    labels: [B, L] int32.  Returns [B, 2L+1] int32.  Padding positions simply
    hold blank in the expanded sequence; they are masked out of the recursion
    by `label_lengths`.  (reference: src/net/ctc-loss.cc:117-131)
    """
    b, l = labels.shape
    exp = jnp.full((b, 2 * l + 1), blank_id, dtype=labels.dtype)
    return exp.at[:, 1::2].set(labels)


def _shift_right(x: Array, n: int, fill: float) -> Array:
    """Shift along the last (state) axis: out[..., s] = x[..., s-n]."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n, 0)]
    return jnp.pad(x, pad, constant_values=fill)[..., : x.shape[-1]]


def _log_add(a: Array, b: Array) -> Array:
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    safe = hi > LOG_ZERO_THRESHOLD
    return jnp.where(safe, hi + jnp.log1p(jnp.exp(jnp.where(safe, lo - hi, 0.0))), LOG_ZERO)


def ctc_forward_backward(
    log_probs_e: Array,
    can_skip: Array,
    logit_lengths: Array,
    label_lengths: Array,
) -> Tuple[Array, Array, Array]:
    """Run the alpha/beta recursions on pre-gathered expanded-label scores.

    Args:
      log_probs_e: [B, T, S] log-prob of the expanded-label symbol at each
        frame (S = 2L+1), already gathered from the [B, T, V] log-softmax.
      can_skip: [B, S] bool — True where the s-2 -> s transition is allowed.
      logit_lengths: [B] int32 frames per sequence.
      label_lengths: [B] int32 labels per sequence (un-expanded).

    Returns:
      (loglik [B], alpha [B, T, S], beta [B, T, S]).
      gamma (state posteriors) = exp(alpha + beta - loglik), valid for
      t < logit_length.
    """
    bsz, t_max, s_max = log_probs_e.shape
    neg = jnp.float32(LOG_ZERO)
    can_skip_f = jnp.where(can_skip, 0.0, neg)  # additive mask

    # ---- alpha (forward), scanning t = 0..T-1; state frozen past seq end ----
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, s_max), 1)
    alpha0 = jnp.where(s_iota <= 1, log_probs_e[:, 0, :], neg)
    # sequences with zero labels may only start in the single blank state
    alpha0 = jnp.where(
        (label_lengths[:, None] == 0) & (s_iota > 0), neg, alpha0
    )

    def alpha_step(alpha, inp):
        lp_t, t = inp
        prev1 = _shift_right(alpha, 1, LOG_ZERO)
        prev2 = _shift_right(alpha, 2, LOG_ZERO) + can_skip_f
        a_new = lp_t + _log_add(_log_add(alpha, prev1), prev2)
        active = (t < logit_lengths)[:, None]
        a_new = jnp.where(active, a_new, alpha)
        return a_new, a_new

    ts = jnp.arange(1, t_max, dtype=jnp.int32)
    _, alpha_rest = jax.lax.scan(
        alpha_step, alpha0, (jnp.moveaxis(log_probs_e[:, 1:, :], 1, 0), ts)
    )
    alpha = jnp.concatenate(
        [alpha0[:, None, :], jnp.moveaxis(alpha_rest, 0, 1)], axis=1
    )

    # final log-likelihood: logsumexp of the last blank and last label state
    # at t = len-1 (alpha is frozen past the end, so read alpha[:, -1, :]).
    last_blank = 2 * label_lengths          # index of final blank state
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    a_fin = alpha[:, -1, :]
    fin_b = jnp.take_along_axis(a_fin, last_blank[:, None], axis=1)[:, 0]
    fin_l = jnp.take_along_axis(a_fin, last_label[:, None], axis=1)[:, 0]
    fin_l = jnp.where(label_lengths > 0, fin_l, neg)
    loglik = _log_add(fin_b, fin_l)

    # ---- beta (backward): beta[t] excludes frame t's emission ----
    # init at t = len-1: 0 at the two final states; recursion uses lp[t+1].
    is_final = (s_iota == last_blank[:, None]) | (
        (s_iota == last_label[:, None]) & (label_lengths[:, None] > 0)
    )
    beta_init_row = jnp.where(is_final, 0.0, neg)

    def beta_step(beta, inp):
        lp_next, t = inp  # lp_next = log_probs_e[:, t+1, :] (clamped at end)
        nxt = beta + lp_next
        nxt1 = _shift_left(nxt, 1)
        nxt2 = _shift_left(nxt, 2) + _shift_left_mask(can_skip_f, 2)
        b_new = _log_add(_log_add(nxt, nxt1), nxt2)
        t_col = t
        at_init = (t_col == logit_lengths - 1)[:, None]
        before_end = (t_col < logit_lengths - 1)[:, None]
        b_new = jnp.where(
            at_init, beta_init_row, jnp.where(before_end, b_new, neg)
        )
        return b_new, b_new

    ts_rev = jnp.arange(t_max - 1, -1, -1, dtype=jnp.int32)
    lp_next = jnp.moveaxis(
        log_probs_e[:, jnp.minimum(ts_rev + 1, t_max - 1), :], 1, 0
    )
    beta_last = jnp.full((bsz, s_max), neg, dtype=log_probs_e.dtype)
    _, beta_rev = jax.lax.scan(beta_step, beta_last, (lp_next, ts_rev))
    beta = jnp.moveaxis(beta_rev, 0, 1)[:, ::-1, :]

    return loglik, alpha, beta


def _shift_left(x: Array, n: int) -> Array:
    """out[..., s] = x[..., s+n], filling with LOG_ZERO."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n)]
    return jnp.pad(x, pad, constant_values=LOG_ZERO)[..., n:]


def _shift_left_mask(mask_f: Array, n: int) -> Array:
    """Shift the additive skip-mask so it indexes the *destination* state.

    The skip transition into state s+2 is allowed iff can_skip[s+2]; when
    combining from the perspective of source state s we need the mask of the
    target, i.e. can_skip shifted left by n.
    """
    pad = [(0, 0)] * (mask_f.ndim - 1) + [(0, n)]
    return jnp.pad(mask_f, pad, constant_values=LOG_ZERO)[..., n:]


def _forward_backward_pallas(
    lp_e, can_skip, logit_lengths, label_lengths, interpret: bool = False
):
    """Fused-kernel alpha/beta (ops/ctc_pallas) + the same final read as
    the XLA path."""
    from eesen_tpu.ops.ctc_pallas import ctc_alpha_beta_pallas

    bsz, t_max, s_max = lp_e.shape
    neg = jnp.float32(LOG_ZERO)
    can_skip_f = jnp.where(can_skip, 0.0, neg)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, s_max), 1)
    last_blank = 2 * label_lengths
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    is_final = (s_iota == last_blank[:, None]) | (
        (s_iota == last_label[:, None]) & (label_lengths[:, None] > 0)
    )
    beta_init_row = jnp.where(is_final, 0.0, neg)
    alpha, beta = ctc_alpha_beta_pallas(
        lp_e, can_skip_f, beta_init_row, logit_lengths, interpret=interpret
    )
    a_fin = alpha[:, -1, :]
    fin_b = jnp.take_along_axis(a_fin, last_blank[:, None], axis=1)[:, 0]
    fin_l = jnp.take_along_axis(a_fin, last_label[:, None], axis=1)[:, 0]
    fin_l = jnp.where(label_lengths > 0, fin_l, neg)
    loglik = _log_add(fin_b, fin_l)
    return loglik, alpha, beta


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss(
    logits: Array,
    logit_lengths: Array,
    labels: Array,
    label_lengths: Array,
    blank_id: int = 0,
) -> Array:
    """Negative log-likelihood per sequence, with the Eesen-composed gradient.

    Args:
      logits: [B, T, V] pre-softmax activations.
      logit_lengths: [B] int32 valid frames.
      labels: [B, L] int32 padded label sequences (values != blank_id).
      label_lengths: [B] int32 valid labels.
      blank_id: blank symbol id (the reference fixes blank = 0;
        src/net/ctc-loss.cc:117-131).

    Returns: [B] float32 — -log p(labels | logits).
    """
    nll, _ = _ctc_forward(logits, logit_lengths, labels, label_lengths, blank_id)
    return nll


def _ctc_prep(logits, logit_lengths, labels, label_lengths, blank_id):
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    elab = expand_labels(labels.astype(jnp.int32), blank_id)
    b, s = elab.shape
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    is_label = (s_iota % 2) == 1
    prev2_lab = _shift_right(elab.astype(jnp.float32), 2, -1.0).astype(jnp.int32)
    can_skip = is_label & (elab != prev2_lab) & (s_iota >= 2)
    # restrict to valid expanded positions (s < 2*label_len+1)
    valid_s = s_iota < (2 * label_lengths[:, None] + 1)
    lp_e = jnp.take_along_axis(log_probs, elab[:, None, :], axis=2)
    lp_e = jnp.where(valid_s[:, None, :], lp_e, LOG_ZERO)
    return log_probs, elab, can_skip, valid_s, lp_e


def _use_pallas_ctc() -> bool:
    import os

    mode = os.environ.get("EESEN_CTC_PALLAS", "auto")
    if mode == "never":
        return False
    if mode == "always":
        return True
    return jax.default_backend() == "tpu"


def _ctc_forward(logits, logit_lengths, labels, label_lengths, blank_id):
    log_probs, elab, can_skip, valid_s, lp_e = _ctc_prep(
        logits, logit_lengths, labels, label_lengths, blank_id
    )
    if _use_pallas_ctc():
        loglik, alpha, beta = _forward_backward_pallas(
            lp_e, can_skip, logit_lengths, label_lengths
        )
    else:
        loglik, alpha, beta = ctc_forward_backward(
            lp_e, can_skip, logit_lengths, label_lengths
        )
    nll = -loglik
    residuals = (log_probs, elab, valid_s, alpha, beta, loglik,
                 logit_lengths)
    return nll, residuals


def _ctc_fwd(logits, logit_lengths, labels, label_lengths, blank_id):
    nll, residuals = _ctc_forward(
        logits, logit_lengths, labels, label_lengths, blank_id
    )
    return nll, residuals


def _ctc_bwd(blank_id, residuals, g):
    (log_probs, elab, valid_s, alpha, beta, loglik, logit_lengths) = residuals
    b, t_max, v = log_probs.shape
    # state posteriors gamma[b, t, s] = exp(alpha + beta - loglik)
    log_gamma = alpha + beta - loglik[:, None, None]
    log_gamma = jnp.where(valid_s[:, None, :], log_gamma, LOG_ZERO)
    gamma = jnp.where(
        log_gamma > LOG_ZERO_THRESHOLD, jnp.exp(jnp.minimum(log_gamma, 0.0)), 0.0
    )
    # scatter state posteriors onto the vocabulary with a one-hot matmul
    # ([B,T,S] x [B,S,V] on the MXU rather than a serial scatter).
    onehot = jax.nn.one_hot(elab, v, dtype=gamma.dtype)  # [B, S, V]
    gamma_v = jnp.einsum("bts,bsv->btv", gamma, onehot)
    grad = jnp.exp(log_probs) - gamma_v  # d(-loglik)/d(logits)
    time_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
        < logit_lengths[:, None]
    )
    grad = grad * time_mask[:, :, None]
    grad = grad * g[:, None, None]
    return grad.astype(log_probs.dtype), None, None, None


ctc_loss.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_mean(
    logits: Array,
    logit_lengths: Array,
    labels: Array,
    label_lengths: Array,
    blank_id: int = 0,
    normalize: str = "frames",
) -> Array:
    """Scalar training loss: sum of per-seq NLL / (total frames | sequences).

    `normalize="frames"` matches the reference's per-frame objective
    reporting (src/net/ctc-loss.cc:180-194 obj/frames).
    """
    nll = ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id)
    if normalize == "frames":
        denom = jnp.maximum(jnp.sum(logit_lengths), 1).astype(nll.dtype)
    elif normalize == "sequences":
        denom = jnp.float32(nll.shape[0])
    else:
        denom = jnp.float32(1.0)
    return jnp.sum(nll) / denom
