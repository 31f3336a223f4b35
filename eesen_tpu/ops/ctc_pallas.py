"""CTC alpha/beta recursions as fused Pallas TPU kernels.

The XLA path (ops/ctc.py) runs two `lax.scan`s over time with a tiny
[B, S] state — per-iteration loop overhead dominates, the same way the
reference pays one CUDA launch per frame
(reference: src/net/ctc-loss.cc:139-146 launching
compute_ctc_alpha/beta_multiple_sequence per t,
src/gpucompute/cuda-kernels.cu:1369,1484).  Here each recursion is ONE
pallas_call with grid=(T,): the [B, S] state lives in VMEM scratch across
the sequential grid, per-step blocks stream through the Pallas pipeline.

The state dimension S = 2L+1 is padded to a lane multiple; the s-1 / s-2
shifts are lane rolls with edge masking.  Gradient composition (gamma ->
vocab scatter) stays in XLA (ops/ctc.py), which consumes the alpha/beta
tensors these kernels emit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eesen_tpu.utils.math import LOG_ZERO, LOG_ZERO_THRESHOLD

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _log_add(a, b):
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    safe = hi > LOG_ZERO_THRESHOLD
    return jnp.where(
        safe, hi + jnp.log1p(jnp.exp(jnp.where(safe, lo - hi, 0.0))),
        LOG_ZERO,
    )


def _shift_right_lanes(x: Array, n: int) -> Array:
    """out[:, s] = x[:, s-n] with LOG_ZERO fill (lane roll + edge mask)."""
    rolled = pltpu.roll(x, shift=n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= n, rolled, LOG_ZERO)


def _shift_left_lanes(x: Array, n: int) -> Array:
    # negative shifts are disallowed; roll by (size - n) is equivalent
    rolled = pltpu.roll(x, shift=x.shape[1] - n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < x.shape[1] - n, rolled, LOG_ZERO)


def _alpha_kernel(
    lp_ref,        # [1, B, S] this frame's expanded-label log-probs
    skip_ref,      # [B, S] additive skip mask (0 / LOG_ZERO)
    len_ref,       # [B, 1] f32 lengths
    alpha_out,     # [1, B, S]
    carry,         # [B, S] scratch
):
    t = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, carry.shape, 1)

    @pl.when(t == 0)
    def _():
        carry[:] = jnp.where(lane <= 1, lp_ref[0], LOG_ZERO)

    @pl.when(t > 0)
    def _():
        a = carry[:]
        prev1 = _shift_right_lanes(a, 1)
        prev2 = _shift_right_lanes(a, 2) + skip_ref[:]
        new = lp_ref[0] + _log_add(_log_add(a, prev1), prev2)
        active = (t < len_ref[:]).astype(jnp.float32)      # [B, 1]
        carry[:] = new * active + a * (1.0 - active)

    alpha_out[0] = carry[:]


def _beta_kernel(
    lp_next_ref,   # [1, B, S] log-probs at t+1 (clamped at the end)
    skip_ref,      # [B, S] additive skip mask shifted to source view
    init_ref,      # [B, S] beta init row (0 at final states, LOG_ZERO else)
    len_ref,       # [B, 1] f32
    t_ref,         # [1, 1] f32 in SMEM-like block: actual time index
    beta_out,      # [1, B, S]
    carry,         # [B, S]
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[:] = jnp.full_like(carry, LOG_ZERO)

    t = t_ref[0, 0]
    b = carry[:]
    nxt = b + lp_next_ref[0]
    nxt1 = _shift_left_lanes(nxt, 1)
    nxt2 = _shift_left_lanes(nxt, 2) + skip_ref[:]
    rec = _log_add(_log_add(nxt, nxt1), nxt2)
    lens = len_ref[:]                                   # [B, 1]
    at_init = t == lens - 1.0
    before = t < lens - 1.0
    new = jnp.where(
        at_init, init_ref[:],
        jnp.where(before, rec, LOG_ZERO),
    )
    carry[:] = new
    beta_out[0] = new


def ctc_alpha_beta_pallas(
    lp_e: Array,          # [B, T, S] expanded-label log-probs
    can_skip_f: Array,    # [B, S] additive skip mask (0 / LOG_ZERO)
    beta_init_row: Array,  # [B, S]
    logit_lengths: Array,  # [B]
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Run both recursions; returns (alpha [B,T,S], beta [B,T,S])."""
    bsz, t_max, s = lp_e.shape
    sp = _round_up(max(s, 128), 128)
    bp = _round_up(bsz, 8)

    def pad(x, fill):
        return jnp.pad(
            x, ((0, bp - bsz), (0, 0), (0, sp - s))
            if x.ndim == 3 else ((0, bp - bsz), (0, sp - s)),
            constant_values=fill,
        )

    lp_p = jnp.moveaxis(pad(lp_e, LOG_ZERO), 1, 0)       # [T, Bp, Sp]
    skip_p = pad(can_skip_f, LOG_ZERO)
    init_p = pad(beta_init_row, LOG_ZERO)
    len_p = jnp.zeros((bp, 1), jnp.float32).at[:bsz, 0].set(
        logit_lengths.astype(jnp.float32)
    )

    alpha = pl.pallas_call(
        _alpha_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, bp, sp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, sp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp, sp), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, bp, sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, sp), jnp.float32)],
        interpret=interpret,
    )(lp_p, skip_p, len_p)

    # beta runs the grid reversed; lp_next[t] = lp[t+1] clamped
    rev = lambda t: (t_max - 1 - t, 0, 0)
    lp_next = jnp.concatenate([lp_p[1:], lp_p[-1:]], axis=0)
    skip_shift = jnp.where(
        _host_shift_left(can_skip_f, 2, s) > LOG_ZERO_THRESHOLD, 0.0,
        LOG_ZERO,
    )
    skip_shift = pad(skip_shift, LOG_ZERO)
    ts = jnp.arange(t_max, dtype=jnp.float32).reshape(t_max, 1, 1)

    beta_rev = pl.pallas_call(
        _beta_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, bp, sp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, sp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, sp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp, sp), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, bp, sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, sp), jnp.float32)],
        interpret=interpret,
    )(lp_next, skip_shift, init_p, len_p, ts)

    alpha = jnp.moveaxis(alpha, 0, 1)[:bsz, :, :s]
    beta = jnp.moveaxis(beta_rev, 0, 1)[:bsz, :, :s]
    return alpha, beta


def _host_shift_left(mask_f: Array, n: int, s: int) -> Array:
    pad = [(0, 0)] * (mask_f.ndim - 1) + [(0, n)]
    return jnp.pad(mask_f, pad, constant_values=LOG_ZERO)[..., n:]
