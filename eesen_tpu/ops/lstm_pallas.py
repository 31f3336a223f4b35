"""Fused LSTM recurrence as a Pallas TPU kernel.

The acoustic model's hot loop is the per-timestep recurrent matmul
([B, H] x [H, 4H] inside `lax.scan`) — the reference pays the same cost as
per-frame CUDA launches of small GEMMs (reference:
src/net/bilstm-parallel-layer.h:97-150 per-t loop).  XLA's while-loop has
per-iteration overhead and cannot keep the recurrent weights pinned; this
kernel runs the WHOLE time loop in one pallas_call:

- grid = (T,): Pallas iterates sequentially on a TPU core, so VMEM scratch
  (the h/c state) persists across steps; the recurrent weight matrix
  [Hp, 4Hp] (bf16) stays resident in VMEM for all T steps;
- per step: one MXU matmul (m @ w_m) + VPU gate math, with the
  per-timestep xw block ([B, 4Hp]) streamed in and outputs streamed out by
  the Pallas pipeline (auto double-buffered);
- the backward pass is a second kernel running the reversed grid,
  accumulating dW/db/dpeephole in VMEM scratch and emitting per-step dxw,
  wired in via custom_vjp.

Gate order is GIFO (g, i, f, o) as everywhere in this codebase
(reference: src/net/lstm-layer.h:70-73).  H and B are padded to hardware
tiles (H -> multiple of 128 lanes, B -> multiple of 8 sublanes) by the
wrapper; length masking follows the same freeze-state/zero-output
semantics as models/bilstm._direction_scan.  Recurrent dropout is not
supported here — the caller falls back to the XLA scan when it is active.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(
    xw_ref,      # [1, B, 4Hp] f32  (this step's input projection + bias)
    mask_ref,    # [1, B, 1] f32
    w_ref,       # [Hp, 4Hp] bf16   (resident)
    ph_ref,      # [3, Hp] f32      (peepholes i, f, o)
    m_out_ref,   # [1, B, Hp] f32   (m_carry)
    c_out_ref,   # [1, B, Hp] f32   (c_carry)
    craw_ref,    # [1, B, Hp] f32
    gates_ref,   # [1, B, 4Hp] bf16 (post-activation g,i,f,o)
    m_scr,       # [B, Hp] f32 scratch (carried m)
    c_scr,       # [B, Hp] f32 scratch (carried c)
):
    t = pl.program_id(0)
    hp = m_scr.shape[1]

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.zeros_like(m_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    m_prev = m_scr[:]
    c_prev = c_scr[:]
    gifo = xw_ref[0] + jnp.dot(
        m_prev.astype(jnp.bfloat16), w_ref[:],
        preferred_element_type=jnp.float32,
    )
    g = jnp.tanh(gifo[:, 0 * hp : 1 * hp])
    i = jax.nn.sigmoid(gifo[:, 1 * hp : 2 * hp] + c_prev * ph_ref[0, :])
    f = jax.nn.sigmoid(gifo[:, 2 * hp : 3 * hp] + c_prev * ph_ref[1, :])
    c_raw = f * c_prev + i * g
    o = jax.nn.sigmoid(gifo[:, 3 * hp : 4 * hp] + c_raw * ph_ref[2, :])
    m_raw = o * jnp.tanh(c_raw)

    mt = mask_ref[0]                       # [B, 1]
    c_new = c_raw * mt + c_prev * (1.0 - mt)
    m_new = m_raw * mt + m_prev * (1.0 - mt)
    m_scr[:] = m_new
    c_scr[:] = c_new
    m_out_ref[0] = m_new
    c_out_ref[0] = c_new
    craw_ref[0] = c_raw
    gates_ref[0] = jnp.concatenate([g, i, f, o], axis=1).astype(jnp.bfloat16)


def _bwd_kernel(
    mask_ref,    # [1, B, 1]
    gates_ref,   # [1, B, 4Hp] bf16
    craw_ref,    # [1, B, Hp]
    cprev_ref,   # [1, B, Hp]  (c_carry at t-1; zeros block at t=0)
    gm_ref,      # [1, B, Hp]  cotangent of m_carry[t]
    w_ref,       # [Hp, 4Hp] bf16
    ph_ref,      # [3, Hp]
    dxw_ref,     # [1, B, 4Hp] out
    dm_scr,      # [B, Hp] carry
    dc_scr,      # [B, Hp] carry
):
    """Minimal recurrence-only backward: emits per-step pre-activation
    grads (dgifo) and keeps nothing else resident, so VMEM stays bounded
    at any H — dW/dphole are one-shot XLA matmuls over the emitted dxw
    sequence (see _lstm_scan_bwd), which is also more MXU-efficient than
    T rank-B accumulations."""
    pid = pl.program_id(0)
    hp = dm_scr.shape[1]

    @pl.when(pid == 0)
    def _():
        dm_scr[:] = jnp.zeros_like(dm_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    gates = gates_ref[0].astype(jnp.float32)
    g = gates[:, 0 * hp : 1 * hp]
    i = gates[:, 1 * hp : 2 * hp]
    f = gates[:, 2 * hp : 3 * hp]
    o = gates[:, 3 * hp : 4 * hp]
    c_raw = craw_ref[0]
    c_prev = cprev_ref[0]
    mt = mask_ref[0]                       # [B, 1]
    tanh_c = jnp.tanh(c_raw)

    dm_total = (gm_ref[0] + dm_scr[:])
    dm_raw = dm_total * mt
    dm_prev_pass = dm_total * (1.0 - mt)
    dc_in = dc_scr[:]
    dc_raw = dc_in * mt
    dc_prev_pass = dc_in * (1.0 - mt)

    do = dm_raw * tanh_c
    dc_raw = dc_raw + dm_raw * o * (1.0 - tanh_c * tanh_c)
    do_pre = do * o * (1.0 - o)
    dc_raw = dc_raw + do_pre * ph_ref[2, :]
    di_pre = dc_raw * g * i * (1.0 - i)
    df_pre = dc_raw * c_prev * f * (1.0 - f)
    dg_pre = dc_raw * i * (1.0 - g * g)
    dc_prev = (
        dc_raw * f + di_pre * ph_ref[0, :] + df_pre * ph_ref[1, :]
        + dc_prev_pass
    )
    dgifo = jnp.concatenate([dg_pre, di_pre, df_pre, do_pre], axis=1)

    dm_in = jnp.dot(
        dgifo.astype(jnp.bfloat16), w_ref[:].T,
        preferred_element_type=jnp.float32,
    )
    dm_scr[:] = dm_in + dm_prev_pass
    dc_scr[:] = dc_prev

    dxw_ref[0] = dgifo


# --------------------------------------------------------------------------
# host-side wrappers (padding + pallas_call plumbing)
# --------------------------------------------------------------------------

def _fwd_call(xw, mask, w_m, ph, interpret):
    t_max, b, fourhp = xw.shape
    hp = fourhp // 4
    grid = (t_max,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b, fourhp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fourhp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, hp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, fourhp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, fourhp), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hp), jnp.float32),
            pltpu.VMEM((b, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_LIMIT),
        ),
        interpret=interpret,
    )(xw, mask, w_m, ph)
    return out


def _bwd_call(mask, gates, craw, cprev_seq, gm, w_m, ph, interpret):
    t_max, b, fourhp = gates.shape
    hp = fourhp // 4
    rev = lambda t: (t_max - 1 - t, 0, 0)

    dxw = pl.pallas_call(
        _bwd_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, fourhp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fourhp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, fourhp), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, b, fourhp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, hp), jnp.float32),
            pltpu.VMEM((b, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_LIMIT),
        ),
        interpret=interpret,
    )(mask, gates, craw, cprev_seq, gm, w_m, ph)
    return dxw


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan(
    xw: Array,       # [T, B, 4Hp] f32 (input projection + bias, GIFO blocks)
    mask: Array,     # [T, B, 1] f32
    w_m: Array,      # [Hp, 4Hp] bf16/f32
    ph: Array,       # [3, Hp] f32 (peepholes i, f, o)
    interpret: bool = False,
) -> Array:
    """Run the fused recurrence; returns m_carry [T, B, Hp] f32
    (equal to the masked output except at padded steps, which callers mask
    anyway)."""
    m, _, _, _ = _fwd_call(
        xw, mask, w_m.astype(jnp.bfloat16), ph, interpret
    )
    return m


def _lstm_scan_fwd(xw, mask, w_m, ph, interpret):
    w_bf = w_m.astype(jnp.bfloat16)
    m, c, craw, gates = _fwd_call(xw, mask, w_bf, ph, interpret)
    return m, (mask, gates, craw, c, m, w_bf, ph)


def _lstm_scan_bwd(interpret, res, gm):
    mask, gates, craw, ccarry, mcarry, w_bf, ph = res
    t_max, b, fourhp = gates.shape
    hp = fourhp // 4
    # carry sequences shifted by one step (zeros = initial state at t=0)
    zeros_row = jnp.zeros((1, b, hp), jnp.float32)
    cprev = jnp.concatenate([zeros_row, ccarry[:-1]], axis=0)
    dxw = _bwd_call(mask, gates, craw, cprev, gm, w_bf, ph, interpret)
    # Weight grads from the emitted dgifo sequence as one-shot XLA
    # matmuls/reductions (MXU-efficient; keeps the kernel's VMEM bounded
    # at any H).  The bias gradient folds into dxw at the caller (xw
    # includes the bias).
    mprev = jnp.concatenate([zeros_row, mcarry[:-1]], axis=0)
    dw = jnp.einsum(
        "tbh,tbk->hk", mprev.astype(jnp.bfloat16),
        dxw.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    di_pre = dxw[:, :, 1 * hp : 2 * hp]
    df_pre = dxw[:, :, 2 * hp : 3 * hp]
    do_pre = dxw[:, :, 3 * hp : 4 * hp]
    dph = jnp.stack([
        jnp.sum(di_pre * cprev, axis=(0, 1)),
        jnp.sum(df_pre * cprev, axis=(0, 1)),
        jnp.sum(do_pre * craw, axis=(0, 1)),
    ])
    return dxw, None, dw, dph


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


# --------------------------------------------------------------------------
# fused-projection kernel (v2)
#
# The v1 kernel above streams a precomputed xw = x @ W_x + b ([T, B, 4Hp]
# f32) from HBM — ~4x more input traffic than streaming x itself, plus a
# full HBM materialization of xw by XLA, plus a second [T, B, 4Hp] f32
# round trip for dxw on the backward pass.  v2 instead:
#
# - keeps BOTH weight matrices (W_x [Dp, 4Hp] and W_m [Hp, 4Hp], bf16)
#   resident in VMEM and streams x ([T, B, Dp] bf16);
# - processes `block_t` time steps per grid step: the input projection for
#   the whole block is ONE large MXU matmul ([BT*B, Dp] x [Dp, 4Hp]), and
#   the per-step work is just the recurrent matmul + VPU gate math;
# - drops the c_raw residual (recomputed in the backward kernel from the
#   stored gates and the c carry);
# - the backward kernel emits dx (= dgifo @ W_x^T) and accumulates dW_x
#   (= x^T dgifo) in VMEM, so no [T, B, 4Hp] dxw ever touches HBM.
#
# Reference semantics unchanged: src/net/bilstm-parallel-layer.h:97-150
# per-t loop, GIFO gate order (src/net/lstm-layer.h:70-73).
# --------------------------------------------------------------------------


def _fused_fwd_kernel(
    x_ref,       # [BT, B, Dp] bf16 (this block's inputs)
    mask_ref,    # [BT, B, 1] f32
    wx_ref,      # [Dp, 4Hp] bf16   (resident)
    b_ref,       # [1, 4Hp] f32     (resident)
    wm_ref,      # [Hp, 4Hp] bf16   (resident)
    ph_ref,      # [3, Hp] f32      (peepholes i, f, o)
    m_out_ref,   # [BT, B, Hp] f32  (m_carry)
    c_out_ref,   # [BT, B, Hp] f32  (c_carry)
    gates_ref,   # [BT, B, 4Hp] bf16 (post-activation g,i,f,o)
    m_scr,       # [B, Hp] f32 scratch (carried m)
    c_scr,       # [B, Hp] f32 scratch (carried c)
):
    blk = pl.program_id(0)
    bt, b, dp = x_ref.shape
    hp = m_scr.shape[1]

    @pl.when(blk == 0)
    def _():
        m_scr[:] = jnp.zeros_like(m_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    # input projection for the whole block: one big MXU matmul
    xw_all = jnp.dot(
        x_ref[:].reshape(bt * b, dp), wx_ref[:],
        preferred_element_type=jnp.float32,
    ) + b_ref[0, :]                       # [BT*B, 4Hp]

    for i in range(bt):
        m_prev = m_scr[:]
        c_prev = c_scr[:]
        gifo = xw_all[i * b : (i + 1) * b] + jnp.dot(
            m_prev.astype(jnp.bfloat16), wm_ref[:],
            preferred_element_type=jnp.float32,
        )
        g = jnp.tanh(gifo[:, 0 * hp : 1 * hp])
        ig = jax.nn.sigmoid(gifo[:, 1 * hp : 2 * hp] + c_prev * ph_ref[0, :])
        f = jax.nn.sigmoid(gifo[:, 2 * hp : 3 * hp] + c_prev * ph_ref[1, :])
        c_raw = f * c_prev + ig * g
        o = jax.nn.sigmoid(gifo[:, 3 * hp : 4 * hp] + c_raw * ph_ref[2, :])
        m_raw = o * jnp.tanh(c_raw)

        mt = mask_ref[i]                  # [B, 1]
        c_new = c_raw * mt + c_prev * (1.0 - mt)
        m_new = m_raw * mt + m_prev * (1.0 - mt)
        # carries stay f32 in VMEM (the cell accumulator); the streamed
        # outputs may be bf16 (state_bf16 mode) to cut HBM write traffic
        m_scr[:] = m_new
        c_scr[:] = c_new
        m_out_ref[i] = m_new.astype(m_out_ref.dtype)
        c_out_ref[i] = c_new.astype(c_out_ref.dtype)
        gates_ref[i] = jnp.concatenate(
            [g, ig, f, o], axis=1
        ).astype(jnp.bfloat16)


def _fused_bwd_kernel(
    x_ref,       # [BT, B, Dp] bf16
    mask_ref,    # [BT, B, 1] f32
    gates_ref,   # [BT, B, 4Hp] bf16
    c_ref,       # [BT, B, Hp] f32  (c_carry rows of this block)
    m_ref,       # [BT, B, Hp] f32  (m_carry rows of this block)
    cl_ref,      # [1, B, Hp] f32   (c_carry at the row before this block)
    ml_ref,      # [1, B, Hp] f32   (m_carry at the row before this block)
    gm_ref,      # [BT, B, Hp] f32  (cotangent of m_carry)
    wx_ref,      # [Dp, 4Hp] bf16
    wm_ref,      # [Hp, 4Hp] bf16
    ph_ref,      # [3, Hp] f32
    dx_ref,      # [BT, B, Dp] bf16 out
    dwx_ref,     # [Dp, 4Hp] f32 out (accumulated in place: constant index
                 #               map keeps the block VMEM-resident for the
                 #               whole sequential grid)
    dwm_ref,     # [Hp, 4Hp] f32 out (same)
    db_ref,      # [1, 4Hp] f32 out (same)
    dph_ref,     # [3, Hp] f32 out (same)
    dm_scr,      # [B, Hp] carry
    dc_scr,      # [B, Hp] carry
    dgifo_scr,   # [BT*B, 4Hp] bf16 (per-block pre-activation grads; only
                 #                   feeds the bf16 dx/dwx matmuls)
):
    k = pl.program_id(0)
    n = pl.num_programs(0)
    bt, b, dp = x_ref.shape
    hp = dm_scr.shape[1]

    @pl.when(k == 0)
    def _():
        dm_scr[:] = jnp.zeros_like(dm_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwm_ref[:] = jnp.zeros_like(dwm_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dph_ref[:] = jnp.zeros_like(dph_ref)

    # 0.0 when this is the first (original-time) block, so the "previous
    # row" reads (clamped to row 0 by the index map) become zeros — the
    # initial state.
    prev_flag = jnp.where(k == n - 1, 0.0, 1.0).astype(jnp.float32)

    for i in range(bt - 1, -1, -1):
        gates = gates_ref[i].astype(jnp.float32)
        g = gates[:, 0 * hp : 1 * hp]
        ig = gates[:, 1 * hp : 2 * hp]
        f = gates[:, 2 * hp : 3 * hp]
        o = gates[:, 3 * hp : 4 * hp]
        if i > 0:
            c_prev = c_ref[i - 1].astype(jnp.float32)
            m_prev = m_ref[i - 1].astype(jnp.float32)
        else:
            c_prev = cl_ref[0].astype(jnp.float32) * prev_flag
            m_prev = ml_ref[0].astype(jnp.float32) * prev_flag
        c_raw = f * c_prev + ig * g       # recomputed residual
        mt = mask_ref[i]                  # [B, 1]
        tanh_c = jnp.tanh(c_raw)

        dm_total = gm_ref[i].astype(jnp.float32) + dm_scr[:]
        dm_raw = dm_total * mt
        dm_prev_pass = dm_total * (1.0 - mt)
        dc_in = dc_scr[:]
        dc_raw = dc_in * mt
        dc_prev_pass = dc_in * (1.0 - mt)

        do = dm_raw * tanh_c
        dc_raw = dc_raw + dm_raw * o * (1.0 - tanh_c * tanh_c)
        do_pre = do * o * (1.0 - o)
        dc_raw = dc_raw + do_pre * ph_ref[2, :]
        di_pre = dc_raw * g * ig * (1.0 - ig)
        df_pre = dc_raw * c_prev * f * (1.0 - f)
        dg_pre = dc_raw * ig * (1.0 - g * g)
        dc_prev = (
            dc_raw * f + di_pre * ph_ref[0, :] + df_pre * ph_ref[1, :]
            + dc_prev_pass
        )
        dgifo = jnp.concatenate([dg_pre, di_pre, df_pre, do_pre], axis=1)

        dm_in = jnp.dot(
            dgifo.astype(jnp.bfloat16), wm_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        dm_scr[:] = dm_in + dm_prev_pass
        dc_scr[:] = dc_prev
        dgifo_scr[i * b : (i + 1) * b] = dgifo.astype(jnp.bfloat16)
        dwm_ref[:] += jnp.dot(
            m_prev.astype(jnp.bfloat16).T, dgifo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        db_ref[0, :] += jnp.sum(dgifo, axis=0)
        dph_ref[0, :] += jnp.sum(di_pre * c_prev, axis=0)
        dph_ref[1, :] += jnp.sum(df_pre * c_prev, axis=0)
        dph_ref[2, :] += jnp.sum(do_pre * c_raw, axis=0)

    # block-level input grads: two big MXU matmuls
    dgifo_all = dgifo_scr[:]                          # [BT*B, 4Hp] bf16
    dx_ref[:] = jnp.dot(
        dgifo_all, wx_ref[:].T, preferred_element_type=jnp.float32,
    ).reshape(bt, b, dp).astype(jnp.bfloat16)
    dwx_ref[:] += jnp.dot(
        x_ref[:].reshape(bt * b, dp).T, dgifo_all,
        preferred_element_type=jnp.float32,
    )


def _fused_fwd_call(x, mask, wx_bf, bias, wm_bf, ph, block_t, interpret,
                    state_dtype=jnp.float32):
    t_max, b, dp = x.shape
    fourhp = wm_bf.shape[1]
    hp = fourhp // 4
    nblk = t_max // block_t
    bt = block_t
    out = pl.pallas_call(
        _fused_fwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bt, b, dp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, 1), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, b, hp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, hp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, fourhp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, hp), state_dtype),
            jax.ShapeDtypeStruct((t_max, b, hp), state_dtype),
            jax.ShapeDtypeStruct((t_max, b, fourhp), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hp), jnp.float32),
            pltpu.VMEM((b, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_LIMIT),
        ),
        interpret=interpret,
    )(x, mask, wx_bf, bias, wm_bf, ph)
    return out


def _fused_bwd_call(
    x, mask, gates, ccarry, mcarry, gm, wx_bf, wm_bf, ph, block_t, interpret
):
    t_max, b, dp = x.shape
    fourhp = wm_bf.shape[1]
    hp = fourhp // 4
    bt = block_t
    nblk = t_max // bt
    rev = lambda k: (nblk - 1 - k, 0, 0)
    # the single carry row preceding this block (clamped to row 0; the
    # kernel zeroes it via prev_flag when processing the first block)
    prev_row = lambda k: (jnp.maximum((nblk - 1 - k) * bt - 1, 0), 0, 0)

    out = pl.pallas_call(
        _fused_bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bt, b, dp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, fourhp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), prev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hp), prev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, b, dp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourhp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, dp), jnp.bfloat16),
            jax.ShapeDtypeStruct((dp, fourhp), jnp.float32),
            jax.ShapeDtypeStruct((hp, fourhp), jnp.float32),
            jax.ShapeDtypeStruct((1, fourhp), jnp.float32),
            jax.ShapeDtypeStruct((3, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hp), jnp.float32),
            pltpu.VMEM((b, hp), jnp.float32),
            pltpu.VMEM((bt * b, fourhp), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_LIMIT),
        ),
        interpret=interpret,
    )(x, mask, gates, ccarry, mcarry, ccarry, mcarry, gm, wx_bf, wm_bf, ph)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def lstm_fused(
    x: Array,        # [T, B, Dp] bf16 (padded; T divisible by block_t)
    mask: Array,     # [T, B, 1] f32
    w_x: Array,      # [Dp, 4Hp] (cast to bf16 internally)
    bias: Array,     # [1, 4Hp] f32
    w_m: Array,      # [Hp, 4Hp]
    ph: Array,       # [3, Hp] f32 (peepholes i, f, o)
    block_t: int = 8,
    interpret: bool = False,
    state_bf16: bool = False,
) -> Array:
    """Fully fused LSTM direction (input projection + recurrence); returns
    m_carry [T, B, Hp] (f32, or bf16 with state_bf16=True — the streamed
    m/c state traffic halves while the in-VMEM cell accumulator stays
    f32; consumers cast to compute dtype anyway)."""
    m, _, _ = _fused_fwd_call(
        x, mask, w_x.astype(jnp.bfloat16), bias,
        w_m.astype(jnp.bfloat16), ph, block_t, interpret,
        jnp.bfloat16 if state_bf16 else jnp.float32,
    )
    return m


def _lstm_fused_fwd(x, mask, w_x, bias, w_m, ph, block_t, interpret,
                    state_bf16):
    wx_bf = w_x.astype(jnp.bfloat16)
    wm_bf = w_m.astype(jnp.bfloat16)
    m, c, gates = _fused_fwd_call(
        x, mask, wx_bf, bias, wm_bf, ph, block_t, interpret,
        jnp.bfloat16 if state_bf16 else jnp.float32,
    )
    return m, (x, mask, gates, c, m, wx_bf, wm_bf, ph)


# VMEM budget for kernel sizing.  The DEFAULT scoped-vmem limit is
# 16MB, but the physical VMEM on the target parts is far larger (v5e:
# 128 MiB/core) and Mosaic accepts an explicit vmem_limit_bytes — the
# beam recombination kernel (ops/beam_pallas.py) has run at a 100 MiB
# limit on this platform since round 2.  Every lstm pallas_call now
# passes _VMEM_LIMIT, and the sizing estimators budget against
# _VMEM_BUDGET (headroom below the limit for Mosaic temporaries).
# This is what lets the LibriSpeech 4x640 config (stacked 2H inputs:
# the four resident weight/weight-grad buffers alone are ~30 MiB) train
# through the fully fused path instead of the v1 fallback (round-3
# limitation), and lets H=320 B=128 run bigger time blocks whose
# block-level dx/dwx matmuls have 8x taller MXU operands.
#
# The limit is derived from the detected device generation: 100 MiB on
# parts with 128 MiB physical VMEM (v4/v5/v6/v7 families, measured on
# v5e), the conservative 16 MiB scoped default otherwise — so on small-
# VMEM generations the estimators route big shapes to the v1 fallback
# instead of failing at Mosaic compile time.


def _detect_vmem_limit() -> int:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001 - no devices/backend: conservative
        return 16 * 2**20
    for tag in ("v4", "v5", "v6", "v7"):
        if tag in kind:
            return 100 * 2**20
    if "tpu" in kind:      # v2/v3 and unknown TPU parts: 16 MiB VMEM
        return 16 * 2**20
    return 100 * 2**20     # CPU interpret / non-TPU: limit is nominal


class _LazyVmem:
    """Module-level ints resolved on first use (device query at import
    time would initialize the backend too early)."""

    _limit: Optional[int] = None

    @classmethod
    def limit(cls) -> int:
        if cls._limit is None:
            cls._limit = _detect_vmem_limit()
        return cls._limit

    @classmethod
    def budget(cls) -> int:
        return cls.limit() - 12 * 2**20 if cls.limit() > 32 * 2**20 \
            else cls.limit() - 4 * 2**20


class _VmemInt:
    """Int-like proxy so existing `vmem_limit_bytes=int(_VMEM_LIMIT)` call
    sites keep working unchanged."""

    def __init__(self, fn):
        self._fn = fn

    def __index__(self) -> int:
        return self._fn()

    def __int__(self) -> int:
        return self._fn()

    # comparisons/arithmetic the estimators use
    def __le__(self, other):
        return self._fn() <= other

    def __lt__(self, other):
        return self._fn() < other

    def __ge__(self, other):
        return self._fn() >= other

    def __gt__(self, other):
        return self._fn() > other

    def __rsub__(self, other):
        return other - self._fn()

    def __sub__(self, other):
        return self._fn() - other


_VMEM_LIMIT = _VmemInt(_LazyVmem.limit)
_VMEM_BUDGET = _VmemInt(_LazyVmem.budget)


def _fwd_vmem_bytes(bt: int, b: int, dp: int, hp: int) -> int:
    """Rough VMEM footprint of the fused forward kernel: resident weights
    + double-buffered streamed blocks + carry scratch."""
    fourhp = 4 * hp
    fixed = dp * fourhp * 2 + hp * fourhp * 2      # wx, wm bf16
    per_block = (
        bt * b * dp * 2          # x bf16
        + bt * b * 4             # mask f32
        + 2 * bt * b * hp * 4    # m, c outputs f32
        + bt * b * fourhp * 2    # gates output bf16
    )
    scratch = 2 * b * hp * 4     # m/c carries
    return fixed + 2 * per_block + scratch


def _bwd_vmem_bytes(bt: int, b: int, dp: int, hp: int) -> int:
    """Rough VMEM footprint of the fused backward kernel.  dwx/dwm are
    accumulated in place in their (constant-index-map, single-buffered)
    output blocks; streamed blocks are double-buffered."""
    fourhp = 4 * hp
    fixed = (
        dp * fourhp * 2      # wx bf16
        + hp * fourhp * 2    # wm bf16
        + dp * fourhp * 4    # dwx out f32 (in-place accumulator)
        + hp * fourhp * 4    # dwm out f32 (in-place accumulator)
    )
    per_block = (
        bt * b * dp * 2        # x bf16
        + bt * b * 4           # mask f32
        + bt * b * fourhp * 2  # gates bf16
        + 3 * bt * b * hp * 4  # c, m, gm f32
        + 2 * b * hp * 4       # prev-row c/m blocks f32
        + bt * b * dp * 2      # dx out bf16
    )
    scratch = (
        2 * b * hp * 4           # dm/dc carries
        + bt * b * fourhp * 2    # dgifo_scr bf16
    )
    return fixed + 2 * per_block + scratch


def fused_block_ts(b: int, d: int, h: int, block_t: int = 8):
    """Choose (forward, backward) block_t for the fused kernel at padded
    tile sizes, or None if even block_t=1 exceeds the VMEM budget (the
    caller should fall back to the v1 xw-streaming path, whose kernel
    VMEM is bounded at any H)."""
    hp = _round_up(h, 128)
    dp = _round_up(d, 128)
    bp = _round_up(b, 8)
    bt_f, bt_b = block_t, block_t
    while bt_f > 1 and _fwd_vmem_bytes(bt_f, bp, dp, hp) > _VMEM_BUDGET:
        bt_f //= 2
    while bt_b > 1 and _bwd_vmem_bytes(bt_b, bp, dp, hp) > _VMEM_BUDGET:
        bt_b //= 2
    if (_fwd_vmem_bytes(bt_f, bp, dp, hp) > _VMEM_BUDGET
            or _bwd_vmem_bytes(bt_b, bp, dp, hp) > _VMEM_BUDGET):
        return None
    return bt_f, bt_b


def _lstm_fused_bwd(block_t, interpret, state_bf16, res, gm):
    x, mask, gates, c, m, wx_bf, wm_bf, ph = res
    t_max, b, dp = x.shape
    hp = wm_bf.shape[0]
    bt = block_t
    while bt > 1 and _bwd_vmem_bytes(bt, b, dp, hp) > _VMEM_BUDGET:
        bt //= 2
    dx, dwx, dwm, db, dph = _fused_bwd_call(
        x, mask, gates, c, m, gm, wx_bf, wm_bf, ph, bt, interpret
    )
    return (
        dx, None, dwx.astype(jnp.float32), db, dwm.astype(jnp.float32), dph
    )


lstm_fused.defvjp(_lstm_fused_fwd, _lstm_fused_bwd)


def lstm_direction_fused(
    x: Array,        # [B, T, D] (already time-reversed for the bw direction)
    mask: Array,     # [B, T] f32
    w_gifo_x: Array,  # [D, 4, H]
    bias: Array,      # [4, H]
    w_gifo_m: Array,  # [H, 4, H]
    ph_i: Array, ph_f: Array, ph_o: Array,  # [H]
    block_t: int = 8,
    interpret: bool = False,
    state_bf16: bool = False,
) -> Array:
    """Batch-major wrapper over lstm_direction_fused_tm.
    Returns m [B, T, H] f32."""
    m = lstm_direction_fused_tm(
        jnp.moveaxis(x, 0, 1), jnp.moveaxis(mask, 0, 1),
        w_gifo_x, bias, w_gifo_m, ph_i, ph_f, ph_o, block_t, interpret,
        state_bf16,
    )
    return jnp.moveaxis(m, 0, 1)


def lstm_direction_fused_tm(
    x: Array,        # [T, B, D] (already time-flipped for the bw direction)
    mask: Array,     # [T, B] f32
    w_gifo_x: Array,  # [D, 4, H]
    bias: Array,      # [4, H]
    w_gifo_m: Array,  # [H, 4, H]
    ph_i: Array, ph_f: Array, ph_o: Array,  # [H]
    block_t: int = 8,
    interpret: bool = False,
    state_bf16: bool = False,
) -> Array:
    """Time-major entry: pad to tiles ONLY when needed, run the fused
    kernel, unpad.  Returns m [T, B, H] f32 (bf16 with state_bf16=True;
    the recurrence accumulates in f32 regardless).  For the flagship shapes
    (T mult of block_t, B mult of 8, D mult of 128 on stacked layers)
    the input needs no copy at all — the round-2 profile showed the
    zero+set repack costing ~0.5 ms/layer.

    block_t is shrunk automatically so forward AND backward kernels fit
    the VMEM budget at the padded tile sizes; when even block_t=1 cannot
    fit (e.g. H=640 with stacked 2H inputs: the four resident weight/
    weight-grad buffers alone exceed scoped VMEM), falls back to the v1
    path — XLA computes the input projection and weight grads as big
    one-shot matmuls and only the recurrence runs as a Pallas kernel."""
    t_max, b, d = x.shape
    h = w_gifo_m.shape[0]
    bts = fused_block_ts(b, d, h, block_t)
    if bts is None:
        return _v1_direction_tm(
            x, mask, w_gifo_x, bias, w_gifo_m, ph_i, ph_f, ph_o, interpret
        )
    block_t = bts[0]
    hp = _round_up(h, 128)
    dp = _round_up(d, 128)
    bp = _round_up(b, 8)
    tp = _round_up(t_max, block_t)

    if (tp, bp, dp) == (t_max, b, d):
        xt = x.astype(jnp.bfloat16)
        mk = mask[:, :, None]
    else:
        xt = jnp.zeros((tp, bp, dp), jnp.bfloat16)
        xt = xt.at[:t_max, :b, :d].set(x.astype(jnp.bfloat16))
        mk = jnp.zeros((tp, bp, 1), jnp.float32)
        mk = mk.at[:t_max, :b, 0].set(mask)
    wx = jnp.pad(
        w_gifo_x, ((0, dp - d), (0, 0), (0, hp - h))
    ).reshape(dp, 4 * hp)
    bs = jnp.pad(bias, ((0, 0), (0, hp - h))).reshape(1, 4 * hp)
    wm = jnp.pad(
        w_gifo_m, ((0, hp - h), (0, 0), (0, hp - h))
    ).reshape(hp, 4 * hp)
    ph = jnp.stack([
        jnp.pad(ph_i, (0, hp - h)),
        jnp.pad(ph_f, (0, hp - h)),
        jnp.pad(ph_o, (0, hp - h)),
    ])
    m = lstm_fused(xt, mk, wx, bs, wm, ph, block_t, interpret,
                   state_bf16)
    return m[:t_max, :b, :h]


def _v1_direction_tm(
    x: Array,        # [T, B, D]
    mask: Array,     # [T, B] f32
    w_gifo_x: Array,  # [D, 4, H]
    bias: Array,      # [4, H]
    w_gifo_m: Array,  # [H, 4, H]
    ph_i: Array, ph_f: Array, ph_o: Array,  # [H]
    interpret: bool = False,
) -> Array:
    """v1 fallback for shapes the fused kernel cannot fit: the input
    projection is one big XLA matmul; only the recurrence runs in the
    Pallas kernel (whose VMEM footprint is independent of D); the weight
    grads are one-shot XLA matmuls over the kernel-emitted dgifo
    sequence.  Returns m [T, B, H] f32."""
    t_max, b, d = x.shape
    h = w_gifo_m.shape[0]
    hp = _round_up(h, 128)
    bp = _round_up(b, 8)
    xw = jnp.einsum(
        "tbd,dgh->tbgh", x.astype(jnp.bfloat16),
        w_gifo_x.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + bias                                # [T, B, 4, H] f32
    xw_p = jnp.pad(
        xw, ((0, 0), (0, bp - b), (0, 0), (0, hp - h))
    ).reshape(t_max, bp, 4 * hp)
    mk = jnp.zeros((t_max, bp, 1), jnp.float32)
    mk = mk.at[:, :b, 0].set(mask)
    w = jnp.pad(w_gifo_m, ((0, hp - h), (0, 0), (0, hp - h))).reshape(
        hp, 4 * hp
    )
    ph = jnp.stack([
        jnp.pad(ph_i, (0, hp - h)),
        jnp.pad(ph_f, (0, hp - h)),
        jnp.pad(ph_o, (0, hp - h)),
    ])
    m = lstm_scan(xw_p, mk, w, ph, interpret)
    return m[:, :b, :h]


# --------------------------------------------------------------------------
# high-level direction runner used by models.bilstm
# --------------------------------------------------------------------------

def lstm_direction_pallas(
    x_proj: Array,   # [B, T, 4, H] f32 (input projection + bias)
    mask: Array,     # [B, T] f32
    w_gifo_m: Array,  # [H, 4, H]
    ph_i: Array, ph_f: Array, ph_o: Array,  # [H]
    interpret: bool = False,
) -> Array:
    """Pad to tiles, run the fused kernel, unpad. Returns m [B, T, H]."""
    b, t_max, four, h = x_proj.shape
    assert four == 4
    hp = _round_up(h, 128)
    bp = _round_up(b, 8)

    # [B,T,4,H] -> [T,Bp,4Hp]
    xw = jnp.zeros((t_max, bp, 4 * hp), jnp.float32)
    xw = xw.at[:, :b, :].set(
        jnp.moveaxis(
            jnp.pad(x_proj, ((0, 0), (0, 0), (0, 0), (0, hp - h)))
            .reshape(b, t_max, 4 * hp),
            0, 1,
        )
    )
    mk = jnp.zeros((t_max, bp, 1), jnp.float32)
    mk = mk.at[:, :b, 0].set(jnp.moveaxis(mask, 0, 1))
    w = jnp.pad(w_gifo_m, ((0, hp - h), (0, 0), (0, hp - h))).reshape(
        hp, 4 * hp
    )
    ph = jnp.stack([
        jnp.pad(ph_i, (0, hp - h)),
        jnp.pad(ph_f, (0, hp - h)),
        jnp.pad(ph_o, (0, hp - h)),
    ])
    m = lstm_scan(xw, mk, w, ph, interpret)
    return jnp.moveaxis(m[:, :b, :h], 0, 1)
