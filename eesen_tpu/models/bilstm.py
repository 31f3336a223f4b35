"""Bidirectional LSTM layers, TPU-first.

Re-designs the reference's BiLSTM acoustic model layer
(reference: src/net/bilstm-layer.h:185-210 parameters, :197-340 step loops;
src/net/bilstm-parallel-layer.h:97-205 masked multi-stream propagation)
for XLA:

- Layout is batch-major [B, T, D] with per-sequence length masks, replacing
  the reference's time-interleaved `row = t*S + s` stream packing
  (src/net/bilstm-parallel-layer.h:202,373).
- The input projection for ALL time steps is one large [B*T, D] x [D, 4H]
  matmul (MXU-friendly); only the recurrent [B, H] x [H, 4H] product lives
  inside `lax.scan`.
- The backward direction reverses each sequence by its own length
  (a gather), runs the same forward scan, and reverses back — equivalent to
  the reference's reverse-time pass (bilstm-parallel-layer.h:152) without
  data-dependent control flow.
- Gate packing follows the reference's GIFO order: g (cell candidate),
  i (input gate), f (forget gate), o (output gate)
  (src/net/lstm-layer.h:70-73), with diagonal peephole connections from the
  cell to the i/f/o gates.  Weights are stored gate-structured
  ([D, 4, H] rather than [D, 4H]) so that tensor-parallel sharding of the
  cell dimension is a clean last-axis PartitionSpec — XLA fuses the gate
  axis back into one matmul.

Gradient clipping (`max_grad`, reference bilstm-layer.h:846-865) is applied
by the optimizer (eesen_tpu.training.optim), not inside the layer, because
in JAX the update step — not the layer — owns gradients.

Dropout variants mirror src/net/bilstm-parallel-layer.h:46-95:
forward dropout on the layer output and recurrent dropout on the recurrent
activations, each with per-step or per-sequence masks (the reference's
*_step_* vs *_sequence_* distinction).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class BiLstmConfig:
    input_dim: int
    cell_dim: int
    param_range: float = 0.1       # uniform init ±range (net/layer.cc InitData)
    fgate_bias: float = 0.0        # forget-gate bias init (<FgateBias>)
    # dropout (bilstm-parallel-layer.h:46-95)
    forward_dropout: float = 0.0
    recurrent_dropout: float = 0.0
    forward_step_dropout: bool = False     # new mask per step (else per sequence)
    recurrent_step_dropout: bool = False
    # recurrent dropout applies to the CELL update, in one of the
    # reference's two modes (bilstm-parallel-layer.h:269-276):
    #   rnndrop     : c_t = mask * (i*g + f*c_{t-1})
    #   no_mem_loss : c_t = mask * (i*g) + f*c_{t-1}   (memory preserved)
    recurrent_dropout_mode: str = "no_mem_loss"   # or "rnndrop"
    # twiddle: stochastically apply recurrent dropout to only one of the
    # two directions per batch (bilstm-parallel-layer.h:385-405)
    twiddle: bool = False
    # compute dtype for the big matmuls; state stays float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # fused Pallas recurrence: "auto" uses it on TPU when no recurrent
    # dropout is active; "never"/"always" force the choice
    use_pallas: str = "auto"
    # False = unidirectional <Lstm>/<LstmParallel>
    # (reference: src/net/lstm-layer.h:28-508, lstm-parallel-layer.h:223)
    # — the streaming-capable acoustic model (models/streaming.py)
    bidirectional: bool = True
    # stream the fused kernel's m/c state in bf16 (cell accumulator
    # stays f32 in VMEM) — cuts the recurrence's HBM traffic ~25%;
    # affects gradients only at bf16 resolution.  Default ON: measured
    # +2.8% (H=320) / +5.4% (H=640) step throughput with loss
    # trajectories identical to f32 state (BENCH_NOTES round 5b)
    state_bf16: bool = True

    @property
    def output_dim(self) -> int:
        return (2 if self.bidirectional else 1) * self.cell_dim


def _init_direction(key: Array, cfg: BiLstmConfig) -> Params:
    h, d = cfg.cell_dim, cfg.input_dim
    k = jax.random.split(key, 6)
    r = cfg.param_range
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -r, r)
    bias = u(k[2], (4, h))
    # GIFO packing: gate axis order [g, i, f, o]; forget-gate bias offset
    # (reference: bilstm-layer.h InitData <FgateBias>)
    bias = bias.at[2].add(cfg.fgate_bias)
    return {
        "w_gifo_x": u(k[0], (d, 4, h)),
        "w_gifo_m": u(k[1], (h, 4, h)),
        "bias": bias,
        "phole_i_c": u(k[3], (h,)),
        "phole_f_c": u(k[4], (h,)),
        "phole_o_c": u(k[5], (h,)),
    }


def init_bilstm_layer(key: Array, cfg: BiLstmConfig) -> Params:
    kf, kb = jax.random.split(key)
    if not cfg.bidirectional:
        return {"fw": _init_direction(kf, cfg)}
    return {
        "fw": _init_direction(kf, cfg),
        "bw": _init_direction(kb, cfg),
    }


def _pallas_enabled(cfg: "BiLstmConfig") -> bool:
    if cfg.use_pallas == "always":
        return True
    if cfg.use_pallas == "never":
        return False
    return jax.default_backend() == "tpu"


def _reverse_by_length(x: Array, lengths: Array) -> Array:
    """Reverse each sequence within its own valid span.

    x: [B, T, D]; padded tail stays in place (it is masked anyway).
    """
    b, t_max, _ = x.shape
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
    idx = jnp.where(
        t_iota < lengths[:, None], lengths[:, None] - 1 - t_iota, t_iota
    )
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _direction_scan(
    p: Params,
    x: Array,
    mask: Array,
    cfg: BiLstmConfig,
    rec_drop_mask: Optional[Array],
    carry_in: Optional[Tuple[Array, Array]] = None,
    return_carry: bool = False,
) -> Array:
    """One direction's recurrence, TIME-MAJOR: x [T, B, D] (already
    time-flipped for the backward direction), mask [T, B] float 0/1,
    rec_drop_mask [T or 1, B, H]; returns m [T, B, H].

    carry_in/return_carry expose the (c, m) state for STREAMING
    unidirectional inference (models/streaming.py): a chunked run with
    the carried state is bit-identical to one scan over the
    concatenation (the mask freeze keeps short rows' states intact
    across chunk boundaries).  The fused Pallas path always starts from
    zeros, so a carried call uses the XLA scan.

    Time-major is the layout both consumers want — lax.scan carries it
    natively and the Pallas kernel streams [block_t, B, D] blocks — so
    the stack does NO per-layer transposes (the round-2 profile showed
    ~0.5 ms/layer of pure moveaxis/copy glue in the batch-major
    version)."""
    t_max, b, _ = x.shape
    h = cfg.cell_dim
    cdt = cfg.compute_dtype

    if (rec_drop_mask is None and _pallas_enabled(cfg)
            and carry_in is None and not return_carry):
        # fully fused kernel: input projection + recurrence in one
        # pallas_call, W_x/W_m resident in VMEM (ops/lstm_pallas.py v2)
        from eesen_tpu.ops.lstm_pallas import lstm_direction_fused_tm

        return lstm_direction_fused_tm(
            x, mask, p["w_gifo_x"], p["bias"], p["w_gifo_m"],
            p["phole_i_c"], p["phole_f_c"], p["phole_o_c"],
            state_bf16=cfg.state_bf16,
        ) * mask[:, :, None]

    # big input projection for all steps at once (MXU)
    xw = (
        jnp.einsum(
            "tbd,dgh->tbgh", x.astype(cdt), p["w_gifo_x"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        + p["bias"]
    )  # [T, B, 4, H] float32

    w_m = p["w_gifo_m"].astype(cdt)
    ph_i, ph_f, ph_o = p["phole_i_c"], p["phole_f_c"], p["phole_o_c"]

    rnndrop = cfg.recurrent_dropout_mode == "rnndrop"

    def step(carry, inp):
        c_prev, m_prev = carry
        xw_t, mask_t, rd_t = inp
        gifo = xw_t + jnp.einsum(
            "bh,hgk->bgk", m_prev.astype(cdt), w_m,
            preferred_element_type=jnp.float32,
        )
        g = jnp.tanh(gifo[:, 0])
        i = jax.nn.sigmoid(gifo[:, 1] + c_prev * ph_i)
        f = jax.nn.sigmoid(gifo[:, 2] + c_prev * ph_f)
        cand = i * g
        if rd_t is not None and not rnndrop:   # no_mem_loss
            cand = cand * rd_t
        c = f * c_prev + cand
        if rd_t is not None and rnndrop:
            c = c * rd_t
        o = jax.nn.sigmoid(gifo[:, 3] + c * ph_o)
        m = o * jnp.tanh(c)
        mt = mask_t[:, None]
        c = c * mt + c_prev * (1.0 - mt)
        m = m * mt  # padded steps emit zeros and freeze state
        m_carry = m + m_prev * (1.0 - mt)
        return (c, m_carry), m

    init = carry_in if carry_in is not None else (
        jnp.zeros((b, h), jnp.float32),
        jnp.zeros((b, h), jnp.float32),
    )
    if rec_drop_mask is None:
        def step2(carry, inp):
            return step(carry, (*inp, None))

        final, ms = jax.lax.scan(step2, init, (xw, mask))
    else:
        rd = jnp.broadcast_to(
            rec_drop_mask, (t_max, b, rec_drop_mask.shape[-1])
        )
        final, ms = jax.lax.scan(step, init, (xw, mask, rd))
    if return_carry:
        return ms, final
    return ms  # [T, B, H]


def _dropout_mask(
    key: Array, rate: float, per_step: bool, b: int, t: int, d: int
) -> Array:
    """Bernoulli keep-mask scaled by 1/keep, TIME-MAJOR [T or 1, B, D].
    Per-sequence masks have a length-1 time axis (one draw per utterance,
    broadcast over time), matching the reference's *_sequence_* dropout
    variants."""
    keep = 1.0 - rate
    shape = (t, b, d) if per_step else (1, b, d)
    m = jax.random.bernoulli(key, keep, shape)
    return m.astype(jnp.float32) / keep


def bilstm_layer_tm(
    params: Params,
    x: Array,
    lengths: Array,
    cfg: BiLstmConfig,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Array:
    """Apply one BiLSTM layer, time-major. x: [T, B, D] -> [T, B, 2H].

    The backward direction runs on the WHOLE-ARRAY time flip (padding
    frames first): the mask freezes the zero-initialized carry through
    the padded prefix, so the state trajectory over valid frames is
    identical to a per-length reversal (bilstm-parallel-layer.h
    PropagateFncVanillaPassBackward semantics) at zero gather cost —
    jnp.flip is a contiguous copy, per-length reversal was a
    take_along_axis gather."""
    t_max, b, _ = x.shape
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_max, b), 0)
    mask = (t_iota < lengths[None, :]).astype(jnp.float32)

    rd_fw = rd_bw = None
    if train and cfg.recurrent_dropout > 0.0:
        assert rng is not None, "recurrent dropout needs an rng"
        k1, k2, kt, rng = jax.random.split(rng, 4)
        rd_fw = _dropout_mask(
            k1, cfg.recurrent_dropout, cfg.recurrent_step_dropout,
            b, t_max, cfg.cell_dim,
        )
        rd_bw = _dropout_mask(
            k2, cfg.recurrent_dropout, cfg.recurrent_step_dropout,
            b, t_max, cfg.cell_dim,
        )
        if cfg.twiddle and cfg.bidirectional:
            # apply dropout to exactly one direction, chosen at random
            # (the reference's twiddle alternation,
            # bilstm-parallel-layer.h:385-405)
            ones = jnp.ones_like(rd_fw)
            pick_fw = jax.random.bernoulli(kt, 0.5)
            rd_fw = jnp.where(pick_fw, rd_fw, ones)
            rd_bw = jnp.where(pick_fw, ones, rd_bw)

    m_fw = _direction_scan(params["fw"], x, mask, cfg, rd_fw)

    if cfg.bidirectional:
        x_rev = jnp.flip(x, axis=0)
        mask_rev = jnp.flip(mask, axis=0)
        m_bw_rev = _direction_scan(
            params["bw"], x_rev, mask_rev, cfg, rd_bw
        )
        m_bw = jnp.flip(m_bw_rev, axis=0)
        y = jnp.concatenate([m_fw, m_bw], axis=-1)
    else:
        # unidirectional <Lstm(Parallel)> (src/net/lstm-layer.h:170-265
        # forward-only recurrence) — the layer the streaming acoustic
        # model is built from
        y = m_fw

    if train and cfg.forward_dropout > 0.0:
        assert rng is not None, "forward dropout needs an rng"
        k, _ = jax.random.split(rng)
        fd = _dropout_mask(
            k, cfg.forward_dropout, cfg.forward_step_dropout,
            b, t_max, cfg.output_dim,
        )
        y = y * fd

    return y * mask[:, :, None]


def bilstm_layer(
    params: Params,
    x: Array,
    lengths: Array,
    cfg: BiLstmConfig,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Array:
    """Batch-major convenience wrapper: [B, T, D] -> [B, T, 2H].
    The model stack runs time-major (bilstm_layer_tm) end to end."""
    y = bilstm_layer_tm(
        params, jnp.moveaxis(x, 0, 1), lengths, cfg, train=train, rng=rng
    )
    return jnp.moveaxis(y, 0, 1)
