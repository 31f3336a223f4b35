"""Streaming (online) acoustic model inference for unidirectional stacks.

The reference ships unidirectional <Lstm>/<LstmParallel> layers
(reference: src/net/lstm-layer.h:28-265, lstm-parallel-layer.h:223) but
its online-decoding code is dead; here the uni-LSTM stack becomes a real
online ASR path: per-layer (c, m) carries are explicit state, so audio
can be pushed chunk-by-chunk through ONE fixed-shape jitted program and
the resulting log-posterior chunks feed StreamingBeamDecoder
(decoder/beam.py) for end-to-end streaming recognition:

    sam = StreamingAcousticModel(params, cfg)       # cfg.bidirectional=False
    st = sam.start(batch_size)
    dec = StreamingBeamDecoder(graph, bcfg)
    ds = dec.start(batch_size)
    for chunk in feature_chunks:                    # [B, Tc, D]
        lp, st = sam.step(st, chunk, chunk_lengths)
        ds = dec.accept(ds, lp, active_mask)
    words = dec.finish(ds)

Chunked output is bit-identical to one offline apply_model pass over the
concatenated features: the per-row length masks freeze (c, m) through
padded frames, so rows whose stream has ended simply carry their state
unchanged (same semantics as models/bilstm._direction_scan masking).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from eesen_tpu.models.bilstm import _direction_scan
from eesen_tpu.models.model import AcousticModelConfig

Array = jax.Array
Params = Dict[str, Array]
# per-layer (c, m), each [B, H]
Carry = List[Tuple[Array, Array]]


def init_stream_state(
    cfg: AcousticModelConfig, batch_size: int,
) -> Carry:
    h = cfg.cell_dim
    return [
        (jnp.zeros((batch_size, h), jnp.float32),
         jnp.zeros((batch_size, h), jnp.float32))
        for _ in range(cfg.num_layers)
    ]


@functools.partial(jax.jit, static_argnames=("cfg",))
def stream_step(
    params: Params,
    carries: Carry,
    feats: Array,     # [B, Tc, D]
    lengths: Array,   # [B] valid frames in this chunk (0 = stream ended)
    cfg: AcousticModelConfig,
) -> Tuple[Array, Carry]:
    """One chunk through the uni-LSTM stack: logits [B, Tc, V] + new
    carries.  Scan order matches _direction_scan exactly (same gate
    math, same mask freeze), so chaining chunks reproduces the offline
    forward bit-for-bit."""
    if cfg.bidirectional:
        raise ValueError(
            "streaming needs a unidirectional stack "
            "(AcousticModelConfig(bidirectional=False)); BiLSTM requires "
            "the full utterance by construction"
        )
    x = jnp.moveaxis(feats, 0, 1)                     # [Tc, B, D]
    t_c, b, _ = x.shape
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_c, b), 0)
    mask = (t_iota < lengths[None, :]).astype(jnp.float32)
    new_carries: Carry = []
    for i in range(cfg.num_layers):
        lcfg = cfg.layer_cfg(i)
        c_in, m_in = carries[i]
        x, (c_out, m_out) = _direction_scan(
            params["layers"][i]["fw"], x, mask, lcfg, None,
            carry_in=(c_in, m_in), return_carry=True,
        )
        x = x * mask[:, :, None]
        new_carries.append((c_out, m_out))
    cdt = cfg.compute_dtype
    logits = (
        jnp.einsum(
            "tbd,dv->tbv", x.astype(cdt), params["out"]["w"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        + params["out"]["b"]
    )
    return jnp.moveaxis(logits, 0, 1), new_carries


class StreamingAcousticModel:
    """Convenience wrapper holding params/cfg; see module docstring."""

    def __init__(self, params: Params, cfg: AcousticModelConfig):
        if cfg.bidirectional:
            raise ValueError("streaming requires bidirectional=False")
        self.params = params
        self.cfg = cfg

    def start(self, batch_size: int) -> Carry:
        return init_stream_state(self.cfg, batch_size)

    def step(
        self, carries: Carry, feats, lengths=None,
    ) -> Tuple[Array, Carry]:
        feats = jnp.asarray(feats)
        if lengths is None:
            lengths = jnp.full((feats.shape[0],), feats.shape[1],
                               jnp.int32)
        logits, carries = stream_step(
            self.params, carries, feats, jnp.asarray(lengths), self.cfg
        )
        return logits, carries
