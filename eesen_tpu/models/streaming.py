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
import numpy as np

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


class StreamingPipeline:
    """FUSED online ASR: acoustic model chunk + log-softmax + WFST
    decoder chunk in ONE jitted program per audio chunk.

    The separate StreamingAcousticModel + StreamingBeamDecoder flow
    costs 3-4 device dispatches per chunk (AM step, softmax, decoder
    accept, summary fetch) — on a remote-tunnel platform each dispatch
    is ~40 ms of RPC, dominating the serving latency (BENCH_NOTES
    round 5d: ~142 ms fixed per chunk).  This pipeline:

    - traces AM forward + log_softmax + the decoder's chunk program +
      on-device path-summary composition into one jit;
    - keeps the per-chunk [B, K] summaries ON DEVICE (no per-chunk
      fetch) — partial()/finish() fetch them all in one transfer when
      the application actually wants a hypothesis.

        pipe = StreamingPipeline(params, cfg, graph, bcfg)
        st = pipe.start(batch)
        for chunk in feature_chunks:          # [B, Tc, D]
            st = pipe.step(st, chunk, lengths)
        for words, cost in pipe.finish(st): ...

    Results are identical to offline apply_model + one-shot decode
    (same guarantee as the unfused pair; tests/test_unilstm.py)."""

    def __init__(self, params, cfg: AcousticModelConfig, graph,
                 bcfg=None, summary_words: Optional[int] = None,
                 max_chunks: int = 512):
        from eesen_tpu.decoder.beam import (
            BeamSearchConfig, DeviceGraph, StreamingBeamDecoder,
            compose_chunk_paths, make_beam_decoder,
        )

        if cfg.bidirectional:
            raise ValueError("streaming requires bidirectional=False")
        bcfg = bcfg if bcfg is not None else BeamSearchConfig()
        if bcfg.blank_skip > 0.0:
            raise ValueError(
                "StreamingPipeline runs the full search; use the "
                "unfused StreamingBeamDecoder for per-chunk blank-skip"
            )
        self.params = params
        self.cfg = cfg
        self.graph = graph
        self.bcfg = bcfg
        self.max_chunks = max_chunks
        self.dg = DeviceGraph.put(graph)
        init_fn, chunk_fn = make_beam_decoder(graph, bcfg,
                                              _internals=True)
        self._init = init_fn
        # host-side traceback reuses the unfused decoder's walker
        self._walker = StreamingBeamDecoder.__new__(StreamingBeamDecoder)
        self._walker.graph = graph
        self._walker.summary_words = summary_words

        cap_cfg = summary_words
        params_c = params
        model_cfg = cfg

        @jax.jit
        def fused(am_carries, dec_carry, feats, lengths, dg):
            logits, am_carries = stream_step(
                params_c, am_carries, feats, lengths, model_cfg
            )
            lp = jax.nn.log_softmax(logits, axis=-1)
            t_c = lp.shape[1]
            active = (
                jnp.arange(t_c, dtype=jnp.int32)[None, :]
                < lengths[:, None]
            )
            dec_carry, (st, sc, par, ol, lm) = chunk_fn(
                dec_carry, lp, active, dg
            )
            if cap_cfg is not None:
                cap = cap_cfg
            else:
                tc, _b, _k, L = ol.shape
                cap = min(max(16, (tc + 1) // 2), tc * L)
            summary = compose_chunk_paths(par, ol, cap)
            return am_carries, dec_carry, summary

        self._fused = fused

    def start(self, batch_size: int) -> dict:
        dec_carry, init_olab = self._init(batch_size, self.dg)
        return {
            "am": init_stream_state(self.cfg, batch_size),
            "carry": dec_carry,
            "init_olab": np.asarray(init_olab),
            "chunks_dev": [],     # on-device summaries, append-only
            "chunks_host": [],    # host mirror, extended lazily
            "batch": batch_size,
            "tframes": 0,
        }

    def step(self, state: dict, feats, lengths=None) -> dict:
        feats = jnp.asarray(feats)
        if lengths is None:
            lengths = jnp.full((feats.shape[0],), feats.shape[1],
                               jnp.int32)
        else:
            lengths = jnp.asarray(lengths, jnp.int32)
        am, carry, summary = self._fused(
            state["am"], state["carry"], feats, lengths, self.dg
        )
        state["am"] = am
        state["carry"] = carry
        state["chunks_dev"].append(summary)   # stays on device
        state["tframes"] += int(feats.shape[1])
        return state

    def _fetch(self, state: dict) -> dict:
        # summaries are immutable once produced: fetch ONLY the ones
        # added since the last partial()/finish() call (a periodic
        # partial() then costs one chunk's 4 small transfers, ~20 ms on
        # the remote tunnel, instead of refetching the whole history)
        new = state["chunks_dev"][len(state["chunks_host"]):]
        if new:
            state["chunks_host"].extend(jax.device_get(new))
        walker_state = {
            "carry": state["carry"],
            "init_olab": state["init_olab"],
            "chunks": state["chunks_host"],
            "batch": state["batch"],
            "tframes": state["tframes"],
        }
        return walker_state

    def partial(self, state: dict):
        return self._walker.partial(self._fetch(state))

    def finish(self, state: dict):
        return self._walker.finish(self._fetch(state))


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
