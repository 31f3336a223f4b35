"""Batched token-passing WFST beam search on TPU.

The TPU-native replacement for the reference's CPU Viterbi decoders
(reference: src/decoder/faster-decoder.cc ProcessEmitting/ProcessNonemitting
token passing with beam + max_active pruning; src/decoder/
decodable-matrix.h:47-54 tid-1 acoustic column shift).  Redesigned for
static shapes and data parallelism:

- The active set is a fixed-size array of K slots per utterance
  ([B, K] state ids + scores, dead slots = +inf), not a hash map.
- Arc expansion is a dense [B, K, D] gather from degree-capped CSR tables
  (see graph_compile.py) — every step has the same shape, so the whole
  T-frame search is ONE `lax.scan` compiled once.
- Viterbi recombination (the hash-map min in the reference) is sort-based:
  proposals are sorted by score then stably by destination state, so the
  best proposal per state is the first of each run — no scatter at all
  (TPU scatter-with-min lowers catastrophically slowly on some platforms),
  and per-frame cost is O(K*D log(K*D)) independent of graph size.
- Pruning = beam threshold against the per-utterance best + top_k to K
  (the reference's adaptive max_active cutoff, faster-decoder.cc GetCutoff).
- Epsilon closure (blank-structure + LM-backoff arcs) runs a fixed number
  of iterations = the graph's eps depth.
- Backpointers are composed WITHIN each frame (emitting arc + the eps
  chain behind it), so the scan emits one parent-slot plus up to
  MAX_OLABELS_PER_FRAME output labels per slot per frame; the best path is
  recovered by a trivial host walk (traceback()).

Batched over utterances sharing one graph; shard the batch axis over a
mesh for multi-chip decoding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.decoder.graph_compile import CompiledGraph

Array = jax.Array
INF = jnp.float32(jnp.inf)
MAX_OLABELS_PER_FRAME = 2   # words emitted by one frame's arc+eps chain


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam: float = 16.0
    max_active: int = 4096          # K slots
    acoustic_scale: float = 0.9     # steps/decode_ctc_lat.sh default
    eps_iters: int = 0              # 0: use graph.eps_depth
    # approximate top-k (jax.lax.approx_max_k): much cheaper on TPU for
    # large K; pruning becomes slightly approximate (recall ~0.95)
    approx_top_k: bool = False


class DeviceGraph(NamedTuple):
    """CompiledGraph arrays as device arrays (jit operands, not baked
    constants)."""
    emit_offsets: Array
    emit_ilabel: Array
    emit_olabel: Array
    emit_weight: Array
    emit_dst: Array
    eps_offsets: Array
    eps_olabel: Array
    eps_weight: Array
    eps_dst: Array
    final_weight: Array

    @classmethod
    def put(cls, g: CompiledGraph) -> "DeviceGraph":
        return cls(
            jnp.asarray(g.emit_offsets), jnp.asarray(g.emit_ilabel),
            jnp.asarray(g.emit_olabel), jnp.asarray(g.emit_weight),
            jnp.asarray(g.emit_dst),
            jnp.asarray(g.eps_offsets), jnp.asarray(g.eps_olabel),
            jnp.asarray(g.eps_weight), jnp.asarray(g.eps_dst),
            jnp.asarray(g.final_weight),
        )


class BeamOutputs(NamedTuple):
    states: Array       # [T, B, K] int32 active states (post eps-closure)
    scores: Array       # [T, B, K] float32
    parent: Array       # [T, B, K] int32 slot in frame t-1 (t=0: init set)
    olabels: Array      # [T, B, K, MAX_OLABELS] int32 (0 = none)
    init_olabels: Array  # [B, K, MAX_OLABELS] from the initial closure
    overflow: Array     # [B] int32 count of dropped olabels (should be 0)


def _expand(
    states: Array, scores: Array,
    offsets: Array, weights: Array, dsts: Array, degree_cap: int,
) -> Tuple[Array, Array, Array]:
    """[B,K] actives -> [B,K*D] (arc_ids, dst, score w/o acoustic).
    Dead/invalid slots produce +inf scores on dummy arcs."""
    b, k = states.shape
    safe_states = jnp.maximum(states, 0)
    base = offsets[safe_states]                       # [B,K]
    deg = offsets[safe_states + 1] - base             # [B,K]
    j = jnp.arange(degree_cap, dtype=jnp.int32)
    aid = base[..., None] + j                         # [B,K,D]
    valid = (j < deg[..., None]) & (states >= 0)[..., None] \
        & jnp.isfinite(scores)[..., None]
    aid_safe = jnp.clip(aid, 0, max(weights.shape[0] - 1, 0))
    if weights.shape[0] == 0:
        w = jnp.full(aid_safe.shape, jnp.inf, jnp.float32)
        dst = jnp.zeros(aid_safe.shape, jnp.int32)
    else:
        w = jnp.where(valid, weights[aid_safe], INF)
        dst = jnp.where(valid, dsts[aid_safe], 0)
    score = jnp.where(valid, scores[..., None] + w, INF)
    return (
        aid_safe.reshape(b, k * degree_cap),
        dst.reshape(b, k * degree_cap),
        score.reshape(b, k * degree_cap),
    )


def _dedup_and_prune(
    dst: Array, score: Array, k: int, beam: float, approx: bool = False,
) -> Tuple[Array, Array, Array]:
    """Viterbi-recombine proposals sharing a destination state, apply the
    beam, keep the best K.

    Sort-based: ascending-score sort, then a STABLE sort by destination
    state; the first entry of every destination run is its best proposal.
    Returns (new_states [B,K], new_scores [B,K], kept proposal idx [B,K]
    into the original proposal axis)."""
    b, m = dst.shape
    best = jnp.min(score, axis=1, keepdims=True)
    score = jnp.where(score <= best + beam, score, INF)
    ord1 = jnp.argsort(score, axis=1)
    dst1 = jnp.take_along_axis(dst, ord1, axis=1)
    score1 = jnp.take_along_axis(score, ord1, axis=1)
    ord2 = jnp.argsort(dst1, axis=1, stable=True)
    dst2 = jnp.take_along_axis(dst1, ord2, axis=1)
    score2 = jnp.take_along_axis(score1, ord2, axis=1)
    orig_idx = jnp.take_along_axis(ord1, ord2, axis=1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), dst2[:, 1:] != dst2[:, :-1]], axis=1
    )
    score2 = jnp.where(first, score2, INF)
    if approx:
        top_neg, top_idx = jax.lax.approx_max_k(-score2, k)
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_neg, top_idx = jax.lax.top_k(-score2, k)
    new_scores = -top_neg
    new_states = jnp.take_along_axis(dst2, top_idx, axis=1)
    new_states = jnp.where(jnp.isfinite(new_scores), new_states, -1)
    kept = jnp.take_along_axis(orig_idx, top_idx, axis=1)
    return new_states, new_scores, kept


def _append_olabel(olab: Array, new: Array, overflow: Array):
    """olab [B,M,L] existing labels, new [B,M] label (0=none) -> appended.
    Counts overflows (more than L labels in one frame)."""
    b, m, l = olab.shape
    count = jnp.sum(olab != 0, axis=-1)                 # [B,M]
    can = count < l
    do = (new != 0)
    idx = jnp.clip(count, 0, l - 1)
    appended = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (b, m, l), 2) == idx[..., None])
        & (do & can)[..., None],
        new[..., None], olab,
    )
    overflow = overflow + jnp.sum((do & ~can), axis=-1, dtype=jnp.int32)
    return appended, overflow


def make_beam_decoder(
    graph: CompiledGraph, cfg: BeamSearchConfig = BeamSearchConfig()
):
    """Build a jitted decoder: fn(loglikes [B,T,V], lengths [B], dgraph)
    -> BeamOutputs."""
    k = cfg.max_active
    d_e = max(graph.max_emit_degree, 1)
    d_n = max(graph.max_eps_degree, 1)
    eps_iters = cfg.eps_iters or max(graph.eps_depth, 1)
    n_total = graph.num_states
    beam = cfg.beam
    scale = cfg.acoustic_scale
    start_state = graph.start
    approx = cfg.approx_top_k
    L = MAX_OLABELS_PER_FRAME

    def eps_phase(dg, states, scores, parent, olab, overflow):
        """Fixed-iteration eps closure; composes frame-level backpointers.
        parent/olab describe each slot's within-frame history."""
        def one_iter(carry, _):
            states, scores, parent, olab, overflow = carry
            aid, dst, pscore = _expand(
                states, scores, dg.eps_offsets, dg.eps_weight, dg.eps_dst,
                d_n,
            )
            exp_olabel = (
                dg.eps_olabel[aid] if dg.eps_olabel.shape[0] > 0
                else jnp.zeros_like(aid)
            )
            exp_olabel = jnp.where(jnp.isfinite(pscore), exp_olabel, 0)
            # expanded proposals inherit src slot's composed history
            src_slot = jnp.repeat(
                jnp.arange(k, dtype=jnp.int32)[None, :], states.shape[0], 0
            )
            src_of_prop = jnp.repeat(src_slot, d_n, axis=1)  # [B, K*D]
            exp_parent = jnp.take_along_axis(parent, src_of_prop, axis=1)
            exp_olab = jnp.take_along_axis(
                olab, src_of_prop[..., None], axis=1
            )
            exp_olab, overflow = _append_olabel(
                exp_olab, exp_olabel, overflow
            )
            all_dst = jnp.concatenate([jnp.maximum(states, 0), dst], axis=1)
            all_score = jnp.concatenate([scores, pscore], axis=1)
            all_parent = jnp.concatenate([parent, exp_parent], axis=1)
            all_olab = jnp.concatenate([olab, exp_olab], axis=1)
            new_states, new_scores, top_idx = _dedup_and_prune(
                all_dst, all_score, k, beam, approx
            )
            new_parent = jnp.take_along_axis(all_parent, top_idx, axis=1)
            new_olab = jnp.take_along_axis(
                all_olab, top_idx[..., None], axis=1
            )
            return (
                new_states, new_scores, new_parent, new_olab, overflow
            ), None

        (states, scores, parent, olab, overflow), _ = jax.lax.scan(
            one_iter, (states, scores, parent, olab, overflow),
            None, length=eps_iters,
        )
        return states, scores, parent, olab, overflow

    def decode(loglikes: Array, lengths: Array, dg: DeviceGraph) -> BeamOutputs:
        b, t_max, v = loglikes.shape
        states0 = jnp.full((b, k), -1, jnp.int32).at[:, 0].set(start_state)
        scores0 = jnp.full((b, k), jnp.inf, jnp.float32).at[:, 0].set(0.0)
        parent0 = jnp.repeat(jnp.arange(k, dtype=jnp.int32)[None], b, 0)
        olab0 = jnp.zeros((b, k, L), jnp.int32)
        overflow0 = jnp.zeros((b,), jnp.int32)
        states0, scores0, _, init_olab, overflow0 = eps_phase(
            dg, states0, scores0, parent0, olab0, overflow0
        )

        def frame(carry, inp):
            states, scores, overflow = carry
            ll_t, t = inp          # [B, V], scalar
            aid, dst, pscore = _expand(
                states, scores, dg.emit_offsets, dg.emit_weight,
                dg.emit_dst, d_e,
            )
            il = dg.emit_ilabel[aid]                    # [B, K*D]
            col = jnp.clip(il - 1, 0, v - 1)            # tid-1 shift
            ac = -scale * jnp.take_along_axis(ll_t, col, axis=1)
            pscore = jnp.where(jnp.isfinite(pscore), pscore + ac, INF)
            e_states, e_scores, e_idx = _dedup_and_prune(
                dst, pscore, k, beam, approx
            )
            # frame-level parent = previous frame slot of the emitting arc
            parent = e_idx // d_e
            e_aid = jnp.take_along_axis(aid, e_idx, axis=1)
            olab0_f = jnp.zeros((b, k, L), jnp.int32)
            emit_ol = jnp.where(
                jnp.isfinite(e_scores), dg.emit_olabel[e_aid], 0
            )
            olab, overflow = _append_olabel(olab0_f, emit_ol, overflow)
            n_states_, n_scores, parent, olab, overflow = eps_phase(
                dg, e_states, e_scores, parent, olab, overflow
            )
            active = (t < lengths)[:, None]
            out_states = jnp.where(active, n_states_, states)
            out_scores = jnp.where(active, n_scores, scores)
            # frozen frames: identity parents, no labels
            ident = jnp.repeat(jnp.arange(k, dtype=jnp.int32)[None], b, 0)
            out_parent = jnp.where(active, parent, ident)
            out_olab = jnp.where(active[..., None], olab, 0)
            return (out_states, out_scores, overflow), (
                out_states, out_scores, out_parent, out_olab,
            )

        ts = jnp.arange(t_max, dtype=jnp.int32)
        (_, _, overflow), (st, sc, par, ol) = jax.lax.scan(
            frame, (states0, scores0, overflow0),
            (jnp.moveaxis(loglikes, 1, 0), ts),
        )
        return BeamOutputs(st, sc, par, ol, init_olab, overflow)

    return jax.jit(decode)


def traceback(
    outputs: BeamOutputs,
    lengths: np.ndarray,
    final_weight: np.ndarray,
) -> List[Tuple[List[int], float]]:
    """Host-side best-path recovery.

    Returns per utterance (word ids, total cost incl. final weight).
    Falls back to the best non-final token when no final state survives
    (reference: decoder-wrappers.cc:60 'partial traceback')."""
    st = np.asarray(outputs.states)
    sc = np.asarray(outputs.scores)
    par = np.asarray(outputs.parent)
    ol = np.asarray(outputs.olabels)
    init_ol = np.asarray(outputs.init_olabels)
    t_max, b, k = st.shape
    results = []
    for i in range(b):
        t_last = int(lengths[i]) - 1
        if t_last < 0:
            results.append(([], 0.0))
            continue
        states_last = st[t_last, i]
        scores_last = sc[t_last, i].copy()
        valid = states_last >= 0
        fw = np.where(
            valid, final_weight[np.maximum(states_last, 0)], np.inf
        )
        total = scores_last + fw
        if np.isfinite(total).any():
            j = int(np.argmin(total))
            cost = float(total[j])
        else:  # no final state: best partial path
            scores_last[~valid] = np.inf
            j = int(np.argmin(scores_last))
            cost = float(scores_last[j])
        words_rev: List[int] = []
        for t in range(t_last, -1, -1):
            labs = ol[t, i, j]
            for w in labs[::-1]:
                if w != 0:
                    words_rev.append(int(w))
            j = int(par[t, i, j])
        for w in init_ol[i, j][::-1]:
            if w != 0:
                words_rev.append(int(w))
        results.append((words_rev[::-1], cost))
    return results
