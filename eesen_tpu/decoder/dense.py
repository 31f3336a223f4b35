"""Dense (beam-free) Viterbi decoding over the full TLG trellis on TPU.

The reference's best-path decoder (src/decoder/faster-decoder.cc) walks a
hash-map of active tokens — pointer chasing that TPUs cannot do.  The
batched beam search (decoder/beam.py) replaces the hash map with a K-slot
active set, but every frame still pays sorts/top_k that scale with K.

This module takes the opposite, TPU-native limit: keep the score of EVERY
graph state as a dense [B, N] vector and relax all arcs every frame with
pure vectorized min/gather ops — no sort, no top_k, no scatter, no beam.
For graphs up to a few hundred thousand states this is both faster than
the beam search and EXACT (it is full Viterbi, equivalent to an infinite
beam):

- arcs are stored by DESTINATION (in-CSR) padded to a fixed in-degree D,
  so each frame's emitting relaxation is D fused gather+min steps over
  [B, N];
- states with in-degree > D ("in-hubs": LM backoff targets, word-start
  states) keep their in-arcs in a dense padded [H, Dh] side table reduced
  in one vectorized min — skew never forces a bigger D;
- epsilon chains use the precomputed transitive closure (same tables as
  the beam decoder), inverted to in-CSR + in-hubs, so one closure
  relaxation per frame suffices;
- per-frame winning-arc ids are stored as compact uint8 slot indices
  ([T, B, N] u8 for both phases); the best path is recovered on the host
  by walking them backwards (traceback_dense).

Reference semantics matched: tid-1 acoustic column shift
(src/decoder/decodable-matrix.h:47-54), final-weight selection with
partial-path fallback (src/decoder/decoder-wrappers.cc:60).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.decoder.graph_compile import CompiledGraph

Array = jax.Array
F32_INF = np.float32(np.inf)


@dataclasses.dataclass
class DenseGraph:
    """In-CSR arc tables for dense relaxation.  Host-side numpy."""
    num_states: int
    start: int
    # regular states: padded [N, D] in-arc tables (slot-padded with
    # src=0, w=+inf so padded slots never win)
    emit_src: np.ndarray      # [N, D] int32
    emit_w: np.ndarray        # [N, D] float32
    emit_il: np.ndarray      # [N, D] int32 (token id; acoustic col = id-1)
    emit_ol: np.ndarray      # [N, D] int32
    # in-hub states: contiguous padded [He, Dh] tables + their state ids
    ehub_state: np.ndarray    # [He] int32
    ehub_src: np.ndarray      # [He, Dh] int32
    ehub_w: np.ndarray        # [He, Dh] float32
    ehub_il: np.ndarray       # [He, Dh] int32
    ehub_ol: np.ndarray       # [He, Dh] int32
    # closure (epsilon) in-tables, same structure
    clo_src: np.ndarray       # [N, Dc] int32
    clo_w: np.ndarray         # [N, Dc] float32
    clo_ol: np.ndarray        # [N, Dc] int32
    chub_state: np.ndarray    # [Hc] int32
    chub_src: np.ndarray      # [Hc, Dch] int32
    chub_w: np.ndarray        # [Hc, Dch] float32
    chub_ol: np.ndarray       # [Hc, Dch] int32
    final_weight: np.ndarray  # [N] float32
    # initial scores after the start state's eps closure
    init_score: np.ndarray    # [N] float32
    init_olabel: np.ndarray   # [N] int32 (word emitted on the init closure)


def _invert_to_in_tables(
    offsets: np.ndarray, src_of_arc: np.ndarray, w: np.ndarray,
    il: Optional[np.ndarray], ol: np.ndarray, dst: np.ndarray,
    n: int, cap: int,
) -> Tuple[np.ndarray, ...]:
    """CSR-by-source -> padded in-CSR by destination + hub side tables."""
    order = np.argsort(dst, kind="stable")
    dsts = dst[order]
    counts = np.bincount(dsts, minlength=n)
    # positions of each arc within its destination's in-list
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(dsts), dtype=np.int64) - starts[dsts]

    hub_mask_state = counts > cap
    hub_states = np.nonzero(hub_mask_state)[0].astype(np.int32)
    is_hub_arc = hub_mask_state[dsts]

    # regular padded table
    reg = ~is_hub_arc
    eil = il[order] if il is not None else np.zeros(len(dsts), np.int32)
    tbl_src = np.zeros((n, cap), np.int32)
    tbl_w = np.full((n, cap), F32_INF, np.float32)
    tbl_il = np.zeros((n, cap), np.int32)
    tbl_ol = np.zeros((n, cap), np.int32)
    r_d, r_p = dsts[reg], pos[reg]
    tbl_src[r_d, r_p] = src_of_arc[order][reg]
    tbl_w[r_d, r_p] = w[order][reg]
    tbl_il[r_d, r_p] = eil[reg]
    tbl_ol[r_d, r_p] = ol[order][reg]

    # hub side tables
    h = len(hub_states)
    dh = int(counts[hub_states].max()) if h else 1
    hub_src = np.zeros((h, dh), np.int32)
    hub_w = np.full((h, dh), F32_INF, np.float32)
    hub_il = np.zeros((h, dh), np.int32)
    hub_ol = np.zeros((h, dh), np.int32)
    if h:
        hub_row = np.full(n, -1, np.int64)
        hub_row[hub_states] = np.arange(h)
        h_d, h_p = hub_row[dsts[is_hub_arc]], pos[is_hub_arc]
        hub_src[h_d, h_p] = src_of_arc[order][is_hub_arc]
        hub_w[h_d, h_p] = w[order][is_hub_arc]
        hub_il[h_d, h_p] = eil[is_hub_arc]
        hub_ol[h_d, h_p] = ol[order][is_hub_arc]
    return (tbl_src, tbl_w, tbl_il, tbl_ol,
            hub_states, hub_src, hub_w, hub_il, hub_ol)


def build_dense_graph(
    g: CompiledGraph, in_degree: int = 16, closure_in_degree: int = 16,
) -> DenseGraph:
    """Invert a CompiledGraph (with closure tables) into dense in-CSR form.

    The forward degree cap / aux states of `g` are irrelevant here (we use
    its raw arc lists); what matters is the IN-degree distribution, handled
    by the cap + hub split."""
    assert g.has_closure, "dense decode needs compile_graph(build_closure=True)"
    n = g.num_states

    src_of_emit = np.repeat(
        np.arange(n, dtype=np.int32),
        (g.emit_offsets[1:] - g.emit_offsets[:-1]).astype(np.int64),
    )
    (e_src, e_w, e_il, e_ol, eh_state, eh_src, eh_w, eh_il, eh_ol
     ) = _invert_to_in_tables(
        g.emit_offsets, src_of_emit, g.emit_weight, g.emit_ilabel,
        g.emit_olabel, g.emit_dst, n, in_degree,
    )

    co = g.closure_offsets
    cp = g.closure_packed
    src_of_clo = np.repeat(
        np.arange(n, dtype=np.int32), (co[1:] - co[:-1]).astype(np.int64)
    )
    c_w_all = cp[:, 2].view(np.float32).copy() if len(cp) else np.zeros(0, np.float32)
    (c_src, c_w, _, c_ol, ch_state, ch_src, ch_w, _, ch_ol
     ) = _invert_to_in_tables(
        co, src_of_clo, c_w_all,
        None, cp[:, 1] if len(cp) else np.zeros(0, np.int32),
        cp[:, 3] if len(cp) else np.zeros(0, np.int32), n, closure_in_degree,
    )

    # initial scores: start state + its closure
    init = np.full(n, F32_INF, np.float32)
    init_ol = np.zeros(n, np.int32)
    init[g.start] = 0.0
    for k in range(co[g.start], co[g.start + 1]):
        d = int(cp[k, 3])
        w = float(np.int32(cp[k, 2]).view(np.float32))
        if w < init[d]:
            init[d] = w
            init_ol[d] = int(cp[k, 1])
    return DenseGraph(
        num_states=n, start=g.start,
        emit_src=e_src, emit_w=e_w, emit_il=e_il, emit_ol=e_ol,
        ehub_state=eh_state, ehub_src=eh_src, ehub_w=eh_w,
        ehub_il=eh_il, ehub_ol=eh_ol,
        clo_src=c_src, clo_w=c_w, clo_ol=c_ol,
        chub_state=ch_state, chub_src=ch_src, chub_w=ch_w, chub_ol=ch_ol,
        final_weight=g.final_weight.copy(),
        init_score=init, init_olabel=init_ol,
    )


class DenseDeviceGraph(NamedTuple):
    emit_src: Array
    emit_w: Array
    emit_il: Array
    ehub_state: Array
    ehub_src: Array
    ehub_w: Array
    ehub_il: Array
    clo_src: Array
    clo_w: Array
    chub_state: Array
    chub_src: Array
    chub_w: Array
    init_score: Array

    @classmethod
    def put(cls, g: DenseGraph) -> "DenseDeviceGraph":
        return cls(
            jnp.asarray(g.emit_src), jnp.asarray(g.emit_w),
            jnp.asarray(g.emit_il),
            jnp.asarray(g.ehub_state), jnp.asarray(g.ehub_src),
            jnp.asarray(g.ehub_w), jnp.asarray(g.ehub_il),
            jnp.asarray(g.clo_src), jnp.asarray(g.clo_w),
            jnp.asarray(g.chub_state), jnp.asarray(g.chub_src),
            jnp.asarray(g.chub_w),
            jnp.asarray(g.init_score),
        )


class DenseOutputs(NamedTuple):
    emit_arg: Array    # [T, B, N] uint8 winning emit in-slot (255 = hub row
    #                    resolved via hub tables on the host)
    clo_arg: Array     # [T, B, N] uint8 winning closure in-slot (254 = stay)
    ehub_arg: Array    # [T, B, He] int32 winning hub slot
    chub_arg: Array    # [T, B, Hc] int32
    final_scores: Array  # [B, N] float32 post-closure scores at each
    #                      utterance's LAST frame (lengths-aware)


def make_dense_decoder(
    dg_host: DenseGraph, acoustic_scale: float = 0.9,
):
    """Build a jitted dense Viterbi decoder:
    fn(loglikes [B,T,V], lengths [B], dev_graph) -> DenseOutputs."""
    n = dg_host.num_states
    d_in = dg_host.emit_src.shape[1]
    dc_in = dg_host.clo_src.shape[1]
    assert d_in < 254 and dc_in < 254, "in-degree caps clash with sentinels"
    he = len(dg_host.ehub_state)
    hc = len(dg_host.chub_state)
    scale = acoustic_scale

    STAY = jnp.uint8(254)
    HUB = jnp.uint8(255)

    def relax_emit(sc, ll_t, dg: DenseDeviceGraph):
        b = sc.shape[0]
        best = jnp.full((b, n), jnp.inf, jnp.float32)
        arg = jnp.zeros((b, n), jnp.uint8)
        for d in range(d_in):
            col = jnp.clip(dg.emit_il[:, d] - 1, 0, ll_t.shape[1] - 1)
            ac = jnp.take_along_axis(
                ll_t, jnp.broadcast_to(col[None], (b, n)), axis=1
            )
            cand = sc[:, dg.emit_src[:, d]] + dg.emit_w[None, :, d] \
                - scale * ac
            take = cand < best
            best = jnp.where(take, cand, best)
            arg = jnp.where(take, jnp.uint8(d), arg)
        if he:
            col = jnp.clip(dg.ehub_il - 1, 0, ll_t.shape[1] - 1)  # [He,Dh]
            ac = ll_t[:, col]                                     # [B,He,Dh]
            cand = sc[:, dg.ehub_src] + dg.ehub_w[None] - scale * ac
            hub_best = jnp.min(cand, axis=2)                      # [B,He]
            hub_arg = jnp.argmin(cand, axis=2).astype(jnp.int32)
            cur = best[:, dg.ehub_state]
            use = hub_best < cur
            upd = jnp.where(use, hub_best, cur)
            best = best.at[:, dg.ehub_state].set(upd)
            arg = arg.at[:, dg.ehub_state].set(
                jnp.where(use, HUB, arg[:, dg.ehub_state])
            )
        else:
            hub_arg = jnp.zeros((b, 0), jnp.int32)
        return best, arg, hub_arg

    def relax_closure(sc, dg: DenseDeviceGraph):
        b = sc.shape[0]
        best = sc
        arg = jnp.full((b, n), STAY, jnp.uint8)
        for d in range(dc_in):
            cand = sc[:, dg.clo_src[:, d]] + dg.clo_w[None, :, d]
            take = cand < best
            best = jnp.where(take, cand, best)
            arg = jnp.where(take, jnp.uint8(d), arg)
        if hc:
            cand = sc[:, dg.chub_src] + dg.chub_w[None]           # [B,Hc,Dch]
            hub_best = jnp.min(cand, axis=2)
            hub_arg = jnp.argmin(cand, axis=2).astype(jnp.int32)
            cur = best[:, dg.chub_state]
            use = hub_best < cur
            best = best.at[:, dg.chub_state].set(
                jnp.where(use, hub_best, cur)
            )
            arg = arg.at[:, dg.chub_state].set(
                jnp.where(use, HUB, arg[:, dg.chub_state])
            )
        else:
            hub_arg = jnp.zeros((b, 0), jnp.int32)
        return best, arg, hub_arg

    def decode(loglikes: Array, lengths: Array, dg: DenseDeviceGraph):
        b, t_max, v = loglikes.shape
        sc0 = jnp.broadcast_to(dg.init_score[None], (b, n))
        fin0 = sc0  # zero-length utterances keep the init scores

        def frame(carry, inp):
            sc, fin = carry
            ll_t, t = inp
            e_best, e_arg, eh_arg = relax_emit(sc, ll_t, dg)
            c_best, c_arg, ch_arg = relax_closure(e_best, dg)
            active = (t < lengths)[:, None]
            out_sc = jnp.where(active, c_best, sc)
            fin = jnp.where((t == lengths - 1)[:, None], c_best, fin)
            return (out_sc, fin), (e_arg, c_arg, eh_arg, ch_arg)

        ts = jnp.arange(t_max, dtype=jnp.int32)
        (_, fin), (e_arg, c_arg, eh_arg, ch_arg) = jax.lax.scan(
            frame, (sc0, fin0), (jnp.moveaxis(loglikes, 1, 0), ts)
        )
        return DenseOutputs(e_arg, c_arg, eh_arg, ch_arg, fin)

    return jax.jit(decode)


def traceback_dense(
    out: DenseOutputs,
    final_scores: np.ndarray,     # [B, N] post-closure scores at each
    #                               utterance's LAST frame (fetch via
    #                               keep_scores or recompute; see decode_dense)
    lengths: np.ndarray,
    g: DenseGraph,
) -> List[Tuple[List[int], float]]:
    """Host walk of the winning-slot tables; returns (words, cost) per utt."""
    e_arg = np.asarray(out.emit_arg)
    c_arg = np.asarray(out.clo_arg)
    eh_arg = np.asarray(out.ehub_arg)
    ch_arg = np.asarray(out.chub_arg)
    he_row = {int(s): i for i, s in enumerate(g.ehub_state)}
    hc_row = {int(s): i for i, s in enumerate(g.chub_state)}
    results = []
    b = final_scores.shape[0]
    for i in range(b):
        t_last = int(lengths[i]) - 1
        if t_last < 0:
            results.append(([], 0.0))
            continue
        total = final_scores[i] + g.final_weight
        if np.isfinite(total).any():
            s = int(np.argmin(total))
            cost = float(total[s])
        else:
            s = int(np.argmin(final_scores[i]))
            cost = float(final_scores[i][s])
        words_rev: List[int] = []
        for t in range(t_last, -1, -1):
            # closure phase (post-emit) at frame t
            ca = int(c_arg[t, i, s])
            if ca == 255 and s in hc_row:
                hslot = int(ch_arg[t, i, hc_row[s]])
                ol = int(g.chub_ol[hc_row[s], hslot])
                src = int(g.chub_src[hc_row[s], hslot])
            elif ca == 254:
                ol, src = 0, s
            else:
                ol = int(g.clo_ol[s, ca])
                src = int(g.clo_src[s, ca])
            if ol:
                words_rev.append(ol)
            s = src
            # emit phase at frame t
            ea = int(e_arg[t, i, s])
            if ea == 255 and s in he_row:
                hslot = int(eh_arg[t, i, he_row[s]])
                ol = int(g.ehub_ol[he_row[s], hslot])
                src = int(g.ehub_src[he_row[s], hslot])
            else:
                ol = int(g.emit_ol[s, ea])
                src = int(g.emit_src[s, ea])
            if ol:
                words_rev.append(ol)
            s = src
        if int(g.init_olabel[s]):
            words_rev.append(int(g.init_olabel[s]))
        results.append((words_rev[::-1], cost))
    return results


def decode_dense(
    loglikes: np.ndarray, lengths: np.ndarray,
    g: DenseGraph, dev: DenseDeviceGraph,
    acoustic_scale: float = 0.9,
    _decoder_cache: dict = {},
) -> List[Tuple[List[int], float]]:
    """Convenience one-call dense decode: device pass + host traceback."""
    key = (id(g), acoustic_scale, loglikes.shape[1:])
    if key not in _decoder_cache:
        _decoder_cache[key] = make_dense_decoder(g, acoustic_scale)
    fn = _decoder_cache[key]
    out = fn(jnp.asarray(loglikes), jnp.asarray(lengths), dev)
    return traceback_dense(
        out, np.asarray(out.final_scores), lengths, g
    )
