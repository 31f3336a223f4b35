"""Batched token-passing WFST beam search on TPU.

The TPU-native replacement for the reference's CPU Viterbi decoders
(reference: src/decoder/faster-decoder.cc ProcessEmitting/ProcessNonemitting
token passing with beam + max_active pruning; src/decoder/
decodable-matrix.h:47-54 tid-1 acoustic column shift).  Redesigned for
static shapes and data parallelism:

- The active set is a fixed-size array of K slots per utterance
  ([B, K] state ids + scores + the state's own arc-table offsets; dead
  slots = +inf), not a hash map.
- Arc expansion is ONE contiguous-block gather of packed [E, 8] int32 arc
  rows (il, ol, weight_bits, dst, dst_emit_base, dst_emit_deg,
  dst_closure_base, dst_closure_deg).  Because every arc row carries its
  DESTINATION's offsets, the active set inherits its offsets from the
  winning arc and the search performs no random offsets gather — random
  gathers are the latency killer on TPU, contiguous-block gathers are
  nearly free.
- High-fanout "hub" states can be expanded densely every frame
  (contiguous vector math over their arc tables, no gather).
- Viterbi recombination (the hash-map min in the reference) is sort-based:
  two variadic `lax.sort` passes (by score, then stably by destination)
  make the best proposal per state the first of its run — no scatter
  (TPU scatter-with-min lowers catastrophically slowly on some platforms).
- Epsilon closure runs either as ONE precomputed-transitive-closure
  expansion (graphs compiled with build_closure=True) or as eps-depth
  iterations over the eps table.
- Backpointers are composed WITHIN each frame, so the scan emits one
  parent slot plus up to MAX_OLABELS_PER_FRAME output labels per slot per
  frame; the best path is recovered by a trivial host walk (traceback()).

Batched over utterances sharing one graph; shard the batch axis over a
mesh for multi-chip decoding.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

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
    # lattice beam: the recipe pipeline prunes reconstructed lattices to
    # paths within this of the best (exact forward+backward, Lattice
    # .prune — the PruneActiveTokens analogue, lattice-faster-decoder
    # .h:50).  The search also emits BeamOutputs.lat_mask (tokens within
    # lattice_beam of the FRAME best) as a cheap diagnostic, but that
    # frame-local margin is unsound for retention — a token can trail
    # the frame best by more than the beam mid-word yet lie on a
    # complete path within the beam — so lattice reconstruction ignores
    # it by default (lattice_from_beam use_lat_mask=False).
    lattice_beam: float = 0.0
    # words emitted by one frame's arc+eps chain; overflow beyond this is
    # counted in BeamOutputs.overflow — callers should re-decode with a
    # larger value if it ever trips (recipes do)
    max_olabels: int = MAX_OLABELS_PER_FRAME
    # approximate top-k (jax.lax.approx_max_k): much cheaper on TPU for
    # large K; pruning becomes slightly approximate (recall ~0.95)
    approx_top_k: bool = False
    # funnel pre-prune: exact top_k by score narrows the K*D proposals to
    # funnel_mult*K before the recombination sort (the per-frame cost
    # driver).  Exact as long as the funnel survivors cover >= K distinct
    # destinations; 0 disables.
    funnel_mult: int = 0
    # skip the (sort-heavy) Viterbi recombination on all but the LAST
    # epsilon iteration: duplicates temporarily waste beam slots but the
    # search stays exact as long as max_active has headroom
    light_eps_dedup: bool = False
    # top-k-only pruning after the EMITTING phase (full recombination
    # still runs after the closure phase): a max_active-style
    # approximation that removes one sort-heavy dedup per frame
    light_emit_dedup: bool = False
    # top-k-only pruning after the (single-expansion) CLOSURE phase:
    # duplicate destination states survive into the next frame's active
    # set, wasting slots but staying exact while max_active has
    # headroom.  On LM-scale graphs whose closure degree exceeds the
    # Pallas kernel cap this replaces the widest XLA sort of the frame.
    light_closure_dedup: bool = False
    # force the take_along_axis acoustic lookup instead of the one-hot
    # contraction (perf probe; the one-hot path wins at small V)
    acoustic_gather: bool = False
    # fused Pallas recombination kernel (ops/beam_pallas.py): beam
    # threshold + dedup + top-k as in-register bitonic networks in ONE
    # kernel instead of ~8 XLA ops.  "auto" uses it on TPU whenever the
    # proposal width fits the kernel cap; "always"/"never" force;
    # "interpret" runs the kernel in interpreter mode (CPU tests).
    # Exact — funnel_mult / approx_top_k are ignored on this path.
    pallas_dedup: str = "auto"
    # unroll factor for the frame scan: the axon TPU runtime has a
    # ~0.5 ms per-while-iteration overhead, so unrolling U frames per
    # loop iteration amortizes it U-fold at the cost of a bigger program
    # (compile time scales with U; diminishing returns past 4)
    scan_unroll: int = 1
    # blank-frame skipping (phone-synchronous decoding): frames whose
    # blank posterior exceeds this threshold are compacted away BEFORE
    # the search (decoder/frame_skip.py) — they shift every path by the
    # same constant, so hypotheses/lattice rankings are unchanged while
    # decode cost drops by the blank rate (typically 2-5x on converged
    # CTC models).  Applied by the recipe driver, not by the search
    # program itself.  0 disables.
    blank_skip: float = 0.0
    # kept-frame counts are rounded up to this bucket so repeated decode
    # calls reuse a few compiled search programs
    blank_skip_bucket: int = 64
    # keep the active set sorted by state id (one cheap [B,K] sort per
    # recombination): the next frame's arc-row gathers then walk the HBM
    # arc table in ascending order, which improves DMA locality on
    # multi-million-state graphs where the table spans hundreds of MB
    sort_active: bool = False
    # compact (CSR) arc expansion budgets.  The rectangular expansion
    # pads every active slot to the graph's MAX out-degree, but real TLG
    # degree distributions are heavily skewed (the LM-scale trigram
    # graph: mean emit degree 1.1 vs cap 16 -> 93% of the [K*D] proposal
    # lanes are padding, and every downstream op — acoustic lookup,
    # recombination sort, payload take_alongs — pays for them).  With a
    # budget M > 0, the expansion instead lays the active set's arcs out
    # contiguously in M shared lanes (exclusive-cumsum of degrees +
    # searchsorted for lane->slot ownership).  EXACT while the active
    # set's total degree fits the budget; overflowing arcs are dropped
    # and counted in BeamOutputs.overflow (same contract as max_olabels
    # — recipes re-decode with a bigger budget if it ever trips).
    # 0 = rectangular expansion.
    arc_budget_emit: int = 0
    arc_budget_x: int = 0


# Dense state-indexed arc rows replace the (base+j)-indexed arc-packed
# gather whenever the padded [N, D, 4] tables fit this byte budget: with
# a degree cap the state id IS the offset, so the destination-offsets
# payload (fields 4..8 of the packed rows, the [B,K,4] offs carry and
# its per-phase take_alongs) disappears.  Measured on a 336k-state TLG
# (v5e, B=8/32, K=512): per-frame cost is IDENTICAL to the arc-packed
# layout (2.5-2.6 ms at B=8) — the search is sort/payload-bound, not
# gather-bound, and the 9x larger table cancels the wider-row fetch win
# — so the budget is kept small: small graphs get the simpler layout,
# big graphs keep the 9x smaller packed table.
DENSE_ROWS_BUDGET = 64 * 1024 * 1024


def use_dense_rows(graph: CompiledGraph) -> bool:
    return graph.dense_bytes() <= DENSE_ROWS_BUDGET


class DeviceGraph(NamedTuple):
    """CompiledGraph arrays as device arrays (jit operands).

    Exactly one of the two layouts is populated (the other fields are
    zero-size): arc-packed ([E, 8] rows indexed base+j, offsets carried
    in the rows/active set) or dense state-indexed rows ([N, D, 4],
    chosen by `use_dense_rows`).  The decoder branches on the populated
    layout at trace time, so put() and make_beam_decoder agree as long
    as both see the same graph."""
    emit_packed: Array    # [Ee, 8] int32 (arc-packed layout)
    x_packed: Array       # [Ex, 8] int32 — closure table if built, else eps
    emit_rows: Array      # [N, De, 4] int32 (dense layout; else [0,1,4])
    x_rows: Array         # [N, Dx, 4] int32 (dense layout; else [0,1,4])
    hub_src: Array        # [H] int32 (may be empty)
    hub_of_arc: Array     # [Eh] int32 (hub index per hub arc)
    hub_packed: Array     # [Eh, 8] int32
    final_weight: Array   # [N] float32

    @classmethod
    def put(cls, g: CompiledGraph, dense: bool = None) -> "DeviceGraph":
        if dense is None:
            dense = use_dense_rows(g)
        z = np.zeros((0, 1, 4), np.int32)
        if dense:
            emit_rows, x_rows = g.dense_rows()
            emit_packed = np.zeros((0, 8), np.int32)
            x_packed = np.zeros((0, 8), np.int32)
        else:
            emit_rows, x_rows = z, z
            emit_packed = g.emit_packed()
            x_packed = (
                g.closure_packed8() if g.has_closure else g.eps_packed()
            )
        hub_src = (
            g.hub_src if g.hub_src is not None else np.zeros(0, np.int32)
        )
        if g.hub_offsets is not None and len(hub_src) > 0:
            hub_of_arc = np.repeat(
                np.arange(len(hub_src), dtype=np.int32),
                np.diff(g.hub_offsets),
            )
            hub_packed = g.hub_packed8()
        else:
            hub_of_arc = np.zeros(0, np.int32)
            hub_packed = np.zeros((0, 8), np.int32)
        return cls(
            jnp.asarray(emit_packed), jnp.asarray(x_packed),
            jnp.asarray(emit_rows), jnp.asarray(x_rows),
            jnp.asarray(hub_src), jnp.asarray(hub_of_arc),
            jnp.asarray(hub_packed),
            jnp.asarray(g.final_weight),
        )


class BeamOutputs(NamedTuple):
    states: Array       # [T, B, K] int32 active states (post eps-closure)
    scores: Array       # [T, B, K] float32
    parent: Array       # [T, B, K] int32 slot in frame t-1 (t=0: init set)
    olabels: Array      # [T, B, K, max_olabels] int32 (0 = none)
    init_olabels: Array  # [B, K, max_olabels] from the initial closure
    overflow: Array     # [B] int32 count of dropped olabels (should be 0)
    lat_mask: Array     # [T, B, K] bool: token within lattice_beam of the
    #                     frame best (all-finite if lattice_beam == 0)


def _expand_dense(
    states: Array, scores: Array, rows_tbl: Array,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Dense-layout expansion: ONE [D*4]-lane row gather by state id.

    states [B,K] (-1 = dead), scores [B,K], rows_tbl [N, D, 4] ->
    [B,K*D] (dst, score, ilabel, olabel, d_offs [B,K*D,0]).  Padding
    slots in the table carry weight=+inf and dead slots carry score=inf,
    so invalid proposals are inf with no mask arithmetic."""
    b, k = scores.shape
    n, d, _ = rows_tbl.shape
    m = k * d
    sid = jnp.clip(states, 0, max(n - 1, 0))
    rows = rows_tbl[sid]                              # [B,K,D,4]
    il = rows[..., 0]
    ol = rows[..., 1]
    w = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
    dst = rows[..., 3]
    score = scores[..., None] + w                     # inf-padding prunes
    fin = jnp.isfinite(score)
    il = jnp.where(fin, il, 0)
    ol = jnp.where(fin, ol, 0)
    dst = jnp.where(fin, dst, 0)
    return (
        dst.reshape(b, m), score.reshape(b, m),
        il.reshape(b, m), ol.reshape(b, m),
        jnp.zeros((b, m, 0), jnp.int32),
    )


def _expand(
    offs: Array, scores: Array, packed: Array, degree_cap: int,
    which: int,
) -> Tuple[Array, Array, Array, Array, Array]:
    """offs [B,K,4] + scores [B,K] -> [B,K*D] (dst, score w/o acoustic,
    ilabel, olabel, dst_offs [B,K*D,4]) via ONE block gather.
    which: 0 = emit table offsets (fields 0,1), 1 = closure/eps (2,3)."""
    b, k, _ = offs.shape
    m = k * degree_cap
    base = offs[..., 2 * which]
    deg = offs[..., 2 * which + 1]
    j = jnp.arange(degree_cap, dtype=jnp.int32)
    aid = base[..., None] + j                         # [B,K,D]
    valid = (j < deg[..., None]) & jnp.isfinite(scores)[..., None]
    n_arcs = packed.shape[0]
    if n_arcs == 0:
        score = jnp.full((b, m), jnp.inf, jnp.float32)
        z = jnp.zeros((b, m), jnp.int32)
        return z, score, z, z, jnp.zeros((b, m, 4), jnp.int32)
    aid_safe = jnp.clip(aid, 0, n_arcs - 1)
    rows = packed[aid_safe]                           # [B,K,D,8]
    il = jnp.where(valid, rows[..., 0], 0)
    ol = jnp.where(valid, rows[..., 1], 0)
    w = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
    dst = jnp.where(valid, rows[..., 3], 0)
    score = jnp.where(valid, scores[..., None] + w, INF)
    d_offs = jnp.where(valid[..., None], rows[..., 4:8], 0)
    return (
        dst.reshape(b, m), score.reshape(b, m),
        il.reshape(b, m), ol.reshape(b, m),
        d_offs.reshape(b, m, 4),
    )


def _expand_compact(
    offs: Array, scores: Array, packed: Array, which: int, m_budget: int,
) -> Tuple[Array, Array, Array, Array, Array, Array, Array]:
    """CSR expansion: the active set's arcs laid out contiguously in
    `m_budget` shared lanes instead of one max-degree-padded row block
    per slot.

    offs [B,K,4] + scores [B,K] -> (dst, score w/o acoustic, ilabel,
    olabel, dst_offs [B,M,4], src_slot [B,M], arc_overflow [B]).
    Lane->slot ownership: slot k owns lanes [cum[k], cum[k]+deg[k]) where
    cum is the exclusive cumsum of (live) degrees; the owner of lane j is
    the LAST slot with cum <= j (zero-degree slots have empty ranges, so
    the tie rule is exact).  Arcs beyond the budget are dropped and
    counted."""
    b, k, _ = offs.shape
    base = offs[..., 2 * which]
    deg = jnp.where(
        jnp.isfinite(scores), offs[..., 2 * which + 1], 0
    )
    cum = jnp.cumsum(deg, axis=1) - deg                  # exclusive
    total = cum[:, -1] + deg[:, -1]                      # [B]
    lane = jnp.broadcast_to(
        jnp.arange(m_budget, dtype=jnp.int32)[None, :], (b, m_budget)
    )
    n_arcs = packed.shape[0]
    if n_arcs == 0:
        score = jnp.full((b, m_budget), jnp.inf, jnp.float32)
        z = jnp.zeros((b, m_budget), jnp.int32)
        return (z, score, z, z, jnp.zeros((b, m_budget, 4), jnp.int32),
                z, jnp.zeros((b,), jnp.int32))
    s = jax.vmap(
        lambda c, l: jnp.searchsorted(c, l, side="right")
    )(cum, lane).astype(jnp.int32) - 1
    s = jnp.clip(s, 0, k - 1)
    base_s = jnp.take_along_axis(base, s, axis=1)
    cum_s = jnp.take_along_axis(cum, s, axis=1)
    scr_s = jnp.take_along_axis(scores, s, axis=1)
    aid = base_s + (lane - cum_s)
    valid = lane < jnp.minimum(total, m_budget)[:, None]
    rows = packed[jnp.clip(aid, 0, n_arcs - 1)]          # [B, M, 8]
    il = jnp.where(valid, rows[..., 0], 0)
    ol = jnp.where(valid, rows[..., 1], 0)
    w = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
    dst = jnp.where(valid, rows[..., 3], 0)
    score = jnp.where(valid, scr_s + w, INF)
    d_offs = jnp.where(valid[..., None], rows[..., 4:8], 0)
    arc_overflow = jnp.maximum(total - m_budget, 0)
    return dst, score, il, ol, d_offs, s, arc_overflow


def _acoustic_lookup(
    ll_t: Array, col: Array, scale: float, force_gather: bool = False,
) -> Array:
    """-scale * ll_t[b, col[b, m]] without a gather.

    XLA gathers on TPU are latency-bound per element (~ns each); for the
    small acoustic vocabularies of CTC graphs (V <= 128 tokens) a one-hot
    contraction is pure vector math and far cheaper at [B, 34k] widths."""
    b, v = ll_t.shape
    if v > 128 or force_gather:
        return -scale * jnp.take_along_axis(ll_t, col, axis=1)
    onehot = (
        col[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, v), 2)
    )
    return jnp.einsum(
        "bmv,bv->bm", onehot.astype(jnp.float32), -scale * ll_t
    )


def _dedup_and_prune(
    dst: Array, score: Array, k: int, beam: float, approx: bool = False,
    funnel: int = 0,
) -> Tuple[Array, Array, Array]:
    """Viterbi-recombine proposals sharing a destination state, apply the
    beam, keep the best K.  Returns (new_states [B,K], new_scores [B,K],
    kept proposal idx [B,K] into the original proposal axis).

    One lexicographic (dst, score) sort makes the best proposal per state
    the first of its destination run.  With funnel > 0, an exact top_k by
    score first narrows the m proposals to the `funnel` best before the
    (much costlier) sort; this is exact whenever the funnel survivors
    cover >= k distinct destinations — guaranteed-safe beyond k*max_degree,
    and in practice a few*k (duplicates per destination are bounded by the
    active set's in-degree within the beam)."""
    b, m = dst.shape
    best = jnp.min(score, axis=1, keepdims=True)
    score = jnp.where(score <= best + beam, score, INF)
    idx0 = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :], (b, m)
    )
    if 0 < funnel < m:
        f = max(funnel, k)
        neg, fidx = jax.lax.top_k(-score, f)
        score = -neg
        fidx = fidx.astype(jnp.int32)
        dst = jnp.take_along_axis(dst, fidx, axis=1)
        idx0 = fidx
    dst2, score2, orig_idx = jax.lax.sort(
        (dst, score, idx0), num_keys=2, dimension=1
    )
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


def _sort_by_state(
    states: Array, scores: Array, kept: Array
) -> Tuple[Array, Array, Array]:
    """Reorder active slots ascending by state id (dead slots last).

    Slot order is free — parents/olabels are permuted via `kept` by the
    caller and traceback scans all slots — so sorting costs only one
    small [B,K] sort while making the next frame's arc-table gathers
    walk HBM in ascending address order."""
    key = jnp.where(states < 0, jnp.int32(0x7FFFFFFF), states)
    _, states, scores, kept = jax.lax.sort(
        (key, states, scores, kept), num_keys=1, dimension=1
    )
    return states, scores, kept


def _topk_prune(dst: Array, score: Array, k: int) -> Tuple[Array, Array, Array]:
    """Pruning without recombination (duplicates allowed)."""
    tn, ti = jax.lax.top_k(-score, k)
    new_scores = -tn
    new_states = jnp.where(
        jnp.isfinite(new_scores),
        jnp.take_along_axis(dst, ti, axis=1), -1,
    )
    return new_states, new_scores, ti


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


def compose_chunk_paths(
    parent: Array,    # [Tc, B, K] per-frame parent slots
    olabels: Array,   # [Tc, B, K, L] per-frame output labels (0 = none)
    cap: int,
) -> Tuple[Array, Array, Array, Array]:
    """Collapse a chunk's per-frame backpointers into ONE summary:
    (entry [B,K], words [B,K,cap], wcount [B,K], wovf [B,K]).

    entry[b,k] = the slot at chunk START that slot k at chunk END
    descends from; words[b,k] = the olabels emitted along that path, in
    order (truncated at `cap`, overflow counted per slot — only the
    winning slot's flag matters to a traceback).  Composing summaries
    chunk-by-chunk makes streaming traceback O(chunks) instead of
    O(frames), which is what keeps finish()/partial() at ms scale."""
    tc, b, k = parent.shape
    entry0 = jnp.repeat(jnp.arange(k, dtype=jnp.int32)[None], b, 0)
    words0 = jnp.zeros((b, k, cap), jnp.int32)
    cnt0 = jnp.zeros((b, k), jnp.int32)
    ovf0 = jnp.zeros((b, k), jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, k, cap), 2)

    def step(carry, inp):
        entry, words, cnt, ovf = carry
        p_t, o_t = inp
        entry = jnp.take_along_axis(entry, p_t, axis=1)
        words = jnp.take_along_axis(words, p_t[..., None], axis=1)
        cnt = jnp.take_along_axis(cnt, p_t, axis=1)
        ovf = jnp.take_along_axis(ovf, p_t, axis=1)
        for li in range(o_t.shape[-1]):
            new = o_t[..., li]
            do = new != 0
            can = cnt < cap
            idx = jnp.clip(cnt, 0, cap - 1)
            words = jnp.where(
                (pos == idx[..., None]) & (do & can)[..., None],
                new[..., None], words,
            )
            ovf = ovf + (do & ~can)
            cnt = cnt + (do & can)
        return (entry, words, cnt, ovf), None

    (entry, words, cnt, ovf), _ = jax.lax.scan(
        step, (entry0, words0, cnt0, ovf0), (parent, olabels)
    )
    return entry, words, cnt, ovf


def make_beam_decoder(
    graph: CompiledGraph, cfg: BeamSearchConfig = BeamSearchConfig(),
    _internals: bool = False,
):
    """Build a jitted decoder: fn(loglikes [B,T,V], lengths [B], dgraph)
    -> BeamOutputs.  (_internals exposes the chunked entry points for
    StreamingBeamDecoder.)"""
    k = cfg.max_active
    dense = use_dense_rows(graph)
    d_e = max(graph.max_emit_degree, 1)
    use_closure = graph.has_closure
    d_x = max(
        graph.max_closure_degree if use_closure else graph.max_eps_degree,
        1,
    )
    has_hubs = graph.has_hubs
    eps_iters = 1 if use_closure else (
        cfg.eps_iters or max(graph.eps_depth, 1)
    )
    beam = cfg.beam
    scale = cfg.acoustic_scale
    start_state = graph.start
    n_off = 0 if dense else 4
    start_offs = (
        () if dense
        else tuple(int(x) for x in graph.state_offs(graph.start))
    )
    approx = cfg.approx_top_k
    light = cfg.light_eps_dedup
    light_emit = cfg.light_emit_dedup
    funnel = cfg.funnel_mult * k if cfg.funnel_mult > 0 else 0
    # budgets below K would make the top-k/recombination stage invalid
    # (fewer proposal lanes than active slots); clamp up
    m_e = 0 if dense else (
        max(cfg.arc_budget_emit, k) if cfg.arc_budget_emit > 0 else 0
    )
    m_x = 0 if dense else (
        max(cfg.arc_budget_x, k) if cfg.arc_budget_x > 0 else 0
    )
    L = max(cfg.max_olabels, 1)
    lat_beam = cfg.lattice_beam
    pmode = cfg.pallas_dedup

    def _dedup(dst: Array, score: Array):
        """Recombine+prune dispatch: fused Pallas kernel when enabled and
        the proposal width fits its compile-time cap, else the EXACT XLA
        sort path.  Wider merges used to funnel down to the kernel by a
        top_k over scores, but that is only exact when the survivors
        cover >= k distinct destinations — on dense (blank-compacted)
        content the top proposals pile onto few destinations and the
        truth path gets KILLED (4.25% -> 14% WER measured); widening the
        funnel to the kernel cap fixed correctness but measured SLOWER
        than the plain exact sort (2.89 vs 2.38 ms/frame on the
        336k-state bench graph), so wide merges now just sort."""
        from eesen_tpu.ops import beam_pallas
        b, m = dst.shape
        cap = beam_pallas.MAX_LANES_AUTO
        fits = beam_pallas._next_pow2(m) <= cap
        interp = pmode == "interpret"
        enabled = pmode == "always" or interp or (
            pmode == "auto" and jax.default_backend() == "tpu"
        )
        if pmode == "always" or (enabled and fits):
            out = beam_pallas.dedup_prune(dst, score, k, beam,
                                          interpret=interp)
        else:
            out = _dedup_and_prune(
                dst, score, k, beam, approx, 0 if enabled else funnel
            )
        return _sort_by_state(*out) if cfg.sort_active else out

    def _x_step(carry_in, do_full_dedup):
        """One eps/closure expansion merged with the carried set."""
        states, scores, offs, parent, olab, overflow = carry_in
        b = states.shape[0]
        if dense:
            dst, pscore, _, exp_ol, d_offs = _expand_dense(
                states, scores, dg_holder[0].x_rows
            )
            src_of_prop = None
        elif m_x > 0:
            dst, pscore, _, exp_ol, d_offs, src_of_prop, arc_of = (
                _expand_compact(
                    offs, scores, dg_holder[0].x_packed, 1, m_x
                )
            )
            overflow = overflow + arc_of
        else:
            dst, pscore, _, exp_ol, d_offs = _expand(
                offs, scores, dg_holder[0].x_packed, d_x, which=1
            )
            src_of_prop = None
        exp_ol = jnp.where(jnp.isfinite(pscore), exp_ol, 0)
        if src_of_prop is None:
            d_x_eff = pscore.shape[1] // k
            src_slot = jnp.repeat(
                jnp.arange(k, dtype=jnp.int32)[None, :], b, 0
            )
            src_of_prop = jnp.repeat(src_slot, d_x_eff, axis=1)
        exp_parent = jnp.take_along_axis(parent, src_of_prop, axis=1)
        exp_olab = jnp.take_along_axis(
            olab, src_of_prop[..., None], axis=1
        )
        exp_olab, overflow = _append_olabel(exp_olab, exp_ol, overflow)
        all_dst = jnp.concatenate([jnp.maximum(states, 0), dst], axis=1)
        all_score = jnp.concatenate([scores, pscore], axis=1)
        all_parent = jnp.concatenate([parent, exp_parent], axis=1)
        all_olab = jnp.concatenate([olab, exp_olab], axis=1)
        all_offs = jnp.concatenate([offs, d_offs], axis=1)
        if do_full_dedup:
            new_states, new_scores, top_idx = _dedup(all_dst, all_score)
        else:
            new_states, new_scores, top_idx = _topk_prune(
                all_dst, all_score, k
            )
        new_parent = jnp.take_along_axis(all_parent, top_idx, axis=1)
        new_olab = jnp.take_along_axis(
            all_olab, top_idx[..., None], axis=1
        )
        new_offs = jnp.take_along_axis(
            all_offs, top_idx[..., None], axis=1
        )
        return (
            new_states, new_scores, new_offs, new_parent, new_olab, overflow
        )

    # dg is threaded through a mutable holder so the helper closures can
    # reference the traced DeviceGraph without replumbing every signature
    dg_holder = [None]

    def eps_phase(states, scores, offs, parent, olab, overflow):
        if use_closure:
            return _x_step(
                (states, scores, offs, parent, olab, overflow),
                not cfg.light_closure_dedup,
            )

        def one_iter(carry, is_last):
            if light:
                out = jax.lax.cond(
                    is_last,
                    lambda c: _x_step(c, True),
                    lambda c: _x_step(c, False),
                    carry,
                )
            else:
                out = _x_step(carry, True)
            return out, None

        last_flags = jnp.arange(eps_iters) == (eps_iters - 1)
        carry, _ = jax.lax.scan(
            one_iter, (states, scores, offs, parent, olab, overflow),
            last_flags,
        )
        return carry

    def init_active_set(b: int):
        """Start-state active set after the initial eps closure."""
        states0 = jnp.full((b, k), -1, jnp.int32).at[:, 0].set(start_state)
        scores0 = jnp.full((b, k), jnp.inf, jnp.float32).at[:, 0].set(0.0)
        offs0 = jnp.zeros((b, k, n_off), jnp.int32)
        if not dense:
            offs0 = offs0.at[:, 0, :].set(
                jnp.asarray(start_offs, jnp.int32)
            )
        parent0 = jnp.repeat(jnp.arange(k, dtype=jnp.int32)[None], b, 0)
        olab0 = jnp.zeros((b, k, L), jnp.int32)
        overflow0 = jnp.zeros((b,), jnp.int32)
        states0, scores0, offs0, _, init_olab, overflow0 = eps_phase(
            states0, scores0, offs0, parent0, olab0, overflow0
        )
        return states0, scores0, offs0, overflow0, init_olab

    def make_frame(dg: DeviceGraph, v: int):
        def frame(carry, inp):
            states, scores, offs, overflow = carry
            ll_t, act = inp        # [B, V], [B] bool
            b = states.shape[0]
            parent_e = None
            if dense:
                dst, pscore, il, ol, d_offs = _expand_dense(
                    states, scores, dg.emit_rows
                )
            elif m_e > 0:
                dst, pscore, il, ol, d_offs, parent_e, arc_of = (
                    _expand_compact(offs, scores, dg.emit_packed, 0, m_e)
                )
                overflow = overflow + arc_of
            else:
                dst, pscore, il, ol, d_offs = _expand(
                    offs, scores, dg.emit_packed, d_e, which=0
                )
            col = jnp.clip(il - 1, 0, v - 1)            # tid-1 shift
            ac = _acoustic_lookup(ll_t, col, scale, cfg.acoustic_gather)
            pscore = jnp.where(jnp.isfinite(pscore), pscore + ac, INF)
            if parent_e is None:
                slot_idx = jnp.repeat(
                    jnp.arange(k, dtype=jnp.int32)[None, :], b, 0
                )
                d_e_eff = pscore.shape[1] // k
                parent_e = jnp.repeat(slot_idx, d_e_eff, axis=1)

            if has_hubs:
                # dense expansion of hub-state arcs: contiguous vector
                # math over the hub tables, no gather
                eq = states[:, :, None] == dg.hub_src[None, None, :]
                msk = jnp.where(
                    eq & jnp.isfinite(scores)[:, :, None],
                    scores[:, :, None], INF,
                )                                           # [B,K,H]
                hub_score = jnp.min(msk, axis=1)            # [B,H]
                hub_parent = jnp.argmin(msk, axis=1).astype(jnp.int32)
                hp = dg.hub_packed
                il_h, ol_h = hp[:, 0], hp[:, 1]
                w_h = jax.lax.bitcast_convert_type(hp[:, 2], jnp.float32)
                dst_h = hp[:, 3]
                arc_hub = dg.hub_of_arc                     # [Eh]
                sc_h = (
                    hub_score[:, arc_hub] + w_h[None, :]
                    - scale * ll_t[:, jnp.clip(il_h - 1, 0, v - 1)]
                )                                           # [B,Eh]
                par_h = hub_parent[:, arc_hub]              # [B,Eh]
                eh = hp.shape[0]
                dst = jnp.concatenate(
                    [dst, jnp.broadcast_to(dst_h[None], (b, eh))], axis=1
                )
                pscore = jnp.concatenate([pscore, sc_h], axis=1)
                ol = jnp.concatenate(
                    [ol, jnp.broadcast_to(ol_h[None], (b, eh))], axis=1
                )
                parent_e = jnp.concatenate([parent_e, par_h], axis=1)
                hub_offs = (
                    jnp.zeros((b, eh, 0), jnp.int32) if dense
                    else jnp.broadcast_to(hp[None, :, 4:8], (b, eh, 4))
                )
                d_offs = jnp.concatenate([d_offs, hub_offs], axis=1)

            if light_emit:
                e_states, e_scores, e_idx = _topk_prune(dst, pscore, k)
            else:
                e_states, e_scores, e_idx = _dedup(dst, pscore)
            parent = jnp.take_along_axis(parent_e, e_idx, axis=1)
            e_offs = jnp.take_along_axis(d_offs, e_idx[..., None], axis=1)
            olab0_f = jnp.zeros((b, k, L), jnp.int32)
            emit_ol = jnp.where(
                jnp.isfinite(e_scores),
                jnp.take_along_axis(ol, e_idx, axis=1), 0,
            )
            olab, overflow = _append_olabel(olab0_f, emit_ol, overflow)
            (n_states_, n_scores, n_offs, parent, olab, overflow
             ) = eps_phase(e_states, e_scores, e_offs, parent, olab, overflow)
            active = act[:, None]
            out_states = jnp.where(active, n_states_, states)
            out_scores = jnp.where(active, n_scores, scores)
            out_offs = jnp.where(active[..., None], n_offs, offs)
            ident = jnp.repeat(jnp.arange(k, dtype=jnp.int32)[None], b, 0)
            out_parent = jnp.where(active, parent, ident)
            out_olab = jnp.where(active[..., None], olab, 0)
            # ONE stacked per-frame output: each separate scan output
            # costs its own dynamic-update-slice per iteration (~0.65 ms
            # for five on axon v5e); pack everything into one int32
            # plane and split after the scan.  lat_mask is derived from
            # the stacked scores post-scan (it is a pure function of
            # them), so it costs nothing here.
            packed = jnp.concatenate(
                [out_states[..., None],
                 jax.lax.bitcast_convert_type(
                     out_scores, jnp.int32)[..., None],
                 out_parent[..., None],
                 out_olab], axis=-1,
            )                                           # [B, K, 3+L]
            return (out_states, out_scores, out_offs, overflow), packed

        return frame

    def _unpack_outputs(packed: Array):
        """[T, B, K, 3+L] int32 -> (states, scores, parent, olab, mask)."""
        st = packed[..., 0]
        sc = jax.lax.bitcast_convert_type(packed[..., 1], jnp.float32)
        par = packed[..., 2]
        ol = packed[..., 3:]
        finite = jnp.isfinite(sc)
        if lat_beam > 0.0:
            fbest = jnp.min(sc, axis=-1, keepdims=True)
            mask = finite & (sc <= fbest + lat_beam)
        else:
            mask = finite
        return st, sc, par, ol, mask

    def _check_layout(dg: DeviceGraph):
        have_dense = dg.emit_rows.shape[0] > 0
        if dense != have_dense:
            raise ValueError(
                f"decoder was built for the "
                f"{'dense-rows' if dense else 'arc-packed'} layout but the "
                f"DeviceGraph holds the other; build it with "
                f"DeviceGraph.put(graph) (auto) or put(graph, "
                f"dense={dense})"
            )

    def decode(loglikes: Array, lengths: Array, dg: DeviceGraph) -> BeamOutputs:
        _check_layout(dg)
        dg_holder[0] = dg
        b, t_max, v = loglikes.shape
        states0, scores0, offs0, overflow0, init_olab = init_active_set(b)
        frame = make_frame(dg, v)
        ts = jnp.arange(t_max, dtype=jnp.int32)
        act = ts[:, None] < lengths[None, :]           # [T, B]
        (_, _, _, overflow), packed = jax.lax.scan(
            frame, (states0, scores0, offs0, overflow0),
            (jnp.moveaxis(loglikes, 1, 0), act),
            unroll=min(cfg.scan_unroll, t_max) if cfg.scan_unroll > 1 else 1,
        )
        st, sc, par, ol, lm = _unpack_outputs(packed)
        return BeamOutputs(st, sc, par, ol, init_olab, overflow, lm)

    def init_chunk(b: int, dg: DeviceGraph):
        _check_layout(dg)
        dg_holder[0] = dg
        states0, scores0, offs0, overflow0, init_olab = init_active_set(b)
        return (states0, scores0, offs0, overflow0), init_olab

    def decode_chunk(carry, loglikes: Array, active: Array, dg: DeviceGraph):
        """One chunk of a streaming decode: carry from init_chunk /
        previous chunk, loglikes [B, Tc, V], active [B, Tc] bool."""
        _check_layout(dg)
        dg_holder[0] = dg
        b, t_c, v = loglikes.shape
        frame = make_frame(dg, v)
        carry, packed = jax.lax.scan(
            frame, carry,
            (jnp.moveaxis(loglikes, 1, 0), jnp.moveaxis(active, 1, 0)),
            unroll=min(cfg.scan_unroll, t_c) if cfg.scan_unroll > 1 else 1,
        )
        return carry, _unpack_outputs(packed)

    if _internals:
        return init_chunk, decode_chunk
    return jax.jit(decode)


class StreamingBeamDecoder:
    """Chunked (online) WFST decoding with carried search state.

    The reference ships only dead online-decoding code; this class makes
    the batched TPU search streamable: the active set (states, scores,
    arc offsets, overflow) is an explicit carry, so audio can be decoded
    chunk-by-chunk with one fixed-shape compiled program and O(chunk)
    latency.  Each chunk's per-frame backpointers are composed ON DEVICE
    into one [B, K] summary (entry slot + emitted words per surviving
    slot, compose_chunk_paths), so traceback walks chunks, not frames:
    finish() is O(chunks) host work (the round-3 frame-walk finish cost
    ~3 s at T=512; summaries make it ms) and partial() emits the current
    best hypothesis after any chunk at the cost of ONE device fetch.
    Results are IDENTICAL to a one-shot decode of the concatenated
    audio.  The per-chunk word cap auto-sizes from the chunk length by
    default (summary_words=None → ~1 word per 2 frames, bounded by the
    chunk's absolute emission capacity); overflow past an explicit cap
    is counted per slot and raises in finish() (truncate-and-flag in
    partial(), `state["truncated"]`).

        dec = StreamingBeamDecoder(graph, cfg)
        st = dec.start(batch_size)
        for chunk in chunks:             # [B, Tc, V] log-likes
            st = dec.accept(st, chunk)   # optional active mask [B, Tc]
            hyps = dec.partial(st)       # optional: current best words
        results = dec.finish(st)         # [(words, cost)] * B

    With cfg.blank_skip > 0, each chunk is blank-run merged before the
    search (decoder/frame_skip.py) — the streaming analogue of the
    offline skip path; `active` masks must be contiguous prefixes per
    row (trailing padding).
    """

    def __init__(
        self, graph: CompiledGraph,
        cfg: BeamSearchConfig = BeamSearchConfig(),
        summary_words: Optional[int] = None,
    ):
        init_fn, chunk_fn = make_beam_decoder(graph, cfg, _internals=True)
        self._init = init_fn
        cap_cfg = summary_words

        def chunk_sum(carry, loglikes, active, dg):
            carry, (st, sc, par, ol, lm) = chunk_fn(
                carry, loglikes, active, dg
            )
            if cap_cfg is not None:
                cap = cap_cfg
            else:
                # auto-size from the chunk length (shapes are static at
                # trace time): one word per 2 frames is several-fold
                # above real speech rates at the 30 ms post-subsample
                # frame period; tc*L is the absolute emission bound, so
                # short chunks can never overflow.
                tc, _b, _k, L = ol.shape
                cap = min(max(16, (tc + 1) // 2), tc * L)
            entry, words, cnt, ovf = compose_chunk_paths(par, ol, cap)
            return carry, (entry, words, cnt, ovf)

        self._chunk = jax.jit(chunk_sum)
        self.graph = graph
        self.cfg = cfg
        self.summary_words = cap_cfg
        self.dg = DeviceGraph.put(graph)

    def start(self, batch_size: int) -> dict:
        carry, init_olab = self._init(batch_size, self.dg)
        return {
            "carry": carry, "init_olab": np.asarray(init_olab),
            "chunks": [],            # host (entry, words, cnt, ovf)
            "batch": batch_size, "tframes": 0,
        }

    def accept(self, state: dict, loglikes, active=None) -> dict:
        b, t_c, _ = loglikes.shape
        if active is None:
            active = jnp.ones((b, t_c), bool)
        else:
            active = jnp.asarray(active, bool)
        loglikes = jnp.asarray(loglikes)
        if self.cfg.blank_skip > 0.0:
            # per-chunk blank-run merging (decoder/frame_skip.py).  A
            # run spanning a chunk boundary is split into one merged
            # frame per chunk — semantics stay exact, compression loses
            # at most one frame per boundary.
            from eesen_tpu.decoder.frame_skip import compact_blank_frames

            cf = compact_blank_frames(
                loglikes, jnp.sum(active, axis=1, dtype=jnp.int32),
                self.cfg.blank_skip, bucket=self.cfg.blank_skip_bucket,
            )
            loglikes = cf.loglikes
            t_c = loglikes.shape[1]
            active = (
                jnp.arange(t_c, dtype=jnp.int32)[None, :]
                < cf.lengths[:, None]
            )
        carry, summary = self._chunk(
            state["carry"], loglikes, active, self.dg
        )
        # ONE batched transfer per chunk (jax.device_get of the tuple):
        # the [B, K] summary is ~100x smaller than the [Tc, B, K, 3+L]
        # frame outputs the pre-summary design accumulated
        state["carry"] = carry
        state["chunks"].append(jax.device_get(summary))
        state["tframes"] += t_c
        return state

    def partial(self, state: dict) -> List[List[int]]:
        """Current best-path word hypotheses (ignores final weights —
        the utterances are still in progress)."""
        scores = np.asarray(state["carry"][1])
        j = np.argmin(np.where(np.isfinite(scores), scores, np.inf), axis=1)
        return self._walk(state, j.astype(np.int64), strict=False)

    def _walk(
        self, state: dict, j: np.ndarray, strict: bool = True,
    ) -> List[List[int]]:
        b = state["batch"]
        slots = j.copy()
        rev: List[List[int]] = [[] for _ in range(b)]
        state["truncated"] = False
        for entry, words, cnt, ovf in reversed(state["chunks"]):
            for i in range(b):
                s = int(slots[i])
                if int(ovf[i, s]) > 0:
                    if strict:
                        raise OverflowError(
                            "chunk path emitted more than "
                            f"{words.shape[-1]} labels; re-run with a "
                            "larger summary_words (or summary_words="
                            "None to auto-size from the chunk length)"
                        )
                    # partial(): truncate-and-flag — an in-progress
                    # hypothesis may legitimately be dropped later, so a
                    # best-effort prefix beats a crash mid-stream
                    state["truncated"] = True
                n = int(cnt[i, s])
                rev[i].extend(int(w) for w in words[i, s, :n][::-1])
                slots[i] = int(entry[i, s])
        out = []
        for i in range(b):
            lead = [int(w) for w in state["init_olab"][i, int(slots[i])]
                    if w != 0]
            out.append(lead + rev[i][::-1])
        return out

    def finish(self, state: dict) -> List[Tuple[List[int], float]]:
        states, scores = (
            np.asarray(state["carry"][0]), np.asarray(state["carry"][1])
        )
        b = state["batch"]
        fw = self.graph.final_weight
        valid = states >= 0
        total = np.where(
            valid, scores + fw[np.maximum(states, 0)], np.inf
        )
        js = np.empty(b, np.int64)
        costs = np.empty(b, np.float64)
        for i in range(b):
            if np.isfinite(total[i]).any():
                js[i] = int(np.argmin(total[i]))
                costs[i] = float(total[i, js[i]])
            else:  # no final state: best partial path
                sc = np.where(valid[i], scores[i], np.inf)
                js[i] = int(np.argmin(sc))
                costs[i] = float(sc[js[i]])
        words = self._walk(state, js)
        return [(w, c) for w, c in zip(words, costs)]


def make_sharded_beam_decoder(
    graph: CompiledGraph,
    cfg: BeamSearchConfig,
    mesh,
    axis: str = "data",
):
    """Multi-chip decode: shard the utterance batch over `mesh[axis]` with
    the graph replicated on every chip (the TPU-native analogue of the
    reference's nj job-sharded decode, steps/decode_ctc_lat.sh:99-104).

    Returns fn(loglikes [B,T,V], lengths [B], dg) -> BeamOutputs; B must
    be divisible by the axis size.  Each shard runs the identical search
    program on its slice — no cross-chip communication is needed, so
    scaling is linear in chips."""
    from jax.sharding import PartitionSpec as P

    base = make_beam_decoder(graph, cfg)
    out_specs = BeamOutputs(
        states=P(None, axis), scores=P(None, axis), parent=P(None, axis),
        olabels=P(None, axis), init_olabels=P(axis), overflow=P(axis),
        lat_mask=P(None, axis),
    )
    f = jax.shard_map(
        base, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(f)


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
