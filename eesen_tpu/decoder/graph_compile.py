"""Compile a TLG graph into compact device arc tables for TPU decoding.

The reference decodes on the CPU with pointer-chasing token passing
(src/decoder/lattice-faster-decoder.cc).  On TPU the graph must become
dense arrays with STATIC per-step shapes.  Two transformations make that
possible:

1. CSR arc tables, split into emitting (ilabel > 0) and epsilon
   (ilabel == 0) arcs — mirroring the decoder's ProcessEmitting /
   ProcessNonemitting phases.

2. **Out-degree capping**: any state with more than `max_degree` arcs of a
   kind is split into a balanced tree of auxiliary states connected by
   epsilon arcs, bounding every state's out-degree.  The active-beam
   expansion then has the static shape [K active x D arcs], which is what
   `lax.scan`/top_k need.  (Aux states add eps-closure depth
   logarithmically; the search runs a fixed number of eps iterations.)

The compiled graph is a set of numpy arrays ready to `jax.device_put`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from eesen_tpu.decoder.fst import EPS, Arc, Fst

F32_INF = np.float32(np.inf)


@dataclasses.dataclass
class CompiledGraph:
    """Device-ready TLG. All arrays are numpy; upload with device_put."""
    num_states: int                 # incl. auxiliary states
    start: int
    # emitting arcs CSR (ilabel > 0)
    emit_offsets: np.ndarray        # [N+1] int32
    emit_ilabel: np.ndarray         # [Ee] int32 (graph token id; col = id-1)
    emit_olabel: np.ndarray         # [Ee] int32
    emit_weight: np.ndarray         # [Ee] float32
    emit_dst: np.ndarray            # [Ee] int32
    # epsilon arcs CSR (ilabel == 0)
    eps_offsets: np.ndarray         # [N+1] int32
    eps_olabel: np.ndarray          # [En] int32
    eps_weight: np.ndarray          # [En] float32
    eps_dst: np.ndarray             # [En] int32
    final_weight: np.ndarray        # [N] float32 (inf = non-final)
    max_emit_degree: int
    max_eps_degree: int
    eps_depth: int                  # max eps-chain length (closure iters)
    # hub tables: dense always-expanded emit arcs of high-fanout states
    hub_src: Optional[np.ndarray] = None        # [H] int32
    hub_offsets: Optional[np.ndarray] = None    # [H+1] int32
    hub_packed: Optional[np.ndarray] = None     # [Eh, 4] int32
    # precomputed eps transitive closure (single-phase expansion)
    closure_offsets: Optional[np.ndarray] = None  # [N+1] int32
    closure_packed: Optional[np.ndarray] = None   # [Ec, 4] int32
    max_closure_degree: int = 0

    @property
    def has_hubs(self) -> bool:
        return self.hub_src is not None and len(self.hub_src) > 0

    @property
    def has_closure(self) -> bool:
        return self.closure_offsets is not None

    def closure_off2(self) -> np.ndarray:
        off = self.closure_offsets
        return np.stack([off[:-1], off[1:] - off[:-1]], axis=1).astype(
            np.int32
        )

    @property
    def num_emit_arcs(self) -> int:
        return len(self.emit_ilabel)

    @property
    def num_eps_arcs(self) -> int:
        return len(self.eps_dst)

    # ---- packed views (built lazily, cached) ----
    # One gather of an [E, 8] int32 row costs the same as one [E] gather on
    # TPU (gathers are latency-bound per index, not per byte).  Rows carry
    # (ilabel, olabel, weight_bits, dst) PLUS the destination state's
    # (emit_base, emit_deg, second_base, second_deg) — "second" = the
    # closure table when built, else the eps table — so the active set
    # carries its own offsets and the search does no random offsets
    # gather at all.
    def _dst_offs(self, dst: np.ndarray) -> np.ndarray:
        e_base = self.emit_offsets[:-1][dst]
        e_deg = (self.emit_offsets[1:] - self.emit_offsets[:-1])[dst]
        if self.has_closure:
            off = self.closure_offsets
        else:
            off = self.eps_offsets
        x_base = off[:-1][dst]
        x_deg = (off[1:] - off[:-1])[dst]
        return np.stack([e_base, e_deg, x_base, x_deg], axis=1).astype(
            np.int32
        )

    def state_offs(self, state: int) -> np.ndarray:
        """[4] int32 (e_base, e_deg, x_base, x_deg) for one state."""
        return self._dst_offs(np.asarray([state]))[0]

    def _pack8(self, il, ol, w, dst) -> np.ndarray:
        head = np.stack(
            [il, ol, w.view(np.int32), dst], axis=1
        ).astype(np.int32)
        if len(dst) == 0:
            return np.zeros((0, 8), np.int32)
        return np.concatenate([head, self._dst_offs(dst)], axis=1)

    def emit_packed(self) -> np.ndarray:
        """[Ee, 8] int32 rows (see class comment)."""
        if not hasattr(self, "_emit_packed"):
            self._emit_packed = self._pack8(
                self.emit_ilabel, self.emit_olabel, self.emit_weight,
                self.emit_dst,
            )
        return self._emit_packed

    def eps_packed(self) -> np.ndarray:
        """[En, 8] int32 rows."""
        if not hasattr(self, "_eps_packed"):
            z = np.zeros_like(self.eps_dst)
            self._eps_packed = self._pack8(
                z, self.eps_olabel, self.eps_weight, self.eps_dst
            )
        return self._eps_packed

    def closure_packed8(self) -> np.ndarray:
        if not hasattr(self, "_closure_packed8"):
            cp = self.closure_packed
            if cp is None or len(cp) == 0:
                self._closure_packed8 = np.zeros((0, 8), np.int32)
            else:
                self._closure_packed8 = self._pack8(
                    cp[:, 0], cp[:, 1], cp[:, 2].view(np.float32).copy(),
                    cp[:, 3],
                )
        return self._closure_packed8

    def hub_packed8(self) -> np.ndarray:
        if not hasattr(self, "_hub_packed8"):
            hp = self.hub_packed
            if hp is None or len(hp) == 0:
                self._hub_packed8 = np.zeros((0, 8), np.int32)
            else:
                self._hub_packed8 = self._pack8(
                    hp[:, 0], hp[:, 1], hp[:, 2].view(np.float32).copy(),
                    hp[:, 3],
                )
        return self._hub_packed8

    def _dense_from_csr(self, off, il, ol, w, dst) -> np.ndarray:
        """CSR -> state-indexed fixed-width rows [N, D, 4] int32
        (il, ol, weight_bits, dst).  Padding slots carry weight = +inf so
        padded proposals die in the beam with NO validity mask or degree
        bookkeeping: score = src_score + inf = inf."""
        n = self.num_states
        deg = off[1:] - off[:-1]
        d = max(int(deg.max()) if len(deg) else 0, 1)
        rows = np.zeros((n, d, 4), np.int32)
        rows[:, :, 2] = F32_INF.view(np.int32)
        if len(dst):
            src = np.repeat(np.arange(n, dtype=np.int64), deg)
            pos = np.arange(len(dst), dtype=np.int64) - off[:-1][src]
            rows[src, pos, 0] = il
            rows[src, pos, 1] = ol
            rows[src, pos, 2] = w.astype(np.float32).view(np.int32)
            rows[src, pos, 3] = dst
        return rows

    def dense_rows(self) -> Tuple[np.ndarray, np.ndarray]:
        """State-indexed arc tables for the dense-row decode path:
        (emit_rows [N, De, 4], x_rows [N, Dx, 4]) — x = closure if built,
        else eps.  One [N, D*4]-lane row gather by STATE ID replaces the
        (base + j)-indexed row gather from the arc-packed tables plus the
        entire destination-offsets payload: with a degree cap every
        state's arc block has a fixed width, so the state id IS the
        offset.  Costs padding memory (N*D vs E arc rows); the decoder
        auto-selects this layout only when it fits a byte budget."""
        if not hasattr(self, "_dense_rows"):
            emit = self._dense_from_csr(
                self.emit_offsets, self.emit_ilabel, self.emit_olabel,
                self.emit_weight, self.emit_dst,
            )
            if self.has_closure:
                cp = self.closure_packed
                if cp is None or len(cp) == 0:
                    x = np.zeros((self.num_states, 1, 4), np.int32)
                    x[:, :, 2] = F32_INF.view(np.int32)
                else:
                    x = self._dense_from_csr(
                        self.closure_offsets, cp[:, 0], cp[:, 1],
                        cp[:, 2].view(np.float32), cp[:, 3],
                    )
            else:
                x = self._dense_from_csr(
                    self.eps_offsets, np.zeros_like(self.eps_dst),
                    self.eps_olabel, self.eps_weight, self.eps_dst,
                )
            self._dense_rows = (emit, x)
        return self._dense_rows

    def dense_bytes(self) -> int:
        de = max(self.max_emit_degree, 1)
        dx = max(
            self.max_closure_degree if self.has_closure
            else self.max_eps_degree,
            1,
        )
        return self.num_states * (de + dx) * 16

    # ---- disk cache (LM-scale graphs take minutes to build; bench.py
    # and recipe reruns reload the compiled arrays instead) ----
    _SCALARS = ("num_states", "start", "max_emit_degree", "max_eps_degree",
                "eps_depth", "max_closure_degree")
    _ARRAYS = ("emit_offsets", "emit_ilabel", "emit_olabel", "emit_weight",
               "emit_dst", "eps_offsets", "eps_olabel", "eps_weight",
               "eps_dst", "final_weight", "hub_src", "hub_offsets",
               "hub_packed", "closure_offsets", "closure_packed")

    def save(self, path: str) -> None:
        """Write the compiled arrays as one .npz (no pickle)."""
        d = {k: np.asarray(getattr(self, k)) for k in self._SCALARS}
        for k in self._ARRAYS:
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        np.savez(path, **d)

    @classmethod
    def load(cls, path: str) -> "CompiledGraph":
        z = np.load(path)
        kw = {k: int(z[k]) for k in cls._SCALARS}
        for k in cls._ARRAYS:
            kw[k] = z[k] if k in z.files else None
        return cls(**kw)

    def offsets_packed(self) -> Tuple[np.ndarray, np.ndarray]:
        """([N, 2] int32 (emit base, emit degree),
        [N, 2] int32 (eps base, eps degree))."""
        if not hasattr(self, "_off_packed"):
            def pack(off):
                return np.stack(
                    [off[:-1], off[1:] - off[:-1]], axis=1
                ).astype(np.int32)
            self._off_packed = (
                pack(self.emit_offsets), pack(self.eps_offsets)
            )
        return self._off_packed


def _cap_degree(fst: Fst, max_degree: int) -> Fst:
    """Split states whose out-degree exceeds max_degree into BALANCED
    epsilon trees (branching = max_degree), so the added epsilon depth is
    logarithmic in the original degree rather than linear.  Returns a new
    Fst with identical weighted behavior."""
    out = fst.copy()
    s = 0
    while s < out.num_states:   # new states appended get revisited
        arcs = out.arcs[s]
        if len(arcs) > max_degree:
            # partition ALL arcs into ceil(n / max_degree) groups; the
            # state keeps one eps arc per group (plus the groups re-split
            # recursively when there are more groups than max_degree,
            # handled by revisiting the aux states in this same loop)
            groups = [
                arcs[i : i + max_degree]
                for i in range(0, len(arcs), max_degree)
            ]
            new_arcs = []
            for grp in groups:
                aux = out.add_state()
                out.arcs[aux] = grp
                new_arcs.append(Arc(EPS, EPS, 0.0, aux))
            out.arcs[s] = new_arcs
            # don't advance: if there are more groups than max_degree the
            # state re-splits, building the tree level by level
            if len(new_arcs) <= max_degree:
                s += 1
        else:
            s += 1
    return out


def _eps_depth(fst: Fst, cap: int = 64) -> int:
    """Longest epsilon-arc chain (for closure iteration count)."""
    n = fst.num_states
    depth = np.zeros(n, dtype=np.int32)
    # iterate to fixpoint (eps subgraph of TLG is acyclic by construction;
    # guard with cap)
    for it in range(cap):
        changed = False
        for s in range(n):
            for a in fst.arcs[s]:
                if a.ilabel == EPS:
                    d = depth[s] + 1
                    if d > depth[a.nextstate]:
                        depth[a.nextstate] = d
                        changed = True
        if not changed:
            return int(depth.max())
    return cap


def _eps_closure_tables(
    rows: List[List[Arc]], n: int, depth_cap: int = 64
) -> Tuple[List[List[Tuple[int, float, int]]], int]:
    """Transitive closure of the eps subgraph (a DAG by construction).

    Returns per-state lists of (dst, weight, first_olabel) for every
    eps-reachable state (identity excluded), Viterbi-combined (min weight
    per dst), and the max closure out-degree.

    Deterministic reverse-topological DP — kept in exact lockstep with the
    native implementation (csrc/fstlib.cpp fstlib_compile_graph): same
    visit order, same float-sum association, same tie rule (replace only
    when strictly better by >1e-12), so both produce identical tables.
    Falls back to bounded relaxation if the eps subgraph has a cycle
    (cannot happen for a determinized TLG; guard only)."""
    # Kahn topological order of the eps subgraph
    indeg = np.zeros(n, dtype=np.int64)
    for s in range(n):
        for a in rows[s]:
            indeg[a.nextstate] += 1
    order: List[int] = [s for s in range(n) if indeg[s] == 0]
    head = 0
    while head < len(order):
        s = order[head]
        head += 1
        for a in rows[s]:
            indeg[a.nextstate] -= 1
            if indeg[a.nextstate] == 0:
                order.append(a.nextstate)
    closure: List[List[Tuple[int, float, int]]] = [[] for _ in range(n)]
    if len(order) < n:   # eps cycle: bounded relaxation fallback
        cmap: List[Dict[int, Tuple[float, int]]] = [dict() for _ in range(n)]
        for s in range(n):
            for a in rows[s]:
                old = cmap[s].get(a.nextstate)
                if old is None or a.weight < old[0]:
                    cmap[s][a.nextstate] = (a.weight, a.olabel)
        for _ in range(depth_cap):
            changed = False
            for s in range(n):
                items = list(cmap[s].items())
                for mid, (w1, o1) in items:
                    for dst, (w2, o2) in cmap[mid].items():
                        w = w1 + w2
                        o = o1 if o1 else o2
                        old = cmap[s].get(dst)
                        if old is None or w < old[0] - 1e-12:
                            cmap[s][dst] = (w, o)
                            changed = True
            if not changed:
                break
        out = [
            sorted((dst, w, o) for dst, (w, o) in cmap[s].items())
            for s in range(n)
        ]
        max_deg = max((len(x) for x in out), default=0)
        return out, max_deg

    # reverse topo: every successor's closure is final before s
    for s in reversed(order):
        ent: List[Tuple[int, float, int]] = []
        idx: Dict[int, int] = {}

        def _relax(dst: int, w: float, o: int):
            j = idx.get(dst)
            if j is None:
                idx[dst] = len(ent)
                ent.append((dst, w, o))
            elif w < ent[j][1] - 1e-12:
                ent[j] = (dst, w, o)

        for a in rows[s]:
            _relax(a.nextstate, a.weight, a.olabel)
            for dst2, w2, o2 in closure[a.nextstate]:
                _relax(dst2, a.weight + w2, a.olabel if a.olabel else o2)
        closure[s] = ent
    out = [sorted(closure[s]) for s in range(n)]
    max_deg = max((len(x) for x in out), default=0)
    return out, max_deg


def compile_graph(
    fst: Fst,
    max_degree: int = 16,
    hub_threshold: int = 0,
    build_closure: bool = False,
    backend: str = "auto",
) -> CompiledGraph:
    """Compact a TLG Fst into CSR device tables with bounded out-degree.

    hub_threshold > 0 extracts the emitting arcs of states whose raw
    out-degree is >= the threshold into dense "hub" tables (expanded
    unconditionally every frame, no gather); this keeps high-fanout LM
    states out of the degree-capping aux trees.  build_closure=True also
    precomputes the epsilon transitive closure so the search runs ONE
    closure expansion instead of eps-depth iterations.

    backend: "auto" uses the native C++ compiler (csrc/fstlib.cpp) when
    available — required for LM-scale graphs (millions of arcs) — and
    falls back to this module's pure-Python path; "python"/"native"
    force one."""
    if backend != "python":
        from eesen_tpu.decoder import fst_native

        if fst_native.compile_graph_available():
            return fst_native.compile_graph_native(
                fst, max_degree, hub_threshold, build_closure
            )
        if backend == "native":
            raise RuntimeError("native graph compiler unavailable")
    hub_src: List[int] = []
    hub_rows: List[List[Arc]] = []
    if hub_threshold > 0:
        work = fst.copy()
        for s in range(work.num_states):
            emit = [a for a in work.arcs[s] if a.ilabel != EPS]
            if len(emit) >= hub_threshold:
                hub_src.append(s)
                hub_rows.append(emit)
                work.arcs[s] = [a for a in work.arcs[s] if a.ilabel == EPS]
        fst = work

    capped = _cap_degree(fst, max_degree)
    n = capped.num_states

    emit_rows: List[List[Arc]] = [[] for _ in range(n)]
    eps_rows: List[List[Arc]] = [[] for _ in range(n)]
    for s in range(n):
        for a in capped.arcs[s]:
            (eps_rows if a.ilabel == EPS else emit_rows)[s].append(a)

    def build_csr(rows, with_ilabel):
        counts = np.fromiter(
            (len(r) for r in rows), dtype=np.int64, count=n
        )
        offsets = np.zeros(n + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(counts).astype(np.int32)
        flat = [a for r in rows for a in r]
        e = len(flat)
        il = (
            np.fromiter((a.ilabel for a in flat), np.int32, count=e)
            if with_ilabel else None
        )
        ol = np.fromiter((a.olabel for a in flat), np.int32, count=e)
        w = np.fromiter((a.weight for a in flat), np.float32, count=e)
        d = np.fromiter((a.nextstate for a in flat), np.int32, count=e)
        return offsets, il, ol, w, d

    eo, eil, eol, ew, ed = build_csr(emit_rows, True)
    no, _, nol, nw, nd = build_csr(eps_rows, False)

    final = np.full(n, np.inf, dtype=np.float32)
    for s, w in capped.finals.items():
        final[s] = w

    max_e = max((len(r) for r in emit_rows), default=0)
    max_n = max((len(r) for r in eps_rows), default=0)
    g = CompiledGraph(
        num_states=n,
        start=capped.start,
        emit_offsets=eo, emit_ilabel=eil, emit_olabel=eol,
        emit_weight=ew, emit_dst=ed,
        eps_offsets=no, eps_olabel=nol, eps_weight=nw, eps_dst=nd,
        final_weight=final,
        max_emit_degree=max_e,
        max_eps_degree=max_n,
        eps_depth=_eps_depth(capped),
    )

    # ---- hub tables ----
    if hub_src:
        g.hub_src = np.asarray(hub_src, dtype=np.int32)
        offs = np.zeros(len(hub_src) + 1, dtype=np.int32)
        rows4 = []
        for i, arcs in enumerate(hub_rows):
            offs[i + 1] = offs[i] + len(arcs)
            for a in arcs:
                rows4.append(
                    (a.ilabel, a.olabel,
                     np.float32(a.weight).view(np.int32), a.nextstate)
                )
        g.hub_offsets = offs
        g.hub_packed = np.asarray(rows4, dtype=np.int32).reshape(-1, 4)
    else:
        g.hub_src = np.zeros(0, dtype=np.int32)
        g.hub_offsets = np.zeros(1, dtype=np.int32)
        g.hub_packed = np.zeros((0, 4), dtype=np.int32)

    # ---- eps closure tables ----
    if build_closure:
        clos, cmax = _eps_closure_tables(eps_rows, n)
        coffs = np.zeros(n + 1, dtype=np.int32)
        rows4 = []
        for s in range(n):
            coffs[s + 1] = coffs[s] + len(clos[s])
            for dst, w, o in clos[s]:
                rows4.append((0, o, np.float32(w).view(np.int32), dst))
        g.closure_offsets = coffs
        g.closure_packed = (
            np.asarray(rows4, dtype=np.int32).reshape(-1, 4)
            if rows4 else np.zeros((0, 4), dtype=np.int32)
        )
        g.max_closure_degree = cmax
    return g
