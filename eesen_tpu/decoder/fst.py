"""Weighted finite-state transducers: the graph-construction core.

Reimplements the subset of OpenFst + the reference's extensions that the
CTC recipes use to build decoding graphs
(reference: src/fstext/ determinize-star{,-inl}.h, table-matcher.h,
remove-eps-local{,-inl}.h, fstext-utils-inl.h; src/fstbin/ fsttablecompose,
fstdeterminizestar, fstminimizeencoded, fstaddselfloops, fstrmepslocal;
asr_egs/wsj/utils/ctc_compile_dict_token.sh pipeline):

  compose            (epsilon-filter composition = fsttablecompose)
  determinize_star   (epsilon-removing determinization, tropical or log,
                      with output-string factoring — fstdeterminizestar)
  minimize_encoded   (arc-encoded acceptor minimization without weight
                      pushing — fstminimizeencoded)
  rm_epsilon         (weighted epsilon removal)
  add_self_loops     (disambig self-loops — fstaddselfloops)
  arcsort / connect / shortest_path / closure helpers

Graph construction is offline, host-side work (runs once per language
directory), so this is plain Python/numpy; the *decoder* consumes the
result as compacted arc tables uploaded to the TPU (decoder/beam.py).

Semirings: tropical (min, +) and log (-log(e^-a + e^-b), +) over floats,
with +inf as semiring zero — matching fst::StdArc / LogArc.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

EPS = 0            # epsilon label id, matches OpenFst convention
INF = float("inf")


def log_plus(a: float, b: float) -> float:
    """Log-semiring plus: -log(e^-a + e^-b)."""
    if a == INF:
        return b
    if b == INF:
        return a
    lo, hi = (a, b) if a > b else (b, a)
    return hi - math.log1p(math.exp(hi - lo))


def trop_plus(a: float, b: float) -> float:
    return a if a < b else b


@dataclasses.dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float
    nextstate: int


class Fst:
    """Mutable WFST; states are dense ints, arcs per-state lists."""

    def __init__(self) -> None:
        self.arcs: List[List[Arc]] = []
        self.finals: Dict[int, float] = {}
        self.start: int = -1

    # ---- construction ----
    def add_state(self) -> int:
        self.arcs.append([])
        return len(self.arcs) - 1

    def add_arc(self, state: int, arc: Arc) -> None:
        self.arcs[state].append(arc)

    def set_start(self, s: int) -> None:
        self.start = s

    def set_final(self, s: int, weight: float = 0.0) -> None:
        self.finals[s] = weight

    @property
    def num_states(self) -> int:
        return len(self.arcs)

    @property
    def num_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    def is_final(self, s: int) -> bool:
        return s in self.finals

    def final_weight(self, s: int) -> float:
        return self.finals.get(s, INF)

    def copy(self) -> "Fst":
        f = Fst()
        f.arcs = [[dataclasses.replace(a) for a in arcs] for arcs in self.arcs]
        f.finals = dict(self.finals)
        f.start = self.start
        return f

    # ---- text format (OpenFst compatible) ----
    @classmethod
    def from_text(cls, text: str) -> "Fst":
        """Parse OpenFst text format (as fed to fstcompile)."""
        f = cls()
        ids: Dict[int, int] = {}

        def state(x: int) -> int:
            if x not in ids:
                ids[x] = f.add_state()
            return ids[x]

        for line in text.strip().splitlines():
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 4:
                s, d = state(int(parts[0])), state(int(parts[1]))
                w = float(parts[4]) if len(parts) >= 5 else 0.0
                f.add_arc(s, Arc(int(parts[2]), int(parts[3]), w, d))
                if f.start < 0:
                    f.set_start(s)
            elif len(parts) <= 2:
                s = state(int(parts[0]))
                w = float(parts[1]) if len(parts) == 2 else 0.0
                f.set_final(s, w)
                if f.start < 0:
                    f.set_start(s)
        return f

    def to_text(self) -> str:
        lines = []
        order = list(range(self.num_states))
        if self.start > 0:
            # OpenFst prints start state first
            order.remove(self.start)
            order.insert(0, self.start)
        for s in order:
            for a in self.arcs[s]:
                if a.weight == 0.0:
                    lines.append(f"{s} {a.nextstate} {a.ilabel} {a.olabel}")
                else:
                    lines.append(
                        f"{s} {a.nextstate} {a.ilabel} {a.olabel} {a.weight}"
                    )
            if s in self.finals:
                w = self.finals[s]
                lines.append(f"{s}" if w == 0.0 else f"{s} {w}")
        return "\n".join(lines) + "\n"

    # ---- path enumeration (for tests / tiny FSTs) ----
    def paths(self, max_paths: int = 100000) -> List[Tuple[Tuple[int, ...], Tuple[int, ...], float]]:
        """All accepting paths as (ilabels, olabels, weight); raises on
        cyclic FSTs that exceed max_paths."""
        out = []
        if self.start < 0:
            return out
        stack = [(self.start, (), (), 0.0, 0)]
        while stack:
            s, il, ol, w, depth = stack.pop()
            if depth > 10000:
                raise RuntimeError("path too deep (cyclic fst?)")
            if s in self.finals:
                out.append((il, ol, w + self.finals[s]))
                if len(out) > max_paths:
                    raise RuntimeError("too many paths")
            for a in self.arcs[s]:
                stack.append((
                    a.nextstate,
                    il + ((a.ilabel,) if a.ilabel != EPS else ()),
                    ol + ((a.olabel,) if a.olabel != EPS else ()),
                    w + a.weight,
                    depth + 1,
                ))
        return out


# --------------------------------------------------------------------------
# basic algorithms
# --------------------------------------------------------------------------

def arcsort(fst: Fst, sort_type: str = "ilabel") -> Fst:
    key = (lambda a: (a.ilabel, a.olabel)) if sort_type == "ilabel" else (
        lambda a: (a.olabel, a.ilabel)
    )
    out = fst.copy()
    for arcs in out.arcs:
        arcs.sort(key=key)
    return out


def connect(fst: Fst) -> Fst:
    """Trim states not on a successful path (fst::Connect)."""
    n = fst.num_states
    if fst.start < 0 or n == 0:
        return Fst()
    # forward reachable
    fwd = np.zeros(n, dtype=bool)
    stack = [fst.start]
    fwd[fst.start] = True
    while stack:
        s = stack.pop()
        for a in fst.arcs[s]:
            if not fwd[a.nextstate]:
                fwd[a.nextstate] = True
                stack.append(a.nextstate)
    # backward reachable from finals
    rev: List[List[int]] = [[] for _ in range(n)]
    for s in range(n):
        for a in fst.arcs[s]:
            rev[a.nextstate].append(s)
    bwd = np.zeros(n, dtype=bool)
    stack = [s for s in fst.finals if fwd[s]]
    for s in stack:
        bwd[s] = True
    while stack:
        s = stack.pop()
        for p in rev[s]:
            if not bwd[p]:
                bwd[p] = True
                stack.append(p)
    keep = fwd & bwd
    remap = -np.ones(n, dtype=np.int64)
    out = Fst()
    for s in range(n):
        if keep[s]:
            remap[s] = out.add_state()
    if not keep[fst.start]:
        return Fst()
    out.set_start(int(remap[fst.start]))
    for s in range(n):
        if not keep[s]:
            continue
        for a in fst.arcs[s]:
            if keep[a.nextstate]:
                out.add_arc(
                    int(remap[s]),
                    Arc(a.ilabel, a.olabel, a.weight, int(remap[a.nextstate])),
                )
        if s in fst.finals:
            out.set_final(int(remap[s]), fst.finals[s])
    return out


def compose(a: Fst, b: Fst) -> Fst:
    """Composition with the epsilon-sequencing filter
    (equivalent to fsttablecompose; reference src/fstext/table-matcher.h).

    The filter canonicalizes each maximal epsilon block to the order
    (a-alone)* (b-alone)*: a-alone moves are forbidden after a b-alone
    move (filter state 2), so every redundant interleaving has exactly one
    surviving representative.  Filter: 0 = neutral, 1 = did a-alone,
    2 = did b-alone; any matched (non-eps) move resets to 0."""
    out = Fst()
    state_map: Dict[Tuple[int, int, int], int] = {}

    def get_state(sa: int, sb: int, f: int) -> int:
        key = (sa, sb, f)
        if key not in state_map:
            state_map[key] = out.add_state()
        return state_map[key]

    if a.start < 0 or b.start < 0:
        return out
    start = get_state(a.start, b.start, 0)
    out.set_start(start)
    stack = [(a.start, b.start, 0)]
    seen = {(a.start, b.start, 0)}
    while stack:
        sa, sb, f = stack.pop()
        cur = get_state(sa, sb, f)
        if a.is_final(sa) and b.is_final(sb):
            out.set_final(cur, a.final_weight(sa) + b.final_weight(sb))

        def emit(na, nb, nf, il, ol, w):
            nxt = get_state(na, nb, nf)
            out.add_arc(cur, Arc(il, ol, w, nxt))
            if (na, nb, nf) not in seen:
                seen.add((na, nb, nf))
                stack.append((na, nb, nf))

        arcs_b_by_ilabel: Dict[int, List[Arc]] = {}
        for ab in b.arcs[sb]:
            arcs_b_by_ilabel.setdefault(ab.ilabel, []).append(ab)

        for aa in a.arcs[sa]:
            if aa.olabel == EPS:
                # a moves alone (b stays): forbidden after a b-alone move
                if f in (0, 1):
                    emit(aa.nextstate, sb, 1, aa.ilabel, EPS, aa.weight)
            else:
                for ab in arcs_b_by_ilabel.get(aa.olabel, []):
                    emit(
                        aa.nextstate, ab.nextstate, 0,
                        aa.ilabel, ab.olabel, aa.weight + ab.weight,
                    )
        # b moves alone on input-eps: always allowed (canonical A*B* order)
        for ab in arcs_b_by_ilabel.get(EPS, []):
            emit(sa, ab.nextstate, 2, EPS, ab.olabel, ab.weight)
    return connect(out)


def push_special(fst: Fst, delta: float = 1e-3, max_iters: int = 200) -> Fst:
    """Weight pushing that preserves total stochasticity (the analogue of
    fstpushspecial; reference src/fstext/push-special.{h,cc}).

    Unlike plain weight pushing, this works on FSTs that do not sum to
    one: it finds per-state potentials v (the dominant eigenvector of the
    probability matrix, with final weights treated as arcs back to the
    start state, as push-special.cc's comment describes) and reweights
    arcs w' = w + log v[src] - log v[dst], so every state's outgoing
    probability mass becomes (approximately) the same constant lambda.
    Path weights are preserved up to the constant start/final shift,
    exactly as the reference's version.
    """
    n = fst.num_states
    if n == 0 or fst.start < 0:
        return fst.copy()
    # transition probability structure (tropical weights -> probs)
    v = np.ones(n, dtype=np.float64)
    lam = 1.0
    for _ in range(max_iters):
        nv = np.zeros(n, dtype=np.float64)
        for s in range(n):
            acc = 0.0
            for a in fst.arcs[s]:
                acc += math.exp(-a.weight) * v[a.nextstate]
            fw = fst.finals.get(s)
            if fw is not None:
                acc += math.exp(-fw) * v[fst.start]
            nv[s] = acc
        norm = float(np.max(nv))
        if norm <= 0:
            break
        # damped update: (M~ + I)/2 has the same eigenvector but is
        # aperiodic, so cyclic FSTs (where plain power iteration
        # oscillates) still converge
        nv = 0.5 * (nv / norm) + 0.5 * v
        nv /= float(np.max(nv))
        diff = float(np.max(np.abs(nv - v)))
        v, lam = nv, norm
        if diff < delta:
            break
    v = np.maximum(v, 1e-30)
    out = fst.copy()
    logv = np.log(v)
    for s in range(n):
        for a in out.arcs[s]:
            a.weight = a.weight + logv[s] - logv[a.nextstate]
    for s in list(out.finals):
        out.finals[s] = out.finals[s] + logv[s] - logv[out.start]
    return out


def phi_compose(a: Fst, b: Fst, phi_label: int) -> Fst:
    """Compose where b's phi_label arcs are FAILURE transitions: taken
    (without consuming input) only when the wanted label has no match at
    the current b state, following phi chains as far as needed
    (= fstphicompose; reference src/fstbin/fstphicompose.cc /
    fst::PhiMatcher — the standard way to apply a backoff LM exactly).
    b must be deterministic on its input labels (true of arpa G fsts)."""
    # index b: per state, ilabel -> arc; phi -> arc
    trans: List[Dict[int, Arc]] = []
    phi: List[Optional[Arc]] = []
    for s in range(b.num_states):
        d: Dict[int, Arc] = {}
        p: Optional[Arc] = None
        for arc in b.arcs[s]:
            if arc.ilabel == phi_label:
                p = arc
            else:
                d[arc.ilabel] = arc
        trans.append(d)
        phi.append(p)

    def resolve(sb: int, label: int) -> Optional[Tuple[float, Arc]]:
        """Follow phi arcs until `label` matches; returns (accumulated phi
        weight, matching arc)."""
        w = 0.0
        seen = set()
        while True:
            arc = trans[sb].get(label)
            if arc is not None:
                return w, arc
            p = phi[sb]
            if p is None or sb in seen:
                return None
            seen.add(sb)
            w += p.weight
            sb = p.nextstate

    def final_weight(sb: int) -> float:
        """Final weight following phi chains (PhiMatcher semantics for
        superfinal handling: back off until a final state)."""
        w = 0.0
        seen = set()
        while True:
            fw = b.finals.get(sb)
            if fw is not None:
                return w + fw
            p = phi[sb]
            if p is None or sb in seen:
                return INF
            seen.add(sb)
            w += p.weight
            sb = p.nextstate

    out = Fst()
    state_map: Dict[Tuple[int, int], int] = {}

    def get_state(sa: int, sb: int) -> int:
        key = (sa, sb)
        if key not in state_map:
            state_map[key] = out.add_state()
        return state_map[key]

    if a.start < 0 or b.start < 0:
        return out
    out.set_start(get_state(a.start, b.start))
    stack = [(a.start, b.start)]
    seen = {(a.start, b.start)}
    while stack:
        sa, sb = stack.pop()
        cur = get_state(sa, sb)
        if a.is_final(sa):
            fw = final_weight(sb)
            if fw < INF:
                out.set_final(cur, a.final_weight(sa) + fw)
        for aa in a.arcs[sa]:
            if aa.olabel == EPS:
                nxt = (aa.nextstate, sb)
                out.add_arc(cur, Arc(aa.ilabel, EPS, aa.weight,
                                     get_state(*nxt)))
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
            else:
                hit = resolve(sb, aa.olabel)
                if hit is None:
                    continue
                pw, ab = hit
                nxt = (aa.nextstate, ab.nextstate)
                out.add_arc(cur, Arc(
                    aa.ilabel, ab.olabel, aa.weight + pw + ab.weight,
                    get_state(*nxt),
                ))
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
    return connect(out)


def rho_compose(a: Fst, b: Fst, rho_label: int) -> Fst:
    """Compose where b's rho_label arcs match ANY otherwise-unmatched
    label, consuming it (= fstrhocompose with label rewriting; reference
    src/fstbin/fstrhocompose.cc / fst::RhoMatcher)."""
    trans: List[Dict[int, Arc]] = []
    rho: List[Optional[Arc]] = []
    for s in range(b.num_states):
        d: Dict[int, Arc] = {}
        r: Optional[Arc] = None
        for arc in b.arcs[s]:
            if arc.ilabel == rho_label:
                r = arc
            else:
                d[arc.ilabel] = arc
        trans.append(d)
        rho.append(r)

    out = Fst()
    state_map: Dict[Tuple[int, int], int] = {}

    def get_state(sa: int, sb: int) -> int:
        key = (sa, sb)
        if key not in state_map:
            state_map[key] = out.add_state()
        return state_map[key]

    if a.start < 0 or b.start < 0:
        return out
    out.set_start(get_state(a.start, b.start))
    stack = [(a.start, b.start)]
    seen = {(a.start, b.start)}
    while stack:
        sa, sb = stack.pop()
        cur = get_state(sa, sb)
        if a.is_final(sa) and b.is_final(sb):
            out.set_final(cur, a.final_weight(sa) + b.final_weight(sb))
        for aa in a.arcs[sa]:
            if aa.olabel == EPS:
                nxt = (aa.nextstate, sb)
                out.add_arc(cur, Arc(aa.ilabel, EPS, aa.weight,
                                     get_state(*nxt)))
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
                continue
            ab = trans[sb].get(aa.olabel)
            rewrite = aa.olabel
            if ab is None:
                ab = rho[sb]
                if ab is None:
                    continue
                # rho consumes the actual label: olabel rewritten to it
                ol = rewrite
            else:
                ol = ab.olabel
            nxt = (aa.nextstate, ab.nextstate)
            out.add_arc(cur, Arc(
                aa.ilabel, ol, aa.weight + ab.weight, get_state(*nxt),
            ))
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return connect(out)


def rm_epsilon(fst: Fst, semiring: str = "tropical") -> Fst:
    """Full weighted epsilon removal (fst::RmEpsilon semantics).

    Computes per-state epsilon-closure distances and splices non-eps arcs /
    final weights through them."""
    plus = trop_plus if semiring == "tropical" else log_plus
    n = fst.num_states
    out = Fst()
    for _ in range(n):
        out.add_state()
    out.set_start(fst.start)

    for s in range(n):
        # epsilon-closure from s: shortest distance over eps-only arcs
        dist: Dict[int, float] = {s: 0.0}
        # Bellman-Ford-ish worklist (graphs here are small & acyclic in eps
        # after graph-build; guard against infinite loops with iteration cap)
        work = [s]
        iters = 0
        while work:
            iters += 1
            if iters > 100 * n + 100:
                raise RuntimeError("epsilon cycle with gain (non-convergent)")
            q = work.pop()
            for a in fst.arcs[q]:
                if a.ilabel == EPS and a.olabel == EPS:
                    nd = dist[q] + a.weight
                    old = dist.get(a.nextstate, INF)
                    new = plus(old, nd)
                    if new < old - 1e-12 or a.nextstate not in dist:
                        dist[a.nextstate] = new
                        work.append(a.nextstate)
        fw = INF
        for q, d in dist.items():
            if q in fst.finals:
                fw = plus(fw, d + fst.finals[q])
            for a in fst.arcs[q]:
                if a.ilabel != EPS or a.olabel != EPS:
                    out.add_arc(
                        s, Arc(a.ilabel, a.olabel, d + a.weight, a.nextstate)
                    )
        if fw != INF:
            out.set_final(s, fw)
    return connect(out)


def add_self_loops(
    fst: Fst, isyms: Sequence[int], osyms: Sequence[int]
) -> Fst:
    """Add self-loops with (isym, osym) pairs at every state that has
    epsilon output arcs leaving it or is final
    (reference: src/fstbin/fstaddselfloops.cc:43 — used to pass disambig
    symbols through L)."""
    out = fst.copy()
    for s in range(out.num_states):
        needs = s in out.finals or any(
            a.olabel == EPS for a in out.arcs[s]
        )
        if needs:
            for i, o in zip(isyms, osyms):
                out.add_arc(s, Arc(i, o, 0.0, s))
    return out


# --------------------------------------------------------------------------
# determinize-star (epsilon-removing determinization with output strings)
# --------------------------------------------------------------------------

def determinize_star(
    fst: Fst, semiring: str = "tropical", max_states: int = 10_000_000
) -> Fst:
    """Epsilon-removing determinization
    (reference: src/fstext/determinize-star.h:85-106).

    Input must be functional (e.g. L∘G with disambiguation symbols).
    Subsets are sets of (state, residual_weight, residual_output_string);
    epsilon arcs (input side) are closed over inside each subset.  When a
    transition emits more than one output label, chains of intermediate
    states are created (the reference's "gallic" factoring).
    """
    plus = trop_plus if semiring == "tropical" else log_plus

    def eps_closure(
        subset: List[Tuple[int, float, Tuple[int, ...]]]
    ) -> List[Tuple[int, float, Tuple[int, ...]]]:
        """Close over input-epsilon arcs, combining weights per
        (state, out-string)."""
        best: Dict[Tuple[int, Tuple[int, ...]], float] = {}
        work = list(subset)
        iters = 0
        while work:
            iters += 1
            if iters > 2_000_000:
                raise RuntimeError("determinize-star: epsilon cycle?")
            s, w, o = work.pop()
            key = (s, o)
            old = best.get(key, INF)
            new = plus(old, w)
            improved = key not in best or (
                new < old - 1e-12 if semiring == "tropical"
                else abs(new - old) > 1e-12
            )
            # in log semiring weights accumulate; to guarantee termination
            # require strict improvement beyond epsilon
            if not improved and key in best:
                continue
            best[key] = new
            for a in fst.arcs[s]:
                if a.ilabel == EPS:
                    no = o + ((a.olabel,) if a.olabel != EPS else ())
                    work.append((a.nextstate, new + a.weight, no))
        return [(s, w, o) for (s, o), w in best.items()]

    def normalize(
        subset: List[Tuple[int, float, Tuple[int, ...]]]
    ) -> Tuple[float, Tuple[int, ...], Tuple]:
        """Factor out common weight and common output prefix."""
        if semiring == "tropical":
            common_w = min(w for _, w, _ in subset)
        else:
            common_w = INF
            for _, w, _ in subset:
                common_w = plus(common_w, w)
        strings = [o for _, _, o in subset]
        prefix = strings[0]
        for o in strings[1:]:
            k = 0
            while k < len(prefix) and k < len(o) and prefix[k] == o[k]:
                k += 1
            prefix = prefix[:k]
        norm = tuple(
            sorted(
                (s, round(w - common_w, 9), o[len(prefix):])
                for s, w, o in subset
            )
        )
        return common_w, prefix, norm

    out = Fst()
    subset_ids: Dict[Tuple, int] = {}

    def get_id(norm: Tuple) -> Tuple[int, bool]:
        if norm in subset_ids:
            return subset_ids[norm], False
        sid = out.add_state()
        subset_ids[norm] = sid
        return sid, True

    init = eps_closure([(fst.start, 0.0, ())])
    w0, p0, norm0 = normalize(init)
    # initial common weight/prefix must be empty for a clean start state;
    # if not, add an epsilon arc from a fresh start.
    sid0, _ = get_id(norm0)
    if w0 != 0.0 or p0:
        real_start = out.add_state()
        out.set_start(real_start)
        _emit_chain(out, real_start, sid0, EPS, p0, w0)
    else:
        out.set_start(sid0)

    work = [norm0]
    processed: Set[Tuple] = {norm0}
    while work:
        norm = work.pop()
        sid = subset_ids[norm]
        if len(subset_ids) > max_states:
            raise RuntimeError("determinize-star: state blowup")
        # final weight: any member final (with residual string must be empty
        # to be truly final; strings remaining at final states are emitted
        # via epsilon chains)
        fw = INF
        final_strings: Dict[Tuple[int, ...], float] = {}
        for s, w, o in norm:
            if fst.is_final(s):
                total = w + fst.final_weight(s)
                final_strings[o] = plus(final_strings.get(o, INF), total)
        if final_strings:
            if set(final_strings) == {()}:
                out.set_final(sid, final_strings[()])
            else:
                for o, w in final_strings.items():
                    if o == ():
                        out.set_final(sid, plus(out.final_weight(sid), w))
                    else:
                        # emit residual output via eps chain to a final state
                        fstate = out.add_state()
                        out.set_final(fstate, 0.0)
                        _emit_chain(out, sid, fstate, EPS, o, w)
        # group transitions by input label
        by_label: Dict[int, List[Tuple[int, float, Tuple[int, ...]]]] = {}
        for s, w, o in norm:
            for a in fst.arcs[s]:
                if a.ilabel != EPS:
                    no = o + ((a.olabel,) if a.olabel != EPS else ())
                    by_label.setdefault(a.ilabel, []).append(
                        (a.nextstate, w + a.weight, no)
                    )
        for ilabel, lst in sorted(by_label.items()):
            closed = eps_closure(lst)
            w_c, prefix, nnorm = normalize(closed)
            nid, fresh = get_id(nnorm)
            _emit_chain(out, sid, nid, ilabel, prefix, w_c)
            if fresh and nnorm not in processed:
                processed.add(nnorm)
                work.append(nnorm)
    return out


def _emit_chain(
    out: Fst, src: int, dst: int, ilabel: int,
    ostring: Tuple[int, ...], weight: float,
) -> None:
    """Arc emitting an output string: intermediate eps-input states."""
    if len(ostring) == 0:
        out.add_arc(src, Arc(ilabel, EPS, weight, dst))
        return
    cur = src
    for k, o in enumerate(ostring):
        last = k == len(ostring) - 1
        il = ilabel if k == 0 else EPS
        w = weight if k == 0 else 0.0
        nxt = dst if last else out.add_state()
        out.add_arc(cur, Arc(il, o, w, nxt))
        cur = nxt


# --------------------------------------------------------------------------
# minimize-encoded
# --------------------------------------------------------------------------

def minimize_encoded(fst: Fst) -> Fst:
    """Minimize as an unweighted acceptor over encoded
    (ilabel, olabel, weight) triples — no weight pushing
    (reference: src/fstbin/fstminimizeencoded.cc:42).

    Partition refinement (Moore's algorithm); assumes deterministic input
    (as produced by determinize_star)."""
    n = fst.num_states
    if n == 0:
        return fst.copy()
    # encode arcs
    enc: Dict[Tuple[int, int, float], int] = {}

    def code(a: Arc) -> int:
        key = (a.ilabel, a.olabel, round(a.weight, 7))
        if key not in enc:
            enc[key] = len(enc)
        return enc[key]

    arcs_enc: List[List[Tuple[int, int]]] = [
        sorted((code(a), a.nextstate) for a in arcs) for arcs in fst.arcs
    ]
    # initial partition: by final weight
    part = {}
    blocks: Dict[Tuple, int] = {}
    for s in range(n):
        key = (round(fst.final_weight(s), 7),)
        if key not in blocks:
            blocks[key] = len(blocks)
        part[s] = blocks[key]
    while True:
        sig: Dict[Tuple, int] = {}
        new_part = {}
        for s in range(n):
            signature = (
                part[s],
                tuple((c, part[d]) for c, d in arcs_enc[s]),
            )
            if signature not in sig:
                sig[signature] = len(sig)
            new_part[s] = sig[signature]
        if len(sig) == len(set(part.values())):
            part = new_part
            break
        part = new_part
    # build minimized fst
    out = Fst()
    rep: Dict[int, int] = {}
    for s in range(n):
        if part[s] not in rep:
            rep[part[s]] = out.add_state()
    out.set_start(rep[part[fst.start]])
    done: Set[int] = set()
    for s in range(n):
        b = part[s]
        if b in done:
            continue
        done.add(b)
        for a in fst.arcs[s]:
            out.add_arc(
                rep[b], Arc(a.ilabel, a.olabel, a.weight, rep[part[a.nextstate]])
            )
        if fst.is_final(s):
            out.set_final(rep[b], fst.final_weight(s))
    return connect(out)


# --------------------------------------------------------------------------
# shortest path (tropical)
# --------------------------------------------------------------------------

def shortest_path(fst: Fst) -> Tuple[List[int], List[int], float]:
    """Single shortest path (tropical): returns (ilabels, olabels, weight).

    Dijkstra over non-negative weights falls back to Bellman-Ford when
    negative arcs exist (lattices can have negative LM scales)."""
    import heapq

    n = fst.num_states
    has_negative = any(
        a.weight < 0 for arcs in fst.arcs for a in arcs
    )
    dist = [INF] * n
    back: List[Optional[Tuple[int, Arc]]] = [None] * n
    dist[fst.start] = 0.0
    if not has_negative:
        pq = [(0.0, fst.start)]
        while pq:
            d, s = heapq.heappop(pq)
            if d > dist[s]:
                continue
            for a in fst.arcs[s]:
                nd = d + a.weight
                if nd < dist[a.nextstate]:
                    dist[a.nextstate] = nd
                    back[a.nextstate] = (s, a)
                    heapq.heappush(pq, (nd, a.nextstate))
    else:
        for _ in range(n):
            changed = False
            for s in range(n):
                if dist[s] == INF:
                    continue
                for a in fst.arcs[s]:
                    nd = dist[s] + a.weight
                    if nd < dist[a.nextstate] - 1e-12:
                        dist[a.nextstate] = nd
                        back[a.nextstate] = (s, a)
                        changed = True
            if not changed:
                break
    best_s, best_w = -1, INF
    for s, fw in fst.finals.items():
        if dist[s] + fw < best_w:
            best_w = dist[s] + fw
            best_s = s
    if best_s < 0:
        return [], [], INF
    ilabels: List[int] = []
    olabels: List[int] = []
    s = best_s
    while back[s] is not None:
        p, a = back[s]
        if a.ilabel != EPS:
            ilabels.append(a.ilabel)
        if a.olabel != EPS:
            olabels.append(a.olabel)
        s = p
    ilabels.reverse()
    olabels.reverse()
    return ilabels, olabels, best_w


def is_deterministic(fst: Fst) -> bool:
    for arcs in fst.arcs:
        labels = [a.ilabel for a in arcs]
        if EPS in labels or len(labels) != len(set(labels)):
            return False
    return True


def is_stochastic(fst: Fst, delta: float = 0.01) -> Tuple[bool, float, float]:
    """Check per-state weight normalization in the log semiring: at every
    state, -log sum exp(-w) over outgoing arcs + final weight should be 0
    (reference: src/fstbin/fstisstochastic.cc).  Returns (ok, min, max)
    of the per-state residuals, like the binary prints."""
    lo, hi = math.inf, -math.inf
    for s in range(fst.num_states):
        total = math.inf
        for a in fst.arcs[s]:
            total = log_plus(total, a.weight)
        if s in fst.finals:
            total = log_plus(total, fst.finals[s])
        if total == math.inf:
            continue   # dead state: no outgoing mass (fstisstochastic
            #             likewise only reports reachable residuals)
        lo, hi = min(lo, total), max(hi, total)
    if lo > hi:
        return True, 0.0, 0.0
    return (abs(lo) <= delta and abs(hi) <= delta), lo, hi


def rm_symbols(fst: Fst, symbols, from_output: bool = False) -> Fst:
    """Replace every listed symbol with epsilon on the input (default) or
    output side (reference: src/fstbin/fstrmsymbols.cc — used to strip
    disambiguation symbols after determinization).  Weights and topology
    are untouched."""
    syms = set(symbols)
    g = fst.copy()
    for arcs in g.arcs:
        for a in arcs:
            if from_output:
                if a.olabel in syms:
                    a.olabel = EPS
            elif a.ilabel in syms:
                a.ilabel = EPS
    return g


def propagate_final(fst: Fst, phi_label: int) -> Fst:
    """Make every state that can reach a final state purely through
    `phi_label` arcs final, folding the phi path weight into its final
    weight (reference: src/fstbin/fstpropfinal.cc ->
    fstext/fstext-utils-inl.h PropagateFinal; used so phi/failure
    composition sees final states through backoff arcs).  Tropical
    fixpoint: iterate until no final weight improves."""
    g = fst.copy()
    changed = True
    iters = 0
    while changed:
        changed = False
        iters += 1
        if iters > g.num_states + 1:
            break   # phi cycle with negative weight would loop; bound it
        for s in range(g.num_states):
            for a in g.arcs[s]:
                if a.ilabel != phi_label:
                    continue
                dw = g.finals.get(a.nextstate)
                if dw is None:
                    continue
                cand = a.weight + dw
                cur = g.finals.get(s, math.inf)
                if cand < cur - 1e-12:
                    g.finals[s] = cand
                    changed = True
    return g


def rand_fst(
    rng,
    n_states: int = 8,
    n_arcs: int = 16,
    n_syms: int = 4,
    eps_prob: float = 0.2,
    acyclic: bool = True,
    final_prob: float = 0.3,
) -> Fst:
    """Random FST generator for property tests (reference:
    src/fstext/rand-fst.h RandFst, src/fstbin/fstrand.cc).  `rng` is a
    `random.Random`.  Guaranteed to have a start state and >= 1 final
    state; acyclic=True restricts arcs to s < d (test default — matches
    the invariant-checking test style of determinize-star-test.cc)."""
    f = Fst()
    for _ in range(max(n_states, 2)):
        f.add_state()
    f.set_start(0)
    n = f.num_states
    for _ in range(n_arcs):
        if acyclic:
            s = rng.randrange(0, n - 1)
            d = rng.randrange(s + 1, n)
        else:
            s = rng.randrange(0, n)
            d = rng.randrange(0, n)
        il = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        ol = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        f.add_arc(s, Arc(il, ol, round(rng.uniform(0, 4), 3), d))
    for s in range(n):
        if rng.random() < final_prob:
            f.set_final(s, round(rng.uniform(0, 2), 3))
    f.set_final(n - 1, 0.0)
    return f


# --------------------------------------------------------------------------
# fstext extras: subsequential loop, factoring, special prune
# --------------------------------------------------------------------------

def add_subsequential_loop(fst: Fst, subseq_sym: int) -> Fst:
    """Add a subsequential "$" loop: every final state gets an arc
    (subseq_sym:eps, final weight) to a new superfinal state that loops
    on subseq_sym (reference: fstext/context-fst-inl.h:401
    AddSubsequentialLoop, fstbin/fstaddsubsequentialloop.cc).  Original
    final weights are kept, as the reference does."""
    out = fst.copy()
    finals = list(out.finals.items())
    superfinal = out.add_state()
    out.add_arc(superfinal, Arc(subseq_sym, 0, 0.0, superfinal))
    out.set_final(superfinal, 0.0)
    for s, w in finals:
        out.add_arc(s, Arc(subseq_sym, 0, w, superfinal))
    return out


def factor(fst: Fst) -> Tuple[Fst, List[List[int]]]:
    """Compress linear chains of input symbols into single new symbols
    (reference: fstext/factor.h Factor, fstbin/fstfactor.cc).

    Returns (ofst, symbols): ofst has the chains replaced by one arc
    whose ilabel indexes `symbols` (symbol -> sequence of original
    ilabels; index 0 is epsilon).  Original symbols keep their number as
    the length-1 sequence, matching the reference's guarantee.  A chain
    is a run of states with in-degree 1 / out-degree 1 whose internal
    arcs carry no olabel, so any olabel stays on the first arc.
    ExpandInputSequences(ofst, symbols) reproduces the input's paths.
    """
    n = fst.num_states
    indeg = [0] * n
    for arcs in fst.arcs:
        for a in arcs:
            indeg[a.nextstate] += 1

    def internal(s: int) -> bool:
        return (
            indeg[s] == 1 and len(fst.arcs[s]) == 1 and s != fst.start
            and s not in fst.finals and fst.arcs[s][0].olabel == 0
        )

    max_sym = 0
    for arcs in fst.arcs:
        for a in arcs:
            max_sym = max(max_sym, a.ilabel)
    symbols: List[List[int]] = [[]] + [[k] for k in range(1, max_sym + 1)]
    seq_to_sym: Dict[Tuple[int, ...], int] = {
        (k,): k for k in range(1, max_sym + 1)
    }

    out = Fst()
    smap: Dict[int, int] = {}

    def get(s: int) -> int:
        if s not in smap:
            smap[s] = out.add_state()
        return smap[s]

    if fst.start < 0:
        return out, symbols
    out.set_start(get(fst.start))
    for s in range(n):
        if internal(s):
            continue
        for a in fst.arcs[s]:
            ils = [a.ilabel] if a.ilabel else []
            w, cur = a.weight, a.nextstate
            while internal(cur):
                nxt = fst.arcs[cur][0]
                if nxt.ilabel:
                    ils.append(nxt.ilabel)
                w += nxt.weight
                cur = nxt.nextstate
            seq = tuple(ils)
            if len(seq) <= 1:
                sym = seq[0] if seq else 0
            else:
                sym = seq_to_sym.get(seq, -1)
                if sym < 0:
                    sym = len(symbols)
                    seq_to_sym[seq] = sym
                    symbols.append(list(seq))
            out.add_arc(get(s), Arc(sym, a.olabel, w, get(cur)))
    for s, w in fst.finals.items():
        if not internal(s):
            out.set_final(get(s), w)
    return out, symbols


def create_factor_fst(symbols: List[List[int]]) -> Fst:
    """Build the left factor FST (reference: fstext/factor.h
    CreateFactorFst): a loop state that is initial and final, with one
    chain per symbol — olabel = the factored symbol on the first arc,
    ilabels = the original sequence — returning to the loop state.
    compose(create_factor_fst(symbols), factored) is equivalent to the
    original FST."""
    f = Fst()
    loop = f.add_state()
    f.set_start(loop)
    f.set_final(loop, 0.0)
    for sym, seq in enumerate(symbols):
        if sym == 0 or not seq:
            continue
        cur = loop
        for i, il in enumerate(seq):
            last = i == len(seq) - 1
            nxt = loop if last else f.add_state()
            f.add_arc(cur, Arc(il, sym if i == 0 else 0, 0.0, nxt))
            cur = nxt
    return f


def expand_input_sequences(fst: Fst, symbols: List[List[int]]) -> Fst:
    """Inverse of factor (reference: fstext/factor.h
    ExpandInputSequences): replace each arc's ilabel by its chain of
    original symbols."""
    out = Fst()
    for _ in range(fst.num_states):
        out.add_state()
    out.start = fst.start
    out.finals = dict(fst.finals)
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            seq = symbols[a.ilabel] if a.ilabel else []
            if len(seq) <= 1:
                out.add_arc(s, Arc(
                    seq[0] if seq else 0, a.olabel, a.weight, a.nextstate,
                ))
                continue
            cur = s
            for i, il in enumerate(seq):
                last = i == len(seq) - 1
                nxt = a.nextstate if last else out.add_state()
                out.add_arc(cur, Arc(
                    il, a.olabel if i == 0 else 0,
                    a.weight if i == 0 else 0.0, nxt,
                ))
                cur = nxt
    return out


def prune_special(fst: Fst, beam: float, max_states: int = 0) -> Fst:
    """Keep only arcs/states on paths within `beam` of the best path
    (reference: fstext/prune-special.h PruneSpecial; equivalent to
    OpenFst Prune at weight_threshold=beam, with an optional state cap).
    Works on cyclic FSTs with non-negative-total cycles via
    label-correcting shortest distances."""
    n = fst.num_states
    if fst.start < 0 or n == 0:
        return Fst()

    def shortest_from(adj_costs) -> List[float]:
        dist = [INF] * n
        srcs, q = adj_costs
        for s, d0 in srcs:
            if d0 < dist[s]:
                dist[s] = d0
        import collections
        queue = collections.deque(s for s, _ in srcs)
        inq = [False] * n
        for s, _ in srcs:
            inq[s] = True
        while queue:
            s = queue.popleft()
            inq[s] = False
            for (d, w) in q[s]:
                nd = dist[s] + w
                if nd < dist[d] - 1e-12:
                    dist[d] = nd
                    if not inq[d]:
                        inq[d] = True
                        queue.append(d)
        return dist

    fwd_adj: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
    bwd_adj: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
    for s in range(n):
        for a in fst.arcs[s]:
            fwd_adj[s].append((a.nextstate, a.weight))
            bwd_adj[a.nextstate].append((s, a.weight))
    fwd = shortest_from(([(fst.start, 0.0)], fwd_adj))
    bwd = shortest_from((list(fst.finals.items()), bwd_adj))
    best = fwd[fst.start] + bwd[fst.start] if n else INF
    best = min(
        (fwd[s] + w for s, w in fst.finals.items()), default=INF
    )
    if not (best < INF):
        return Fst()
    cutoff = best + beam

    keep = [
        s for s in range(n) if fwd[s] + bwd[s] <= cutoff
    ]
    if max_states and len(keep) > max_states:
        keep.sort(key=lambda s: fwd[s] + bwd[s])
        keep = keep[:max_states]
    keepset = set(keep)
    out = Fst()
    smap = {}
    for s in keep:
        smap[s] = out.add_state()
    if fst.start not in smap:
        return Fst()
    out.set_start(smap[fst.start])
    for s in keep:
        for a in fst.arcs[s]:
            if (a.nextstate in keepset
                    and fwd[s] + a.weight + bwd[a.nextstate] <= cutoff):
                out.add_arc(smap[s], Arc(
                    a.ilabel, a.olabel, a.weight, smap[a.nextstate],
                ))
        if s in fst.finals and fwd[s] + fst.finals[s] <= cutoff:
            out.set_final(smap[s], fst.finals[s])
    return out
