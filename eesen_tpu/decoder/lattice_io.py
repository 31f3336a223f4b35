"""Lattice archive IO, Kaldi-compatible.

Reads and writes lattices in the reference's text CompactLattice-style
format and in the plain Lattice text format
(reference: src/lat/kaldi-lattice.{h,cc} — LatticeHolder/
CompactLatticeHolder; lattice text lines are
`src dst ilabel olabel graph_cost,acoustic_cost[,string]` with final
lines `state cost[,cost]`), so lattices decoded here can be post-processed
by Kaldi/eesen tools and vice versa.

Archive framing matches kaldi_io: `key ` then the text lattice terminated
by an empty line (the reference's text-mode tables).
"""

from __future__ import annotations

from typing import BinaryIO, Dict, Iterator, List, Optional, TextIO, Tuple

from eesen_tpu.decoder.lattice import Lattice, LatticeArc

INF = float("inf")


def write_lattice_text(lat: Lattice, f: TextIO) -> None:
    """Plain Lattice text format: weights are (graph_cost, acoustic_cost)."""
    n = lat.num_states
    order = sorted(range(n), key=lambda s: (lat.state_frame[s], s))
    remap = {s: i for i, s in enumerate(order)}
    # ensure the start state prints first (Kaldi convention: state 0)
    if lat.start in remap and remap[lat.start] != 0:
        other = order[0]
        order[0], order[remap[lat.start]] = lat.start, other
        remap = {s: i for i, s in enumerate(order)}
    for s in order:
        for a in lat.arcs[s]:
            f.write(
                f"{remap[s]}\t{remap[a.nextstate]}\t{a.ilabel}\t{a.olabel}\t"
                f"{a.graph_cost:.7g},{a.acoustic_cost:.7g}\n"
            )
        if s in lat.finals:
            f.write(f"{remap[s]}\t{lat.finals[s]:.7g},0\n")


def read_lattice_text(lines: List[str]) -> Lattice:
    lat = Lattice()
    ids: Dict[int, int] = {}

    def state(x: int) -> int:
        if x not in ids:
            ids[x] = lat.add_state(-1)
        return ids[x]

    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if len(parts) >= 4:
            s, d = state(int(parts[0])), state(int(parts[1]))
            il, ol = int(parts[2]), int(parts[3])
            gc = ac = 0.0
            if len(parts) >= 5:
                w = parts[4].split(",")
                gc = float(w[0]) if w[0] else 0.0
                ac = float(w[1]) if len(w) > 1 and w[1] else 0.0
            lat.arcs[s].append(LatticeArc(il, ol, gc, ac, d))
        elif len(parts) <= 2:
            s = state(int(parts[0]))
            w = parts[1].split(",") if len(parts) == 2 else ["0"]
            lat.finals[s] = float(w[0]) if w[0] else 0.0
    if ids:
        lat.start = ids[min(ids)]
    # recover frame order topologically (frames unknown from text: use BFS
    # depth as a stand-in so best_path's topological order works)
    _assign_frames(lat)
    return lat


def _assign_frames(lat: Lattice) -> None:
    n = lat.num_states
    depth = [0] * n
    # longest-path depth via repeated relaxation (lattices are small DAGs)
    for _ in range(n):
        changed = False
        for s in range(n):
            for a in lat.arcs[s]:
                if depth[s] + 1 > depth[a.nextstate]:
                    depth[a.nextstate] = depth[s] + 1
                    changed = True
        if not changed:
            break
    lat.state_frame = depth


def determinize_lattice(lat: Lattice, acoustic_scale: float = 1.0) -> Lattice:
    """Word-level lattice determinization.

    The analogue of the reference's DeterminizeLatticePruned wrapper after
    decoding (src/lat/determinize-lattice-pruned.{h,cc} via
    decoder-wrappers.cc:87-99): merge all paths with the same word sequence
    keeping the best, producing a compact word DAG.  Costs are combined as
    graph + acoustic_scale-weighted acoustic (the pair semiring is
    flattened; scale before determinizing)."""
    from eesen_tpu.decoder.fst import Arc as FArc, Fst
    from eesen_tpu.decoder import fst_native as fnat

    f = Fst()
    for _ in range(lat.num_states):
        f.add_state()
    f.set_start(lat.start)
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            w = a.graph_cost + acoustic_scale * a.acoustic_cost
            f.add_arc(s, FArc(a.olabel, a.olabel, w, a.nextstate))
    for s, w in lat.finals.items():
        f.set_final(s, w)
    d = fnat.determinize_star(f, "tropical")
    out = Lattice()
    for _ in range(d.num_states):
        out.add_state(-1)
    out.start = d.start
    for s in range(d.num_states):
        for a in d.arcs[s]:
            out.arcs[s].append(
                LatticeArc(a.ilabel, a.olabel, a.weight, 0.0, a.nextstate)
            )
    for s, w in d.finals.items():
        out.finals[s] = w
    _assign_frames(out)
    return out


def write_lattice_ark(
    path: str, items: Iterator[Tuple[str, Lattice]]
) -> None:
    with open(path, "w") as f:
        for key, lat in items:
            f.write(f"{key} \n")
            write_lattice_text(lat, f)
            f.write("\n")


def read_lattice_ark(path: str) -> Iterator[Tuple[str, Lattice]]:
    with open(path) as f:
        key: Optional[str] = None
        lines: List[str] = []
        for raw in f:
            line = raw.rstrip("\n")
            if key is None:
                if line.strip():
                    key = line.split()[0]
                    rest = line[len(key):].strip()
                    if rest:
                        lines.append(rest)
                continue
            if not line.strip():
                yield key, read_lattice_text(lines)
                key, lines = None, []
            else:
                lines.append(line)
        if key is not None:
            yield key, read_lattice_text(lines)
