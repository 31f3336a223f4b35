"""Lattice archive round-trip tests."""

import numpy as np

from eesen_tpu.decoder.lattice import Lattice, LatticeArc
from eesen_tpu.decoder.lattice_io import (
    read_lattice_ark, write_lattice_ark,
)


def make_lat():
    lat = Lattice()
    s0, s1, s2 = lat.add_state(-1), lat.add_state(3), lat.add_state(6)
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 10, 0.25, 1.5, s1))
    lat.arcs[s0].append(LatticeArc(2, 11, 1.0, 0.5, s1))
    lat.arcs[s1].append(LatticeArc(3, 12, 0.0, 2.0, s2))
    lat.finals[s2] = 0.5
    return lat


def test_lattice_ark_roundtrip(tmp_path):
    path = str(tmp_path / "lat.ark")
    lats = {"utt1": make_lat(), "utt2": make_lat()}
    write_lattice_ark(path, iter(lats.items()))
    back = dict(read_lattice_ark(path))
    assert set(back) == {"utt1", "utt2"}
    for key in lats:
        a, b = lats[key], back[key]
        assert a.num_states == b.num_states
        assert a.num_arcs == b.num_arcs
        ia, oa, ca = a.best_path()
        ib, ob, cb = b.best_path()
        assert ia == ib and oa == ob
        np.testing.assert_allclose(ca, cb, rtol=1e-5)


def test_lattice_scale_after_reload(tmp_path):
    path = str(tmp_path / "lat.ark")
    write_lattice_ark(path, iter([("u", make_lat())]))
    (_, lat), = list(read_lattice_ark(path))
    _, _, c1 = lat.best_path()
    lat.scale(acoustic_scale=0.5)
    _, _, c2 = lat.best_path()
    assert c2 < c1


def test_determinize_lattice():
    from eesen_tpu.decoder.lattice_io import determinize_lattice

    lat = Lattice()
    s0, s1a, s1b, s2 = (
        lat.add_state(-1), lat.add_state(2), lat.add_state(3),
        lat.add_state(6),
    )
    lat.start = s0
    # two paths with the SAME word (10), different costs, + one with 11
    lat.arcs[s0].append(LatticeArc(1, 10, 0.5, 1.0, s1a))
    lat.arcs[s0].append(LatticeArc(2, 10, 0.2, 0.6, s1b))
    lat.arcs[s0].append(LatticeArc(3, 11, 0.1, 0.1, s1a))
    lat.arcs[s1a].append(LatticeArc(4, 12, 0.0, 1.0, s2))
    lat.arcs[s1b].append(LatticeArc(5, 12, 0.0, 1.0, s2))
    lat.finals[s2] = 0.0
    d = determinize_lattice(lat)
    # word-sequence (10, 12) appears ONCE with the better cost 0.8+1.0
    # (graph and acoustic costs stay separate through determinization
    # now; total = graph + acoustic)
    paths = {}
    def walk(s, words, cost):
        if s in d.finals:
            key = tuple(words)
            paths[key] = min(paths.get(key, float("inf")), cost + d.finals[s])
        for a in d.arcs[s]:
            walk(a.nextstate, words + ([a.olabel] if a.olabel else []),
                 cost + a.graph_cost + a.acoustic_cost)
    walk(d.start, [], 0.0)
    assert set(paths) == {(10, 12), (11, 12)}
    np.testing.assert_allclose(paths[(10, 12)], 1.8, rtol=1e-5)
    np.testing.assert_allclose(paths[(11, 12)], 1.2, rtol=1e-5)
    # determinism over word labels at each state
    for arcs in d.arcs:
        labs = [a.olabel for a in arcs if a.olabel]
        assert len(labs) == len(set(labs))


def test_compact_lattice_text_roundtrip(tmp_path):
    from eesen_tpu.decoder.clat import determinize_lattice_pruned
    from eesen_tpu.decoder.lattice_io import (
        read_compact_lattice_text, write_compact_lattice_text,
    )
    import io

    clat = determinize_lattice_pruned(make_lat(), lattice_beam=20.0)
    buf = io.StringIO()
    write_compact_lattice_text(clat, buf)
    back = read_compact_lattice_text(buf.getvalue().splitlines())
    ia, wa, ca = clat.best_path()
    ib, wb, cb = back.best_path()
    assert (ia, wa) == (ib, wb)
    np.testing.assert_allclose(ca, cb, rtol=1e-5)
    assert back.num_states == clat.num_states
    assert back.num_arcs == clat.num_arcs


def test_binary_lattice_ark_roundtrip(tmp_path):
    path = str(tmp_path / "lat.bark")
    lats = {"utt1": make_lat(), "utt2": make_lat()}
    write_lattice_ark(path, iter(lats.items()), binary=True)
    with open(path, "rb") as f:
        head = f.read(10)
    assert head[:5] == b"utt1 "
    assert head[5] == 0xD6      # OpenFst magic first byte (little-endian)
    back = dict(read_lattice_ark(path))
    assert set(back) == {"utt1", "utt2"}
    for key in lats:
        a, b = lats[key], back[key]
        assert a.num_states == b.num_states
        assert a.num_arcs == b.num_arcs
        ia, oa, ca = a.best_path()
        ib, ob, cb = b.best_path()
        assert ia == ib and oa == ob
        np.testing.assert_allclose(ca, cb, rtol=1e-5)


def test_binary_compact_lattice_ark_roundtrip(tmp_path):
    from eesen_tpu.decoder.clat import (
        CompactLattice, determinize_lattice_pruned,
    )

    path = str(tmp_path / "clat.bark")
    clat = determinize_lattice_pruned(make_lat(), lattice_beam=20.0)
    write_lattice_ark(path, iter([("u1", clat)]), binary=True)
    (key, back), = list(read_lattice_ark(path))
    assert key == "u1" and isinstance(back, CompactLattice)
    ia, wa, ca = clat.best_path()
    ib, wb, cb = back.best_path()
    assert (ia, wa) == (ib, wb)
    np.testing.assert_allclose(ca, cb, rtol=1e-5)
    # pair stays separate: rescale the reloaded lattice
    _, _, c05 = back.scaled(0.5).best_path()
    assert c05 < cb


def test_mixed_text_archive_autodetects_compact(tmp_path):
    from eesen_tpu.decoder.clat import (
        CompactLattice, determinize_lattice_pruned,
    )

    path = str(tmp_path / "mixed.ark")
    clat = determinize_lattice_pruned(make_lat(), lattice_beam=20.0)
    write_lattice_ark(path, iter([("a", make_lat()), ("b", clat)]))
    back = dict(read_lattice_ark(path))
    assert isinstance(back["a"], Lattice)
    assert isinstance(back["b"], CompactLattice)
