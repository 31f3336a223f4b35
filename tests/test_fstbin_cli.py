"""CLI coverage for the fstbin/decoderbin equivalents added in round 2:
fst-* text tools, arpa2fst, analyze-counts, lattice-1best, nbest-to-ctm."""

import numpy as np
import pytest

from eesen_tpu.decoder.fst import EPS, Arc, Fst
from eesen_tpu.decoder.lattice import Lattice, LatticeArc
from eesen_tpu.decoder.lattice_io import write_lattice_ark
from eesen_tpu.io.kaldi_io import write_ark
from eesen_tpu.tools.cli import main

FST_TEXT = """0 1 1 2 0.5
0 1 2 3 1.5
1 2 1 1 0.25
2 0.75
"""


def _write(tmp_path, name, text):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_fst_copy_roundtrip(tmp_path, capsys):
    src = _write(tmp_path, "a.fst", FST_TEXT)
    out = str(tmp_path / "b.fst")
    assert main(["fst-copy", src, out]) == 0
    f = Fst.from_text(open(out).read())
    assert f.num_states == 3 and f.num_arcs == 3


def test_fst_determinize_and_minimize(tmp_path):
    # two arcs with the same ilabel from state 0 -> determinize merges
    text = "0 1 1 2 0.5\n0 2 1 3 1.0\n1 3 2 0 0.0\n2 3 2 0 0.0\n3\n"
    src = _write(tmp_path, "a.fst", text)
    det = str(tmp_path / "det.fst")
    assert main(["fst-determinize-star", src, det]) == 0
    f = Fst.from_text(open(det).read())
    for arcs in f.arcs:
        ils = [a.ilabel for a in arcs if a.ilabel != EPS]
        assert len(ils) == len(set(ils))
    mn = str(tmp_path / "min.fst")
    assert main(["fst-minimize-encoded", det, mn]) == 0
    g = Fst.from_text(open(mn).read())
    assert g.num_states <= f.num_states


def test_fst_compose_and_selfloops(tmp_path):
    a = _write(tmp_path, "a.fst", "0 1 1 2 0.0\n1\n")
    b = _write(tmp_path, "b.fst", "0 1 2 3 0.5\n1\n")
    out = str(tmp_path / "c.fst")
    assert main(["fst-compose", a, b, out]) == 0
    c = Fst.from_text(open(out).read())
    assert c.num_arcs == 1
    arc = c.arcs[c.start][0]
    assert (arc.ilabel, arc.olabel) == (1, 3)

    loops = str(tmp_path / "l.fst")
    assert main(["fst-add-self-loops", a, loops,
                 "--isyms", "7", "--osyms", "8"]) == 0
    f = Fst.from_text(open(loops).read())
    assert any(
        x.ilabel == 7 and x.olabel == 8 and x.nextstate == s
        for s in range(f.num_states) for x in f.arcs[s]
    )


def test_fst_is_stochastic(tmp_path):
    import math
    # two arcs each with probability 0.5 (in -log space)
    w = -math.log(0.5)
    good = _write(tmp_path, "g.fst", f"0 1 1 1 {w}\n0 1 2 2 {w}\n1 0.0\n")
    bad = _write(tmp_path, "b.fst", "0 1 1 1 3.0\n1 0.0\n")
    assert main(["fst-is-stochastic", good]) == 0
    assert main(["fst-is-stochastic", bad]) == 1


def test_fst_push_special_makes_stochastic_like(tmp_path):
    src = _write(tmp_path, "a.fst", FST_TEXT)
    out = str(tmp_path / "p.fst")
    assert main(["fst-push-special", src, out]) == 0
    # push-special equalizes the per-state residual (all states share one
    # constant) — the min/max spread should be tiny
    from eesen_tpu.decoder.fst import is_stochastic
    _, lo, hi = is_stochastic(Fst.from_text(open(out).read()), delta=1e9)
    assert hi - lo < 0.01


def test_arpa2fst_cli(tmp_path, capsys):
    from tests.test_ctc_graph import ARPA
    arpa = _write(tmp_path, "lm.arpa", ARPA)
    out = str(tmp_path / "g.fst")
    assert main(["arpa2fst", arpa, "--out", out]) == 0
    g = Fst.from_text(open(out).read())
    assert g.num_states > 0 and g.num_arcs > 0


def test_analyze_counts(tmp_path):
    ark = str(tmp_path / "labels.ark")
    write_ark(ark, [
        ("u1", np.array([1, 1, 2], np.int32)),
        ("u2", np.array([2, 3], np.int32)),
    ])
    out = str(tmp_path / "counts.txt")
    assert main(["analyze-counts", f"ark:{ark}", out,
                 "--num-targets", "5"]) == 0
    counts = np.loadtxt(out)
    assert counts.shape == (5,)
    assert counts[1] >= 2 and counts[2] >= 2 and counts[3] >= 1


def _toy_lattice():
    lat = Lattice()
    s0 = lat.add_state(0)
    s1 = lat.add_state(1)
    s2 = lat.add_state(2)
    s3 = lat.add_state(2)
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 11, 0.1, 0.2, s1))
    lat.arcs[s1].append(LatticeArc(2, 12, 0.1, 0.1, s2))   # best
    lat.arcs[s1].append(LatticeArc(3, 13, 1.0, 1.0, s3))   # worse
    lat.finals[s2] = 0.0
    lat.finals[s3] = 0.0
    return lat


def test_lattice_1best_cli(tmp_path):
    ark = str(tmp_path / "lat.ark")
    write_lattice_ark(ark, [("u1", _toy_lattice())])
    out = str(tmp_path / "best.ark")
    assert main(["lattice-1best", ark, out]) == 0
    from eesen_tpu.decoder.lattice_io import read_lattice_ark
    (key, lat), = list(read_lattice_ark(out))
    assert key == "u1"
    assert lat.num_arcs == 2               # linear: exactly the best path
    words = [a.olabel for arcs in lat.arcs for a in arcs if a.olabel]
    assert words == [11, 12]


def test_nbest_to_ctm_cli(tmp_path, capsys):
    ark = str(tmp_path / "lat.ark")
    write_lattice_ark(ark, [("u1", _toy_lattice())])
    assert main(["nbest-to-ctm", ark]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("u1")]
    assert len(lines) == 2                 # two best-path words
    assert lines[0].split()[4] == "11"
