"""ConstArpa flat-array trie vs the G-fst LmAutomaton oracle."""

import math

import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.const_arpa import ConstArpa
from eesen_tpu.decoder.ctc_graph import make_word_table
from eesen_tpu.decoder.rescore import LmAutomaton
from eesen_tpu.recipes.lm import estimate_bigram_arpa, estimate_ngram_arpa

INF = float("inf")


def _mk(order, n_vocab=30, n_sents=300, seed=0, min_counts=None):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(n_vocab)]
    sents = []
    for _ in range(n_sents):
        n = int(rng.integers(3, 9))
        start = int(rng.integers(0, n_vocab))
        sents.append([vocab[(start + 3 * k) % n_vocab] for k in range(n)])
    arpa = estimate_ngram_arpa(
        sents, order=order, vocab=vocab,
        min_counts=min_counts or (1,) * order,
    )
    words = make_word_table(vocab)
    g = arpa_to_fst(arpa, words)
    oracle = LmAutomaton(g, backoff_ilabel=words["#0"])
    trie = ConstArpa.from_arpa(arpa, words)
    return vocab, words, oracle, trie


@pytest.mark.parametrize("order,min_counts", [
    (2, None), (3, None), (3, (1, 1, 2)), (4, None),
])
def test_score_matches_lm_automaton(order, min_counts):
    vocab, words, oracle, trie = _mk(order, min_counts=min_counts)
    rng = np.random.default_rng(1)
    for _ in range(60):
        qs, ts = oracle.start, trie.start
        total_o = total_t = 0.0
        for _ in range(int(rng.integers(1, 10))):
            w = words[vocab[int(rng.integers(0, len(vocab)))]]
            co, qs = oracle.score(qs, w)
            ct, ts = trie.score(ts, w)
            assert (co == INF) == (ct == INF)
            if co == INF:
                break
            total_o += co
            total_t += ct
        else:
            fo, ft = oracle.final(qs), trie.final(ts)
            assert (fo == INF) == (ft == INF)
            if fo != INF:
                total_o += fo
                total_t += ft
        assert total_t == pytest.approx(total_o, abs=1e-4)


def test_save_load_mmap(tmp_path):
    vocab, words, oracle, trie = _mk(3)
    p = str(tmp_path / "lm.npz")
    trie.save(p)
    back = ConstArpa.load(p, mmap=True)
    rng = np.random.default_rng(2)
    qs, ts = trie.start, back.start
    for _ in range(30):
        w = words[vocab[int(rng.integers(0, len(vocab)))]]
        c1, qs = trie.score(qs, w)
        c2, ts = back.score(ts, w)
        assert c1 == pytest.approx(c2)
    assert back.num_ngrams == trie.num_ngrams
    assert back.order == 3


def test_rescore_lattice_accepts_const_arpa():
    """rescore_lattice duck-types: ConstArpa slots in for LmAutomaton and
    produces the same rescored best path."""
    from eesen_tpu.decoder.lattice import Lattice, LatticeArc
    from eesen_tpu.decoder.rescore import rescore_lattice

    vocab, words, oracle, trie = _mk(2, n_vocab=8, n_sents=100)
    lat = Lattice()
    for f in range(4):
        lat.add_state(f)
    lat.start = 0
    w1, w2, w3 = (words[vocab[i]] for i in (0, 3, 6))
    lat.arcs[0].append(LatticeArc(1, w1, 0.5, 1.0, 1))
    lat.arcs[0].append(LatticeArc(2, w2, 0.6, 0.9, 1))
    lat.arcs[1].append(LatticeArc(3, w3, 0.2, 1.1, 2))
    lat.arcs[1].append(LatticeArc(4, 0, 0.1, 0.2, 3))
    lat.finals[2] = 0.0
    lat.finals[3] = 0.3

    a = rescore_lattice(lat, oracle, lm_scale_new=0.8)
    b = rescore_lattice(lat, trie, lm_scale_new=0.8)
    pa = a.best_path()
    pb = b.best_path()
    assert pa[1] == pb[1]
    assert pa[2] == pytest.approx(pb[2], abs=1e-4)


def test_const_arpa_compactness():
    """The trie's byte size is linear in ngrams (the const-arpa design
    point, const-arpa-lm.h:32), far below the G-fst object graph."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    sents = [
        [vocab[int(j)] for j in rng.integers(0, 50, int(rng.integers(4, 9)))]
        for _ in range(2000)
    ]
    arpa = estimate_ngram_arpa(sents, order=3, vocab=vocab)
    words = make_word_table(vocab)
    trie = ConstArpa.from_arpa(arpa, words)
    n = trie.num_ngrams
    assert n > 1000
    # ~13 bytes per child + state overhead
    assert trie.bytes() < 40 * n + 64 * trie.num_states


def test_cli_const_lm_and_rescore(tmp_path):
    """arpa-to-const-lm + lattice-rescore (npz and ARPA inputs give the
    same best paths) + lattice-confidence smoke."""
    from eesen_tpu.decoder.lattice import Lattice, LatticeArc
    from eesen_tpu.decoder.lattice_io import (
        read_lattice_ark, write_lattice_ark,
    )
    from eesen_tpu.tools.cli import main

    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(10)]
    sents = [
        [vocab[int(j)] for j in rng.integers(0, 10, 5)] for _ in range(200)
    ]
    arpa = estimate_ngram_arpa(sents, order=3, vocab=vocab)
    words = make_word_table(vocab)
    arpa_path = str(tmp_path / "lm.arpa")
    with open(arpa_path, "w") as f:
        f.write(arpa)
    wpath = str(tmp_path / "words.txt")
    words.write(wpath)

    # a small 2-path lattice
    lat = Lattice()
    for fr in range(3):
        lat.add_state(fr)
    lat.start = 0
    lat.arcs[0].append(LatticeArc(1, words["w1"], 0.5, 1.0, 1))
    lat.arcs[0].append(LatticeArc(2, words["w2"], 0.4, 1.1, 1))
    lat.arcs[1].append(LatticeArc(3, words["w3"], 0.2, 0.8, 2))
    lat.finals[2] = 0.0
    ark = str(tmp_path / "in.lat.ark")
    write_lattice_ark(ark, iter([("utt1", lat)]), binary=False)

    npz = str(tmp_path / "lm.npz")
    assert main(["arpa-to-const-lm", arpa_path, wpath, npz]) == 0

    out1 = str(tmp_path / "res_npz.ark")
    out2 = str(tmp_path / "res_arpa.ark")
    assert main(["lattice-rescore", ark, npz, out1,
                 "--lm-scale", "0.7"]) == 0
    assert main(["lattice-rescore", ark, arpa_path, out2,
                 "--words", wpath, "--lm-scale", "0.7"]) == 0
    (k1, l1), = list(read_lattice_ark(out1))
    (k2, l2), = list(read_lattice_ark(out2))
    p1, p2 = l1.best_path(), l2.best_path()
    assert k1 == k2 == "utt1"
    assert p1[1] == p2[1]
    assert p1[2] == pytest.approx(p2[2], abs=1e-4)

    conf = str(tmp_path / "conf.txt")
    assert main(["lattice-confidence", out1, "--out", conf]) == 0
    line = open(conf).read().split()
    assert line[0] == "utt1" and len(line) == 3
