"""Pair-semiring pruned lattice determinization tests.

Oracle: brute-force path enumeration over the input lattice — group paths
by word sequence, keep the best (graph, acoustic) pair per the reference's
LatticeWeight order (fstext/lattice-weight.h:295 Compare), and check the
determinized CompactLattice reproduces exactly those sequences, costs and
alignment strings within the beam."""

import math
import random

import numpy as np
import pytest

from eesen_tpu.decoder.clat import (
    CompactLattice, compact_to_lattice, determinize_lattice_pruned,
    lattice_to_compact, pair_compare,
)
from eesen_tpu.decoder.lattice import Lattice, LatticeArc

INF = float("inf")


def _mk_lattice(arcs, finals, n_states, start=0):
    lat = Lattice()
    for i in range(n_states):
        lat.add_state(i)
    lat.start = start
    for (s, d, il, ol, g, a) in arcs:
        lat.arcs[s].append(LatticeArc(il, ol, g, a, d))
    lat.finals = dict(finals)
    return lat


def _enumerate_paths(lat):
    """All (word_seq, ilabel_seq, graph, acoustic) complete paths."""
    out = []

    def rec(s, words, ils, g, a, depth):
        assert depth < 500
        if s in lat.finals:
            out.append((tuple(words), tuple(ils), g + lat.finals[s], a))
        for arc in lat.arcs[s]:
            rec(
                arc.nextstate,
                words + ([arc.olabel] if arc.olabel else []),
                ils + ([arc.ilabel] if arc.ilabel else []),
                g + arc.graph_cost, a + arc.acoustic_cost, depth + 1,
            )

    rec(lat.start, [], [], 0.0, 0.0, 0)
    return out


def _best_per_wordseq(paths):
    best = {}
    for (ws, ils, g, a) in paths:
        cur = best.get(ws)
        if cur is None or pair_compare((g, a), (cur[1], cur[2])) < 0:
            best[ws] = (ils, g, a)
    return best


def _clat_paths(clat):
    """All complete paths of a CompactLattice."""
    out = []

    def rec(s, words, ils, g, a, depth):
        assert depth < 500
        if s in clat.finals:
            fg, fa, fil = clat.finals[s]
            out.append((
                tuple(words), tuple(ils) + tuple(fil), g + fg, a + fa,
            ))
        for arc in clat.arcs[s]:
            rec(
                arc.nextstate,
                words + ([arc.word] if arc.word else []),
                ils + list(arc.ilabels),
                g + arc.graph_cost, a + arc.acoustic_cost, depth + 1,
            )

    rec(clat.start, [], [], 0.0, 0.0, 0)
    return out


def _random_lattice(rng, n_states=10, n_arcs=24, n_words=3, n_toks=4):
    lat = Lattice()
    for i in range(n_states):
        lat.add_state(i)
    lat.start = 0
    for _ in range(n_arcs):
        s = rng.randrange(0, n_states - 1)
        d = rng.randrange(s + 1, n_states)   # forward arcs only: acyclic
        il = rng.randrange(0, n_toks + 1)
        ol = rng.choice([0, 0, 1, 2, 3][: 2 + n_words])
        g = round(rng.uniform(0, 3), 2)
        a = round(rng.uniform(0, 3), 2)
        lat.arcs[s].append(LatticeArc(il, ol, g, a, d))
    lat.finals[n_states - 1] = round(rng.uniform(0, 1), 2)
    return lat


class TestDeterminize:
    def test_merges_same_wordseq_keeps_best_pair(self):
        # two paths for word 5: costs (2,1) vs (1,1.5) -> (1,1.5) wins
        # (total 2.5 < 3); alignments differ, winner's alignment kept.
        lat = _mk_lattice(
            arcs=[
                (0, 1, 7, 5, 2.0, 1.0),
                (0, 2, 8, 5, 1.0, 1.5),
                (1, 3, 0, 0, 0.0, 0.0),
                (2, 3, 0, 0, 0.0, 0.0),
            ],
            finals={3: 0.0}, n_states=4,
        )
        clat = determinize_lattice_pruned(lat, lattice_beam=10.0)
        paths = _clat_paths(clat)
        assert len(paths) == 1
        ws, ils, g, a = paths[0]
        assert ws == (5,)
        assert ils == (8,)
        assert (g, a) == (1.0, 1.5)

    def test_tie_total_prefers_smaller_graph_cost(self):
        lat = _mk_lattice(
            arcs=[
                (0, 1, 7, 5, 2.0, 1.0),   # total 3, graph 2
                (0, 2, 8, 5, 1.0, 2.0),   # total 3, graph 1 -> wins
            ],
            finals={1: 0.0, 2: 0.0}, n_states=3,
        )
        clat = determinize_lattice_pruned(lat, lattice_beam=10.0)
        paths = _clat_paths(clat)
        assert len(paths) == 1
        assert paths[0][2:] == (1.0, 2.0)
        assert paths[0][1] == (8,)

    def test_epsilon_ilabels_absorbed_into_string(self):
        # word 5 then eps-arc chain carrying tokens 2, 3
        lat = _mk_lattice(
            arcs=[
                (0, 1, 9, 5, 0.5, 0.25),
                (1, 2, 2, 0, 0.1, 0.2),
                (2, 3, 3, 0, 0.0, 0.3),
            ],
            finals={3: 0.75}, n_states=4,
        )
        clat = determinize_lattice_pruned(lat, lattice_beam=10.0)
        ils, words, cost = clat.best_path()
        assert words == [5]
        assert ils == [9, 2, 3]
        assert cost == pytest.approx(0.5 + 0.25 + 0.1 + 0.2 + 0.3 + 0.75)

    def test_beam_pruning_drops_bad_wordseq(self):
        lat = _mk_lattice(
            arcs=[
                (0, 1, 7, 5, 0.0, 0.0),
                (0, 1, 8, 6, 20.0, 0.0),   # 20 over best: outside beam
            ],
            finals={1: 0.0}, n_states=2,
        )
        clat = determinize_lattice_pruned(lat, lattice_beam=8.0)
        seqs = {p[0] for p in _clat_paths(clat)}
        assert seqs == {(5,)}
        clat2 = determinize_lattice_pruned(lat, lattice_beam=30.0)
        assert {p[0] for p in _clat_paths(clat2)} == {(5,), (6,)}

    def test_deterministic_output(self):
        rng = random.Random(7)
        for _ in range(5):
            lat = _random_lattice(rng)
            clat = determinize_lattice_pruned(lat, lattice_beam=50.0)
            for s in range(clat.num_states):
                words = [a.word for a in clat.arcs[s]]
                assert len(words) == len(set(words)), "nondeterministic"

    @pytest.mark.parametrize("seed", range(8))
    def test_random_vs_bruteforce(self, seed):
        rng = random.Random(seed)
        lat = _random_lattice(rng)
        paths = _enumerate_paths(lat)
        if not paths:
            return
        best = _best_per_wordseq(paths)
        best_total = min(g + a for (_, g, a) in best.values())
        beam = 6.0
        clat = determinize_lattice_pruned(lat, lattice_beam=beam)
        got = {p[0]: p[1:] for p in _clat_paths(clat)}
        # every word sequence within the beam must appear with the exact
        # best (graph, acoustic) pair and its alignment string
        for ws, (ils, g, a) in best.items():
            if g + a <= best_total + beam - 1e-6:
                assert ws in got, f"missing {ws}"
                gils, gg, ga = got[ws]
                assert (gg + ga) == pytest.approx(g + a, abs=1e-4)
                assert gg == pytest.approx(g, abs=1e-4)
                assert gils == ils
        # nothing outside the beam, nothing not in the input
        for ws, (gils, gg, ga) in got.items():
            assert ws in best
            bils, bg, ba = best[ws]
            assert gg + ga == pytest.approx(bg + ba, abs=1e-4)


class TestCompactOps:
    def _simple(self):
        lat = _mk_lattice(
            arcs=[
                (0, 1, 7, 5, 1.0, 2.0),
                (1, 2, 3, 6, 0.5, 1.0),
            ],
            finals={2: 0.25}, n_states=3,
        )
        return determinize_lattice_pruned(lat, lattice_beam=10.0)

    def test_scale_sweep_matches_rescoring(self):
        clat = self._simple()
        for acwt in (0.5, 0.9, 2.0):
            sc = clat.scaled(acwt)
            _, words, cost = sc.best_path()
            assert words == [5, 6]
            assert cost == pytest.approx(1.75 + acwt * 3.0)

    def test_add_penalty(self):
        clat = self._simple()
        _, _, base = clat.best_path()
        clat.add_penalty(0.7)
        _, _, c2 = clat.best_path()
        assert c2 == pytest.approx(base + 2 * 0.7)

    def test_compact_to_lattice_roundtrip_bestpath(self):
        clat = self._simple()
        ils, words, cost = clat.best_path()
        lat = compact_to_lattice(clat)
        lils, lwords, lcost = lat.best_path()
        assert lwords == words
        assert lils == ils
        assert lcost == pytest.approx(cost)

    def test_lattice_to_compact_straight(self):
        lat = _mk_lattice(
            arcs=[(0, 1, 7, 5, 1.0, 2.0)], finals={1: 0.5}, n_states=2,
        )
        clat = lattice_to_compact(lat)
        ils, words, cost = clat.best_path()
        assert words == [5] and ils == [7]
        assert cost == pytest.approx(3.5)

    def test_prune(self):
        lat = _mk_lattice(
            arcs=[
                (0, 1, 7, 5, 0.0, 0.0),
                (0, 1, 8, 6, 5.0, 0.0),
            ],
            finals={1: 0.0}, n_states=2,
        )
        clat = determinize_lattice_pruned(lat, lattice_beam=20.0)
        assert len(_clat_paths(clat)) == 2
        clat.prune(3.0)
        assert {p[0] for p in _clat_paths(clat)} == {(5,)}


class TestPushMinimize:
    """push-lattice + minimize-lattice (reference: src/lat/push-lattice.cc,
    src/lat/minimize-lattice.cc) — path-set invariance + canonical-form
    properties on determinized random lattices."""

    def _det_clat(self, seed):
        rng = random.Random(seed)
        lat = _random_lattice(rng)
        if not _enumerate_paths(lat):
            return None
        return determinize_lattice_pruned(lat, lattice_beam=1e9)

    @pytest.mark.parametrize("seed", range(8))
    def test_push_strings_invariant(self, seed):
        from eesen_tpu.decoder.clat import push_strings

        clat = self._det_clat(seed)
        if clat is None:
            return
        before = sorted(_clat_paths(clat))
        push_strings(clat)
        assert sorted(_clat_paths(clat)) == before
        # canonical: no non-start state has a common first token over
        # all its outgoing strings + final string
        for s in range(clat.num_states):
            if s == clat.start:
                continue
            heads = [a.ilabels[0] for a in clat.arcs[s] if a.ilabels]
            n_items = len(clat.arcs[s]) + (1 in [1] if s in clat.finals else 0)
            if s in clat.finals:
                fin = clat.finals[s][2]
                if fin:
                    heads.append(fin[0])
            total = len(clat.arcs[s]) + (1 if s in clat.finals else 0)
            if total >= 1 and len(heads) == total and heads:
                assert len(set(heads)) > 1 or total == 1 and not heads

    @pytest.mark.parametrize("seed", range(8))
    def test_push_weights_invariant_and_stochastic(self, seed):
        from eesen_tpu.decoder.clat import push_weights

        clat = self._det_clat(seed)
        if clat is None:
            return
        before = sorted(_clat_paths(clat))
        push_weights(clat)
        after = sorted(_clat_paths(clat))
        assert len(after) == len(before)
        for (bw, bi, bg, ba), (aw, ai, ag, aa) in zip(before, after):
            assert bw == aw and bi == ai
            assert ag + aa == pytest.approx(bg + ba, abs=1e-6)
        # every non-start state's best outgoing suffix weight is (0, 0)
        # in total cost (the 'sums to one' canonical form)
        suffix_best = {}
        for s in reversed(clat.topo_order()):
            cands = []
            for a in clat.arcs[s]:
                cands.append(
                    a.graph_cost + a.acoustic_cost
                    + suffix_best[a.nextstate]
                )
            if s in clat.finals:
                g, a_, _ = clat.finals[s]
                cands.append(g + a_)
            suffix_best[s] = min(cands) if cands else 0.0
            if cands and s != clat.start:
                assert min(cands) == pytest.approx(0.0, abs=1e-6)

    @pytest.mark.parametrize("seed", range(8))
    def test_minimize_preserves_paths_and_shrinks(self, seed):
        from eesen_tpu.decoder.clat import (
            minimize, push_strings, push_weights,
        )

        clat = self._det_clat(seed)
        if clat is None:
            return
        before = sorted(_clat_paths(clat))
        push_strings(clat)
        push_weights(clat)
        small = minimize(clat)
        assert small.num_states <= clat.num_states
        assert sorted(_clat_paths(small)) == sorted(_clat_paths(clat))
        # ... and path multiset equals the pre-push one up to weight
        # redistribution along each path
        after = sorted(_clat_paths(small))
        assert len(after) == len(before)
        for (bw, bi, bg, ba), (aw, ai, ag, aa) in zip(before, after):
            assert bw == aw and bi == ai
            assert ag + aa == pytest.approx(bg + ba, abs=1e-4)

    def test_minimize_merges_shared_suffix(self):
        from eesen_tpu.decoder.clat import minimize
        from eesen_tpu.decoder.clat import CompactArc, CompactLattice

        # two prefixes reaching two DISTINCT but equivalent suffix states
        clat = CompactLattice()
        for _ in range(5):
            clat.add_state()
        clat.start = 0
        clat.arcs[0].append(CompactArc(1, 0.5, 0.0, (1,), 1))
        clat.arcs[0].append(CompactArc(2, 0.7, 0.0, (2,), 2))
        clat.arcs[1].append(CompactArc(3, 0.1, 0.2, (3, 3), 3))
        clat.arcs[2].append(CompactArc(3, 0.1, 0.2, (3, 3), 4))
        clat.finals[3] = (0.0, 0.0, ())
        clat.finals[4] = (0.0, 0.0, ())
        small = minimize(clat)
        assert small.num_states == 3   # {0}, {1,2}? no: 1,2 differ by arc
        # states 3 and 4 merge (identical final), then 1 and 2 share the
        # same successor class but have different incoming words -> they
        # also merge (identical outgoing signature)
        paths = sorted(_clat_paths(small))
        assert [p[0] for p in paths] == [(1, 3), (2, 3)]


# ---------------------------------------------------------------------
# SentenceLevelConfidence (lat/confidence.cc)
# ---------------------------------------------------------------------

def test_sentence_confidence_margin():
    from eesen_tpu.decoder.clat import (
        sentence_confidence, sentence_confidence_lattice,
    )
    # two word sequences: [5] cost 1.0, [7] cost 3.5 -> margin 2.5
    lat = _mk_lattice(
        [(0, 1, 3, 5, 0.4, 0.6), (0, 2, 4, 7, 2.0, 1.5)],
        {1: 0.0, 2: 0.0}, 3,
    )
    clat = determinize_lattice_pruned(lat)
    conf, n, best, second = sentence_confidence(clat)
    assert n == 2
    assert conf == pytest.approx(2.5)
    assert best == [5] and second == [7]
    # the raw-lattice variant (determinizes internally) agrees
    conf2, n2, best2, second2 = sentence_confidence_lattice(lat)
    assert (conf2, n2, best2, second2) == (conf, n, best, second)


def test_sentence_confidence_single_and_empty():
    from eesen_tpu.decoder.clat import sentence_confidence
    lat = _mk_lattice([(0, 1, 3, 5, 0.4, 0.6)], {1: 0.0}, 2)
    conf, n, best, _ = sentence_confidence(determinize_lattice_pruned(lat))
    assert n == 1 and conf == INF and best == [5]
    empty = _mk_lattice([], {}, 1)
    conf, n, _, _ = sentence_confidence(determinize_lattice_pruned(empty))
    assert n == 0 and conf == 0.0


def test_sentence_confidence_merges_same_words():
    """Two distinct paths with the SAME word sequence must count as one:
    confidence is between distinct word sequences, not raw paths."""
    from eesen_tpu.decoder.clat import sentence_confidence
    lat = _mk_lattice(
        [(0, 1, 3, 5, 0.4, 0.6), (0, 1, 4, 5, 0.7, 0.9)],
        {1: 0.0}, 2,
    )
    conf, n, best, _ = sentence_confidence(determinize_lattice_pruned(lat))
    assert n == 1 and conf == INF and best == [5]


def test_random_confidence_vs_bruteforce():
    from eesen_tpu.decoder.clat import sentence_confidence
    rng = random.Random(11)
    for trial in range(20):
        n_states = rng.randint(3, 7)
        arcs = []
        for s in range(n_states - 1):
            for _ in range(rng.randint(1, 3)):
                d = rng.randint(s + 1, n_states - 1)
                arcs.append((
                    s, d, rng.randint(1, 4), rng.choice([0, 1, 2, 3]),
                    round(rng.uniform(0, 3), 3), round(rng.uniform(0, 3), 3),
                ))
        lat = _mk_lattice(arcs, {n_states - 1: 0.0}, n_states)
        paths = _enumerate_paths(lat)
        if not paths:
            continue
        best = _best_per_wordseq(paths)
        totals = sorted(g + a for (_, g, a) in best.values())
        conf, n, _, _ = sentence_confidence(
            determinize_lattice_pruned(lat, lattice_beam=INF)
        )
        if len(totals) == 1:
            assert n == 1 and conf == INF
        else:
            assert n == 2
            assert conf == pytest.approx(totals[1] - totals[0], abs=1e-6)
