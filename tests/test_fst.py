"""WFST algorithm tests: path-enumeration equivalence oracles
(the reference tests its fstext algorithms with random FSTs + equivalence
checks — src/fstext/determinize-star-test.cc:594; same strategy here)."""

import math
import random

import numpy as np
import pytest

from eesen_tpu.decoder.fst import (
    EPS, INF, Arc, Fst, add_self_loops, arcsort, compose, connect,
    determinize_star, is_deterministic, log_plus, minimize_encoded,
    rm_epsilon, shortest_path,
)


def language(fst, semiring="tropical"):
    """Map (istring, ostring) -> combined weight over all paths."""
    lang = {}
    for il, ol, w in fst.paths():
        key = (il, ol)
        if key in lang:
            lang[key] = (
                min(lang[key], w) if semiring == "tropical"
                else log_plus(lang[key], w)
            )
        else:
            lang[key] = w
    return lang


def assert_equivalent(a, b, semiring="tropical", tol=1e-4):
    la, lb = language(a, semiring), language(b, semiring)
    assert set(la) == set(lb), (set(la) ^ set(lb))
    for k in la:
        assert abs(la[k] - lb[k]) < tol, (k, la[k], lb[k])


def random_acyclic_fst(rng, n_states=6, n_arcs=10, n_syms=3, eps_prob=0.2):
    """Random acyclic FST (arcs only go forward in state order)."""
    f = Fst()
    for _ in range(n_states):
        f.add_state()
    f.set_start(0)
    f.set_final(n_states - 1, round(rng.uniform(0, 2), 3))
    for _ in range(n_arcs):
        s = rng.randrange(0, n_states - 1)
        d = rng.randrange(s + 1, n_states)
        il = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        ol = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        f.add_arc(s, Arc(il, ol, round(rng.uniform(0, 2), 3), d))
    return connect(f)


def linear_fst(labels, olabels=None, weight=0.0):
    f = Fst()
    s = f.add_state()
    f.set_start(s)
    ol = olabels if olabels is not None else labels
    for i, (a, b) in enumerate(zip(labels, ol)):
        ns = f.add_state()
        f.add_arc(s, Arc(a, b, weight if i == 0 else 0.0, ns))
        s = ns
    f.set_final(s, 0.0)
    return f


def test_text_roundtrip():
    f = Fst.from_text("0 1 1 2 0.5\n1 2 3 4\n2 0.25\n")
    assert f.num_states == 3 and f.num_arcs == 2
    f2 = Fst.from_text(f.to_text())
    assert_equivalent(f, f2)


def test_connect_trims():
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, Arc(1, 1, 0.0, 1))
    f.add_arc(0, Arc(2, 2, 0.0, 2))  # dead end (2 is not final, no out)
    f.set_final(1, 0.0)
    g = connect(f)
    assert g.num_states == 2 and g.num_arcs == 1


def test_compose_simple():
    a = linear_fst([1, 2], olabels=[3, 4])
    b = linear_fst([3, 4], olabels=[5, 6])
    c = compose(a, b)
    assert language(c) == {((1, 2), (5, 6)): 0.0}


def test_compose_with_epsilons():
    # a outputs eps in the middle; b has input-eps arcs
    a = Fst.from_text("0 1 1 3\n1 2 2 0\n2 3 4 5 0.5\n3\n")
    b = Fst.from_text("0 1 3 7\n1 2 0 8 0.25\n2 3 5 9\n3\n")
    c = compose(a, b)
    lang = language(c)
    assert lang == {((1, 2, 4), (7, 8, 9)): 0.75}


@pytest.mark.parametrize("seed", range(8))
def test_compose_random_no_duplicate_paths(seed):
    """Epsilon filter: composing with an eps-free b must preserve the
    weighted language restricted to matching strings."""
    rng = random.Random(seed)
    a = random_acyclic_fst(rng, eps_prob=0.3)
    b = random_acyclic_fst(rng, eps_prob=0.0)
    if a.num_states == 0 or b.num_states == 0:
        return
    c = compose(a, b)
    la, lb, lc = language(a), language(b), language(c)
    want = {}
    for (ai, ao), wa in la.items():
        for (bi, bo), wb in lb.items():
            if ao == bi:
                key = (ai, bo)
                w = wa + wb
                want[key] = min(want.get(key, INF), w)
    assert set(lc) == set(want)
    for k in lc:
        assert abs(lc[k] - want[k]) < 1e-4


@pytest.mark.parametrize("seed", range(8))
def test_rm_epsilon_equivalence(seed):
    rng = random.Random(100 + seed)
    f = random_acyclic_fst(rng, eps_prob=0.4)
    if f.num_states == 0:
        return
    g = rm_epsilon(f)
    for arcs in g.arcs:
        for a in arcs:
            assert not (a.ilabel == EPS and a.olabel == EPS)
    assert_equivalent(f, g)


@pytest.mark.parametrize("seed", range(10))
def test_determinize_star_equivalence(seed):
    """Determinize-star on functional FSTs: same weighted relation, output
    deterministic w.r.t. input labels (modulo output-emission eps chains)."""
    rng = random.Random(200 + seed)
    # build a functional FST: union of linear (istring->ostring) pairs
    f = Fst()
    root = f.add_state()
    f.set_start(root)
    n_entries = rng.randrange(2, 6)
    seen_istrings = set()
    for _ in range(n_entries):
        n = rng.randrange(1, 4)
        ils = tuple(rng.randrange(1, 4) for _ in range(n))
        if ils in seen_istrings:
            continue  # keep it functional AND deterministic-weight
        seen_istrings.add(ils)
        ols = tuple(rng.randrange(1, 4) for _ in range(n))
        s = root
        for i, (a, b) in enumerate(zip(ils, ols)):
            ns = f.add_state()
            f.add_arc(s, Arc(a, b, round(rng.uniform(0, 1), 3), ns))
            s = ns
        f.set_final(s, 0.0)
    d = determinize_star(f)
    assert_equivalent(f, d)
    # determinism on input labels: no state may have two arcs with the same
    # non-eps ilabel; eps-input arcs exist only for output factoring chains
    for arcs in d.arcs:
        non_eps = [a.ilabel for a in arcs if a.ilabel != EPS]
        assert len(non_eps) == len(set(non_eps))


def test_determinize_star_merges_prefixes():
    """Two pronunciations sharing a prefix must share determinized states."""
    f = Fst()
    root = f.add_state()
    f.set_start(root)
    for ols, ils in [((10,), (1, 2, 3)), ((11,), (1, 2, 4))]:
        s = root
        for i, il in enumerate(ils):
            ns = f.add_state()
            f.add_arc(s, Arc(il, ols[0] if i == 0 else EPS, 0.0, ns))
            s = ns
        f.set_final(s, 0.0)
    d = determinize_star(f)
    assert_equivalent(f, d)
    # root now has exactly one arc on ilabel 1
    assert sum(1 for a in d.arcs[d.start] if a.ilabel == 1) == 1


def test_determinize_star_log_semiring():
    """In the log semiring, parallel paths combine probabilities."""
    f = Fst.from_text("0 1 1 2 0.5\n0 2 1 2 1.0\n1 3 2 3\n2 3 2 3\n3\n")
    d = determinize_star(f, semiring="log")
    assert is_deterministic(d)
    lang = language(d, semiring="log")
    want = log_plus(0.5, 1.0)
    assert abs(lang[((1, 2), (2, 3))] - want) < 1e-5


@pytest.mark.parametrize("seed", range(6))
def test_minimize_encoded_equivalence(seed):
    rng = random.Random(300 + seed)
    f = random_acyclic_fst(rng, eps_prob=0.0)
    if f.num_states == 0:
        return
    d = determinize_star(f)
    m = minimize_encoded(d)
    assert m.num_states <= d.num_states
    assert_equivalent(d, m)


def test_minimize_encoded_merges_suffixes():
    # two branches with identical suffix structure must merge
    f = Fst.from_text(
        "0 1 1 1\n0 2 2 2\n1 3 5 5\n2 4 5 5\n3\n4\n"
    )
    m = minimize_encoded(f)
    assert m.num_states == 3  # {0}, {1,2}, {3,4}
    assert_equivalent(f, m)


def test_add_self_loops():
    f = Fst.from_text("0 1 1 0\n1 2 2 3\n2\n")  # state 0 has eps-output arc
    g = add_self_loops(f, [99], [98])
    loops = {
        s: [a for a in g.arcs[s] if a.nextstate == s] for s in range(3)
    }
    assert len(loops[0]) == 1 and loops[0][0].ilabel == 99
    assert len(loops[1]) == 0      # no eps-output arcs, not final
    assert len(loops[2]) == 1      # final state


def test_shortest_path():
    f = Fst.from_text(
        "0 1 1 1 1.0\n0 2 2 2 0.5\n1 3 3 3 0.1\n2 3 4 4 2.0\n3 0.0\n"
    )
    il, ol, w = shortest_path(f)
    assert il == [1, 3] and abs(w - 1.1) < 1e-6


class TestPushSpecial:
    def _chain(self):
        from eesen_tpu.decoder.fst import Arc, Fst
        f = Fst()
        s = [f.add_state() for _ in range(3)]
        f.set_start(s[0])
        f.add_arc(s[0], Arc(1, 1, 2.0, s[1]))
        f.add_arc(s[0], Arc(2, 2, 0.1, s[1]))
        f.add_arc(s[1], Arc(3, 3, 1.5, s[2]))
        f.set_final(s[2], 0.3)
        return f

    def test_path_weights_preserved(self):
        from eesen_tpu.decoder.fst import push_special, shortest_path
        f = self._chain()
        _, _, before = shortest_path(f)
        g = push_special(f)
        _, _, after = shortest_path(g)
        # push-special preserves total path weight exactly (no start
        # weight exists, and the final adjustment uses the start potential)
        np.testing.assert_allclose(after, before, rtol=1e-4)

    def test_outgoing_mass_equalized(self):
        import math
        from eesen_tpu.decoder.fst import push_special
        f = self._chain()
        g = push_special(f, delta=1e-8, max_iters=2000)

        def mass(fst, s):
            m = sum(math.exp(-a.weight) for a in fst.arcs[s])
            if s in fst.finals:
                m += math.exp(-fst.finals[s])
            return m

        masses = [mass(g, s) for s in range(g.num_states)]
        assert max(masses) / min(masses) < 1.01, masses
        # the original is far from stochastic
        m0 = [mass(f, s) for s in range(f.num_states)]
        assert max(m0) / min(m0) > 1.2


class TestPhiRhoCompose:
    def _lm(self):
        """Tiny backoff 'LM': state 0 matches word 1 directly; other
        words only via phi (label 99) to state 1 which matches 2."""
        from eesen_tpu.decoder.fst import Arc, Fst
        b = Fst()
        s0, s1 = b.add_state(), b.add_state()
        b.set_start(s0)
        b.add_arc(s0, Arc(1, 1, 0.5, s0))       # word 1 at order-2
        b.add_arc(s0, Arc(99, 99, 0.9, s1))     # backoff
        b.add_arc(s1, Arc(2, 2, 0.7, s0))       # word 2 at order-1
        b.set_final(s0, 0.2)
        return b

    def _acceptor(self, words):
        from eesen_tpu.decoder.fst import Arc, Fst
        a = Fst()
        cur = a.add_state()
        a.set_start(cur)
        for w in words:
            nxt = a.add_state()
            a.add_arc(cur, Arc(w, w, 0.0, nxt))
            cur = nxt
        a.set_final(cur, 0.0)
        return a

    def test_phi_direct_match_no_backoff(self):
        from eesen_tpu.decoder.fst import phi_compose, shortest_path
        c = phi_compose(self._acceptor([1]), self._lm(), phi_label=99)
        _, ols, w = shortest_path(c)
        assert ols == [1]
        np.testing.assert_allclose(w, 0.5 + 0.2, rtol=1e-6)

    def test_phi_backoff_path(self):
        from eesen_tpu.decoder.fst import phi_compose, shortest_path
        c = phi_compose(self._acceptor([2]), self._lm(), phi_label=99)
        _, ols, w = shortest_path(c)
        assert ols == [2]
        # phi cost 0.9 + word-2 cost 0.7 + final 0.2
        np.testing.assert_allclose(w, 0.9 + 0.7 + 0.2, rtol=1e-6)

    def test_phi_no_match_gives_empty(self):
        from eesen_tpu.decoder.fst import phi_compose
        c = phi_compose(self._acceptor([7]), self._lm(), phi_label=99)
        assert not c.finals

    def test_rho_matches_rest(self):
        from eesen_tpu.decoder.fst import Arc, Fst, rho_compose, shortest_path
        b = Fst()
        s0, s1 = b.add_state(), b.add_state()
        b.set_start(s0)
        b.add_arc(s0, Arc(1, 1, 0.25, s1))     # explicit word 1
        b.add_arc(s0, Arc(55, 55, 2.0, s1))    # rho: anything else
        b.set_final(s1, 0.0)
        c1 = rho_compose(self._acceptor([1]), b, rho_label=55)
        _, ols, w = shortest_path(c1)
        assert ols == [1]
        np.testing.assert_allclose(w, 0.25, rtol=1e-6)
        c2 = rho_compose(self._acceptor([9]), b, rho_label=55)
        _, ols2, w2 = shortest_path(c2)
        assert ols2 == [9]                      # label rewritten
        np.testing.assert_allclose(w2, 2.0, rtol=1e-6)


# ---------------------------------------------------------------------
# fstext extras: subsequential loop, factor, prune-special
# ---------------------------------------------------------------------

class TestFstextExtras:
    def test_add_subsequential_loop(self):
        from eesen_tpu.decoder.fst import add_subsequential_loop
        f = Fst.from_text("0 1 1 2 0.5\n1 0.25\n")
        g = add_subsequential_loop(f, 9)
        # superfinal exists, loops on 9, original final kept
        sf = g.num_states - 1
        assert g.finals.get(sf) == 0.0 and g.finals.get(1) == 0.25
        loop = [a for a in g.arcs[sf] if a.ilabel == 9 and a.nextstate == sf]
        assert len(loop) == 1
        into = [a for a in g.arcs[1] if a.ilabel == 9 and a.nextstate == sf]
        assert len(into) == 1 and into[0].weight == 0.25

    @pytest.mark.parametrize("seed", range(8))
    def test_factor_expand_roundtrip(self, seed):
        from eesen_tpu.decoder.fst import (
            expand_input_sequences, factor, rand_fst,
        )
        rng = random.Random(seed)
        f = rand_fst(rng, n_states=10, n_arcs=14, n_syms=3, acyclic=True)
        g, symbols = factor(f)
        back = expand_input_sequences(g, symbols)
        assert_equivalent(connect(f), connect(back))

    @pytest.mark.parametrize("seed", range(4))
    def test_factor_compose_with_factor_fst(self, seed):
        from eesen_tpu.decoder.fst import (
            create_factor_fst, factor, rand_fst,
        )
        rng = random.Random(100 + seed)
        f = rand_fst(rng, n_states=8, n_arcs=12, n_syms=3, acyclic=True)
        g, symbols = factor(f)
        left = create_factor_fst(symbols)
        recomposed = compose(arcsort(left, "olabel"), arcsort(g))
        # compose(left, factored) accepts the original (istring, ostring)
        # language (reference fstfactor.cc self-test)
        assert_equivalent(connect(f), connect(recomposed))

    def test_factor_compresses_chain(self):
        from eesen_tpu.decoder.fst import factor
        # 0 -1:5-> 1 -2:eps-> 2 -3:eps-> 3(final): one chain
        f = Fst.from_text("0 1 1 5\n1 2 2 0\n2 3 3 0\n3\n")
        g, symbols = factor(f)
        assert g.num_states == 2 and g.num_arcs == 1
        a = g.arcs[g.start][0]
        assert symbols[a.ilabel] == [1, 2, 3] and a.olabel == 5

    @pytest.mark.parametrize("seed", range(8))
    def test_prune_special_matches_bruteforce(self, seed):
        from eesen_tpu.decoder.fst import prune_special
        rng = random.Random(200 + seed)
        from eesen_tpu.decoder.fst import rand_fst
        f = rand_fst(rng, n_states=8, n_arcs=14, n_syms=3, acyclic=True)
        beam = 2.0
        pruned = prune_special(f, beam)
        paths = f.paths()
        if not paths:
            assert pruned.num_states == 0
            return
        best = min(w for (_, _, w) in paths)
        want = {(il, ol, round(w, 6)) for (il, ol, w) in paths
                if w <= best + beam + 1e-9}
        got = {(il, ol, round(w, 6)) for (il, ol, w) in pruned.paths()}
        assert got == want

    def test_prune_special_max_states(self):
        from eesen_tpu.decoder.fst import prune_special
        f = Fst.from_text(
            "0 1 1 1 0.0\n0 2 2 2 5.0\n1 3 1 1 0.0\n2 3 2 2 0.0\n3\n"
        )
        pruned = prune_special(f, 100.0, max_states=3)
        # only the best chain survives the state cap
        assert pruned.num_states == 3
        assert {(il, ol) for (il, ol, _) in pruned.paths()} == {
            ((1, 1), (1, 1))
        }
