"""Lattice LM rescoring tests."""

import math

import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.ctc_graph import compile_lang
from eesen_tpu.decoder.lattice import Lattice, LatticeArc
from eesen_tpu.decoder.rescore import LmAutomaton, rescore_lattice

from tests.test_ctc_graph import ARPA, LEXICON, UNITS

LN10 = math.log(10.0)


@pytest.fixture(scope="module")
def lm():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    return lang, LmAutomaton(g, backoff_ilabel=lang.words["#0"])


def test_lm_automaton_scores(lm):
    lang, auto = lm
    s = auto.start
    # <s> ab bigram: -0.3 log10
    c, s2 = auto.score(s, lang.words["ab"])
    np.testing.assert_allclose(c, 0.3 * LN10, rtol=1e-5)
    # ab -> ba bigram -0.4
    c2, s3 = auto.score(s2, lang.words["ba"])
    np.testing.assert_allclose(c2, 0.4 * LN10, rtol=1e-5)
    # ab -> cab: backoff(ab)=-0.3 + unigram -1.0
    c3, _ = auto.score(s2, lang.words["cab"])
    np.testing.assert_allclose(c3, (0.3 + 1.0) * LN10, rtol=1e-5)
    # final from (ba abc): </s> after abc: abc </s> bigram -0.6
    c4, s4 = auto.score(s3, lang.words["abc"])
    f = auto.final(s4)
    np.testing.assert_allclose(f, 0.6 * LN10, rtol=1e-5)


def test_rescore_changes_best_path(lm):
    lang, auto = lm
    w_ab, w_cab, w_ba = (
        lang.words["ab"], lang.words["cab"], lang.words["ba"],
    )
    # lattice: two first-word options with equal old scores
    lat = Lattice()
    s0, s1, s2 = lat.add_state(-1), lat.add_state(3), lat.add_state(6)
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, w_ab, 1.0, 0.0, s1))
    lat.arcs[s0].append(LatticeArc(1, w_cab, 1.0, 0.0, s1))
    lat.arcs[s1].append(LatticeArc(2, w_ba, 0.0, 0.0, s2))
    lat.finals[s2] = 0.0
    # old scores tie -> LM decides: <s> ab (-0.3 bigram) beats
    # <s> cab (backoff -0.7 + unigram -1.0 ... )
    res = rescore_lattice(lat, auto, lm_scale_new=1.0, old_graph_scale=1.0)
    _, ols, cost = res.best_path()
    assert ols == [w_ab, w_ba]
    # cost = old(1.0) + lm(<s> ab=0.3, ab ba=0.4, final after ba:
    # backoff(ba)=0.2 + </s> unigram 0.9) in ln units
    want = 1.0 + (0.3 + 0.4) * LN10 + (0.2 + 0.9) * LN10
    np.testing.assert_allclose(cost, want, rtol=1e-5)


def test_rescore_prunes_impossible(lm):
    lang, auto = lm
    lat = Lattice()
    s0, s1 = lat.add_state(-1), lat.add_state(2)
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, lang.words["#0"], 0.0, 0.0, s1))
    lat.finals[s1] = 0.0
    # '#0' is not a real word; LM can't score it -> empty result path-wise
    res = rescore_lattice(lat, auto)
    _, ols, cost = res.best_path()
    assert ols == [] and cost == float("inf")
