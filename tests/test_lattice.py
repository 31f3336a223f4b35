"""Lattice generation + post-processing tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.decoder.beam import (
    BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
)
from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.graph_compile import compile_graph
from eesen_tpu.decoder.lattice import Lattice, LatticeArc, lattice_from_beam

from tests.test_ctc_graph import ARPA, LEXICON, UNITS
from tests.test_beam import synth_loglikes


@pytest.fixture(scope="module")
def decoded():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g_fst = arpa_to_fst(ARPA, lang.words)
    tlg = build_tlg(lang.t_fst, build_lg(lang.l_fst, g_fst))
    g = compile_graph(tlg, max_degree=8)
    rng = np.random.default_rng(3)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2,
        noise=0.5,
    )
    cfg = BeamSearchConfig(beam=1e9, max_active=128, acoustic_scale=0.9)
    decoder = make_beam_decoder(g, cfg)
    out = decoder(jnp.asarray(ll[None]), jnp.asarray([len(ll)]), DeviceGraph.put(g))
    return lang, g, ll, out, cfg


def test_lattice_best_path_matches_beam(decoded):
    lang, g, ll, out, cfg = decoded
    (bp_words, bp_cost), = traceback(out, np.asarray([len(ll)]), g.final_weight)
    lat = lattice_from_beam(out, 0, len(ll), g, ll, cfg.acoustic_scale)
    assert lat.num_states > 2 and lat.num_arcs > 0
    _, ols, cost = lat.best_path()
    assert ols == bp_words
    np.testing.assert_allclose(cost, bp_cost, rtol=1e-4, atol=1e-3)


def test_lattice_scale_changes_path_cost(decoded):
    lang, g, ll, out, cfg = decoded
    lat = lattice_from_beam(out, 0, len(ll), g, ll, cfg.acoustic_scale)
    _, _, c1 = lat.best_path()
    lat.scale(acoustic_scale=0.5)
    _, _, c2 = lat.best_path()
    assert c2 < c1  # acoustic costs dominate here; halving reduces total


def test_lattice_nbest(decoded):
    lang, g, ll, out, cfg = decoded
    lat = lattice_from_beam(out, 0, len(ll), g, ll, cfg.acoustic_scale)
    nb = lat.nbest(4)
    assert len(nb) >= 1
    costs = [c for _, c in nb]
    assert costs == sorted(costs)
    _, ols, best_cost = lat.best_path()
    assert nb[0][0] == ols
    np.testing.assert_allclose(nb[0][1], best_cost, rtol=1e-4, atol=1e-3)


def test_lattice_word_times(decoded):
    lang, g, ll, out, cfg = decoded
    lat = lattice_from_beam(out, 0, len(ll), g, ll, cfg.acoustic_scale)
    times = lat.word_times()
    _, ols, _ = lat.best_path()
    assert [w for w, _, _ in times] == ols
    for w, s, e in times:
        assert -1 <= s <= e < len(ll)


@pytest.mark.parametrize("seed", range(4))
def test_lattice_pipeline_preserves_viterbi(seed):
    """Regression for the round-2g retention bug: the FULL recipe
    lattice pipeline (reconstruct with keep_tokens -> prune ->
    determinize) must reproduce the search's Viterbi words and cost at
    the search acwt, under a realistic (narrow) beam, for random peaked
    inputs with blank runs and repeated units."""
    from eesen_tpu.decoder.clat import determinize_lattice_pruned

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g_fst = arpa_to_fst(ARPA, lang.words)
    tlg = build_tlg(lang.t_fst, build_lg(lang.l_fst, g_fst))
    g = compile_graph(tlg, max_degree=8, build_closure=True)
    rng = np.random.default_rng(100 + seed)
    toks = ["a", "b", "c", "<blk>"]
    seq = [toks[int(j)] for j in rng.integers(0, 4, 12)]
    ll = synth_loglikes(rng, lang, seq, t_per=2, noise=0.8)
    cfg = BeamSearchConfig(beam=14.0, max_active=64, acoustic_scale=0.9,
                           lattice_beam=8.0)
    decoder = make_beam_decoder(g, cfg)
    out = decoder(jnp.asarray(ll[None]), jnp.asarray([len(ll)]),
                  DeviceGraph.put(g))
    (bp_words, bp_cost), = traceback(out, np.asarray([len(ll)]),
                                     g.final_weight)
    raw = lattice_from_beam(out, 0, len(ll), g, ll, cfg.acoustic_scale,
                            keep_tokens=16)
    raw.prune(cfg.lattice_beam)
    _, ols, cost = raw.best_path()
    assert ols == bp_words
    np.testing.assert_allclose(cost, bp_cost, rtol=1e-4, atol=1e-3)
    clat = determinize_lattice_pruned(raw, lattice_beam=cfg.lattice_beam)
    _, dwords, dcost = clat.best_path()
    assert list(dwords) == bp_words
    np.testing.assert_allclose(dcost, bp_cost, rtol=1e-4, atol=1e-3)
