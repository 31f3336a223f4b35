"""Tests for the fused beam recombination kernel (ops/beam_pallas.py).

Run in Pallas interpret mode on CPU; compared against the XLA sort-based
reference implementation (decoder/beam._dedup_and_prune) which is itself
oracle-tested in test_beam.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.decoder.beam import _dedup_and_prune
from eesen_tpu.ops.beam_pallas import dedup_prune


def _make_props(rng, b, m, n_states, dead_frac=0.15):
    dst = rng.integers(0, n_states, (b, m)).astype(np.int32)
    score = (rng.standard_normal((b, m)) * 4.0).astype(np.float32)
    dead = rng.random((b, m)) < dead_frac
    score[dead] = np.inf
    dst[dead] = 0
    return jnp.asarray(dst), jnp.asarray(score)


def _canon(states, scores):
    """Order-independent canonical form of an active set."""
    st = np.asarray(states)
    sc = np.asarray(scores)
    out = []
    for b in range(st.shape[0]):
        alive = np.isfinite(sc[b])
        pairs = sorted(zip(st[b][alive].tolist(), sc[b][alive].tolist()))
        out.append(pairs)
    return out


@pytest.mark.parametrize("m,k,n_states", [(512, 64, 100), (1000, 128, 4000)])
@pytest.mark.slow
def test_matches_xla_dedup(m, k, n_states):
    rng = np.random.default_rng(0)
    dst, score = _make_props(rng, 8, m, n_states)
    beam = 6.0
    st_x, sc_x, kept_x = _dedup_and_prune(dst, score, k, beam)
    st_p, sc_p, kept_p = dedup_prune(dst, score, k, beam, interpret=True)
    assert _canon(st_p, sc_p) == _canon(st_x, sc_x)
    # kept indices must map back to the same (dst, score) pairs
    d = np.asarray(dst)
    s = np.asarray(score)
    kp = np.asarray(kept_p)
    alive = np.isfinite(np.asarray(sc_p))
    np.testing.assert_array_equal(
        np.take_along_axis(d, kp, 1)[alive], np.asarray(st_p)[alive]
    )
    np.testing.assert_allclose(
        np.take_along_axis(s, kp, 1)[alive], np.asarray(sc_p)[alive]
    )


def test_beam_threshold_applied():
    rng = np.random.default_rng(1)
    dst, score = _make_props(rng, 8, 256, 300, dead_frac=0.0)
    beam = 1.0
    st, sc, _ = dedup_prune(dst, score, 64, beam, interpret=True)
    sc = np.asarray(sc)
    for b in range(8):
        alive = np.isfinite(sc[b])
        if alive.any():
            assert sc[b][alive].max() <= float(np.asarray(score)[b].min()) + beam + 1e-6


def test_fewer_live_than_k():
    """When fewer than K distinct live states exist, dead slots are -1/inf."""
    rng = np.random.default_rng(2)
    dst, score = _make_props(rng, 8, 128, 10, dead_frac=0.5)
    st, sc, kept = dedup_prune(dst, score, 64, 100.0, interpret=True)
    st, sc = np.asarray(st), np.asarray(sc)
    for b in range(8):
        alive = np.isfinite(sc[b])
        assert alive.sum() <= 10
        assert (st[b][~alive] == -1).all()
        # live states are distinct (recombined)
        assert len(set(st[b][alive])) == alive.sum()
    assert int(np.asarray(kept).max()) < 128


@pytest.mark.parametrize("closure", [False, True])
@pytest.mark.slow
def test_end_to_end_beam_decoder_pallas(closure):
    """Full beam search with the Pallas recombination matches both the
    XLA-recombination search and the host FasterDecoder oracle."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.beam import (
        BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
    )
    from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
    from eesen_tpu.decoder.faster import FasterDecoder, FasterDecoderOptions
    from eesen_tpu.decoder.graph_compile import compile_graph
    from tests.test_beam import synth_loglikes
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    fst = build_tlg(lang.t_fst, build_lg(lang.l_fst, arpa_to_fst(ARPA, lang.words)))
    rng = np.random.default_rng(3)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2, noise=1.0
    )
    g = compile_graph(fst, max_degree=8, build_closure=closure)
    dg = DeviceGraph.put(g)
    lls = jnp.asarray(ll[None])
    lens = jnp.asarray([ll.shape[0]])

    cfg_x = BeamSearchConfig(beam=1e9, max_active=128, pallas_dedup="never")
    cfg_p = BeamSearchConfig(beam=1e9, max_active=128, pallas_dedup="interpret")
    out_x = make_beam_decoder(g, cfg_x)(lls, lens, dg)
    out_p = make_beam_decoder(g, cfg_p)(lls, lens, dg)
    (w_x, c_x), = traceback(out_x, np.asarray(lens), g.final_weight)
    (w_p, c_p), = traceback(out_p, np.asarray(lens), g.final_weight)
    assert w_p == w_x
    np.testing.assert_allclose(c_p, c_x, rtol=1e-5)

    ref = FasterDecoder(
        fst, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    _, ref_words, ref_cost = ref.decode(ll)
    assert w_p == ref_words
    np.testing.assert_allclose(c_p, ref_cost, rtol=1e-4, atol=1e-3)
