"""Dense (beam-free) Viterbi decoder vs the host FasterDecoder oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.dense import (
    DenseDeviceGraph, build_dense_graph, decode_dense, make_dense_decoder,
    traceback_dense,
)
from eesen_tpu.decoder.faster import FasterDecoder, FasterDecoderOptions
from eesen_tpu.decoder.graph_compile import compile_graph

from tests.test_beam import synth_loglikes
from tests.test_ctc_graph import ARPA, LEXICON, UNITS


@pytest.fixture(scope="module")
def graphs():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    tlg = build_tlg(lang.t_fst, build_lg(lang.l_fst, g))
    cg = compile_graph(tlg, max_degree=8, build_closure=True)
    dg = build_dense_graph(cg, in_degree=4, closure_in_degree=4)
    return lang, tlg, cg, dg


def test_dense_graph_has_hubs(graphs):
    """The tiny in-degree caps must force hub extraction (so the hub path
    is exercised by the decode tests)."""
    _, _, _, dg = graphs
    assert len(dg.ehub_state) > 0 or len(dg.chub_state) > 0


@pytest.mark.parametrize("seed", range(4))
def test_dense_matches_faster_decoder(graphs, seed):
    """Dense Viterbi is exact: must equal the infinite-beam host oracle."""
    lang, tlg, cg, dg = graphs
    rng = np.random.default_rng(seed)
    seqs = [
        ["a", "<blk>", "b", "<blk>", "b", "a"],
        ["a", "a", "b", "c", "<blk>"],
        ["b", "a", "<blk>", "a", "b"],
        ["c", "<blk>", "b", "a", "a"],
    ]
    ll = synth_loglikes(rng, lang, seqs[seed], t_per=2, noise=1.0)
    ref = FasterDecoder(
        tlg, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    _, ref_words, ref_cost = ref.decode(ll)
    dev = DenseDeviceGraph.put(dg)
    (words, cost), = decode_dense(
        ll[None].astype(np.float32), np.asarray([len(ll)]), dg, dev,
        acoustic_scale=0.9,
    )
    assert words == ref_words, (words, ref_words)
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)


def test_dense_batched_lengths(graphs):
    """Batched rows with different lengths decode independently."""
    lang, tlg, cg, dg = graphs
    rng = np.random.default_rng(42)
    lls = [
        synth_loglikes(rng, lang, ["a", "<blk>", "b"], t_per=2),
        synth_loglikes(rng, lang, ["b", "a", "<blk>", "a", "b", "c"], t_per=2),
    ]
    t_max = max(len(x) for x in lls)
    batch = np.zeros((2, t_max, lls[0].shape[1]), np.float32)
    lengths = np.asarray([len(x) for x in lls], np.int32)
    for i, x in enumerate(lls):
        batch[i, : len(x)] = x
    dev = DenseDeviceGraph.put(dg)
    results = decode_dense(batch, lengths, dg, dev, acoustic_scale=0.9)
    ref = FasterDecoder(
        tlg, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    for i, x in enumerate(lls):
        _, ref_words, ref_cost = ref.decode(x)
        words, cost = results[i]
        assert words == ref_words
        np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)


def test_dense_matches_beam(graphs):
    """Dense and beam decoders agree on words and cost at wide beam."""
    from eesen_tpu.decoder.beam import (
        BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
    )

    lang, tlg, cg, dg = graphs
    rng = np.random.default_rng(7)
    ll = synth_loglikes(rng, lang, ["a", "a", "b", "c"], t_per=2, noise=1.0)
    dec_b = make_beam_decoder(
        cg, BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    )
    out_b = dec_b(jnp.asarray(ll[None]), jnp.asarray([len(ll)]),
                  DeviceGraph.put(cg))
    (bw, bc), = traceback(out_b, np.asarray([len(ll)]), cg.final_weight)
    (dw, dc), = decode_dense(
        ll[None].astype(np.float32), np.asarray([len(ll)]), dg,
        DenseDeviceGraph.put(dg), acoustic_scale=0.9,
    )
    assert dw == bw
    np.testing.assert_allclose(dc, bc, rtol=1e-4, atol=1e-3)
