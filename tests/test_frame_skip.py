"""Blank-frame skipping: compaction semantics + search equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.beam import (
    BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
)
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.frame_skip import compact_blank_frames
from eesen_tpu.decoder.graph_compile import compile_graph

from tests.test_beam import synth_loglikes
from tests.test_ctc_graph import ARPA, LEXICON, UNITS


@pytest.fixture(scope="module")
def tlg():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    lg = build_lg(lang.l_fst, g)
    return lang, build_tlg(lang.t_fst, lg)


def _peaked(rng, lang, seq, t_per=2):
    ll = synth_loglikes(rng, lang, seq, t_per=t_per, noise=0.3)
    return ll


def test_compaction_partition_and_costs():
    rng = np.random.default_rng(0)
    b, t, v = 3, 20, 5
    ll = rng.standard_normal((b, t, v)).astype(np.float32)
    # make frames 3..9 of row 0 and all active frames of row 2 blank-like
    ll[0, 3:10, 0] += 12.0
    ll[2, :, 0] += 12.0
    ll = ll - np.log(np.exp(ll).sum(-1, keepdims=True))
    lengths = np.array([20, 15, 12], np.int32)
    cf = compact_blank_frames(ll, lengths, 0.98, acoustic_scale=0.7,
                              bucket=4)
    lens = np.asarray(cf.lengths)
    tm = np.asarray(cf.time_map)
    packed = np.asarray(cf.loglikes)
    # row 0: 7 frames skipped; row 1: none; row 2: all blank -> keep 1
    assert lens[0] == 13 and lens[1] == 15 and lens[2] == 1
    # bucket rounding: longest kept count 15 -> 16 slots
    assert packed.shape[1] == 16
    # kept frames preserve original order and content
    keep0 = [i for i in range(20) if not (3 <= i < 10)]
    assert tm[0, :13].tolist() == keep0
    np.testing.assert_allclose(packed[0, :13], ll[0, keep0], rtol=1e-6)
    assert tm[1, :15].tolist() == list(range(15))
    # skipped cost = scale * sum(-ll[blank]) over skipped active frames
    exp0 = 0.7 * float(np.sum(-ll[0, 3:10, 0]))
    np.testing.assert_allclose(float(cf.skipped_cost[0]), exp0, rtol=1e-5)
    assert float(cf.skipped_cost[1]) == 0.0
    # row 2 keeps frame 0, skips the other 11 active frames
    exp2 = 0.7 * float(np.sum(-ll[2, 1:12, 0]))
    np.testing.assert_allclose(float(cf.skipped_cost[2]), exp2, rtol=1e-5)


def test_compaction_never_exceeds_original_t():
    rng = np.random.default_rng(1)
    ll = rng.standard_normal((2, 10, 4)).astype(np.float32)
    ll = ll - np.log(np.exp(ll).sum(-1, keepdims=True))
    cf = compact_blank_frames(ll, np.array([10, 10]), 0.999, bucket=64)
    assert cf.loglikes.shape[1] == 10  # bucket capped at original T


def test_threshold_validation():
    ll = np.zeros((1, 4, 3), np.float32)
    with pytest.raises(ValueError):
        compact_blank_frames(ll, np.array([4]), 0.0)
    with pytest.raises(ValueError):
        compact_blank_frames(ll, np.array([4]), 1.0)


def test_skip_decode_matches_full_decode(tlg):
    """On peaked posteriors with long blank runs, decoding the compacted
    frames yields the same words as the full decode, and the total cost
    matches once the skipped constant is added back."""
    lang, fst = tlg
    rng = np.random.default_rng(7)
    seqs = [
        ["a", "<blk>", "<blk>", "b", "<blk>", "b", "<blk>", "a"],
        ["a", "a", "<blk>", "<blk>", "<blk>", "b", "c", "<blk>"],
    ]
    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=128, acoustic_scale=0.9)
    decoder = make_beam_decoder(g, cfg)
    dg = DeviceGraph.put(g)

    lls = [_peaked(rng, lang, s, t_per=3) for s in seqs]
    t_max = max(x.shape[0] for x in lls)
    ll = np.stack([
        np.pad(x, ((0, t_max - x.shape[0]), (0, 0))) for x in lls
    ])
    lens = np.array([x.shape[0] for x in lls], np.int32)

    full = decoder(jnp.asarray(ll), jnp.asarray(lens), dg)
    full_res = traceback(full, lens, g.final_weight)

    cf = compact_blank_frames(ll, lens, 0.98, cfg.acoustic_scale, bucket=8)
    assert int(np.asarray(cf.lengths).max()) < int(lens.max())  # skipped some
    out = decoder(cf.loglikes, cf.lengths, dg)
    skip_res = traceback(out, np.asarray(cf.lengths), g.final_weight)

    for (w_full, c_full), (w_skip, c_skip), sc in zip(
        full_res, skip_res, np.asarray(cf.skipped_cost)
    ):
        assert w_skip == w_full
        np.testing.assert_allclose(c_skip + sc, c_full, rtol=1e-4,
                                   atol=1e-2)
