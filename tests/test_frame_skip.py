"""Blank-frame skipping: run-sum compaction semantics + search
equivalence (words AND costs must match the full decode)."""

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
    """synth_loglikes with blank peaks resharpened to realistic
    saturation (~0.9999 posterior) so the 0.98 skip threshold fires."""
    ll = np.array(synth_loglikes(rng, lang, seq, t_per=t_per, noise=0.3))
    blank_peak = ll[:, 0] > np.log(0.5)
    ll[blank_peak, 0] += 8.0
    return ll - np.log(np.exp(ll).sum(-1, keepdims=True))


def test_compaction_run_sum_semantics():
    rng = np.random.default_rng(0)
    b, t, v = 3, 20, 5
    ll = rng.standard_normal((b, t, v)).astype(np.float32)
    # make frames 3..9 of row 0 and all active frames of row 2 blank-like
    ll[0, 3:10, 0] += 12.0
    ll[2, :, 0] += 12.0
    ll = ll - np.log(np.exp(ll).sum(-1, keepdims=True))
    lengths = np.array([20, 15, 12], np.int32)
    cf = compact_blank_frames(ll, lengths, 0.98, bucket=4)
    lens = np.asarray(cf.lengths)
    tm = np.asarray(cf.time_map)
    packed = np.asarray(cf.loglikes)
    # row 0: run 3..9 merges into frame 9 (6 merged); row 1: nothing
    # blank; row 2: all 12 active frames merge into frame 11
    assert lens[0] == 14 and lens[1] == 15 and lens[2] == 1
    # bucket rounding: longest kept count 15 -> 16 slots
    assert packed.shape[1] == 16
    # kept slots map to original frames (runs -> their last frame), in
    # original order
    keep0 = [i for i in range(20) if not (3 <= i < 9)]
    assert tm[0, :14].tolist() == keep0
    assert tm[1, :15].tolist() == list(range(15))
    assert tm[2, 0] == 11
    # non-run frames carry their own loglikes; a merged slot's column c
    # is sum(blank over run) + max over run of (ll[c] - blank): blank
    # pays the exact run sum, any other label its best single-position
    # insertion price
    def merged(seg):
        blank = seg[:, 0]
        return blank.sum() + (seg - blank[:, None]).max(axis=0)

    np.testing.assert_allclose(packed[0, :3], ll[0, :3], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(packed[0, 3], merged(ll[0, 3:10]),
                               rtol=1e-4, atol=1e-4)
    # blank column of the merged slot = exact run sum
    np.testing.assert_allclose(packed[0, 3, 0], ll[0, 3:10, 0].sum(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(packed[0, 4:14], ll[0, 10:20], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(packed[1, :15], ll[1, :15], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(packed[2, 0], merged(ll[2, :12]),
                               rtol=1e-4, atol=1e-4)


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
    """Words AND costs of the compacted decode must equal the full
    decode (run summation carries every skipped frame's cost).  Row 0
    has a repeated unit separated only by a blank run (b <blk> b) — the
    case that forces keeping one frame per run."""
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

    cf = compact_blank_frames(ll, lens, 0.98, bucket=8)
    assert int(np.asarray(cf.lengths).max()) < int(lens.max())  # merged some
    out = decoder(cf.loglikes, cf.lengths, dg)
    skip_res = traceback(out, np.asarray(cf.lengths), g.final_weight)

    for (w_full, c_full), (w_skip, c_skip) in zip(full_res, skip_res):
        assert w_skip == w_full
        np.testing.assert_allclose(c_skip, c_full, rtol=1e-4, atol=1e-2)
