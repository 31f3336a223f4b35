"""TPU beam search vs host FasterDecoder oracle on a real (tiny) TLG."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.beam import (
    BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
)
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.faster import FasterDecoder, FasterDecoderOptions
from eesen_tpu.decoder.graph_compile import compile_graph

from tests.test_ctc_graph import ARPA, LEXICON, UNITS


@pytest.fixture(scope="module")
def tlg():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    lg = build_lg(lang.l_fst, g)
    return lang, build_tlg(lang.t_fst, lg)


def synth_loglikes(rng, lang, units_seq, t_per=3, noise=0.5):
    """Peaked log-softmax favoring the given framewise unit sequence."""
    # vocab order: col 0 = blank, cols 1.. = units (token id - 1)
    v = 1 + len(UNITS)
    frames = []
    for u in units_seq:
        col = 0 if u == "<blk>" else lang.tokens[u] - 1
        for _ in range(t_per):
            x = rng.standard_normal(v) * noise
            x[col] += 6.0
            frames.append(x)
    ll = np.stack(frames).astype(np.float32)
    ll = ll - np.log(np.exp(ll).sum(axis=1, keepdims=True))
    return ll


def test_graph_compile_degree_cap(tlg):
    lang, fst = tlg
    g = compile_graph(fst, max_degree=4)
    assert g.max_emit_degree <= 4
    assert g.max_eps_degree <= 4
    assert g.num_emit_arcs + g.num_eps_arcs >= fst.num_arcs
    # degree-capped graph must preserve the language: spot-check decode
    rng = np.random.default_rng(0)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2
    )
    dec = FasterDecoder(fst, FasterDecoderOptions(beam=1e9, max_active=10**9))
    _, ow, _ = dec.decode(ll)
    assert [lang.words.sym(o) for o in ow] == ["ab", "ba"]


@pytest.mark.parametrize("seed", range(5))
def test_beam_matches_faster_decoder(tlg, seed):
    """With wide beams both decoders must find the same best path."""
    lang, fst = tlg
    rng = np.random.default_rng(seed)
    seqs = [
        ["a", "<blk>", "b", "<blk>", "b", "a"],
        ["a", "a", "b", "c", "<blk>"],
        ["b", "a", "<blk>", "a", "b"],
    ]
    units_seq = seqs[seed % len(seqs)]
    ll = synth_loglikes(rng, lang, units_seq, t_per=2, noise=1.0)

    ref = FasterDecoder(
        fst, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    _, ref_words, ref_cost = ref.decode(ll)

    g = compile_graph(fst, max_degree=8)
    cfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    decoder = make_beam_decoder(g, cfg)
    dg = DeviceGraph.put(g)
    out = decoder(
        jnp.asarray(ll[None, :, :]), jnp.asarray([ll.shape[0]]), dg
    )
    assert int(out.overflow[0]) == 0
    (words, cost), = traceback(
        out, np.asarray([ll.shape[0]]), g.final_weight
    )
    assert words == ref_words, (
        [lang.words.sym(w) for w in words],
        [lang.words.sym(w) for w in ref_words],
    )
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)


def test_beam_batched(tlg):
    """Batched decode: each row matches its own single decode."""
    lang, fst = tlg
    rng = np.random.default_rng(42)
    lls = [
        synth_loglikes(rng, lang, ["a", "<blk>", "b"], t_per=2),
        synth_loglikes(rng, lang, ["b", "a", "<blk>", "a", "b", "c"], t_per=2),
    ]
    t_max = max(x.shape[0] for x in lls)
    batch = np.zeros((2, t_max, lls[0].shape[1]), np.float32)
    lengths = np.zeros(2, np.int32)
    for i, x in enumerate(lls):
        batch[i, : len(x)] = x
        lengths[i] = len(x)

    g = compile_graph(fst, max_degree=8)
    decoder = make_beam_decoder(
        g, BeamSearchConfig(beam=1e9, max_active=256)
    )
    dg = DeviceGraph.put(g)
    out = decoder(jnp.asarray(batch), jnp.asarray(lengths), dg)
    results = traceback(out, lengths, g.final_weight)

    ref = FasterDecoder(
        fst, FasterDecoderOptions(beam=1e9, max_active=10**9)
    )
    for i, x in enumerate(lls):
        _, ref_words, ref_cost = ref.decode(x)
        words, cost = results[i]
        assert words == ref_words
        np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)


def test_beam_narrow_still_decodes(tlg):
    """A realistic narrow beam must still produce the right words on
    clean posteriors."""
    lang, fst = tlg
    rng = np.random.default_rng(7)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=3,
        noise=0.2,
    )
    g = compile_graph(fst, max_degree=8)
    decoder = make_beam_decoder(
        g, BeamSearchConfig(beam=12.0, max_active=64)
    )
    dg = DeviceGraph.put(g)
    out = decoder(jnp.asarray(ll[None]), jnp.asarray([len(ll)]), dg)
    (words, cost), = traceback(out, np.asarray([len(ll)]), g.final_weight)
    assert [lang.words.sym(w) for w in words] == ["ab", "ba"]


@pytest.mark.parametrize("hub_threshold,closure", [
    (0, True), (3, False), (3, True),
])
def test_beam_hub_and_closure_modes(tlg, hub_threshold, closure):
    """Hub extraction and closure precompute must not change results."""
    lang, fst = tlg
    rng = np.random.default_rng(11)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2,
        noise=1.0,
    )
    ref = FasterDecoder(
        fst, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    _, ref_words, ref_cost = ref.decode(ll)

    g = compile_graph(
        fst, max_degree=8, hub_threshold=hub_threshold,
        build_closure=closure,
    )
    if hub_threshold:
        assert g.has_hubs, "test graph should have hub states"
    if closure:
        assert g.has_closure
    decoder = make_beam_decoder(
        g, BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    )
    out = decoder(
        jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]), DeviceGraph.put(g)
    )
    (words, cost), = traceback(out, np.asarray([ll.shape[0]]), g.final_weight)
    assert words == ref_words, (
        [lang.words.sym(w) for w in words],
        [lang.words.sym(w) for w in ref_words],
    )
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)

@pytest.mark.parametrize("funnel_mult", [1, 2])
def test_beam_funnel_exact(tlg, funnel_mult):
    """Funnel pre-prune must not change the best path (funnel survivors
    cover all reachable destinations at these sizes)."""
    lang, fst = tlg
    rng = np.random.default_rng(13)
    ll = synth_loglikes(
        rng, lang, ["a", "a", "b", "c", "<blk>"], t_per=2, noise=1.0
    )
    ref = FasterDecoder(
        fst, FasterDecoderOptions(beam=1e9, max_active=10**9,
                                  acoustic_scale=0.9)
    )
    _, ref_words, ref_cost = ref.decode(ll)

    g = compile_graph(fst, max_degree=8, build_closure=True)
    decoder = make_beam_decoder(
        g, BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9,
                            funnel_mult=funnel_mult)
    )
    out = decoder(
        jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]), DeviceGraph.put(g)
    )
    (words, cost), = traceback(out, np.asarray([ll.shape[0]]), g.final_weight)
    assert words == ref_words
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-4, atol=1e-3)

def test_beam_scan_unroll_exact(tlg):
    """scan_unroll only restructures the frame loop; outputs must be
    bit-identical to the unroll=1 decode."""
    lang, fst = tlg
    rng = np.random.default_rng(17)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2,
        noise=1.0,
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    dg = DeviceGraph.put(g)
    lls = jnp.asarray(ll[None])
    lens = jnp.asarray([ll.shape[0]])
    base = make_beam_decoder(
        g, BeamSearchConfig(beam=1e9, max_active=128)
    )(lls, lens, dg)
    for unroll in (2, 4, 100):
        out = make_beam_decoder(
            g, BeamSearchConfig(beam=1e9, max_active=128,
                                scan_unroll=unroll)
        )(lls, lens, dg)
        np.testing.assert_array_equal(
            np.asarray(out.states), np.asarray(base.states))
        np.testing.assert_allclose(
            np.asarray(out.scores), np.asarray(base.scores),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out.olabels), np.asarray(base.olabels))


def test_sharded_beam_matches_single(tlg):
    """shard_map over the batch axis must reproduce single-device decode
    exactly (graph replicated, no cross-chip communication)."""
    import jax
    from eesen_tpu.decoder.beam import make_sharded_beam_decoder
    from eesen_tpu.parallel.mesh import MeshConfig, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs a 4+ device mesh")
    lang, fst = tlg
    rng = np.random.default_rng(21)
    seqs = [
        ["a", "<blk>", "b"], ["b", "a", "<blk>", "a"],
        ["a", "a", "b", "c"], ["c", "<blk>", "b", "a"],
    ]
    lls = [synth_loglikes(rng, lang, s, t_per=2) for s in seqs]
    t_max = max(x.shape[0] for x in lls)
    batch = np.zeros((4, t_max, lls[0].shape[1]), np.float32)
    lengths = np.zeros(4, np.int32)
    for i, x in enumerate(lls):
        batch[i, : len(x)] = x
        lengths[i] = len(x)

    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=128)
    dg = DeviceGraph.put(g)
    single = make_beam_decoder(g, cfg)(
        jnp.asarray(batch), jnp.asarray(lengths), dg
    )
    mesh = make_mesh(MeshConfig(data=4, model=1), devices=jax.devices()[:4])
    sharded = make_sharded_beam_decoder(g, cfg, mesh)(
        jnp.asarray(batch), jnp.asarray(lengths), dg
    )
    r_single = traceback(single, lengths, g.final_weight)
    r_sharded = traceback(sharded, lengths, g.final_weight)
    for (w1, c1), (w2, c2) in zip(r_single, r_sharded):
        assert w1 == w2
        np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-5)

def test_streaming_matches_offline(tlg):
    """Chunked streaming decode must produce results identical to the
    one-shot decode of the whole utterance."""
    from eesen_tpu.decoder.beam import StreamingBeamDecoder

    lang, fst = tlg
    rng = np.random.default_rng(31)
    seqs = [
        ["a", "<blk>", "b", "<blk>", "b", "a"],
        ["a", "a", "b", "c", "<blk>", "b"],
    ]
    lls = [synth_loglikes(rng, lang, s, t_per=2, noise=1.0) for s in seqs]
    t_max = max(len(x) for x in lls)
    batch = np.full((2, t_max, lls[0].shape[1]), -30.0, np.float32)
    lengths = np.asarray([len(x) for x in lls], np.int32)
    for i, x in enumerate(lls):
        batch[i, : len(x)] = x

    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    offline = make_beam_decoder(g, cfg)(
        jnp.asarray(batch), jnp.asarray(lengths), DeviceGraph.put(g)
    )
    ref = traceback(offline, lengths, g.final_weight)

    dec = StreamingBeamDecoder(g, cfg)
    st = dec.start(2)
    chunk = 5
    for t0 in range(0, t_max, chunk):
        ll_c = batch[:, t0 : t0 + chunk]
        act = (np.arange(t0, t0 + ll_c.shape[1])[None, :]
               < lengths[:, None])
        st = dec.accept(st, ll_c, act)
    res = dec.finish(st)
    for (w1, c1), (w2, c2) in zip(ref, res):
        assert w1 == w2, (w1, w2)
        np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-4)


def test_packed_layout_matches_dense(tlg, monkeypatch):
    """The arc-packed (offsets-carrying) layout and the dense
    state-indexed rows layout are two encodings of the same search;
    words, costs, and per-frame score sets must agree.  (Small test
    graphs auto-select dense, so this test pins BOTH paths.)"""
    import eesen_tpu.decoder.beam as beam_mod

    lang, fst = tlg
    rng = np.random.default_rng(3)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "b", "a"], t_per=2, noise=1.0
    )
    for closure in (False, True):
        g = compile_graph(fst, max_degree=8, build_closure=closure)
        cfg = BeamSearchConfig(beam=14.0, max_active=64,
                               acoustic_scale=0.9)
        args = (jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]))

        monkeypatch.setattr(beam_mod, "DENSE_ROWS_BUDGET", 10**15)
        assert beam_mod.use_dense_rows(g)
        out_d = make_beam_decoder(g, cfg)(*args, DeviceGraph.put(g))

        monkeypatch.setattr(beam_mod, "DENSE_ROWS_BUDGET", 0)
        assert not beam_mod.use_dense_rows(g)
        out_p = make_beam_decoder(g, cfg)(*args, DeviceGraph.put(g))

        (wd, cd), = traceback(out_d, np.asarray([ll.shape[0]]),
                              g.final_weight)
        (wp, cp), = traceback(out_p, np.asarray([ll.shape[0]]),
                              g.final_weight)
        assert wd == wp and abs(cd - cp) < 1e-4
        sd = np.sort(np.asarray(out_d.scores), axis=-1)
        sp = np.sort(np.asarray(out_p.scores), axis=-1)
        fin = np.isfinite(sd) & np.isfinite(sp)
        np.testing.assert_allclose(sd[fin], sp[fin], atol=1e-4)
        assert (np.isfinite(sd) == np.isfinite(sp)).all()


def test_layout_mismatch_raises(tlg):
    import eesen_tpu.decoder.beam as beam_mod

    lang, fst = tlg
    g = compile_graph(fst, max_degree=8)
    assert beam_mod.use_dense_rows(g)       # tiny graph
    dec = make_beam_decoder(g, BeamSearchConfig(max_active=16))
    dg_packed = DeviceGraph.put(g, dense=False)
    ll = jnp.zeros((1, 4, 8))
    with pytest.raises(ValueError, match="layout"):
        dec(ll, jnp.asarray([4]), dg_packed)


def test_streaming_blank_skip_matches_offline_full(tlg):
    """Streaming with per-chunk blank-run merging must reproduce the
    full (unskipped) offline decode: words identical and cost equal
    (the merged frames carry their exact blank sums; runs split at
    chunk boundaries just merge into one frame per chunk)."""
    from eesen_tpu.decoder.beam import StreamingBeamDecoder

    lang, fst = tlg
    rng = np.random.default_rng(77)
    seqs = [
        ["a", "<blk>", "<blk>", "b", "<blk>", "b", "a"],
        ["a", "a", "<blk>", "<blk>", "<blk>", "b", "c", "<blk>"],
    ]
    lls = []
    for s in seqs:
        x = np.array(synth_loglikes(rng, lang, s, t_per=3, noise=0.3))
        bp = x[:, 0] > np.log(0.5)
        x[bp, 0] += 8.0                     # saturate blanks
        lls.append(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    t_max = max(len(x) for x in lls)
    batch = np.full((2, t_max, lls[0].shape[1]), -30.0, np.float32)
    batch[:, :, 0] = 0.0                    # padding decodes as blank
    lengths = np.asarray([len(x) for x in lls], np.int32)
    for i, x in enumerate(lls):
        batch[i, : len(x)] = x

    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=128, acoustic_scale=0.9)
    offline = make_beam_decoder(g, cfg)(
        jnp.asarray(batch), jnp.asarray(lengths), DeviceGraph.put(g)
    )
    ref = traceback(offline, lengths, g.final_weight)

    dec = StreamingBeamDecoder(
        g, dataclasses.replace(cfg, blank_skip=0.98, blank_skip_bucket=2)
    )
    st = dec.start(2)
    chunk = 12
    for t0 in range(0, t_max, chunk):
        ll_c = batch[:, t0 : t0 + chunk]
        act = (np.arange(t0, t0 + ll_c.shape[1])[None, :]
               < lengths[:, None])
        st = dec.accept(st, ll_c, act)
    res = dec.finish(st)
    assert st["tframes"] < t_max            # actually merged frames
    for (w1, c1), (w2, c2) in zip(ref, res):
        assert w1 == w2, (w1, w2)
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-2)


def test_beam_sort_active_exact(tlg):
    """sort_active only reorders slots (parents/olabels ride the same
    permutation), so words and cost must match the default order."""
    lang, fst = tlg
    rng = np.random.default_rng(21)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2,
        noise=1.0,
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    dg = DeviceGraph.put(g)
    outs = []
    for sort_active in (False, True):
        dec = make_beam_decoder(
            g, BeamSearchConfig(beam=1e9, max_active=256,
                                acoustic_scale=0.9,
                                sort_active=sort_active)
        )
        out = dec(jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]), dg)
        outs.append(
            traceback(out, np.asarray([ll.shape[0]]), g.final_weight)[0]
        )
    (w0, c0), (w1, c1) = outs
    assert w0 == w1
    np.testing.assert_allclose(c0, c1, rtol=1e-5, atol=1e-4)


def test_beam_compact_arc_budget_exact(tlg, monkeypatch):
    """CSR (arc-budget) expansion must reproduce the rectangular search
    exactly while the active set's total degree fits the budget."""
    import eesen_tpu.decoder.beam as beam_mod

    monkeypatch.setattr(beam_mod, "DENSE_ROWS_BUDGET", 0)
    lang, fst = tlg
    rng = np.random.default_rng(23)
    ll = synth_loglikes(
        rng, lang, ["a", "a", "b", "c", "<blk>"], t_per=2, noise=1.0
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    dg = DeviceGraph.put(g, dense=False)
    base = dict(beam=1e9, max_active=64, acoustic_scale=0.9)
    dec0 = make_beam_decoder(g, BeamSearchConfig(**base))
    # generous budgets: K * max_degree lanes always fit
    dec1 = make_beam_decoder(g, BeamSearchConfig(
        **base, arc_budget_emit=64 * g.max_emit_degree,
        arc_budget_x=64 * max(g.max_closure_degree, 1),
    ))
    args = (jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]), dg)
    out0, out1 = dec0(*args), dec1(*args)
    assert int(out1.overflow[0]) == 0
    r0 = traceback(out0, np.asarray([ll.shape[0]]), g.final_weight)[0]
    r1 = traceback(out1, np.asarray([ll.shape[0]]), g.final_weight)[0]
    assert r0[0] == r1[0]
    np.testing.assert_allclose(r0[1], r1[1], rtol=1e-5, atol=1e-4)
    # per-frame active sets agree as SETS (slot order may differ)
    for t in range(ll.shape[0]):
        s0 = {(int(a), round(float(b), 3))
              for a, b in zip(out0.states[t, 0], out0.scores[t, 0])
              if a >= 0}
        s1 = {(int(a), round(float(b), 3))
              for a, b in zip(out1.states[t, 0], out1.scores[t, 0])
              if a >= 0}
        assert s0 == s1


def test_beam_compact_overflow_counted(tlg, monkeypatch):
    """A too-small arc budget must not crash: dropped arcs are counted in
    BeamOutputs.overflow so callers can re-decode with a bigger budget."""
    import eesen_tpu.decoder.beam as beam_mod

    monkeypatch.setattr(beam_mod, "DENSE_ROWS_BUDGET", 0)
    lang, fst = tlg
    rng = np.random.default_rng(24)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b"], t_per=2, noise=1.0
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    dg = DeviceGraph.put(g, dense=False)
    dec = make_beam_decoder(g, BeamSearchConfig(
        beam=1e9, max_active=4, acoustic_scale=0.9,
        arc_budget_emit=4, arc_budget_x=4,
    ))
    out = dec(jnp.asarray(ll[None]), jnp.asarray([ll.shape[0]]), dg)
    assert int(out.overflow[0]) > 0


def test_streaming_partial_hypotheses(tlg):
    """partial() must emit a valid hypothesis after every chunk, and the
    post-final-chunk partial must equal finish()'s words whenever the
    best slot is final-reachable (it is, with these wide beams)."""
    from eesen_tpu.decoder.beam import StreamingBeamDecoder

    lang, fst = tlg
    rng = np.random.default_rng(33)
    ll = synth_loglikes(
        rng, lang, ["a", "<blk>", "b", "<blk>", "b", "a"], t_per=2,
        noise=1.0,
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    dec = StreamingBeamDecoder(g, cfg)
    st = dec.start(1)
    partials = []
    for t0 in range(0, ll.shape[0], 4):
        st = dec.accept(st, ll[None, t0:t0 + 4])
        partials.append(dec.partial(st)[0])
    (words, cost), = dec.finish(st)
    assert all(isinstance(p, list) for p in partials)
    # hypotheses grow (weakly) as audio arrives and converge to final
    assert len(partials[-1]) >= len(partials[0])


def test_streaming_summary_overflow_raises(tlg):
    """A summary_words cap too small for the content must raise, not
    silently truncate the hypothesis."""
    import pytest

    from eesen_tpu.decoder.beam import StreamingBeamDecoder

    lang, fst = tlg
    rng = np.random.default_rng(34)
    ll = synth_loglikes(
        rng, lang, ["a", "b", "c", "a", "b"], t_per=2, noise=0.5
    )
    g = compile_graph(fst, max_degree=8, build_closure=True)
    cfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    dec = StreamingBeamDecoder(g, cfg, summary_words=1)
    st = dec.start(1)
    st = dec.accept(st, ll[None])       # whole utt as one chunk: >1 word
    with pytest.raises(OverflowError):
        dec.finish(st)
