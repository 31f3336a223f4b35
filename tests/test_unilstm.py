"""Unidirectional <Lstm>/<LstmParallel> stack + streaming inference.

reference: src/net/lstm-layer.h:28-265 (uni recurrence),
lstm-parallel-layer.h:223; streaming is the TPU-native capability the
uni stack unlocks (the reference's online-decoding code is dead).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.models.bilstm import BiLstmConfig, init_bilstm_layer
from eesen_tpu.models.model import (
    AcousticModelConfig, apply_model, init_model,
)
from eesen_tpu.models.proto import emit_nnet_proto, parse_nnet_proto
from eesen_tpu.models.serialize import read_eesen_nnet, write_eesen_nnet
from eesen_tpu.models.streaming import StreamingAcousticModel


CFG = AcousticModelConfig(
    input_dim=6, cell_dim=8, num_layers=2, num_targets=5,
    compute_dtype=jnp.float32, bidirectional=False,
)


def test_uni_layer_matches_manual_recurrence():
    """Forward-only recurrence vs a literal numpy re-derivation of
    lstm-layer.h:170-265 (GIFO order, peepholes, masking)."""
    rng = np.random.default_rng(0)
    lcfg = BiLstmConfig(input_dim=4, cell_dim=3, bidirectional=False,
                        compute_dtype=jnp.float32, use_pallas="never")
    p = init_bilstm_layer(jax.random.PRNGKey(0), lcfg)
    assert set(p) == {"fw"}
    b, t = 2, 7
    x = rng.standard_normal((t, b, 4)).astype(np.float32)
    lengths = np.array([7, 4], np.int32)

    from eesen_tpu.models.bilstm import bilstm_layer_tm

    y = np.asarray(bilstm_layer_tm(
        p, jnp.asarray(x), jnp.asarray(lengths), lcfg
    ))
    assert y.shape == (t, b, 3)

    fw = {k: np.asarray(v) for k, v in p["fw"].items()}
    c = np.zeros((b, 3), np.float32)
    m = np.zeros((b, 3), np.float32)
    want = np.zeros((t, b, 3), np.float32)
    for ti in range(t):
        gifo = (
            np.einsum("bd,dgh->bgh", x[ti], fw["w_gifo_x"])
            + np.einsum("bh,hgk->bgk", m, fw["w_gifo_m"])
            + fw["bias"]
        )
        g = np.tanh(gifo[:, 0])
        i = 1 / (1 + np.exp(-(gifo[:, 1] + c * fw["phole_i_c"])))
        f = 1 / (1 + np.exp(-(gifo[:, 2] + c * fw["phole_f_c"])))
        c_new = f * c + i * g
        o = 1 / (1 + np.exp(-(gifo[:, 3] + c_new * fw["phole_o_c"])))
        m_new = o * np.tanh(c_new)
        alive = (ti < lengths).astype(np.float32)[:, None]
        c = c_new * alive + c * (1 - alive)
        m_out = m_new * alive
        m = m_out + m * (1 - alive)
        want[ti] = m_out
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_uni_model_shapes_and_params():
    params = init_model(jax.random.PRNGKey(1), CFG)
    assert set(params["layers"][0]) == {"fw"}
    # inner layers consume H (not 2H)
    assert params["layers"][1]["fw"]["w_gifo_x"].shape == (8, 4, 8)
    assert params["out"]["w"].shape == (8, 5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 11, 6)).astype(np.float32))
    lengths = jnp.asarray([11, 8, 5], jnp.int32)
    logits = apply_model(params, x, lengths, CFG)
    assert logits.shape == (3, 11, 5)


def test_streaming_matches_offline():
    """Chunked stream_step == one offline apply_model pass (the property
    that makes the uni stack an online AM)."""
    params = init_model(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(5)
    b, t = 3, 20
    feats = rng.standard_normal((b, t, 6)).astype(np.float32)
    lengths = np.array([20, 13, 17], np.int32)
    offline = np.asarray(apply_model(
        params, jnp.asarray(feats), jnp.asarray(lengths), CFG
    ))

    sam = StreamingAcousticModel(params, CFG)
    st = sam.start(b)
    got = np.zeros_like(offline)
    for t0 in range(0, t, 7):                      # uneven chunks
        t1 = min(t0 + 7, t)
        chunk_lens = np.clip(lengths - t0, 0, t1 - t0)
        lp, st = sam.step(st, feats[:, t0:t1], chunk_lens)
        got[:, t0:t1] = np.asarray(lp)
    # compare on valid frames only (offline zeros padded outputs too,
    # but the affine bias makes padded logits nonzero in both)
    for i in range(b):
        np.testing.assert_allclose(
            got[i, :lengths[i]], offline[i, :lengths[i]],
            rtol=2e-4, atol=2e-4,
        )


def test_uni_proto_roundtrip():
    text = emit_nnet_proto(CFG)
    assert "<LstmParallel>" in text and "BiLstm" not in text
    cfg2 = parse_nnet_proto(text)
    assert not cfg2.bidirectional
    assert cfg2.cell_dim == CFG.cell_dim
    assert cfg2.num_layers == CFG.num_layers
    assert cfg2.num_targets == CFG.num_targets


def test_uni_serialize_roundtrip(tmp_path):
    params = init_model(jax.random.PRNGKey(3), CFG)
    path = str(tmp_path / "uni.nnet")
    write_eesen_nnet(path, jax.tree_util.tree_map(np.asarray, params),
                     CFG, parallel=True)
    params2, cfg2 = read_eesen_nnet(path)
    assert not cfg2.bidirectional
    assert cfg2.cell_dim == CFG.cell_dim
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_accus_roundtrip(tmp_path):
    """Optimizer-accumulator round-trip in the native format
    (bilstm-layer.h:376-395 <BiLstmAccus>): write accus, read them back,
    inject into an optax adagrad state."""
    import optax

    from eesen_tpu.models.serialize import extract_accus, inject_accus

    cfg = dataclasses.replace(CFG, bidirectional=True)
    params = jax.tree_util.tree_map(
        np.asarray, init_model(jax.random.PRNGKey(4), cfg))
    # a fake adagrad state with nonzero accumulators
    tx = optax.adagrad(0.1, initial_accumulator_value=0.0)
    opt_state = tx.init(params)
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.5, params)
    _, opt_state = tx.update(g, opt_state, params)
    accus = extract_accus(opt_state)
    assert accus is not None

    path = str(tmp_path / "with_accus.nnet")
    write_eesen_nnet(path, params, cfg, parallel=True,
                     accus=jax.tree_util.tree_map(np.asarray, accus))
    params2, cfg2, accus2 = read_eesen_nnet(path, with_accus=True)
    assert accus2 is not None
    for a, b in zip(jax.tree_util.tree_leaves(accus),
                    jax.tree_util.tree_leaves(accus2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)
    # inject into a fresh opt state
    fresh = tx.init(params)
    resumed = inject_accus(fresh, accus2)
    got = extract_accus(resumed)
    for a, b in zip(jax.tree_util.tree_leaves(accus),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_plain_nnet_without_accus_still_reads(tmp_path):
    params = jax.tree_util.tree_map(
        np.asarray, init_model(jax.random.PRNGKey(5), CFG))
    path = str(tmp_path / "plain.nnet")
    write_eesen_nnet(path, params, CFG)
    p2, c2, accus = read_eesen_nnet(path, with_accus=True)
    assert accus is None


def test_streaming_am_drives_streaming_decoder():
    """End-to-end online ASR: uni-LSTM AM chunks -> StreamingBeamDecoder
    == offline apply_model -> offline beam decode.  This is the usable
    online path the uni stack exists for (the reference's
    online-feature/online-decoding code is dead in every recipe)."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.beam import (
        BeamSearchConfig, DeviceGraph, StreamingBeamDecoder,
        make_beam_decoder, traceback,
    )
    from eesen_tpu.decoder.ctc_graph import (
        build_lg, build_tlg, compile_lang,
    )
    from eesen_tpu.decoder.graph_compile import compile_graph
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g_fst = arpa_to_fst(ARPA, lang.words)
    fst = build_tlg(lang.t_fst, build_lg(lang.l_fst, g_fst))
    g = compile_graph(fst, max_degree=8, build_closure=True)

    num_targets = 1 + len(UNITS)
    cfg = dataclasses.replace(CFG, num_targets=num_targets)
    params = init_model(jax.random.PRNGKey(7), cfg)

    rng = np.random.default_rng(11)
    b, t = 2, 18
    feats = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    lengths = np.array([18, 12], np.int32)

    # offline: full forward + one-shot decode
    logits = apply_model(params, jnp.asarray(feats),
                         jnp.asarray(lengths), cfg)
    lp = jax.nn.log_softmax(logits, axis=-1)
    bcfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    off = make_beam_decoder(g, bcfg)(
        lp, jnp.asarray(lengths), DeviceGraph.put(g)
    )
    ref = traceback(off, lengths, g.final_weight)

    # streaming: chunked AM + chunked decoder
    sam = StreamingAcousticModel(params, cfg)
    dec = StreamingBeamDecoder(g, bcfg)
    ast = sam.start(b)
    dst = dec.start(b)
    chunk = 5
    for t0 in range(0, t, chunk):
        t1 = min(t0 + chunk, t)
        chunk_lens = np.clip(lengths - t0, 0, t1 - t0)
        cl, ast = sam.step(ast, feats[:, t0:t1], chunk_lens)
        clp = jax.nn.log_softmax(cl, axis=-1)
        act = (np.arange(t0, t1)[None, :] < lengths[:, None])
        dst = dec.accept(dst, clp, act)
    res = dec.finish(dst)
    for (w1, c1), (w2, c2) in zip(ref, res):
        assert w1 == w2, (w1, w2)
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-3)


def test_streaming_pipeline_fused_matches_offline():
    """StreamingPipeline (ONE jitted program per chunk, summaries kept
    on device) must equal the offline forward + one-shot decode, like
    the unfused pair."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.beam import (
        BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
    )
    from eesen_tpu.decoder.ctc_graph import (
        build_lg, build_tlg, compile_lang,
    )
    from eesen_tpu.decoder.graph_compile import compile_graph
    from eesen_tpu.models.streaming import StreamingPipeline
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g_fst = arpa_to_fst(ARPA, lang.words)
    fst = build_tlg(lang.t_fst, build_lg(lang.l_fst, g_fst))
    g = compile_graph(fst, max_degree=8, build_closure=True)

    num_targets = 1 + len(UNITS)
    cfg = dataclasses.replace(CFG, num_targets=num_targets)
    params = init_model(jax.random.PRNGKey(7), cfg)

    rng = np.random.default_rng(13)
    b, t = 2, 18
    feats = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    lengths = np.array([18, 12], np.int32)
    logits = apply_model(params, jnp.asarray(feats),
                         jnp.asarray(lengths), cfg)
    lp = jax.nn.log_softmax(logits, axis=-1)
    bcfg = BeamSearchConfig(beam=1e9, max_active=256, acoustic_scale=0.9)
    off = make_beam_decoder(g, bcfg)(
        lp, jnp.asarray(lengths), DeviceGraph.put(g)
    )
    ref = traceback(off, lengths, g.final_weight)

    pipe = StreamingPipeline(params, cfg, g, bcfg)
    st = pipe.start(b)
    for t0 in range(0, t, 5):
        t1 = min(t0 + 5, t)
        chunk_lens = np.clip(lengths - t0, 0, t1 - t0)
        st = pipe.step(st, feats[:, t0:t1], chunk_lens)
        _ = pipe.partial(st)   # mid-stream hypotheses don't disturb state
    res = pipe.finish(st)
    for (w1, c1), (w2, c2) in zip(ref, res):
        assert w1 == w2, (w1, w2)
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-3)


def test_uni_trains_and_converges():
    """Toy CTC training through the uni stack (the reference's
    train-ctc-parallel would accept an <Lstm> net the same way)."""
    from eesen_tpu.training.optim import OptimizerConfig
    from eesen_tpu.training.schedule import NewbobConfig
    from eesen_tpu.training.trainer import Trainer, TrainerConfig
    from tests.test_training import _toy_batch

    tcfg = TrainerConfig(
        model=CFG,
        optimizer=OptimizerConfig(algorithm="adagrad"),
        newbob=NewbobConfig(learn_rate=0.1, max_iters=6, min_iters=6),
        report_step=1000,
    )
    t = Trainer(tcfg)
    rng = np.random.default_rng(0)
    b = _toy_batch(rng, 4, 12, 6, 5)
    batches = lambda: iter([dict(b) for _ in range(50)])
    hist = t.fit(batches, batches)
    accs = [hist[e]["train_acc"] for e in sorted(hist)]
    assert accs[-1] > accs[0]
    assert accs[-1] > 50.0
