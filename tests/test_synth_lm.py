"""Tests for the bigram ARPA estimator and the synthetic corpus generator."""

import numpy as np
import pytest

from eesen_tpu.recipes.lm import BOS, EOS, estimate_bigram_arpa
from eesen_tpu.recipes.synth_corpus import (
    SynthConfig, generate_corpus, make_lexicon, make_phones, synth_utterance,
)


def test_bigram_arpa_parses_and_normalizes():
    from eesen_tpu.decoder.arpa import parse_arpa

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(30)]
    sents = [
        [vocab[int(j)] for j in rng.integers(0, 30, rng.integers(3, 9))]
        for _ in range(200)
    ]
    arpa = estimate_bigram_arpa(sents, vocab=vocab)
    grams = parse_arpa(arpa)
    assert len(grams) == 2
    uni = {g[1][0]: g for g in grams[0]}
    assert BOS in uni and EOS in uni
    # Katz model normalizes: for each seen context, sum of explicit bigram
    # probs + bow * (unigram mass of unseen words) == 1
    p_uni = {w: 10 ** lp for lp, (w,), _ in grams[0] if w != BOS}
    bows = {w: 10 ** bo for _, (w,), bo in grams[0]}
    by_ctx = {}
    for lp, (a, w), _ in grams[1]:
        by_ctx.setdefault(a, {})[w] = 10 ** lp
    for ctx, seen in by_ctx.items():
        mass = sum(seen.values())
        unseen = sum(p for w, p in p_uni.items() if w not in seen)
        total = mass + bows[ctx] * unseen
        assert abs(total - 1.0) < 2e-3, (ctx, total)


def test_bigram_arpa_builds_g_fst():
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import make_word_table

    sents = [["a", "b"], ["b", "a"], ["a", "b", "c"]]
    arpa = estimate_bigram_arpa(sents)
    words = make_word_table(["a", "b", "c"])
    g = arpa_to_fst(arpa, words)
    assert g.num_states > 0 and g.num_arcs > 0


def test_synth_corpus_shapes():
    cfg = SynthConfig(num_phones=12, num_words=20, num_speakers=3)
    rng = np.random.default_rng(cfg.seed)
    phones = make_phones(cfg, rng)
    lex = make_lexicon(cfg, rng)
    assert len(lex) == 20
    waves, texts, utt2spk = generate_corpus(cfg, 5, 1, lex, phones)
    assert len(waves) == 5
    for k, w in waves.items():
        assert w.dtype == np.float32 and len(w) > 16000 // 2
        assert np.abs(w).max() > 1000        # real signal energy
        assert len(texts[k]) >= cfg.min_utt_words
        assert utt2spk[k].startswith("spk")


def test_synth_is_deterministic():
    cfg = SynthConfig(num_phones=8, num_words=10, num_speakers=2)
    rng = np.random.default_rng(cfg.seed)
    phones = make_phones(cfg, rng)
    lex = make_lexicon(cfg, rng)
    w1, t1, _ = generate_corpus(cfg, 3, 5, lex, phones)
    rng2 = np.random.default_rng(cfg.seed)
    phones2 = make_phones(cfg, rng2)
    lex2 = make_lexicon(cfg, rng2)
    w2, t2, _ = generate_corpus(cfg, 3, 5, lex2, phones2)
    assert t1 == t2
    for k in w1:
        np.testing.assert_array_equal(w1[k], w2[k])
