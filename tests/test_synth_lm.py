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


def _arpa_eval(grams):
    """ARPA conditional p(w|ctx) evaluator over parse_arpa output."""
    prob, bow = {}, {}
    for order in grams:
        for lp, ng, bo in order:
            prob[ng] = 10 ** lp
            if bo is not None:
                bow[ng] = 10 ** bo

    def p(ng):
        while True:
            if ng in prob:
                return prob[ng]
            if len(ng) == 1:
                return 0.0
            return bow.get(ng[:-1], 1.0) * p(ng[1:])

    return p, prob, bow


@pytest.mark.parametrize("order", [2, 3, 4])
def test_ngram_arpa_normalizes(order):
    from eesen_tpu.decoder.arpa import parse_arpa
    from eesen_tpu.recipes.lm import estimate_ngram_arpa

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(25)]
    # patterned text so higher orders have real mass
    sents = []
    for _ in range(300):
        n = int(rng.integers(3, 9))
        start = int(rng.integers(0, 25))
        sents.append([vocab[(start + 2 * k) % 25] for k in range(n)])
    arpa = estimate_ngram_arpa(sents, order=order, vocab=vocab)
    grams = parse_arpa(arpa)
    assert len(grams) == order
    p, prob, bow = _arpa_eval(grams)
    words = vocab + [EOS]
    # every context with a bow must normalize: sum_w p(w|ctx) == 1
    ctxs = list(bow)[:200]
    for ctx in ctxs:
        total = sum(p(ctx + (w,)) for w in words)
        assert abs(total - 1.0) < 5e-3, (ctx, total)


def test_ngram_prune_keeps_normalization_and_prefix_closure():
    from eesen_tpu.decoder.arpa import parse_arpa
    from eesen_tpu.recipes.lm import estimate_ngram_arpa

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(20)]
    sents = [
        [vocab[int(j)] for j in rng.integers(0, 20, int(rng.integers(3, 9)))]
        for _ in range(400)
    ]
    arpa = estimate_ngram_arpa(
        sents, order=3, vocab=vocab, min_counts=(1, 2, 2)
    )
    grams = parse_arpa(arpa)
    bi = {ng for _, ng, _ in grams[1]}
    for _, ng, _ in grams[2]:
        assert ng[:-1] in bi, ng  # prefix closure
    p, prob, bow = _arpa_eval(grams)
    words = vocab + [EOS]
    for ctx in list(bow)[:100]:
        total = sum(p(ctx + (w,)) for w in words)
        assert abs(total - 1.0) < 5e-3, (ctx, total)


def test_trigram_beats_bigram_on_patterned_text():
    """Held-out log-prob should improve with order on deterministic
    patterns (sanity that higher orders carry real signal)."""
    from eesen_tpu.decoder.arpa import parse_arpa
    from eesen_tpu.recipes.lm import estimate_bigram_arpa, estimate_ngram_arpa

    vocab = ["a", "b", "c", "d"]
    # a b -> c, b a -> d deterministic trigram pattern
    train = [["a", "b", "c", "b", "a", "d"] for _ in range(50)]
    held = ["a", "b", "c", "b", "a", "d"]
    tri = parse_arpa(estimate_ngram_arpa(train, order=3, vocab=vocab))
    bi = parse_arpa(estimate_ngram_arpa(train, order=2, vocab=vocab))

    def logprob(grams):
        p, _, _ = _arpa_eval(grams)
        toks = [BOS] + held + [EOS]
        total = 0.0
        import math
        for i in range(1, len(toks)):
            ctx = tuple(toks[max(0, i - len(grams) + 1):i])
            total += math.log(max(p(ctx + (toks[i],)), 1e-30))
        return total

    assert logprob(tri) > logprob(bi) + 1.0
