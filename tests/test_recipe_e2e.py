"""Full-recipe integration test: wav files + lexicon + ARPA LM ->
lang build -> features -> CTC training -> TLG -> TPU beam decode -> WER.

This is the miniature equivalent of asr_egs/wsj/run_ctc_phn.sh run end to
end on a synthetic tone-phoneme corpus (each phone = a sine frequency), on
the CPU mesh.  The reference validated its whole stack exactly this way —
through recipe WER (SURVEY.md §4)."""

import dataclasses
import os
import struct

import numpy as np
import pytest

from eesen_tpu.decoder.beam import BeamSearchConfig
from eesen_tpu.frontend.features import (
    FbankOptions, FrameOptions, MelOptions,
)
from eesen_tpu.frontend.pipeline import FeaturePipelineConfig
from eesen_tpu.io.datadir import DataDir
from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.recipes.config import RecipeConfig
from eesen_tpu.recipes.run import RecipeRun
from eesen_tpu.training.batching import BatchConfig
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.schedule import NewbobConfig

SR = 16000
PHONES = ["aa", "bb", "cc", "dd"]
FREQ = {p: 400 + 350 * i for i, p in enumerate(PHONES)}
WORDS = {
    "apple": ("aa", "bb"),
    "cider": ("cc", "dd"),
    "bad": ("bb", "aa", "dd"),
    "cab": ("cc", "aa", "bb"),
}

ARPA = """
\\data\\
ngram 1=6

\\1-grams:
-0.5 </s>
-99 <s>
-0.7 apple
-0.7 cider
-0.7 bad
-0.7 cab

\\end\\
"""


def write_wav(path, samples):
    body = samples.astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 2, 2, 16)
            + b"data" + struct.pack("<I", len(body)) + body
        )


def synth(rng, words):
    segs = []
    for w in words:
        for p in WORDS[w]:
            dur = int(rng.integers(1500, 2200))
            t = np.arange(dur) / SR
            segs.append(np.sin(2 * np.pi * FREQ[p] * t) * 8000)
    x = np.concatenate(segs)
    return (x + rng.standard_normal(len(x)) * 80).astype(np.float64)


@pytest.mark.slow
def test_full_recipe(tmp_path):
    rng = np.random.default_rng(0)
    vocab = list(WORDS)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    wav_scp, text, utt2spk = {}, {}, {}
    for i in range(28):
        n = int(rng.integers(1, 4))
        ws = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        utt = f"utt{i:03d}"
        path = str(wav_dir / f"{utt}.wav")
        write_wav(path, synth(rng, ws))
        wav_scp[utt] = path
        text[utt] = ws
        utt2spk[utt] = f"spk{i % 3}"
    data = DataDir.write(
        str(tmp_path / "data"), wav_scp=wav_scp, text=text, utt2spk=utt2spk
    )
    data.validate()

    cfg = RecipeConfig(
        name="toy", dict_type="phn",
        fbank=FbankOptions(
            frame_opts=FrameOptions(dither=0.0),
            mel_opts=MelOptions(num_bins=20),
        ),
        pipeline=FeaturePipelineConfig(norm_vars=True, delta_order=2),
        model=AcousticModelConfig(
            input_dim=60, cell_dim=32, num_layers=1, num_targets=-1,
        ),
        optimizer=OptimizerConfig(algorithm="adagrad", max_grad=50.0),
        newbob=NewbobConfig(
            learn_rate=0.05, max_iters=6, min_iters=5,
            start_halving_inc=0.5, end_halving_inc=0.1,
        ),
        batch=BatchConfig(num_sequence=8, frame_limit=20000, time_quant=128),
        decode=BeamSearchConfig(beam=20.0, max_active=512,
                                acoustic_scale=0.9),
    )
    lexicon = [(w, p) for w, p in WORDS.items()] + [("<UNK>", ("aa",))]
    run = RecipeRun(cfg, str(tmp_path / "work"), lexicon, PHONES)

    # stage 1: lang + labels
    lang = run.build_lang()
    assert "<blk>" in lang.tokens and "apple" in lang.words
    labels = run.prep_labels(data)
    assert all(len(v) > 0 for v in labels.values())

    # stage 2: features
    feats = run.compute_features(data)
    d0 = next(iter(feats.values()))
    assert d0.shape[1] == 60

    # stage 3: train (hold out 8 utts for cv/test)
    keys = sorted(feats)
    tr, cv = keys[:20], keys[20:]
    hist = run.train(
        {k: feats[k] for k in tr}, {k: labels[k] for k in tr},
        {k: feats[k] for k in cv}, {k: labels[k] for k in cv},
        epochs_batches_repeat=40,
    )
    assert len(hist) >= 2
    final_acc = hist[max(hist)]["train_acc"]
    assert final_acc > 85.0, hist

    # stage 4: graph + decode + score
    graph = run.build_graph(ARPA)
    assert graph.num_states > 0
    refs = {k: text[k] for k in cv}
    stats, hyps = run.decode({k: feats[k] for k in cv}, refs)
    assert stats.wer < 40.0, (stats.report(), hyps)

    # acwt sweep from ONE decode pass (lattice rescaling, not re-decoding;
    # local/score.sh:44-55): at the decode acwt the swept WER must equal
    # the direct decode's WER
    cv_feats = {k: feats[k] for k in cv}
    sweep = run.score_sweep(cv_feats, refs, acwts=(0.5, 0.9, 1.3))
    assert sweep[0.9].wer == pytest.approx(stats.wer, abs=1e-9), (
        sweep[0.9].report(), stats.report(),
    )
    assert set(sweep) == {0.5, 0.9, 1.3}

    # determinized lattices rescore at different acwts: costs must move
    # with the scale (pair semiring retained through determinization)
    lats = run.decode_lattices(cv_feats)
    k0 = sorted(lats)[0]
    c_lo = lats[k0].scaled(0.5).best_path()[2]
    c_hi = lats[k0].scaled(1.3).best_path()[2]
    assert c_lo != c_hi

    # decode from the saved checkpoint, no live Trainer
    run2 = RecipeRun(cfg, str(tmp_path / "work"), lexicon, PHONES)
    run2.build_lang()
    run2.graph = run.graph
    run2.load_model()
    stats2, _ = run2.decode(cv_feats, refs)
    assert stats2.wer == pytest.approx(stats.wer, abs=1e-9)


@pytest.mark.slow
def test_blank_skip_guard(tmp_path):
    """score_sweep runs the blank-skip parity guard: when the guard
    passes, skipping is used; when it reports a mismatch, the pass falls
    back to blank_skip=0 (decode_lattices sees the full-decode cfg)."""
    import dataclasses as dc

    from eesen_tpu.recipes.run import RecipeRun

    rng = np.random.default_rng(1)
    vocab = list(WORDS)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    wav_scp, text, utt2spk = {}, {}, {}
    for i in range(12):
        ws = [vocab[int(j)] for j in rng.integers(0, len(vocab), 2)]
        utt = f"utt{i:03d}"
        path = str(wav_dir / f"{utt}.wav")
        write_wav(path, synth(rng, ws))
        wav_scp[utt], text[utt], utt2spk[utt] = path, ws, f"spk{i % 2}"
    data = DataDir.write(
        str(tmp_path / "data"), wav_scp=wav_scp, text=text, utt2spk=utt2spk
    )
    cfg = RecipeConfig(
        name="toy", dict_type="phn",
        fbank=FbankOptions(
            frame_opts=FrameOptions(dither=0.0),
            mel_opts=MelOptions(num_bins=20),
        ),
        pipeline=FeaturePipelineConfig(norm_vars=True, delta_order=2),
        model=AcousticModelConfig(
            input_dim=60, cell_dim=32, num_layers=1, num_targets=-1,
        ),
        optimizer=OptimizerConfig(algorithm="adagrad", max_grad=50.0),
        newbob=NewbobConfig(learn_rate=0.05, max_iters=2, min_iters=2),
        batch=BatchConfig(num_sequence=8, frame_limit=20000, time_quant=128),
        decode=BeamSearchConfig(beam=20.0, max_active=512,
                                acoustic_scale=0.9, blank_skip=0.98),
        blank_skip_guard=3,
    )
    lexicon = [(w, p) for w, p in WORDS.items()] + [("<UNK>", ("aa",))]
    run = RecipeRun(cfg, str(tmp_path / "work"), lexicon, PHONES)
    run.build_lang()
    labels = run.prep_labels(data)
    feats = run.compute_features(data)
    keys = sorted(feats)
    tr, cv = keys[:8], keys[8:]
    run.train(
        {k: feats[k] for k in tr}, {k: labels[k] for k in tr},
        {k: feats[k] for k in cv}, {k: labels[k] for k in cv},
        epochs_batches_repeat=10,
    )
    run.build_graph(ARPA)
    cv_feats = {k: feats[k] for k in cv}
    refs = {k: text[k] for k in cv}

    # the guard itself: both decodes on real posteriors
    ok, info = run.check_blank_skip_parity(cv_feats, sample=3)
    assert info["checked"] and len(info["checked"]) == 3
    # (parity normally holds on this easy corpus; don't assert ok — the
    # model is barely trained — just that the mechanism produces data)

    # fallback wiring: force a mismatch and capture what decode saw
    seen_cfgs = []
    orig = run.decode_lattices

    def capture(feats_, **kw):
        seen_cfgs.append(kw.get("decode_cfg"))
        return orig(feats_, **kw)

    guard_calls = []

    def fake_guard(*a, **k):
        guard_calls.append(1)
        return False, {"checked": ["x"], "mismatched": ["x"]}

    run.check_blank_skip_parity = fake_guard
    run.decode_lattices = capture
    run.score_sweep(cv_feats, refs, acwts=(0.9,))
    assert seen_cfgs and seen_cfgs[0] is not None
    assert seen_cfgs[0].blank_skip == 0.0
    assert len(guard_calls) == 1
    # verdict is cached per eval set: a second sweep must not pay the
    # double decode again, and must still use the downgraded cfg
    run.score_sweep(cv_feats, refs, acwts=(0.9,))
    assert len(guard_calls) == 1
    assert seen_cfgs[1].blank_skip == 0.0
