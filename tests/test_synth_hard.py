"""Stress-v2 difficulty levers of the synthetic corpus generator."""

import numpy as np

from eesen_tpu.recipes.synth_corpus import (
    SynthConfig, _apply_channel, generate_corpus, make_phones,
)


def test_confusable_groups_share_templates():
    cfg = SynthConfig(num_phones=40, confusable_groups=10, seed=1)
    rng = np.random.default_rng(1)
    phones = make_phones(cfg, rng)
    assert len(phones) == 40
    # group members (i, i+10, ...) differ by <= ~3% in formants
    for i in range(10):
        group = [phones[j][1] for j in range(i, 40, 10)]
        base = group[0]
        for f in group[1:]:
            assert np.all(np.abs(f / base - 1.0) < 0.07)
    # distinct groups are (generically) farther apart than within-group
    within = np.mean([
        np.abs(phones[i][1] - phones[i + 10][1]).mean() for i in range(10)
    ])
    across = np.mean([
        np.abs(phones[i][1] - phones[i + 1][1]).mean() for i in range(9)
    ])
    assert within < across


def test_channel_sim_changes_spectrum_not_scale():
    rng = np.random.default_rng(2)
    wave = rng.standard_normal(16000).astype(np.float32) * 1000
    out = _apply_channel(wave, rng)
    assert out.shape == wave.shape
    assert not np.allclose(out, wave)
    # band edges attenuated relative to mid-band
    sp_in = np.abs(np.fft.rfft(wave))
    sp_out = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(wave), 1.0 / 16000)
    hi_ratio = sp_out[freqs > 7500].mean() / sp_in[freqs > 7500].mean()
    mid_ratio = (sp_out[(freqs > 500) & (freqs < 2000)].mean()
                 / sp_in[(freqs > 500) & (freqs < 2000)].mean())
    assert hi_ratio < mid_ratio
    # peak preserved (normalization keeps levels comparable)
    np.testing.assert_allclose(np.abs(out).max(), np.abs(wave).max(),
                               rtol=1e-3)


def test_generate_corpus_applies_channel_and_rate():
    lex = [("wa", ("p00", "p01")), ("wb", ("p02", "p03"))]
    cfg_a = SynthConfig(num_phones=4, num_words=2, num_speakers=2,
                        channel_sim=False, seed=3)
    cfg_b = SynthConfig(num_phones=4, num_words=2, num_speakers=2,
                        channel_sim=True, rate_range=(0.6, 1.6), seed=3)
    rng = np.random.default_rng(3)
    phones = make_phones(cfg_a, rng)
    w_a, _, _ = generate_corpus(cfg_a, 3, 0, lex, phones)
    w_b, _, _ = generate_corpus(cfg_b, 3, 0, lex, phones)
    assert len(w_a) == len(w_b) == 3
    # channel+rate changes the audio (keys/lengths may differ too since
    # the channel draws advance the shared rng)
    common = sorted(set(w_a) & set(w_b))
    changed = any(
        w_a[k].shape != w_b[k].shape or not np.allclose(w_a[k], w_b[k])
        for k in common
    )
    assert changed or set(w_a) != set(w_b)
