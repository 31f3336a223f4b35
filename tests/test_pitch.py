"""Pitch extraction tests: known-frequency tones must be tracked."""

import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.pitch import (
    PitchOptions, compute_nccf, fbank_pitch, kaldi_pitch, process_pitch,
    _lowpass_decimate,
)


def tone(freq, dur_s=0.5, sr=16000, amp=8000.0):
    t = np.arange(int(dur_s * sr)) / sr
    return (np.sin(2 * np.pi * freq * t) * amp).astype(np.float32)


def test_resample():
    w = tone(100, 0.2)
    w4, fs = _lowpass_decimate(jnp.asarray(w), PitchOptions())
    assert fs == 4000.0
    assert abs(len(w4) - len(w) // 4) <= 1
    # energy preserved for a 100 Hz tone (way below cutoff)
    r = float(jnp.std(w4)) / np.std(w)
    assert 0.8 < r < 1.2


def test_pitch_tracks_tone():
    for freq in (120.0, 220.0, 330.0):
        w = tone(freq) + np.random.default_rng(0).standard_normal(8000) * 50
        raw = np.asarray(kaldi_pitch(jnp.asarray(w)))
        f0 = raw[:, 1]
        # median tracked f0 within 10% of the truth
        assert abs(np.median(f0) - freq) < 0.1 * freq, (freq, np.median(f0))
        # strong voicing
        assert np.median(raw[:, 0]) > 0.7


def test_pitch_follows_change():
    w = np.concatenate([tone(150, 0.3), tone(300, 0.3)])
    raw = np.asarray(kaldi_pitch(jnp.asarray(w)))
    f0 = raw[:, 1]
    n = len(f0)
    assert abs(np.median(f0[: n // 3]) - 150) < 25
    assert abs(np.median(f0[-n // 3 :]) - 300) < 45


def test_process_pitch_shape_and_norm():
    w = tone(200)
    raw = kaldi_pitch(jnp.asarray(w))
    feats = np.asarray(process_pitch(raw))
    assert feats.shape[1] == 3
    # POV in [-1, 1]; normalized log pitch roughly centered
    assert np.all(feats[:, 0] >= -1.0) and np.all(feats[:, 0] <= 1.0)
    assert abs(np.average(feats[:, 1])) < 0.5


def test_fbank_pitch_dims():
    w = tone(180)
    out = np.asarray(fbank_pitch(jnp.asarray(w)))
    assert out.shape[1] == 23 + 3
