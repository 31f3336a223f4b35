"""Windowed-sinc resampler tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.frontend.resample import resample


@pytest.mark.parametrize("target", [8000.0, 22050.0, 11025.0])
def test_sine_fidelity(target):
    sr = 16000
    t = np.arange(sr) / sr
    w = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(w), sr, target))
    assert abs(len(y) - int(target)) <= 1
    t2 = np.arange(len(y)) / target
    ref = np.sin(2 * np.pi * 440 * t2)
    assert np.abs(y[50:-50] - ref[50:-50]).max() < 0.05


def test_identity():
    w = jnp.asarray(np.random.default_rng(0).standard_normal(100).astype(np.float32))
    y = resample(w, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(w))


def test_downsample_removes_high_freq():
    sr = 16000
    t = np.arange(sr) / sr
    hi = np.sin(2 * np.pi * 7000 * t).astype(np.float32)  # above 4k nyquist
    y = np.asarray(resample(jnp.asarray(hi), sr, 8000.0))
    assert np.std(y[100:-100]) < 0.15 * np.std(hi)
