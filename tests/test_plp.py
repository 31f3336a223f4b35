"""PLP feature tests: Durbin/LPC oracles and end-to-end sanity."""

import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.features import FrameOptions, MelOptions
from eesen_tpu.frontend.plp import (
    PlpOptions, _durbin_batch, _lpc_to_cepstrum, equal_loudness,
    idft_bases, plp,
)


def numpy_durbin(ac):
    """Scalar transcription of the reference's Durbin recursion."""
    n = len(ac) - 1
    lp = np.zeros(n)
    e = ac[0]
    for i in range(n):
        ki = ac[i + 1]
        for j in range(i):
            ki += lp[j] * ac[i - j]
        ki /= e
        c = max(1 - ki * ki, 1e-5)
        e *= c
        tmp = lp.copy()
        tmp[i] = -ki
        for j in range(i):
            tmp[j] = lp[j] - ki * lp[i - j - 1]
        lp = tmp
    return lp, e


def test_durbin_matches_oracle():
    rng = np.random.default_rng(0)
    # autocorrelation of a real AR signal (positive definite)
    x = rng.standard_normal(2000)
    for i in range(2, len(x)):
        x[i] += 0.6 * x[i - 1] - 0.3 * x[i - 2]
    ac = np.array([np.dot(x[: len(x) - k], x[k:]) for k in range(13)])
    want_lp, want_e = numpy_durbin(ac)
    got_lp, got_e = _durbin_batch(jnp.asarray(ac[None], jnp.float32), 12)
    np.testing.assert_allclose(np.asarray(got_lp)[0], want_lp, rtol=1e-3)
    np.testing.assert_allclose(float(got_e[0]), want_e, rtol=1e-3)


def test_lpc_to_cepstrum_oracle():
    rng = np.random.default_rng(1)
    lpc = rng.standard_normal(12) * 0.1
    ceps = np.zeros(12)
    for i in range(12):
        s = sum((i - j) * lpc[j] * ceps[i - j - 1] for j in range(i))
        ceps[i] = -lpc[i] - s / (i + 1)
    got = np.asarray(_lpc_to_cepstrum(jnp.asarray(lpc[None], jnp.float32), 12))
    np.testing.assert_allclose(got[0], ceps, rtol=1e-4, atol=1e-6)


def test_equal_loudness_shape():
    el = equal_loudness(MelOptions(23), FrameOptions())
    assert el.shape == (23,)
    assert np.all(el > 0) and np.all(el <= 1.5)
    # rises from low freq, roughly flat in mid band
    assert el[0] < el[10]


def test_idft_bases():
    m = idft_bases(13, 25)
    assert m.shape == (13, 25)
    np.testing.assert_allclose(m[0, 1:-1], 2.0 / 48.0, rtol=1e-6)


def test_plp_end_to_end():
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal(4000) * 1000).astype(np.float32)
    opts = PlpOptions(frame_opts=FrameOptions(dither=0.0))
    feats = np.asarray(plp(jnp.asarray(wave), opts))
    assert feats.shape[1] == 13
    assert np.all(np.isfinite(feats))
    # deterministic
    feats2 = np.asarray(plp(jnp.asarray(wave), opts))
    np.testing.assert_array_equal(feats, feats2)
    # energy column monotone with scaling of the input
    feats_loud = np.asarray(plp(jnp.asarray(wave * 4), opts))
    assert feats_loud[:, 0].mean() > feats[:, 0].mean()
