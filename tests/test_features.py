"""Frontend tests: framing, windows, mel banks, fbank, CMVN, deltas, splice.

Validated against a straight-line numpy transcription of the Kaldi
definitions (the reference validates features against MATLAB/HTK golden
dumps — feat/feature-fbank-test.cc:32-62; our oracle plays that role)."""

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.features import (
    FbankOptions, FrameOptions, MelOptions,
    apply_cmvn, cmvn_stats, compute_deltas, delta_filters, fbank,
    feature_window, frame_signal, mel_banks, num_frames, splice_frames,
    subsample_frames,
)


def nodither_opts(**kw):
    return FrameOptions(dither=0.0, **kw)


def numpy_fbank_oracle(wave, frame_opts, mel_opts):
    """Direct numpy transcription of Kaldi fbank (dither off)."""
    ws, shift = frame_opts.window_size, frame_opts.window_shift
    nfft = frame_opts.padded_window_size
    n_frames = 1 + (len(wave) - ws) // shift
    win = feature_window(frame_opts).astype(np.float64)
    mel = mel_banks(mel_opts, frame_opts).astype(np.float64)
    out = np.zeros((n_frames, mel_opts.num_bins))
    for f in range(n_frames):
        x = wave[f * shift : f * shift + ws].astype(np.float64).copy()
        x -= x.mean()                                   # remove_dc_offset
        pre = np.concatenate([[x[0]], x[:-1]])          # preemph edge rule
        x = x - frame_opts.preemph_coeff * pre
        x *= win
        spec = np.fft.rfft(x, nfft)
        ps = np.abs(spec) ** 2
        m = mel @ ps
        out[f] = np.log(np.maximum(m, np.finfo(np.float32).tiny))
    return out


def test_num_frames():
    opts = nodither_opts()
    assert opts.window_size == 400 and opts.window_shift == 160
    assert opts.padded_window_size == 512
    assert num_frames(400, opts) == 1
    assert num_frames(399, opts) == 0
    assert num_frames(560, opts) == 2
    assert num_frames(16000, opts) == 98


def test_povey_window_endpoints():
    w = feature_window(nodither_opts())
    assert abs(w[0]) < 1e-6 and abs(w[-1]) < 1e-6
    assert w.max() <= 1.0 + 1e-6


def test_mel_banks_partition():
    """Interior FFT bins should be covered; each row sums > 0."""
    fo, mo = nodither_opts(), MelOptions(num_bins=23)
    m = mel_banks(mo, fo)
    assert m.shape == (23, 257)
    assert np.all(m >= 0.0)
    assert np.all(m.sum(axis=1) > 0)
    assert np.all(m[:, -1] == 0.0)  # nyquist bin untouched


def test_fbank_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(4000) * 1000).astype(np.float32)
    fo = nodither_opts()
    mo = MelOptions(num_bins=23)
    opts = FbankOptions(frame_opts=fo, mel_opts=mo)
    got = np.asarray(jax.jit(lambda w: fbank(w, opts))(jnp.asarray(wave)))
    want = numpy_fbank_oracle(wave, fo, mo)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_batched():
    rng = np.random.default_rng(1)
    waves = (rng.standard_normal((3, 3200)) * 500).astype(np.float32)
    opts = FbankOptions(frame_opts=nodither_opts(), mel_opts=MelOptions(40))
    got = np.asarray(fbank(jnp.asarray(waves), opts))
    assert got.shape == (3, num_frames(3200, opts.frame_opts), 40)
    single = np.asarray(fbank(jnp.asarray(waves[1]), opts))
    np.testing.assert_allclose(got[1], single, rtol=1e-5, atol=1e-5)


def test_vtln_identity_and_warp():
    fo, mo = nodither_opts(), MelOptions(num_bins=20)
    m1 = mel_banks(mo, fo, vtln_warp=1.0)
    m2 = mel_banks(mo, fo, vtln_warp=1.1)
    assert not np.allclose(m1, m2)
    assert np.all(m2.sum(axis=1) > 0)


def test_delta_filters_match_kaldi():
    f = delta_filters(order=2, window=2)
    # first-order: [-2,-1,0,1,2]/10
    np.testing.assert_allclose(f[1], np.array([-2, -1, 0, 1, 2]) / 10.0,
                               rtol=1e-6)
    assert len(f[2]) == 9


def test_compute_deltas_edge_replication():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((7, 3)).astype(np.float32)
    d = np.asarray(compute_deltas(jnp.asarray(x), order=2, window=2))
    assert d.shape == (7, 9)
    np.testing.assert_allclose(d[:, :3], x, rtol=1e-6)
    # manual first-order delta at t=0 with edge replication
    k = np.array([-2, -1, 0, 1, 2]) / 10.0
    frames = [x[0], x[0], x[0], x[1], x[2]]
    want = sum(c * fr for c, fr in zip(k, frames))
    np.testing.assert_allclose(d[0, 3:6], want, rtol=1e-5, atol=1e-6)


def test_splice_and_subsample():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    s = np.asarray(splice_frames(x, 1, 1))
    assert s.shape == (6, 6)
    np.testing.assert_array_equal(s[0, :2], s[0, 2:4])  # left edge replicated
    np.testing.assert_array_equal(s[2, :2], np.asarray(x[1]))
    sub = np.asarray(subsample_frames(x, 3, offset=1))
    np.testing.assert_array_equal(sub[:, 0], [2, 8])


def test_cmvn_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((50, 13)).astype(np.float32) * 3 + 5)
    stats = cmvn_stats(x)
    assert stats.shape == (2, 14)
    y = np.asarray(apply_cmvn(x, stats, norm_vars=True))
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-2)
    y2 = np.asarray(apply_cmvn(x, stats, norm_vars=False))
    np.testing.assert_allclose(y2.mean(axis=0), 0.0, atol=1e-4)


def test_host_numpy_path_matches_device_path():
    """The pipeline ops dispatch to numpy for host inputs (per-utterance
    recipe calls must not pay a device round-trip each); both paths must
    agree."""
    from eesen_tpu.frontend.features import _xp

    rng = np.random.default_rng(9)
    x = rng.standard_normal((40, 13)).astype(np.float32)
    assert _xp(x) is np and _xp(jnp.asarray(x)) is jnp

    for fn, args in [
        (compute_deltas, (2, 2)),
        (splice_frames, (2, 1)),
        (subsample_frames, (3, 1)),
    ]:
        host = fn(x, *args)
        dev = fn(jnp.asarray(x), *args)
        assert isinstance(host, np.ndarray)
        np.testing.assert_allclose(host, np.asarray(dev), rtol=1e-6)

    st_h = cmvn_stats(x)
    st_d = cmvn_stats(jnp.asarray(x))
    assert isinstance(st_h, np.ndarray)
    np.testing.assert_allclose(st_h, np.asarray(st_d), rtol=1e-5)
    for nv in (True, False):
        h = apply_cmvn(x, st_h, norm_vars=nv)
        d = apply_cmvn(jnp.asarray(x), st_d, norm_vars=nv)
        assert isinstance(h, np.ndarray)
        np.testing.assert_allclose(h, np.asarray(d), rtol=1e-4, atol=1e-5)


class TestShiftedDeltas:
    """SDC (reference: feature-functions.cc:269-341, feature-sdc-test.cc)."""

    def _oracle(self, x, window, num_blocks, block_shift):
        """Frame-by-frame transcription of ShiftedDeltaFeatures::Process."""
        t, d = x.shape
        norm = sum(j * j for j in range(-window, window + 1))
        out = np.zeros((t, d * (num_blocks + 1)), np.float32)
        out[:, :d] = x
        for f in range(t):
            for i in range(num_blocks):
                blk = np.zeros(d, np.float32)
                for j in range(-window, window + 1):
                    src = min(max(f + j + i * block_shift, 0), t - 1)
                    blk += (j / norm) * x[src]
                out[f, (i + 1) * d:(i + 2) * d] = blk
        return out

    def test_matches_oracle_default_config(self):
        from eesen_tpu.frontend.features import compute_shifted_deltas
        rng = np.random.default_rng(3)
        x = rng.standard_normal((25, 7)).astype(np.float32)
        got = compute_shifted_deltas(x)  # window=1, num_blocks=7, shift=3
        assert got.shape == (25, 7 * 8)
        np.testing.assert_allclose(got, self._oracle(x, 1, 7, 3), rtol=1e-5,
                                   atol=1e-6)

    def test_matches_oracle_nondefault(self):
        from eesen_tpu.frontend.features import compute_shifted_deltas
        rng = np.random.default_rng(4)
        x = rng.standard_normal((12, 3)).astype(np.float32)
        got = compute_shifted_deltas(x, window=2, num_blocks=4, block_shift=2)
        np.testing.assert_allclose(got, self._oracle(x, 2, 4, 2), rtol=1e-5,
                                   atol=1e-6)

    def test_block0_is_first_order_delta(self):
        """Block 0 (shift 0) must equal the plain first-order delta with the
        same half-window (DeltaFeatures with order=1)."""
        from eesen_tpu.frontend.features import compute_shifted_deltas
        rng = np.random.default_rng(5)
        x = rng.standard_normal((30, 5)).astype(np.float32)
        sdc = compute_shifted_deltas(x, window=2, num_blocks=1)
        plain = compute_deltas(x, order=1, window=2)
        np.testing.assert_allclose(sdc[:, 5:10], plain[:, 5:10], rtol=1e-5,
                                   atol=1e-6)

    def test_device_path_matches_host(self):
        from eesen_tpu.frontend.features import compute_shifted_deltas
        rng = np.random.default_rng(6)
        x = rng.standard_normal((16, 4)).astype(np.float32)
        host = compute_shifted_deltas(x)
        dev = compute_shifted_deltas(jnp.asarray(x))
        assert isinstance(host, np.ndarray)
        np.testing.assert_allclose(host, np.asarray(dev), rtol=1e-5,
                                   atol=1e-6)
