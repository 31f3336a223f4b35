"""MFCC/spectrogram, feature pipeline, CE loss, and CLI tool tests."""

import os
import struct
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.features import (
    FbankOptions, FrameOptions, MelOptions, fbank,
)
from eesen_tpu.frontend.mfcc import (
    MfccOptions, SpectrogramOptions, dct_matrix, lifter_coeffs, mfcc,
    spectrogram,
)
from eesen_tpu.frontend.pipeline import (
    FeaturePipeline, FeaturePipelineConfig, speaker_cmvn_stats,
)
from eesen_tpu.ops.ce import ce_loss


def nodither():
    return FrameOptions(dither=0.0)


def test_dct_matrix_orthogonal():
    m = dct_matrix(23, 23)
    np.testing.assert_allclose(m @ m.T, np.eye(23), atol=1e-5)


def test_lifter_coeffs():
    c = lifter_coeffs(22.0, 13)
    assert c[0] == 1.0
    assert np.all(c[1:] > 1.0)


def test_mfcc_matches_manual():
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(4000) * 1000).astype(np.float32)
    opts = MfccOptions(
        frame_opts=nodither(), mel_opts=MelOptions(num_bins=23),
        use_energy=False,
    )
    got = np.asarray(mfcc(jnp.asarray(wave), opts))
    logmel = np.asarray(
        fbank(
            jnp.asarray(wave),
            FbankOptions(frame_opts=nodither(), mel_opts=MelOptions(23)),
        )
    )
    want = logmel @ dct_matrix(13, 23).T * lifter_coeffs(22.0, 13)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mfcc_energy_column():
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(2000) * 500).astype(np.float32)
    opts = MfccOptions(frame_opts=nodither(), use_energy=True)
    got = np.asarray(mfcc(jnp.asarray(wave), opts))
    assert got.shape[1] == 13
    # column 0 is a log energy, so it should differ from C0 of no-energy
    noc0 = np.asarray(
        mfcc(jnp.asarray(wave),
             MfccOptions(frame_opts=nodither(), use_energy=False))
    )
    assert not np.allclose(got[:, 0], noc0[:, 0])
    np.testing.assert_allclose(got[:, 1:], noc0[:, 1:], rtol=1e-5)


def test_spectrogram_shape():
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal(2000) * 500).astype(np.float32)
    got = np.asarray(
        spectrogram(jnp.asarray(wave),
                    SpectrogramOptions(frame_opts=nodither()))
    )
    assert got.shape[1] == 257


def test_feature_pipeline():
    rng = np.random.default_rng(3)
    feats = {
        "u1": rng.standard_normal((20, 8)).astype(np.float32),
        "u2": rng.standard_normal((30, 8)).astype(np.float32) + 2.0,
    }
    utt2spk = {"u1": "s1", "u2": "s1"}
    stats = speaker_cmvn_stats(feats, utt2spk)
    assert set(stats) == {"s1"}
    cfg = FeaturePipelineConfig(
        splice_left=1, splice_right=1, subsample_n=3, delta_order=2,
    )
    pipe = FeaturePipeline(cfg, stats, utt2spk)
    out = pipe("u1", feats["u1"])
    assert out.shape == (7, pipe.output_dim(8))
    assert pipe.output_dim(8) == 8 * 3 * 3
    copies = pipe.subsampled_copies("u1", feats["u1"])
    assert len(copies) == 3
    assert copies[1].shape[0] == 7  # offsets 0..2 of 20 frames


def test_ce_loss():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 10, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 10)).astype(np.int32))
    lengths = jnp.asarray([10, 6])
    loss, metrics = ce_loss(logits, lengths, labels)
    assert np.isfinite(float(loss))
    assert int(metrics["frames"]) == 16
    # grad check vs masked manual
    def f(x):
        return ce_loss(x, lengths, labels)[0]
    g = np.asarray(jax.grad(f)(logits))
    assert np.all(g[1, 6:, :] == 0.0)
    assert np.any(g[0] != 0.0)


def test_cli_feature_chain(tmp_path):
    """compute-fbank-feats -> compute-cmvn-stats -> apply-cmvn ->
    add-deltas through the CLI, as the recipes pipe them."""
    from eesen_tpu.io.kaldi_io import read_ark, write_ark
    from eesen_tpu.tools.cli import main

    rng = np.random.default_rng(5)
    wave = (
        np.sin(np.arange(8000) * 0.05) * 5000
        + rng.standard_normal(8000) * 500
    ).astype(np.float32)
    wav_ark = str(tmp_path / "wav.ark")
    write_ark(wav_ark, [("u1", wave[None, :])])

    fb_ark = str(tmp_path / "fbank.ark")
    rc = main([
        "compute-fbank-feats", "--dither", "0", "--num-mel-bins", "40",
        f"ark:{wav_ark}", f"ark:{fb_ark}",
    ])
    assert rc == 0
    (k, fb), = list(read_ark(fb_ark))
    assert k == "u1" and fb.shape[1] == 40

    st_ark = str(tmp_path / "cmvn.ark")
    assert main(["compute-cmvn-stats", f"ark:{fb_ark}", f"ark:{st_ark}"]) == 0

    norm_ark = str(tmp_path / "norm.ark")
    assert main([
        "apply-cmvn", f"ark:{st_ark}", f"ark:{fb_ark}", f"ark:{norm_ark}",
    ]) == 0
    (_, normed), = list(read_ark(norm_ark))
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-3)

    d_ark = str(tmp_path / "delta.ark")
    assert main(["add-deltas", f"ark:{norm_ark}", f"ark:{d_ark}"]) == 0
    (_, d), = list(read_ark(d_ark))
    assert d.shape[1] == 120


def test_cli_compute_wer(tmp_path, capsys):
    from eesen_tpu.tools.cli import main

    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 a b c\nu2 d e\n")
    hyp.write_text("u1 a b d\nu2 d e\n")
    assert main(["compute-wer", str(ref), str(hyp)]) == 0
    out = capsys.readouterr().out
    assert "%WER 20.00" in out  # 1 error / 5 ref tokens
