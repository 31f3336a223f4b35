"""MFCC and spectrogram features.

Mirrors the reference's MFCC computation (reference:
src/feat/feature-mfcc.{h,cc} — MfccOptions :38-59 defaults
num_ceps=13/use_energy=true/cepstral_lifter=22; DCT matrix from
src/cpucompute/matrix-functions.cc:591-608 ComputeDctMatrix; lifter
coefficients src/feat/mel-computations.cc:248-254) and the spectrogram
features (src/feat/feature-spectrogram.{h,cc}: log power spectrum with
log-energy in column 0).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.features import (
    FbankOptions, FrameOptions, MelOptions, fbank, frame_signal,
    power_spectrum,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MfccOptions:
    frame_opts: FrameOptions = FrameOptions()
    mel_opts: MelOptions = MelOptions(num_bins=23)
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    cepstral_lifter: float = 22.0


def dct_matrix(k: int, n: int) -> np.ndarray:
    """Orthogonal DCT-II matrix [K, N] (ComputeDctMatrix)."""
    m = np.zeros((k, n), dtype=np.float64)
    m[0, :] = math.sqrt(1.0 / n)
    for i in range(1, k):
        m[i, :] = math.sqrt(2.0 / n) * np.cos(
            math.pi / n * (np.arange(n) + 0.5) * i
        )
    return m.astype(np.float32)


def lifter_coeffs(q: float, n: int) -> np.ndarray:
    """1 + Q/2 sin(pi i / Q) (ComputeLifterCoeffs)."""
    i = np.arange(n, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


def mfcc(
    wave: Array,
    opts: MfccOptions = MfccOptions(),
    *,
    vtln_warp: float = 1.0,
    dither_rng: Optional[Array] = None,
) -> Array:
    """wave [..., N] -> [..., F, num_ceps]."""
    fb_opts = FbankOptions(
        frame_opts=opts.frame_opts, mel_opts=opts.mel_opts,
        use_energy=False, use_log_fbank=True,
    )
    logmel = fbank(
        wave, fb_opts, vtln_warp=vtln_warp, dither_rng=dither_rng
    )  # [..., F, M]
    dct = jnp.asarray(dct_matrix(opts.num_ceps, opts.mel_opts.num_bins))
    feats = jnp.einsum("...fm,cm->...fc", logmel, dct)
    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(
            lifter_coeffs(opts.cepstral_lifter, opts.num_ceps)
        )
    if opts.use_energy:
        frames = frame_signal(wave, opts.frame_opts, dither_rng=dither_rng)
        energy = jnp.log(
            jnp.maximum(
                jnp.sum(jnp.square(frames), axis=-1),
                np.finfo(np.float32).tiny,
            )
        )
        if opts.energy_floor > 0.0:
            energy = jnp.maximum(energy, math.log(opts.energy_floor))
        feats = feats.at[..., 0].set(energy)
    return feats


@dataclasses.dataclass(frozen=True)
class SpectrogramOptions:
    frame_opts: FrameOptions = FrameOptions()
    energy_floor: float = 0.0
    raw_energy: bool = True


def spectrogram(
    wave: Array,
    opts: SpectrogramOptions = SpectrogramOptions(),
    *,
    dither_rng: Optional[Array] = None,
) -> Array:
    """Log power spectrum with log-energy in column 0
    (src/feat/feature-spectrogram.cc)."""
    frames = frame_signal(wave, opts.frame_opts, dither_rng=dither_rng)
    ps = power_spectrum(frames)
    energy = jnp.log(
        jnp.maximum(
            jnp.sum(jnp.square(frames), axis=-1), np.finfo(np.float32).tiny
        )
    )
    if opts.energy_floor > 0.0:
        energy = jnp.maximum(energy, math.log(opts.energy_floor))
    logps = jnp.log(jnp.maximum(ps, np.finfo(np.float32).tiny))
    return logps.at[..., 0].set(energy)
