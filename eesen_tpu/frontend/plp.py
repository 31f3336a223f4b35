"""PLP features (perceptual linear prediction).

Mirrors the reference's PLP computation (reference:
src/feat/feature-plp.{h,cc} Plp::ComputeInternal:160-260;
src/feat/feature-functions.cc GetEqualLoudnessVector:347-359 /
InitIdftBases:360-377 / ComputeLpc:378-390; src/feat/mel-computations.cc
Durbin:262-297 / Lpc2Cepstrum:300-310):

  power spectrum -> mel filterbank -> equal-loudness weighting ->
  cube-root compression -> IDFT to autocorrelation -> Durbin LPC ->
  LPC-to-cepstrum -> liftering, C0 = residual log-energy.

All frames are processed batched; the Durbin recursion unrolls over the
(static) LPC order with vectorized frame math.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.frontend.features import (
    FbankOptions, FrameOptions, MelOptions, frame_signal, mel_banks,
    power_spectrum,
)
from eesen_tpu.frontend.mfcc import lifter_coeffs

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PlpOptions:
    frame_opts: FrameOptions = FrameOptions()
    mel_opts: MelOptions = MelOptions(num_bins=23)
    lpc_order: int = 12
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    compress_factor: float = 1.0 / 3.0
    cepstral_lifter: float = 22.0
    cepstral_scale: float = 1.0


def equal_loudness(mel_opts: MelOptions, frame_opts: FrameOptions) -> np.ndarray:
    """Equal-loudness weighting at the mel-bin center frequencies."""
    # recompute center freqs the same way mel_banks does
    nyquist = 0.5 * frame_opts.samp_freq
    high = (
        mel_opts.high_freq if mel_opts.high_freq > 0.0
        else nyquist + mel_opts.high_freq
    )
    mel_low = 1127.0 * np.log(1.0 + mel_opts.low_freq / 700.0)
    mel_high = 1127.0 * np.log(1.0 + high / 700.0)
    delta = (mel_high - mel_low) / (mel_opts.num_bins + 1)
    centers_mel = mel_low + (np.arange(mel_opts.num_bins) + 1) * delta
    f0 = 700.0 * (np.exp(centers_mel / 1127.0) - 1.0)
    fsq = f0 * f0
    fsub = fsq / (fsq + 1.6e5)
    return (fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))).astype(np.float32)


def idft_bases(n_bases: int, dimension: int) -> np.ndarray:
    angle = math.pi / (dimension - 1)
    scale = 1.0 / (2.0 * (dimension - 1))
    m = np.zeros((n_bases, dimension))
    for i in range(n_bases):
        m[i, 0] = scale
        for j in range(1, dimension - 1):
            m[i, j] = 2.0 * scale * math.cos(angle * i * j)
        m[i, dimension - 1] = scale * math.cos(angle * i * (dimension - 1))
    return m.astype(np.float32)


def _durbin_batch(ac: Array, n: int) -> tuple:
    """Vectorized Durbin recursion. ac: [..., n+1] -> (lpc [..., n],
    residual energy [...])."""
    shape = ac.shape[:-1]
    lp = [jnp.zeros(shape, ac.dtype) for _ in range(n)]
    e = ac[..., 0]
    for i in range(n):
        ki = ac[..., i + 1]
        for j in range(i):
            ki = ki + lp[j] * ac[..., i - j]
        ki = ki / e
        c = jnp.maximum(1.0 - ki * ki, 1e-5)
        e = e * c
        new_lp = list(lp)
        new_lp[i] = -ki
        for j in range(i):
            new_lp[j] = lp[j] - ki * lp[i - j - 1]
        lp = new_lp
    return jnp.stack(lp, axis=-1), e


def _lpc_to_cepstrum(lpc: Array, n: int) -> Array:
    """[..., n] LPC -> [..., n] cepstra (Lpc2Cepstrum)."""
    ceps = []
    for i in range(n):
        s = jnp.zeros(lpc.shape[:-1], lpc.dtype)
        for j in range(i):
            s = s + (i - j) * lpc[..., j] * ceps[i - j - 1]
        ceps.append(-lpc[..., i] - s / (i + 1))
    return jnp.stack(ceps, axis=-1)


def plp(
    wave: Array,
    opts: PlpOptions = PlpOptions(),
    *,
    vtln_warp: float = 1.0,
    dither_rng: Optional[Array] = None,
) -> Array:
    """wave [..., N] -> [..., F, num_ceps]."""
    assert opts.num_ceps <= opts.lpc_order + 1
    frames = frame_signal(wave, opts.frame_opts, dither_rng=dither_rng)
    ps = power_spectrum(frames)
    mel = jnp.asarray(mel_banks(opts.mel_opts, opts.frame_opts, vtln_warp))
    mel_e = jnp.einsum("...fk,mk->...fm", ps, mel)
    mel_e = mel_e * jnp.asarray(equal_loudness(opts.mel_opts, opts.frame_opts))
    mel_e = jnp.power(jnp.maximum(mel_e, 1e-20), opts.compress_factor)
    # duplicate first and last bins
    dup = jnp.concatenate(
        [mel_e[..., :1], mel_e, mel_e[..., -1:]], axis=-1
    )
    bases = jnp.asarray(
        idft_bases(opts.lpc_order + 1, opts.mel_opts.num_bins + 2)
    )
    autocorr = jnp.einsum("...fm,cm->...fc", dup, bases)
    lpc, resid = _durbin_batch(autocorr, opts.lpc_order)
    c0 = -jnp.log(1.0 / jnp.maximum(resid, np.finfo(np.float32).tiny))
    raw = _lpc_to_cepstrum(lpc, opts.lpc_order)
    feats = jnp.concatenate(
        [c0[..., None], raw[..., : opts.num_ceps - 1]], axis=-1
    )
    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(
            lifter_coeffs(opts.cepstral_lifter, opts.num_ceps)
        )
    if opts.cepstral_scale != 1.0:
        feats = feats * opts.cepstral_scale
    if opts.use_energy:
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
