"""Feature frontend: fbank/spectrogram + CMVN + deltas/splice/subsample.

Re-implements the semantics of the reference feature pipeline
(reference: src/feat/feature-functions.{h,cc} FrameExtractionOptions
:73-148 / ExtractWindow :91-163 / ComputePowerSpectrum :173 /
DeltaFeatures :192+ / SpliceFrames; src/feat/mel-computations.cc MelBanks;
src/feat/feature-fbank.cc Fbank::ComputeInternal; src/feat/cmvn.cc)
as batched, jittable XLA code:

- The reference computes one frame at a time on the CPU; here the whole
  utterance (or batch of utterances) is framed with one gather and pushed
  through an rFFT + a single [F, N_fft] x [N_fft, n_mels] matmul (MXU).
- Mel filterbank weights, window functions, and delta filters are computed
  once host-side in numpy (they are tiny constants) and baked into the
  jitted computation.
- Defaults match Kaldi: 25ms/10ms povey window, preemphasis 0.97,
  remove_dc_offset, round-to-power-of-two FFT, snip_edges, dither 1.0
  (dither uses JAX PRNG instead of Kaldi's RNG — same distribution,
  different stream; recipes validated with dither both on and off).

The recipes' 40-dim fbank + Δ + ΔΔ = 120-dim input
(asr_egs/wsj/conf/fbank.conf --num-mel-bins=40,
 steps/train_ctc_parallel.sh:95-111) is `fbank` + `compute_deltas`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------
# options
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FrameOptions:
    """reference: src/feat/feature-functions.h:73-148."""
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    dither: float = 1.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"     # povey | hamming | hanning | rectangular
    round_to_power_of_two: bool = True
    snip_edges: bool = True

    @property
    def window_shift(self) -> int:
        return int(self.samp_freq * 0.001 * self.frame_shift_ms)

    @property
    def window_size(self) -> int:
        return int(self.samp_freq * 0.001 * self.frame_length_ms)

    @property
    def padded_window_size(self) -> int:
        if self.round_to_power_of_two:
            return 1 << (self.window_size - 1).bit_length()
        return self.window_size


@dataclasses.dataclass(frozen=True)
class MelOptions:
    """reference: src/feat/mel-computations.h MelBanksOptions."""
    num_bins: int = 23             # recipes use 40 (conf/fbank.conf)
    low_freq: float = 20.0
    high_freq: float = 0.0         # <= 0: offset from Nyquist
    vtln_low: float = 100.0
    vtln_high: float = -500.0


@dataclasses.dataclass(frozen=True)
class FbankOptions:
    frame_opts: FrameOptions = FrameOptions()
    mel_opts: MelOptions = MelOptions()
    use_energy: bool = False
    energy_floor: float = 0.0
    raw_energy: bool = True
    use_log_fbank: bool = True


# --------------------------------------------------------------------------
# host-side constant builders (numpy)
# --------------------------------------------------------------------------

def feature_window(opts: FrameOptions) -> np.ndarray:
    """Window function (reference: feature-functions.cc
    FeatureWindowFunction)."""
    n = opts.window_size
    i = np.arange(n, dtype=np.float64)
    a = 2 * np.pi * i / (n - 1)
    if opts.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a)
    elif opts.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a)
    elif opts.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a)) ** 0.85
    elif opts.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"invalid window type {opts.window_type}")
    return w.astype(np.float32)


def povey_window(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return ((0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))) ** 0.85).astype(
        np.float32
    )


def _mel_scale(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def _inverse_mel_scale(m):
    return 700.0 * (np.exp(m / 1127.0) - 1.0)


def _vtln_warp_freq(
    vtln_low: float, vtln_high: float, low_freq: float, high_freq: float,
    warp: float, freq: np.ndarray,
) -> np.ndarray:
    """Piecewise-linear VTLN warp (reference: mel-computations.cc
    VtlnWarpFreq)."""
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    scale = 1.0 / warp
    fl, fh = scale * l, scale * h
    scale_left = (fl - low_freq) / (l - low_freq)
    scale_right = (high_freq - fh) / (high_freq - h)
    out = np.where(
        freq < l,
        low_freq + scale_left * (freq - low_freq),
        np.where(freq < h, scale * freq, high_freq + scale_right * (freq - high_freq)),
    )
    return np.where((freq < low_freq) | (freq > high_freq), freq, out)


def _vtln_warp_mel(vtln_low, vtln_high, low_freq, high_freq, warp, mel):
    return _mel_scale(
        _vtln_warp_freq(
            vtln_low, vtln_high, low_freq, high_freq, warp,
            _inverse_mel_scale(mel),
        )
    )


def mel_banks(
    mel_opts: MelOptions,
    frame_opts: FrameOptions,
    vtln_warp: float = 1.0,
) -> np.ndarray:
    """Triangular mel filterbank matrix [num_bins, n_fft//2 + 1].

    reference: src/feat/mel-computations.cc MelBanks::MelBanks — identical
    bin placement (divide by num_bins+1, per-FFT-bin mel weights), with the
    Nyquist bin zero (the reference's bins never cover it either).
    """
    num_bins = mel_opts.num_bins
    nfft = frame_opts.padded_window_size
    num_fft_bins = nfft // 2
    nyquist = 0.5 * frame_opts.samp_freq
    low_freq = mel_opts.low_freq
    high_freq = (
        mel_opts.high_freq if mel_opts.high_freq > 0.0
        else nyquist + mel_opts.high_freq
    )
    vtln_high = mel_opts.vtln_high
    if vtln_high < 0.0:
        vtln_high += nyquist

    fft_bin_width = frame_opts.samp_freq / nfft
    mel_low = _mel_scale(low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mels = _mel_scale(freqs)  # [num_fft_bins]

    bins = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float32)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        if vtln_warp != 1.0:
            left = _vtln_warp_mel(
                mel_opts.vtln_low, vtln_high, low_freq, high_freq, vtln_warp,
                np.float64(left))
            center = _vtln_warp_mel(
                mel_opts.vtln_low, vtln_high, low_freq, high_freq, vtln_warp,
                np.float64(center))
            right = _vtln_warp_mel(
                mel_opts.vtln_low, vtln_high, low_freq, high_freq, vtln_warp,
                np.float64(right))
        up = (mels - left) / (center - left)
        down = (right - mels) / (right - center)
        w = np.where(mels <= center, up, down)
        w = np.where((mels > left) & (mels < right), w, 0.0)
        bins[b, :num_fft_bins] = w
    return bins


def delta_filters(order: int = 2, window: int = 2) -> list:
    """Delta regression filters (reference: feature-functions.cc
    DeltaFeatures::DeltaFeatures). Returns [order+1] numpy 1-D kernels."""
    scales = [np.array([1.0], dtype=np.float64)]
    for _ in range(order):
        prev = scales[-1]
        prev_offset = (len(prev) - 1) // 2
        cur = np.zeros(len(prev) + 2 * window, dtype=np.float64)
        cur_offset = prev_offset + window
        normalizer = 0.0
        for j in range(-window, window + 1):
            normalizer += j * j
            for k in range(-prev_offset, prev_offset + 1):
                cur[j + k + cur_offset] += j * prev[k + prev_offset]
        scales.append(cur / normalizer)
    return [s.astype(np.float32) for s in scales]


# --------------------------------------------------------------------------
# jittable feature computation
# --------------------------------------------------------------------------

def num_frames(wave_len: int, opts: FrameOptions) -> int:
    """Frame count for snip_edges framing (reference:
    feature-functions.cc NumFrames)."""
    ws, shift = opts.window_size, opts.window_shift
    if opts.snip_edges:
        if wave_len < ws:
            return 0
        return 1 + (wave_len - ws) // shift
    return (wave_len + shift // 2) // shift


def frame_signal(
    wave: Array,
    opts: FrameOptions,
    *,
    dither_rng: Optional[Array] = None,
) -> Array:
    """wave [..., N] -> windowed, padded frames [..., F, n_fft].

    Applies, in the reference's order (feature-functions.cc:148-163):
    dither -> remove DC offset -> preemphasis -> window function, then
    zero-pads to the power-of-two FFT size.
    """
    ws, shift = opts.window_size, opts.window_shift
    nfft = opts.padded_window_size
    n = wave.shape[-1]
    f = num_frames(n, opts)
    if f <= 0:
        raise ValueError(f"waveform too short: {n} < {ws}")
    starts = np.arange(f) * shift
    idx = starts[:, None] + np.arange(ws)[None, :]        # [F, ws]
    frames = wave[..., idx]                               # [..., F, ws]

    if opts.dither != 0.0 and dither_rng is not None:
        frames = frames + opts.dither * jax.random.normal(
            dither_rng, frames.shape, frames.dtype
        )
    if opts.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if opts.preemph_coeff != 0.0:
        c = opts.preemph_coeff
        prev = jnp.concatenate(
            [frames[..., :1], frames[..., :-1]], axis=-1
        )  # x[-1] := x[0] (reference Preemphasize edge rule)
        frames = frames - c * prev
    win = jnp.asarray(feature_window(opts))
    frames = frames * win
    pad = [(0, 0)] * (frames.ndim - 1) + [(0, nfft - ws)]
    return jnp.pad(frames, pad)


def power_spectrum(frames: Array) -> Array:
    """[..., n_fft] real frames -> [..., n_fft//2+1] power spectrum."""
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.square(spec.real) + jnp.square(spec.imag)


def fbank(
    wave: Array,
    opts: FbankOptions = FbankOptions(),
    *,
    vtln_warp: float = 1.0,
    dither_rng: Optional[Array] = None,
) -> Array:
    """wave [..., N] (float, Kaldi convention: int16 range) -> log-mel
    features [..., F, num_bins(+1 energy)]."""
    frames = frame_signal(wave, opts.frame_opts, dither_rng=dither_rng)
    ps = power_spectrum(frames)
    mel = jnp.asarray(mel_banks(opts.mel_opts, opts.frame_opts, vtln_warp))
    feats = jnp.einsum("...fk,mk->...fm", ps, mel)
    if opts.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, np.finfo(np.float32).tiny))
    if opts.use_energy:
        # energy after windowing (raw_energy would require the pre-window
        # signal; computed from the processed frames as in !raw_energy mode)
        energy = jnp.log(
            jnp.maximum(
                jnp.sum(jnp.square(frames), axis=-1),
                np.finfo(np.float32).tiny,
            )
        )
        if opts.energy_floor > 0.0:
            energy = jnp.maximum(energy, math.log(opts.energy_floor))
        feats = jnp.concatenate([energy[..., None], feats], axis=-1)
    return feats


def _xp(*arrays):
    """numpy for host inputs, jnp for device arrays/tracers — the
    per-utterance pipeline calls (recipes, CLI tools) stay on host (each
    un-jitted device op costs a tunnel round-trip at corpus scale) while
    in-jit callers keep tracing through jnp."""
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def compute_deltas(feats: Array, order: int = 2, window: int = 2) -> Array:
    """[..., T, D] -> [..., T, D*(order+1)]; edge frames replicated
    (reference: feature-functions.cc DeltaFeatures::Process)."""
    xp = _xp(feats)
    filters = delta_filters(order, window)
    outs = [feats]
    t = feats.shape[-2]
    for k in range(1, order + 1):
        kern = filters[k]
        off = (len(kern) - 1) // 2
        acc = xp.zeros_like(feats)
        for j in range(-off, off + 1):
            scale = float(kern[j + off])
            if scale == 0.0:
                continue
            src = np.clip(np.arange(t) + j, 0, t - 1)
            acc = acc + scale * feats[..., src, :]
        outs.append(acc)
    return xp.concatenate(outs, axis=-1)


def compute_shifted_deltas(
    feats: Array, window: int = 1, num_blocks: int = 7, block_shift: int = 3
) -> Array:
    """Shifted delta cepstra: [..., T, D] -> [..., T, D*(num_blocks+1)].

    Output frame = [x(t), d(t), d(t+P), d(t+2P), ...] where d is the
    first-order delta with the given half-window and P = block_shift;
    out-of-range source frames are clamped to the edges (reference:
    src/feat/feature-functions.cc:269-314 ShiftedDeltaFeatures /
    ComputeShiftedDeltas; a language-ID feature, off the CTC recipe path).
    """
    xp = _xp(feats)
    # First-order delta scale window: j / sum(j^2), j in [-window, window].
    normalizer = float(sum(j * j for j in range(-window, window + 1)))
    t = feats.shape[-2]
    outs = [feats]
    for i in range(num_blocks):
        acc = xp.zeros_like(feats)
        for j in range(-window, window + 1):
            scale = j / normalizer
            if scale == 0.0:
                continue
            src = np.clip(np.arange(t) + j + i * block_shift, 0, t - 1)
            acc = acc + scale * feats[..., src, :]
        outs.append(acc)
    return xp.concatenate(outs, axis=-1)


def splice_frames(feats: Array, left: int, right: int) -> Array:
    """[..., T, D] -> [..., T, D*(left+1+right)], edges replicated
    (reference: feature-functions.cc SpliceFrames)."""
    xp = _xp(feats)
    t = feats.shape[-2]
    outs = []
    for j in range(-left, right + 1):
        src = np.clip(np.arange(t) + j, 0, t - 1)
        outs.append(feats[..., src, :])
    return xp.concatenate(outs, axis=-1)


def subsample_frames(feats: Array, n: int, offset: int = 0) -> Array:
    """Every n-th frame starting at `offset` (reference:
    src/featbin/subsample-feats.cc — the 30ms frame-rate trick)."""
    return feats[..., offset::n, :]


# --------------------------------------------------------------------------
# CMVN (reference: src/feat/cmvn.{h,cc})
# --------------------------------------------------------------------------

def cmvn_stats(feats: Array, weights: Optional[Array] = None) -> Array:
    """Accumulate stats [2, D+1]: row 0 = sum + count, row 1 = sumsq + 0."""
    xp = _xp(feats, weights)
    if weights is None:
        s = xp.sum(feats, axis=tuple(range(feats.ndim - 1)))
        sq = xp.sum(xp.square(feats), axis=tuple(range(feats.ndim - 1)))
        count = xp.asarray(
            np.prod(feats.shape[:-1]), dtype=feats.dtype
        )
    else:
        w = weights[..., None]
        s = xp.sum(feats * w, axis=tuple(range(feats.ndim - 1)))
        sq = xp.sum(xp.square(feats) * w, axis=tuple(range(feats.ndim - 1)))
        count = xp.sum(weights)
    top = xp.concatenate([s, count[None]])
    bot = xp.concatenate([sq, xp.zeros((1,), feats.dtype)])
    return xp.stack([top, bot])


def apply_cmvn(feats: Array, stats: Array, norm_vars: bool = True) -> Array:
    """Apply mean (and optionally variance) normalization
    (reference: src/feat/cmvn.cc ApplyCmvn; var floor 1e-20)."""
    xp = _xp(feats, stats)
    dim = stats.shape[-1] - 1
    count = stats[0, dim]
    mean = stats[0, :dim] / count
    if norm_vars:
        var = stats[1, :dim] / count - xp.square(mean)
        if xp is jnp:
            scale = jax.lax.rsqrt(jnp.maximum(var, 1e-20))
        else:
            scale = 1.0 / np.sqrt(np.maximum(var, 1e-20))
    else:
        scale = xp.ones_like(mean)
    return (feats - mean) * scale
