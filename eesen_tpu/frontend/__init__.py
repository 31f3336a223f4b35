from eesen_tpu.frontend.features import (
    FrameOptions,
    MelOptions,
    FbankOptions,
    fbank,
    frame_signal,
    mel_banks,
    povey_window,
    compute_deltas,
    splice_frames,
    subsample_frames,
    cmvn_stats,
    apply_cmvn,
)

__all__ = [
    "FrameOptions",
    "MelOptions",
    "FbankOptions",
    "fbank",
    "frame_signal",
    "mel_banks",
    "povey_window",
    "compute_deltas",
    "splice_frames",
    "subsample_frames",
    "cmvn_stats",
    "apply_cmvn",
]
