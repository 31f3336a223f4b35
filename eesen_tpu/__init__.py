"""eesen_tpu — a TPU-native end-to-end speech recognition framework.

A from-scratch rebuild of the capabilities of srvk/eesen (BiLSTM acoustic
models trained with CTC, decoded with WFSTs) designed for TPU hardware:

- the compute path (features, LSTM, CTC, beam search) is JAX/XLA/Pallas,
  jitted and shardable over a `jax.sharding.Mesh`;
- data-parallel training replaces the reference's shared-filesystem model
  averaging (reference: src/net/communicator.h) with per-step gradient
  `psum` over the mesh's data axis;
- WFST graph construction (reference: src/fstext, src/fstbin) is host-side
  and offline, producing compacted arc tables for device decoding.

Layout:
  utils/     logging, log-space math, timers, edit distance
  io/        Kaldi-compatible ark/scp tables, data-dir conventions, wav
  frontend/  fbank/MFCC/spectrogram features, CMVN, deltas/splice/subsample
  ops/       CTC loss (XLA + Pallas), fused LSTM steps
  models/    BiLSTM stacks, projection layers, model (de)serialization
  training/  optimizers, newbob LR schedule, bucketing, the train loop
  parallel/  mesh construction and sharded train/eval steps
  decoder/   WFST build (T/L/G -> TLG), greedy + beam decoding, lattices
"""

__version__ = "0.1.0"
