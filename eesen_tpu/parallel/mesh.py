"""Device mesh construction.

The TPU-native replacement for the reference's distributed backend
(reference: src/net/communicator.h — shared-filesystem model averaging with
rename+poll; steps/train_ctc_parallel_h.sh — N independent jobs): a single
SPMD program over a `jax.sharding.Mesh` with axes

  data  — data parallelism (per-step gradient psum replaces the
          every-500-utterances file averaging)
  model — tensor parallelism over the LSTM cell dimension, only needed if a
          configuration outgrows one chip (the reference's models never did)

On a multi-host pod slice the data axis spans hosts (DCN) and the model
axis stays within a host (ICI), which `jax.make_mesh` arranges by default
device order.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1        # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        model = max(self.model, 1)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != device count {n_devices}"
            )
        return MeshConfig(data=data, model=model)


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    r = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(r.data, r.model)
    return Mesh(arr, axis_names=("data", "model"))
