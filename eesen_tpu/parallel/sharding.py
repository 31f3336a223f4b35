"""Sharding rules for model parameters, optimizer state, and batches.

Parameters are gate-structured ([D, 4, H], [H, 4, H], [4, H], [H] — see
eesen_tpu.models.bilstm), so tensor parallelism over the cell dimension H is
always a last-axis (or, for the output projection, first-axis) PartitionSpec
and one shape-based rule covers every leaf — including optimizer-state
leaves (momentum / RMS accumulators), which mirror parameter shapes.

Batches shard along the leading (batch) axis over the `data` mesh axis.
Params/opt-state are replicated over `data`; jit then computes the gradient
all-reduce over `data` automatically — this IS the distributed training
backend (replacing the reference's file-averaging communicator,
src/net/communicator.h:40-120).

Placement-driven: `shard_state`/`shard_batch` device_put the pytrees with
NamedShardings and jit infers in/out shardings from the operands, so the
same train-step code runs single-chip or on any mesh.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_pspec(x) -> P:
    """Shape-based PartitionSpec for a parameter-like leaf.

    [D,4,H] / [H,4,H] LSTM weights -> shard H (last axis);
    [4,H] gate bias -> shard H; [2H,V] output weight -> shard 2H (input);
    vectors/scalars -> replicated (tiny).
    """
    ndim = getattr(x, "ndim", 0)
    shape = getattr(x, "shape", ())
    if ndim == 3:
        return P(None, None, "model")
    if ndim == 2:
        if shape[0] == 4:
            return P(None, "model")
        return P("model", None)
    return P()


def tree_pspecs(tree) -> Any:
    return jax.tree_util.tree_map(leaf_pspec, tree)


def batch_pspec() -> Dict[str, P]:
    return {
        "feats": P("data", None, None),
        "feat_lengths": P("data"),
        "labels": P("data", None),
        "label_lengths": P("data"),
    }


def shard_params(params, mesh: Mesh):
    """Device-put a param(-shaped) tree with model-axis shardings,
    replicated over data."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, leaf_pspec(x))
        ),
        params,
    )


def shard_state(state, mesh: Mesh):
    """Shard a TrainState (params + opt_state + step) onto the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, leaf_pspec(x))),
        state,
    )


def shard_batch(batch, mesh: Mesh):
    specs = batch_pspec()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
        if k in specs
    }


# Backwards-compatible alias
param_sharding_rules = leaf_pspec
param_pspecs = tree_pspecs
