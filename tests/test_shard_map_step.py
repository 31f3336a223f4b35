"""shard_map train step must match the auto-sharded jit step exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.parallel.mesh import MeshConfig, make_mesh
from eesen_tpu.parallel.sharding import shard_batch, shard_state
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.trainer import (
    create_train_state, make_shard_map_train_step, make_train_step,
)
from tests.test_training import _toy_batch


@pytest.mark.slow
def test_shard_map_matches_jit():
    cfg = AcousticModelConfig(
        input_dim=6, cell_dim=8, num_layers=1, num_targets=5,
        compute_dtype=jnp.float32,
    )
    opt = OptimizerConfig(algorithm="sgd", momentum=0.9, max_grad=10.0)
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng, 8, 16, 6, 5)
    mesh = make_mesh(MeshConfig(data=4, model=2))

    state1, tx1 = create_train_state(jax.random.PRNGKey(5), cfg, opt)
    step1 = make_train_step(cfg, tx1, donate=False)
    dev1 = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(3):
        state1, m1 = step1(state1, dev1, None, jnp.float32(0.05))

    state2, tx2 = create_train_state(jax.random.PRNGKey(5), cfg, opt)
    state2 = shard_state(state2, mesh)
    step2 = make_shard_map_train_step(cfg, tx2, mesh, donate=False)
    dev2 = shard_batch(batch, mesh)
    for _ in range(3):
        state2, m2 = step2(state2, dev2, None, jnp.float32(0.05))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
