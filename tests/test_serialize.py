"""Reference-format model serialization roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.models.model import (
    AcousticModelConfig, apply_model, init_model,
)
from eesen_tpu.models.serialize import read_eesen_nnet, write_eesen_nnet


def test_nnet_roundtrip(tmp_path):
    cfg = AcousticModelConfig(
        input_dim=10, cell_dim=6, num_layers=2, num_targets=8,
        compute_dtype=jnp.float32,
    )
    params = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "final.nnet")
    write_eesen_nnet(path, jax.tree_util.tree_map(np.asarray, params), cfg)

    params2, cfg2 = read_eesen_nnet(path)
    assert cfg2.input_dim == 10 and cfg2.cell_dim == 6
    assert cfg2.num_layers == 2 and cfg2.num_targets == 8

    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # forward equivalence
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 7, 10)), jnp.float32
    )
    lengths = jnp.asarray([7, 5])
    cfg2 = AcousticModelConfig(
        **{**cfg2.__dict__, "compute_dtype": jnp.float32}
    )
    y1 = np.asarray(apply_model(params, x, lengths, cfg))
    y2 = np.asarray(
        apply_model(
            jax.tree_util.tree_map(jnp.asarray, params2), x, lengths, cfg2
        )
    )
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_nnet_parallel_marker(tmp_path):
    cfg = AcousticModelConfig(
        input_dim=4, cell_dim=3, num_layers=1, num_targets=5,
    )
    params = init_model(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "parallel.nnet")
    write_eesen_nnet(
        path, jax.tree_util.tree_map(np.asarray, params), cfg, parallel=True
    )
    with open(path, "rb") as f:
        head = f.read(40)
    assert b"<BiLstmParallel>" in head
    params2, cfg2 = read_eesen_nnet(path)
    assert cfg2.cell_dim == 3
