"""BiLSTM layer + model tests: oracle step check, masking, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.models.bilstm import (
    BiLstmConfig, bilstm_layer, init_bilstm_layer, _reverse_by_length,
)
from eesen_tpu.models.model import (
    AcousticModelConfig, apply_model, init_model, model_num_params,
)


def numpy_lstm_direction(p, x):
    """Scalar oracle for one direction, one sequence. x: [T, D]."""
    t_max, d = x.shape
    h = p["phole_i_c"].shape[0]
    w_x = p["w_gifo_x"].reshape(d, 4 * h)
    w_m = p["w_gifo_m"].reshape(h, 4 * h)
    bias = p["bias"].reshape(4 * h)
    c = np.zeros(h); m = np.zeros(h)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    out = []
    for t in range(t_max):
        gifo = x[t] @ w_x + m @ w_m + bias
        g, i, f, o = np.split(gifo, 4)
        i = sig(i + c * p["phole_i_c"])
        f = sig(f + c * p["phole_f_c"])
        g = np.tanh(g)
        c = f * c + i * g
        o = sig(o + c * p["phole_o_c"])
        m = o * np.tanh(c)
        out.append(m.copy())
    return np.stack(out)


def test_bilstm_matches_numpy_oracle():
    cfg = BiLstmConfig(input_dim=5, cell_dim=4, compute_dtype=jnp.float32)
    params = init_bilstm_layer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 7, 5)).astype(np.float32)
    y = np.asarray(
        bilstm_layer(params, jnp.asarray(x), jnp.asarray([7]), cfg)
    )
    pf = {k: np.asarray(v) for k, v in params["fw"].items()}
    pb = {k: np.asarray(v) for k, v in params["bw"].items()}
    want_fw = numpy_lstm_direction(pf, x[0])
    want_bw = numpy_lstm_direction(pb, x[0][::-1])[::-1]
    np.testing.assert_allclose(y[0, :, :4], want_fw, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y[0, :, 4:], want_bw, rtol=1e-4, atol=1e-5)


def test_bilstm_length_masking():
    """A padded batch must give identical results to the unpadded sequence."""
    cfg = BiLstmConfig(input_dim=3, cell_dim=4, compute_dtype=jnp.float32)
    params = init_bilstm_layer(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x_short = rng.standard_normal((1, 5, 3)).astype(np.float32)
    x_padded = np.concatenate(
        [x_short, rng.standard_normal((1, 4, 3)).astype(np.float32)], axis=1
    )
    y_short = np.asarray(
        bilstm_layer(params, jnp.asarray(x_short), jnp.asarray([5]), cfg)
    )
    y_padded = np.asarray(
        bilstm_layer(params, jnp.asarray(x_padded), jnp.asarray([5]), cfg)
    )
    np.testing.assert_allclose(y_padded[0, :5], y_short[0], rtol=1e-4, atol=1e-5)
    # padded region emits zeros
    assert np.all(y_padded[0, 5:] == 0.0)


def test_reverse_by_length():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    r = np.asarray(_reverse_by_length(x, jnp.asarray([4])))
    np.testing.assert_array_equal(r[0, :4, 0], [6, 4, 2, 0])
    np.testing.assert_array_equal(r[0, 4:, 0], [8, 10])


def test_model_shapes_and_grad():
    cfg = AcousticModelConfig(
        input_dim=8, cell_dim=6, num_layers=2, num_targets=10,
        compute_dtype=jnp.float32,
    )
    params = init_model(jax.random.PRNGKey(2), cfg)
    # param count: per direction per layer: d*4h + h*4h + 4h + 3h
    def one_layer(d, h):
        return 2 * (d * 4 * h + h * 4 * h + 4 * h + 3 * h)
    want = one_layer(8, 6) + one_layer(12, 6) + 12 * 10 + 10
    assert model_num_params(params) == want

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 9, 8)), jnp.float32)
    lengths = jnp.asarray([9, 6])
    logits = apply_model(params, x, lengths, cfg)
    assert logits.shape == (2, 9, 10)

    def loss(p):
        return jnp.sum(apply_model(p, x, lengths, cfg) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_dropout_active_only_in_train():
    cfg = BiLstmConfig(
        input_dim=4, cell_dim=4, forward_dropout=0.5, recurrent_dropout=0.3,
        compute_dtype=jnp.float32,
    )
    params = init_bilstm_layer(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 6, 4)), jnp.float32
    )
    lengths = jnp.asarray([6, 6])
    y_eval = bilstm_layer(params, x, lengths, cfg, train=False)
    y_eval2 = bilstm_layer(params, x, lengths, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_tr1 = bilstm_layer(
        params, x, lengths, cfg, train=True, rng=jax.random.PRNGKey(0)
    )
    y_tr2 = bilstm_layer(
        params, x, lengths, cfg, train=True, rng=jax.random.PRNGKey(1)
    )
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))
