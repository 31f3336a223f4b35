"""Fused Pallas LSTM kernel vs the XLA scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.models.bilstm import BiLstmConfig, _direction_scan, init_bilstm_layer
from eesen_tpu.ops.lstm_pallas import lstm_direction_pallas


def setup(b=3, t=7, d=5, h=4, seed=0):
    cfg = BiLstmConfig(input_dim=d, cell_dim=h, compute_dtype=jnp.float32)
    params = init_bilstm_layer(jax.random.PRNGKey(seed), cfg)["fw"]
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(t // 2, t + 1, size=b).astype(np.int32))
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    mask = (t_iota < lengths[:, None]).astype(jnp.float32)
    xw = (
        jnp.einsum("btd,dgh->btgh", x, params["w_gifo_x"]) + params["bias"]
    )
    return cfg, params, x, mask, xw


def run_pallas(params, xw, mask):
    return lstm_direction_pallas(
        xw, mask, params["w_gifo_m"],
        params["phole_i_c"], params["phole_f_c"], params["phole_o_c"],
        interpret=True,
    )


def run_xla(cfg, params, x, mask):
    # _direction_scan is time-major; tests are written batch-major
    m = _direction_scan(
        params, jnp.moveaxis(x, 0, 1), jnp.moveaxis(mask, 0, 1), cfg, None
    )
    return jnp.moveaxis(m, 0, 1)


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_xla(seed):
    cfg, params, x, mask, xw = setup(seed=seed)
    m_pl = np.asarray(run_pallas(params, xw, mask))
    m_xla = np.asarray(run_xla(cfg, params, x, mask))
    # the kernel emits m_carry (pass-through at padded steps); the XLA path
    # zeroes padded outputs — compare only valid steps
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        m_pl * valid, m_xla * valid, rtol=2e-2, atol=2e-3
    )


def test_grads_match_xla():
    cfg, params, x, mask, xw = setup(seed=2)
    valid = mask[:, :, None]

    def loss_pl(p):
        xw_l = jnp.einsum("btd,dgh->btgh", x, p["w_gifo_x"]) + p["bias"]
        m = lstm_direction_pallas(
            xw_l, mask, p["w_gifo_m"], p["phole_i_c"], p["phole_f_c"],
            p["phole_o_c"], interpret=True,
        )
        return jnp.sum((m * valid) ** 2)

    def loss_xla(p):
        m = jnp.moveaxis(_direction_scan(
            p, jnp.moveaxis(x, 0, 1), jnp.moveaxis(mask, 0, 1), cfg, None
        ), 0, 1)
        return jnp.sum((m * valid) ** 2)

    g_pl = jax.grad(loss_pl)(params)
    g_xla = jax.grad(loss_xla)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_pl[k]), np.asarray(g_xla[k]),
            rtol=5e-2, atol=5e-3, err_msg=k,
        )


def test_padded_tiles_zero():
    """Padding lanes/rows must not leak into real outputs."""
    cfg, params, x, mask, xw = setup(b=2, t=5, d=3, h=3, seed=3)
    m = np.asarray(run_pallas(params, xw, mask))
    assert m.shape == (2, 5, 3)
    assert np.all(np.isfinite(m))


# ---------------------------------------------------------------------------
# fused-projection kernel (v2)
# ---------------------------------------------------------------------------

from eesen_tpu.ops.lstm_pallas import lstm_direction_fused


def run_fused(params, x, mask, block_t=4):
    return lstm_direction_fused(
        x, mask, params["w_gifo_x"], params["bias"], params["w_gifo_m"],
        params["phole_i_c"], params["phole_f_c"], params["phole_o_c"],
        block_t=block_t, interpret=True,
    )


@pytest.mark.parametrize("seed,block_t", [(0, 4), (1, 3), (4, 8)])
def test_fused_forward_matches_xla(seed, block_t):
    cfg, params, x, mask, _ = setup(seed=seed)
    m_pl = np.asarray(run_fused(params, x, mask, block_t))
    m_xla = np.asarray(run_xla(cfg, params, x, mask))
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        m_pl * valid, m_xla * valid, rtol=2e-2, atol=2e-3
    )


def test_fused_grads_match_xla():
    cfg, params, x, mask, _ = setup(seed=2)
    valid = mask[:, :, None]

    def loss_pl(p, xx):
        m = lstm_direction_fused(
            xx, mask, p["w_gifo_x"], p["bias"], p["w_gifo_m"],
            p["phole_i_c"], p["phole_f_c"], p["phole_o_c"],
            block_t=4, interpret=True,
        )
        return jnp.sum((m * valid) ** 2)

    def loss_xla(p, xx):
        m = jnp.moveaxis(_direction_scan(
            p, jnp.moveaxis(xx, 0, 1), jnp.moveaxis(mask, 0, 1), cfg, None
        ), 0, 1)
        return jnp.sum((m * valid) ** 2)

    g_pl, gx_pl = jax.grad(loss_pl, argnums=(0, 1))(params, x)
    g_xla, gx_xla = jax.grad(loss_xla, argnums=(0, 1))(params, x)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_pl[k]), np.asarray(g_xla[k]),
            rtol=5e-2, atol=5e-3, err_msg=k,
        )
    # dx flows back through the fused kernel (bf16) — looser tolerance
    np.testing.assert_allclose(
        np.asarray(gx_pl), np.asarray(gx_xla), rtol=5e-2, atol=2e-2
    )


def test_fused_multi_block_state_carry():
    """State must carry across grid blocks (T > block_t) and t=0 must see
    zero initial state in both passes."""
    cfg, params, x, mask, _ = setup(b=2, t=12, d=6, h=5, seed=5)
    m_a = np.asarray(run_fused(params, x, mask, block_t=3))
    m_b = np.asarray(run_fused(params, x, mask, block_t=12))
    np.testing.assert_allclose(m_a, m_b, rtol=1e-5, atol=1e-5)



# ---------------------------------------------------------------------
# dispatch: VMEM-aware block sizing + v1 fallback for huge shapes
# ---------------------------------------------------------------------

def test_fused_block_ts_shrinks_and_bails():
    from eesen_tpu.ops import lstm_pallas
    from eesen_tpu.ops.lstm_pallas import fused_block_ts

    # every production shape fits the raised (explicit vmem_limit_bytes)
    # budget at full blocks — including the LibriSpeech 4x640 stacked
    # layer whose ~30 MiB of resident weight/weight-grad buffers forced
    # the v1 fallback when the budget was the 16 MiB default
    assert fused_block_ts(128, 640, 320) == (8, 8)
    assert fused_block_ts(128, 1280, 640) == (8, 8)
    assert fused_block_ts(32, 128, 320) == (8, 8)
    # the estimator still shrinks blocks / bails to v1 when a shape
    # cannot fit (simulate with a tightened budget)
    orig = lstm_pallas._VMEM_BUDGET
    try:
        lstm_pallas._VMEM_BUDGET = 14 * 2**20
        bts = fused_block_ts(128, 640, 320)
        assert bts is not None and 1 <= bts[1] <= bts[0] <= 8
        assert fused_block_ts(128, 1280, 640) is None
    finally:
        lstm_pallas._VMEM_BUDGET = orig


def test_v1_direction_matches_xla():
    """The v1 fallback path (XLA input projection + minimal Pallas
    recurrence + XLA weight grads) must match the scan numerically,
    values AND gradients."""
    from eesen_tpu.ops.lstm_pallas import _v1_direction_tm

    cfg, params, x, mask, xw = setup(b=3, t=8, d=5, h=4)
    x_tm = jnp.moveaxis(x, 0, 1)
    mask_tm = jnp.moveaxis(mask, 0, 1)

    def f_v1(p):
        m = _v1_direction_tm(
            x_tm, mask_tm, p["w_gifo_x"], p["bias"], p["w_gifo_m"],
            p["phole_i_c"], p["phole_f_c"], p["phole_o_c"],
            interpret=True,
        )
        return jnp.sum(m * mask_tm[:, :, None] * 0.1)

    def f_xla(p):
        m = _direction_scan(p, x_tm, mask_tm, cfg, None)
        return jnp.sum(m * mask_tm[:, :, None] * 0.1)

    v1, g1 = jax.value_and_grad(f_v1)(params)
    v2, g2 = jax.value_and_grad(f_xla)(params)
    # v1 runs the input projection in bf16 (the production dtype); the
    # XLA scan here runs f32 — differences are bf16 rounding only
    np.testing.assert_allclose(float(v1), float(v2), rtol=5e-3)
    for k in g2:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=3e-2, atol=3e-3,
            err_msg=k,
        )


def test_fused_state_bf16_matches_f32():
    """state_bf16=True must match the f32-state path within bf16
    resolution, forward AND gradients (the cell accumulator stays f32 in
    VMEM; only the streamed state and the grads that re-read it see
    quantization)."""
    cfg, params, x, mask, _ = setup(seed=7)
    valid = mask[:, :, None]

    def loss(p, xx, sb):
        m = lstm_direction_fused(
            xx, mask, p["w_gifo_x"], p["bias"], p["w_gifo_m"],
            p["phole_i_c"], p["phole_f_c"], p["phole_o_c"],
            block_t=4, interpret=True, state_bf16=sb,
        )
        return jnp.sum((m.astype(jnp.float32) * valid) ** 2)

    m32 = lstm_direction_fused(
        x, mask, params["w_gifo_x"], params["bias"], params["w_gifo_m"],
        params["phole_i_c"], params["phole_f_c"], params["phole_o_c"],
        block_t=4, interpret=True, state_bf16=False,
    )
    m16 = lstm_direction_fused(
        x, mask, params["w_gifo_x"], params["bias"], params["w_gifo_m"],
        params["phole_i_c"], params["phole_f_c"], params["phole_o_c"],
        block_t=4, interpret=True, state_bf16=True,
    )
    assert m16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(m16, np.float32), np.asarray(m32),
        rtol=2e-2, atol=1e-2,
    )

    g32, gx32 = jax.grad(loss, argnums=(0, 1))(params, x, False)
    g16, gx16 = jax.grad(loss, argnums=(0, 1))(params, x, True)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g16[k]), np.asarray(g32[k]),
            rtol=8e-2, atol=2e-2, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(gx16), np.asarray(gx32), rtol=8e-2, atol=3e-2
    )
