"""Pallas CTC kernels vs the XLA scan (interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.ops.ctc import (
    _ctc_prep, _forward_backward_pallas, ctc_forward_backward, ctc_loss,
)
from eesen_tpu.utils.math import LOG_ZERO_THRESHOLD
from tests.test_ctc import make_case


@pytest.mark.parametrize("seed", [0, 1])
def test_alpha_beta_match_xla(seed):
    rng = np.random.default_rng(seed)
    bsz, t_max, l_max, vocab = 3, 18, 5, 9
    logits, logit_lengths, labels, label_lengths = make_case(
        rng, bsz, t_max, l_max, vocab
    )
    args = (
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths),
    )
    _, _, can_skip, _, lp_e = _ctc_prep(*args, 0)
    ll_x, a_x, b_x = ctc_forward_backward(
        lp_e, can_skip, args[1], args[3]
    )
    ll_p, a_p, b_p = _forward_backward_pallas(
        lp_e, can_skip, args[1], args[3], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ll_p), np.asarray(ll_x), rtol=1e-5, atol=1e-5
    )
    # compare alpha/beta where finite (the sentinel magnitude may differ
    # after repeated additions)
    for p, x in ((a_p, a_x), (b_p, b_x)):
        p, x = np.asarray(p), np.asarray(x)
        finite = x > LOG_ZERO_THRESHOLD
        np.testing.assert_array_equal(finite, p > LOG_ZERO_THRESHOLD)
        np.testing.assert_allclose(
            p[finite], x[finite], rtol=1e-4, atol=1e-4
        )


def test_ctc_loss_pallas_grads_match(monkeypatch):
    """End-to-end ctc_loss with the pallas path forced (interpret) must
    match the XLA path including gradients."""
    monkeypatch.setenv("EESEN_CTC_PALLAS", "never")
    rng = np.random.default_rng(2)
    logits, logit_lengths, labels, label_lengths = make_case(
        rng, 2, 14, 4, 7
    )
    args = (
        jnp.asarray(logit_lengths), jnp.asarray(labels),
        jnp.asarray(label_lengths),
    )

    def f(x):
        return jnp.sum(ctc_loss(x, *args))

    v_x, g_x = jax.value_and_grad(f)(jnp.asarray(logits))

    # force pallas (interpret mode works on CPU)
    import eesen_tpu.ops.ctc as ctc_mod
    monkeypatch.setattr(ctc_mod, "_use_pallas_ctc", lambda: True)
    monkeypatch.setattr(
        ctc_mod, "_forward_backward_pallas",
        lambda *a, **k: _forward_backward_pallas(*a, interpret=True),
    )
    v_p, g_p = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5
    )
