"""CTC loss tests: scalar numpy oracle, optax cross-check, gradient checks.

The reference validated CTC only end-to-end through recipe WER
(SURVEY.md §4); these numerical unit tests are what it lacked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eesen_tpu.ops.ctc import ctc_loss, ctc_loss_mean, expand_labels


def numpy_ctc_nll(log_probs, labels, blank=0):
    """Scalar forward-algorithm oracle for one sequence. O(T*S) python."""
    t_max, _ = log_probs.shape
    lab = [blank]
    for l in labels:
        lab += [int(l), blank]
    s = len(lab)
    neg = -np.inf
    alpha = np.full((t_max, s), neg)
    alpha[0, 0] = log_probs[0, lab[0]]
    if s > 1:
        alpha[0, 1] = log_probs[0, lab[1]]
    for t in range(1, t_max):
        for j in range(s):
            cands = [alpha[t - 1, j]]
            if j >= 1:
                cands.append(alpha[t - 1, j - 1])
            if j >= 2 and lab[j] != blank and lab[j] != lab[j - 2]:
                cands.append(alpha[t - 1, j - 2])
            alpha[t, j] = np.logaddexp.reduce(cands) + log_probs[t, lab[j]]
    fin = [alpha[t_max - 1, s - 1]]
    if s > 1:
        fin.append(alpha[t_max - 1, s - 2])
    return -np.logaddexp.reduce(fin)


def make_case(rng, bsz, t_max, l_max, vocab):
    logits = rng.standard_normal((bsz, t_max, vocab)).astype(np.float32)
    logit_lengths = rng.integers(l_max * 2 + 1, t_max + 1, size=bsz).astype(np.int32)
    label_lengths = rng.integers(1, l_max + 1, size=bsz).astype(np.int32)
    labels = rng.integers(1, vocab, size=(bsz, l_max)).astype(np.int32)
    for i in range(bsz):
        labels[i, label_lengths[i]:] = 0
    return logits, logit_lengths, labels, label_lengths


def test_expand_labels():
    labels = jnp.array([[3, 5, 5], [7, 0, 0]], dtype=jnp.int32)
    exp = expand_labels(labels)
    np.testing.assert_array_equal(
        np.asarray(exp), [[0, 3, 0, 5, 0, 5, 0], [0, 7, 0, 0, 0, 0, 0]]
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    bsz, t_max, l_max, vocab = 4, 20, 5, 11
    logits, logit_lengths, labels, label_lengths = make_case(
        rng, bsz, t_max, l_max, vocab
    )
    nll = jax.jit(ctc_loss)(
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths),
    )
    for i in range(bsz):
        lp = jax.nn.log_softmax(jnp.asarray(logits[i, : logit_lengths[i]]))
        want = numpy_ctc_nll(np.asarray(lp), labels[i, : label_lengths[i]])
        np.testing.assert_allclose(float(nll[i]), want, rtol=1e-5, atol=1e-5)


def test_ctc_repeated_labels():
    """The repeat rule (no s-2 skip between equal labels) must hold."""
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 12, 6)).astype(np.float32)
    labels = np.array([[2, 2, 3]], dtype=np.int32)
    nll = ctc_loss(
        jnp.asarray(logits), jnp.asarray([12]), jnp.asarray(labels),
        jnp.asarray([3]),
    )
    lp = jax.nn.log_softmax(jnp.asarray(logits[0]))
    want = numpy_ctc_nll(np.asarray(lp), [2, 2, 3])
    np.testing.assert_allclose(float(nll[0]), want, rtol=1e-5, atol=1e-5)


def test_ctc_matches_optax():
    rng = np.random.default_rng(4)
    bsz, t_max, l_max, vocab = 6, 25, 7, 30
    logits, logit_lengths, labels, label_lengths = make_case(
        rng, bsz, t_max, l_max, vocab
    )
    nll = ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths),
    )
    t_iota = np.arange(t_max)[None, :]
    logitpaddings = (t_iota >= logit_lengths[:, None]).astype(np.float32)
    l_iota = np.arange(l_max)[None, :]
    labelpaddings = (l_iota >= label_lengths[:, None]).astype(np.float32)
    ref = optax.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logitpaddings),
        jnp.asarray(labels), jnp.asarray(labelpaddings),
    )
    np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_ctc_gradient_matches_optax():
    rng = np.random.default_rng(5)
    bsz, t_max, l_max, vocab = 3, 15, 4, 9
    logits, logit_lengths, labels, label_lengths = make_case(
        rng, bsz, t_max, l_max, vocab
    )
    t_iota = np.arange(t_max)[None, :]
    logitpaddings = (t_iota >= logit_lengths[:, None]).astype(np.float32)
    l_iota = np.arange(l_max)[None, :]
    labelpaddings = (l_iota >= label_lengths[:, None]).astype(np.float32)

    def ours(x):
        return jnp.sum(
            ctc_loss(
                x, jnp.asarray(logit_lengths), jnp.asarray(labels),
                jnp.asarray(label_lengths),
            )
        )

    def theirs(x):
        return jnp.sum(
            optax.ctc_loss(
                x, jnp.asarray(logitpaddings), jnp.asarray(labels),
                jnp.asarray(labelpaddings),
            )
        )

    g_ours = jax.grad(ours)(jnp.asarray(logits))
    g_theirs = jax.grad(theirs)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_theirs), rtol=1e-3, atol=1e-4
    )


def test_ctc_gradient_numerical():
    """Finite-difference check of the custom VJP on a tiny case."""
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((1, 6, 4)).astype(np.float64).astype(np.float32)
    labels = jnp.asarray([[1, 2]], dtype=jnp.int32)

    def f(x):
        return jnp.sum(ctc_loss(x, jnp.asarray([6]), labels, jnp.asarray([2])))

    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 2, 1), (0, 5, 3), (0, 3, 2)]:
        xp = logits.copy(); xp[idx] += eps
        xm = logits.copy(); xm[idx] -= eps
        fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


def test_ctc_padded_frames_zero_grad():
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal((2, 10, 5)).astype(np.float32))
    lengths = jnp.asarray([6, 10])
    labels = jnp.asarray([[1, 2, 0], [3, 4, 1]], dtype=jnp.int32)
    lab_lens = jnp.asarray([2, 3])

    def f(x):
        return jnp.sum(ctc_loss(x, lengths, labels, lab_lens))

    g = np.asarray(jax.grad(f)(logits))
    assert np.all(g[0, 6:, :] == 0.0)
    assert np.any(g[0, :6, :] != 0.0)


def test_ctc_loss_mean_jits():
    rng = np.random.default_rng(8)
    logits, logit_lengths, labels, label_lengths = make_case(rng, 2, 12, 3, 7)
    val = jax.jit(ctc_loss_mean)(
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths),
    )
    assert np.isfinite(float(val))
