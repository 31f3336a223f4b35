"""Class-prior tests (net-output-extract's posterior->likelihood path)."""

import jax.numpy as jnp
import numpy as np

from eesen_tpu.models.priors import (
    ClassPriorOptions, compute_log_priors, counts_from_labels,
    subtract_priors,
)


def test_counts_from_labels():
    counts = counts_from_labels([[1, 2], [2, 3]], num_targets=5)
    # blanks: one per label occurrence (interleave+trailing awk pattern)
    assert counts[0] == 4
    assert counts[1] == 1 and counts[2] == 2 and counts[3] == 1
    assert counts[4] == 1  # zero-count class gets +1


def test_log_priors_normalized():
    counts = np.array([100.0, 50.0, 50.0])
    lp = compute_log_priors(counts)
    np.testing.assert_allclose(np.exp(lp).sum(), 1.0, rtol=1e-5)
    assert lp[0] > lp[1]


def test_blank_scale_and_cutoff():
    counts = np.array([100.0, 50.0, 0.0])
    lp = compute_log_priors(
        counts, ClassPriorOptions(blank_scale=0.5, prior_cutoff=1e-10)
    )
    # cutoff class is pushed to a huge value => zero likelihood after
    # subtraction
    assert lp[2] > 1e30
    lp_noscale = compute_log_priors(counts)
    assert lp[0] < lp_noscale[0]  # blank downscaled


def test_subtract_priors():
    logpost = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    lp = compute_log_priors(np.array([10.0, 5.0, 5.0]))
    out = np.asarray(subtract_priors(logpost, lp, prior_scale=1.0))
    want = np.asarray(logpost) - lp
    np.testing.assert_allclose(out, want, rtol=1e-6)
