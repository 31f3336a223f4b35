"""Log-space math helpers.

Mirrors the semantics of the reference's log-domain arithmetic
(reference: src/base/kaldi-math.h:171,195 LogAdd/LogSub and
src/gpucompute/ctc-utils.h:35-97 AddAB/LogAPlusB with log_zero = -1e30),
but uses a large-negative sentinel rather than -inf so that XLA never sees
inf-inf -> nan in fused expressions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Log-zero sentinel (reference: src/gpucompute/ctc-utils.h:35). Large enough
# that exp() underflows to 0 exactly, small enough to avoid overflow when
# summed a few times in float32.
LOG_ZERO = -1e30
# Values below this threshold are treated as log-zero.
LOG_ZERO_THRESHOLD = -1e29


def log_add(a, b):
    """log(exp(a) + exp(b)), safe around the LOG_ZERO sentinel."""
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    safe = hi > LOG_ZERO_THRESHOLD
    # log1p(exp(lo-hi)) is stable; where both are log-zero return LOG_ZERO.
    out = hi + jnp.log1p(jnp.exp(jnp.where(safe, lo - hi, 0.0)))
    return jnp.where(safe, out, LOG_ZERO)


def log_add3(a, b, c):
    return log_add(log_add(a, b), c)
