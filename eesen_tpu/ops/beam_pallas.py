"""Fused beam-search recombination kernel (Pallas, TPU).

Replaces the per-frame XLA op chain of the WFST beam search's pruning
phase — beam threshold, Viterbi recombination (min score per distinct
destination state), and top-K selection — with ONE on-core kernel.

Why: at production beam widths the search frame is a chain of ~15
medium-sized XLA ops ([B, K*D] sorts, top_k, take_alongs), each paying
launch + HBM round-trip overhead; the whole working set is well under
1 MB and belongs in VMEM end-to-end.  The reference's equivalent is the
hash-map token recombination in ProcessEmitting
(reference: src/decoder/faster-decoder.cc:147-211) — a form that cannot
vectorize.  This kernel keeps the TPU-native sort-based formulation but
executes both sort passes as in-register bitonic networks:

- batch rows live in the SUBLANE dimension (8 f32 sublanes = the whole
  B=8 decode batch), lanes hold proposals, so every compare-exchange is
  one full-width VPU op;
- partner selection for network distance j uses two lane-rolls
  (i XOR j == i+j for the low element, i-j for the high one — circular
  wrap is never selected);
- pass 1 sorts lexicographically by (destination, score) and keeps the
  first of each destination run (the Viterbi winner);
- pass 2 sorts the masked scores ascending; the first K lanes are the
  surviving active set.

Exact: no funnel pre-prune or approx_top_k approximations are needed —
sort cost is shape-fixed.  Equivalent by construction to
decoder/beam._dedup_and_prune (funnel=0, approx=False) up to ties.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.float32(np.inf)
_PAD_DST = np.int32(0x3FFFFFFF)

# the unrolled network is quadratic-ish in log2(M); cap M so compile time
# and VMEM stay sane (beyond this the XLA sort path wins anyway)
MAX_LANES = 32768
# "auto" dispatch cap: Mosaic compile time explodes with width (measured
# on v5e: 4096 lanes ~27 s, 16384 lanes ~480 s); above this the XLA sort
# path is dispatched instead unless the caller forces "always"
MAX_LANES_AUTO = 8192


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _roll(x: jax.Array, j: int) -> jax.Array:
    """Circular lane-roll by j (may be negative) along axis 1."""
    m = x.shape[1]
    return pltpu.roll(x, j % m, axis=1)


def _cmp_exchange(
    arrs: List[jax.Array], nk: int, idx: jax.Array, j: int, kblk: int,
) -> List[jax.Array]:
    """One bitonic substage: compare-exchange with partner i XOR j inside
    (alternating-direction) blocks of size kblk.  arrs[:nk] are the sort
    keys (lexicographic), the rest ride along as payloads."""
    lower = (idx & j) == 0
    want_min = lower == ((idx & kblk) == 0)
    partners = [
        jnp.where(lower, _roll(a, -j), _roll(a, j)) for a in arrs
    ]
    less = None
    eq = None
    for p, a in zip(partners[:nk], arrs[:nk]):
        l_i = p < a
        if less is None:
            less, eq = l_i, p == a
        else:
            less = less | (eq & l_i)
            eq = eq & (p == a)
    choose = less == want_min
    return [jnp.where(choose, p, a) for p, a in zip(partners, arrs)]


def _bitonic_sort(
    keys: Sequence[jax.Array], payloads: Sequence[jax.Array],
) -> List[jax.Array]:
    """Full ascending bitonic sort along lanes; returns keys+payloads."""
    b, m = keys[0].shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    arrs = list(keys) + list(payloads)
    nk = len(keys)
    kblk = 2
    while kblk <= m:
        j = kblk // 2
        while j >= 1:
            arrs = _cmp_exchange(arrs, nk, idx, j, kblk)
            j //= 2
        kblk *= 2
    return arrs


def _dedup_prune_kernel(
    k: int, beam: float,
    dst_ref, score_ref, states_ref, scores_ref, kept_ref,
):
    dst = dst_ref[:]
    score = score_ref[:]
    b, m = dst.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    # beam threshold relative to the best proposal this frame
    best = jnp.min(score, axis=1, keepdims=True)
    score = jnp.where(score <= best + beam, score, INF)
    # pass 1: sort by (dst, score); the Viterbi winner per destination is
    # the first lane of its run.  The (unique) lane index is the final
    # sort key: a compare-exchange on EQUAL keys would duplicate one
    # element and drop its partner, so keys must be distinct — and this
    # also makes the sort stable (lowest proposal index wins ties, like
    # the XLA lax.sort path).
    d2, s2, i2 = _bitonic_sort((dst, score, lane), ())
    first = (lane == 0) | (d2 != _roll(d2, 1))
    s2 = jnp.where(first, s2, INF)
    # pass 2: survivors to the front, ascending by score (i2 is a
    # permutation of the lane indices — again a unique final key)
    s3, i3, d3 = _bitonic_sort((s2, i2), (d2,))
    sk = s3[:, :k]
    alive = sk < INF
    scores_ref[:] = sk
    states_ref[:] = jnp.where(alive, d3[:, :k], -1)
    kept_ref[:] = i3[:, :k]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dedup_prune(
    dst: jax.Array, score: jax.Array, k: int, beam: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused beam+recombine+top-k.  dst [B,M] int32 proposal destinations,
    score [B,M] float32 (inf = dead).  Returns (states [B,K] int32 with -1
    for dead slots, scores [B,K] float32, kept [B,K] int32 indices into
    the proposal axis)."""
    b, m = dst.shape
    mp = max(_next_pow2(m), 128)
    if mp > MAX_LANES:
        raise ValueError(f"proposal width {m} exceeds kernel cap {MAX_LANES}")
    if mp != m:
        dst = jnp.pad(dst, ((0, 0), (0, mp - m)), constant_values=_PAD_DST)
        score = jnp.pad(score, ((0, 0), (0, mp - m)), constant_values=np.inf)
    kernel = functools.partial(_dedup_prune_kernel, k, float(beam))
    states, scores, kept = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.int32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # the unrolled network's live set exceeds the default 16 MiB
        # scoped-vmem budget at wide M; v5e has 128 MiB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dst, score)
    # padded proposals carry lane indices >= m; they are only selected when
    # fewer than K live states exist — clamp for safe downstream gathers
    kept = jnp.minimum(kept, m - 1)
    return states, scores, kept
