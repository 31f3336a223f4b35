"""Forced alignment + lattice post-processing + MBR tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.ops.align import align_to_segments, ctc_align
from eesen_tpu.decoder.lattice import Lattice, LatticeArc
from eesen_tpu.decoder.sausages import minimum_bayes_risk, sausage_to_ctm


def peaked_logprobs(seq, v, t_per=3, peak=8.0):
    """Frame-wise log-softmax strongly favoring `seq`."""
    frames = []
    for s in seq:
        for _ in range(t_per):
            x = np.zeros(v, np.float32)
            x[s] = peak
            frames.append(x)
    ll = np.stack(frames)
    return ll - np.log(np.exp(ll).sum(axis=1, keepdims=True))


def test_ctc_align_recovers_segments():
    # true frame sequence: blank, 2,2,2, blank, 3,3, blank, 2,2
    frame_seq = [0, 2, 2, 2, 0, 3, 3, 0, 2, 2]
    ll = peaked_logprobs(frame_seq, v=5, t_per=1)
    labels = jnp.asarray([[2, 3, 2]], dtype=jnp.int32)
    aligns = ctc_align(
        jnp.asarray(ll[None]), jnp.asarray([len(frame_seq)]),
        labels, jnp.asarray([3]),
    )
    np.testing.assert_array_equal(aligns[0], frame_seq)
    segs = align_to_segments(aligns[0])
    assert [s[0] for s in segs] == [2, 3, 2]
    assert segs[0] == (2, 1, 4)


def test_ctc_align_batched_lengths():
    rng = np.random.default_rng(0)
    t, v = 12, 6
    ll = np.log(
        np.full((2, t, v), 1e-3, np.float32)
    )
    # utt0: 1 then 2; utt1 shorter: just 3
    for i, (length, labs) in enumerate([(12, [1, 2]), (8, [3])]):
        seg = length // (len(labs) + 1)
        for j, l in enumerate(labs):
            ll[i, (j + 1) * seg - seg // 2 : (j + 1) * seg + 1, l] = 0.0
    aligns = ctc_align(
        jnp.asarray(ll), jnp.asarray([12, 8]),
        jnp.asarray([[1, 2], [3, 0]], dtype=jnp.int32),
        jnp.asarray([2, 1]),
    )
    assert len(aligns[0]) == 12 and len(aligns[1]) == 8
    assert [s for s in aligns[0] if s != 0] != []
    labs0 = [s[0] for s in align_to_segments(aligns[0])]
    assert labs0 == [1, 2]
    labs1 = [s[0] for s in align_to_segments(aligns[1])]
    assert labs1 == [3]


def make_two_path_lattice(p_good=0.8):
    """start -> (A | B) -> C -> final, A stronger than B."""
    lat = Lattice()
    s0 = lat.add_state(-1)
    s1 = lat.add_state(3)
    s2 = lat.add_state(6)
    lat.start = s0
    wa = -np.log(p_good)
    wb = -np.log(1 - p_good)
    lat.arcs[s0].append(LatticeArc(1, 10, wa, 0.0, s1))
    lat.arcs[s0].append(LatticeArc(1, 11, wb, 0.0, s1))
    lat.arcs[s1].append(LatticeArc(2, 12, 0.0, 0.0, s2))
    lat.finals[s2] = 0.0
    return lat


def test_lattice_prune_and_penalty():
    lat = make_two_path_lattice(0.9)
    assert lat.num_arcs == 3
    lat2 = make_two_path_lattice(0.9)
    lat2.prune(lattice_beam=0.5)  # cost gap = ln(0.9/0.1) ≈ 2.2 > 0.5
    assert lat2.num_arcs == 2
    _, ols, _ = lat2.best_path()
    assert ols == [10, 12]

    lat3 = make_two_path_lattice(0.9)
    _, _, c_before = lat3.best_path()
    lat3.add_penalty(0.5)
    _, _, c_after = lat3.best_path()
    np.testing.assert_allclose(c_after - c_before, 1.0, rtol=1e-6)


def test_posterior_arcs_sum():
    lat = make_two_path_lattice(0.8)
    posts = lat.posterior_arcs()
    by_word = {w: p for w, p, _, _ in posts}
    np.testing.assert_allclose(by_word[10], 0.8, rtol=1e-5)
    np.testing.assert_allclose(by_word[11], 0.2, rtol=1e-5)
    np.testing.assert_allclose(by_word[12], 1.0, rtol=1e-5)


def test_mbr_picks_majority():
    lat = make_two_path_lattice(0.8)
    res = minimum_bayes_risk(lat)
    assert res is not None
    assert res.words == [10, 12]
    assert res.confidences[0] == pytest.approx(0.8, rel=1e-3)
    assert res.confidences[1] == pytest.approx(1.0, rel=1e-3)
    ctm = sausage_to_ctm(res)
    assert len(ctm) == 2 and "10" in ctm[0]
