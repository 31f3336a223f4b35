"""Training loop tests: toy convergence, sharded-vs-single parity, newbob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.parallel.mesh import MeshConfig, make_mesh
from eesen_tpu.parallel.sharding import shard_batch, shard_state
from eesen_tpu.training.batching import BatchConfig, Utterance, make_batches
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.schedule import NewbobConfig, NewbobScheduler
from eesen_tpu.training.trainer import (
    create_train_state, make_eval_step, make_train_step,
)
from eesen_tpu.training.metrics import collapse_ctc_path, token_error_counts


def toy_data(rng, n, t, dim, n_classes):
    """Each utterance: a sequence of 'phones'; feature = one-hot + noise."""
    utts = []
    for i in range(n):
        n_lab = rng.integers(2, 5)
        labs = rng.integers(1, n_classes, size=n_lab)
        # each label occupies t//n_lab frames
        feats = np.zeros((t, dim), dtype=np.float32)
        seg = t // n_lab
        for j, l in enumerate(labs):
            feats[j * seg : (j + 1) * seg, l % dim] = 1.0
        feats += 0.05 * rng.standard_normal((t, dim)).astype(np.float32)
        utts.append((feats, labs.astype(np.int32)))
    return utts


def _toy_batch(rng, bsz, t, dim, n_classes):
    data = toy_data(rng, bsz, t, dim, n_classes)
    feats = np.stack([d[0] for d in data])
    lengths = np.full((bsz,), t, dtype=np.int32)
    l_max = max(len(d[1]) for d in data)
    labels = np.zeros((bsz, l_max), dtype=np.int32)
    label_lengths = np.zeros((bsz,), dtype=np.int32)
    for i, (_, lab) in enumerate(data):
        labels[i, : len(lab)] = lab
        label_lengths[i] = len(lab)
    return {
        "feats": feats,
        "feat_lengths": lengths,
        "labels": labels,
        "label_lengths": label_lengths,
    }


def test_toy_convergence():
    """The full train step must drive CTC loss down and learn the toy task."""
    cfg = AcousticModelConfig(
        input_dim=8, cell_dim=16, num_layers=1, num_targets=6,
        compute_dtype=jnp.float32,
    )
    opt = OptimizerConfig(algorithm="adagrad", max_grad=50.0)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, tx, donate=False, with_argmax=True)
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng, 8, 24, 8, 6)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(300):
        key, sk = jax.random.split(key)
        state, metrics = step(state, dev, sk, jnp.float32(5e-2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.1, losses[::25]
    # greedy decode should mostly match
    errs, refs = token_error_counts(
        np.asarray(metrics["argmax"]), batch["feat_lengths"],
        batch["labels"], batch["label_lengths"],
    )
    assert errs / refs < 0.3


@pytest.mark.slow
def test_sharded_matches_single_device():
    """Data-parallel (8 virtual devices) must match single-device training."""
    cfg = AcousticModelConfig(
        input_dim=6, cell_dim=8, num_layers=1, num_targets=5,
        compute_dtype=jnp.float32,
    )
    opt = OptimizerConfig(algorithm="sgd", momentum=0.0, max_grad=0.0)
    rng = np.random.default_rng(1)
    batch = _toy_batch(rng, 8, 16, 6, 5)

    # single device
    state1, tx1 = create_train_state(jax.random.PRNGKey(3), cfg, opt)
    step1 = make_train_step(cfg, tx1, donate=False)
    dev1 = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(3):
        state1, m1 = step1(state1, dev1, None, jnp.float32(0.05))

    # 4x2 mesh (data x model)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state2, tx2 = create_train_state(jax.random.PRNGKey(3), cfg, opt)
    state2 = shard_state(state2, mesh)
    step2 = make_train_step(cfg, tx2, donate=False)
    dev2 = shard_batch(batch, mesh)
    for _ in range(3):
        state2, m2 = step2(state2, dev2, None, jnp.float32(0.05))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_newbob_schedule():
    cfg = NewbobConfig(
        learn_rate=0.1, start_halving_inc=0.5, end_halving_inc=0.1,
        halving_factor=0.5, halving_after_epoch=1, max_iters=20,
    )
    s = NewbobScheduler(cfg)
    # big improvements: no halving
    stop, lr = s.report(10.0); assert not stop and lr == 0.1
    stop, lr = s.report(20.0); assert not stop and lr == 0.1
    # small improvement -> halving starts
    stop, lr = s.report(20.3); assert not stop and lr == 0.05
    # still improving a bit -> keep halving
    stop, lr = s.report(20.6); assert not stop and lr == 0.025
    # improvement below end threshold while halving -> stop
    stop, lr = s.report(20.65); assert stop


def test_newbob_resume(tmp_path):
    cfg = NewbobConfig(learn_rate=0.2)
    s = NewbobScheduler(cfg)
    s.report(5.0)
    s.save(str(tmp_path / "sched.json"))
    s2 = NewbobScheduler.load(str(tmp_path / "sched.json"), cfg)
    assert s2.epoch == s.epoch and s2.learn_rate == s.learn_rate


def test_batching_frame_limit():
    rng = np.random.default_rng(2)
    utts = [
        Utterance(f"u{i}", rng.standard_normal((l, 4)).astype(np.float32),
                  np.array([1, 2], dtype=np.int32))
        for i, l in enumerate([10, 12, 30, 35, 100, 110])
    ]
    cfg = BatchConfig(
        num_sequence=4, frame_limit=100, time_quant=8, fixed_batch=False
    )
    batches = list(make_batches(utts, cfg))
    # u5 (len 110 > frame_limit) is skipped, as in the reference
    # (train-ctc-parallel.cc:161-164); the rest appear exactly once
    keys = [k for b in batches for k in b["keys"]]
    assert sorted(keys) == [f"u{i}" for i in range(5)]
    for b in batches:
        n_real = int(np.sum(b["feat_lengths"] > 0))
        max_len = int(np.max(b["feat_lengths"]))
        assert n_real <= 4
        # batch area respects the cap for the real (unquantized) lengths
        assert max_len * n_real <= 100 or n_real == 1
        assert b["feats"].shape[1] % 8 == 0


def test_collapse_ctc_path():
    assert collapse_ctc_path([0, 1, 1, 0, 2, 2, 2, 0, 1]) == [1, 2, 1]
    assert collapse_ctc_path([0, 0]) == []
    assert collapse_ctc_path([3]) == [3]


def test_ce_training_converges():
    """CE objective (train-ce-parallel equivalent): loss falls and frame
    accuracy rises on frame-aligned toy labels."""
    rng = np.random.default_rng(5)
    bsz, t, dim, n_classes = 8, 48, 12, 12
    feats = np.zeros((bsz, t, dim), np.float32)
    frame_labels = rng.integers(1, n_classes, size=(bsz, t)).astype(np.int32)
    for i in range(bsz):
        feats[i, np.arange(t), frame_labels[i] % dim] = 1.0
    feats += 0.05 * rng.standard_normal(feats.shape).astype(np.float32)
    batch = {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.full((bsz,), t, jnp.int32),
        "labels": jnp.asarray(frame_labels),
        "label_lengths": jnp.full((bsz,), t, jnp.int32),
    }
    cfg = AcousticModelConfig(
        input_dim=dim, cell_dim=24, num_layers=1, num_targets=n_classes,
    )
    state, tx = create_train_state(
        jax.random.PRNGKey(0), cfg, OptimizerConfig(algorithm="adagrad")
    )
    step = make_train_step(cfg, tx, donate=False, loss="ce")
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(200):
        key, sk = jax.random.split(key)
        state, metrics = step(state, batch, sk, jnp.float32(0.05))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    acc = float(metrics["correct"]) / float(metrics["frames"])
    assert last < first * 0.5, (first, last)
    assert acc > 0.8, acc
    ev = make_eval_step(cfg, loss="ce")(state.params, batch)
    assert float(ev["correct"]) / float(ev["frames"]) > 0.8


def test_frame_labels_batching():
    """frame_labels pads labels to the quantized feature length."""
    rng = np.random.default_rng(0)
    utts = [
        Utterance(f"u{i}", rng.standard_normal((30 + i, 4)).astype(np.float32),
                  rng.integers(1, 5, size=30 + i).astype(np.int32))
        for i in range(3)
    ]
    cfg = BatchConfig(num_sequence=4, time_quant=16, frame_labels=True)
    (b,) = list(make_batches(utts, cfg))
    assert b["labels"].shape[1] == b["feats"].shape[1] == 32
    assert b["label_lengths"][0] == b["feat_lengths"][0]


@pytest.mark.parametrize("algo", ["sgd", "adagrad", "rmsprop"])
def test_flat_optimizer_matches_tree(algo):
    """The flat (single-vector) optimizer is numerically identical to the
    per-leaf optax chain — same transforms, same values, one layout."""
    import optax
    from eesen_tpu.models.model import init_model
    from eesen_tpu.training.optim import make_optimizer

    cfg = AcousticModelConfig(
        input_dim=6, cell_dim=8, num_layers=2, num_targets=5,
        compute_dtype=jnp.float32,
    )
    params = init_model(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(algorithm=algo, momentum=0.9, max_grad=1.0)

    results = []
    for flat in (False, True):
        tx = make_optimizer(ocfg, flat=flat)
        p = params
        st = tx.init(p)
        st = st._replace(
            hyperparams=dict(st.hyperparams, learning_rate=jnp.float32(0.1))
        )
        for i in range(5):
            g_rng = np.random.default_rng(100 + i)   # same grads both runs
            grads = jax.tree_util.tree_map(
                lambda a: jnp.asarray(
                    g_rng.standard_normal(a.shape).astype(np.float32) * 3.0
                ),
                p,
            )
            upd, st = tx.update(grads, st, p)
            p = optax.apply_updates(p, upd)
        results.append(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        results[0], results[1],
    )
