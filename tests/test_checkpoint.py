"""Checkpoint/resume tests for the trainer (orbax round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.schedule import NewbobConfig
from eesen_tpu.training.trainer import Trainer, TrainerConfig
from tests.test_training import _toy_batch


def make_cfg(tmp_path, max_iters=2):
    return TrainerConfig(
        model=AcousticModelConfig(
            input_dim=6, cell_dim=8, num_layers=1, num_targets=5,
            compute_dtype=jnp.float32,
        ),
        optimizer=OptimizerConfig(algorithm="adagrad"),
        newbob=NewbobConfig(learn_rate=0.05, max_iters=max_iters,
                            min_iters=max_iters),
        checkpoint_dir=str(tmp_path / "ckpt"),
        report_step=1000,
    )


def batches():
    rng = np.random.default_rng(0)
    b = _toy_batch(rng, 4, 12, 6, 5)
    return [dict(b) for _ in range(3)]


def test_fit_saves_and_resumes(tmp_path):
    cfg = make_cfg(tmp_path, max_iters=2)
    t1 = Trainer(cfg)
    hist1 = t1.fit(lambda: iter(batches()), lambda: iter(batches()))
    assert t1.latest_checkpoint() == 2

    # a fresh trainer resumes from the saved epoch and state
    t2 = Trainer(make_cfg(tmp_path, max_iters=3))
    latest = t2.latest_checkpoint()
    assert latest == 2
    t2.restore_checkpoint(latest)
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # scheduler state restored too
    assert t2.sched.epoch == t1.sched.epoch


def test_resume_finished_run_trains_zero_batches(tmp_path):
    """Resuming a COMPLETED run must not train a phantom extra epoch.

    Round-4 regression: the restored schedule (epoch = max_iters + 1)
    re-entered the train loop for a full epoch before the stop check ran
    (reference semantics: a final `.epoch` dotfile ends the loop —
    steps/train_ctc_parallel.sh:132-190)."""
    cfg = make_cfg(tmp_path, max_iters=2)
    t1 = Trainer(cfg)
    t1.fit(lambda: iter(batches()), lambda: iter(batches()))
    assert t1.sched.finished

    calls = {"train": 0, "cv": 0}

    def counting(kind):
        def gen():
            calls[kind] += 1
            return iter(batches())
        return gen

    t2 = Trainer(make_cfg(tmp_path, max_iters=2))
    hist = t2.fit(counting("train"), counting("cv"))
    assert calls == {"train": 0, "cv": 0}
    assert hist == {}
    assert t2.sched.finished


def test_resume_legacy_sched_json_without_finished_flag(tmp_path):
    """Old sched.json files (no `finished` key) with epoch > max_iters
    must also be treated as complete."""
    import json
    from eesen_tpu.training.schedule import NewbobConfig, NewbobScheduler

    p = tmp_path / "sched.json"
    p.write_text(json.dumps(
        {"epoch": 3, "cvacc_prev": 50.0, "halving": True,
         "learn_rate": 0.01}))
    sched = NewbobScheduler.load(str(p), NewbobConfig(max_iters=2))
    assert sched.finished
