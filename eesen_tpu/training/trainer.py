"""The training loop: jitted SPMD train/eval steps + epoch driver.

Replaces the reference's split of responsibilities where the C++ binary did
one epoch of SGD (reference: src/netbin/train-ctc-parallel.cc:144-218) and
the shell did LR scheduling / early stop / resume
(steps/train_ctc_parallel.sh:132-190):

- `make_train_step` builds ONE jitted SPMD program: forward (BiLSTM stack),
  CTC loss, backward, clip, update — batch sharded over the mesh `data`
  axis, params sharded over `model`/replicated over `data`.  The gradient
  all-reduce over `data` that XLA inserts replaces the file-based model
  averaging communicator (src/net/communicator.h) entirely.
- The greedy token-accuracy monitor (src/net/ctc-loss.cc:235 ErrorRateMSeq)
  is device argmax + host edit distance, as in the reference.
- `Trainer.fit` runs the newbob epoch loop with checkpoint/resume via orbax.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eesen_tpu.models.model import AcousticModelConfig, apply_model, init_model
from eesen_tpu.ops.ce import ce_loss
from eesen_tpu.ops.ctc import ctc_loss
from eesen_tpu.training.metrics import EpochReport, token_error_counts
from eesen_tpu.training.optim import OptimizerConfig, make_optimizer
from eesen_tpu.training.schedule import NewbobConfig, NewbobScheduler
from eesen_tpu.parallel.sharding import shard_batch, shard_state
from eesen_tpu.utils.logging import get_logger
from eesen_tpu.utils.timer import Timer

log = get_logger("training.trainer")

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def create_train_state(
    rng: Array, model_cfg: AcousticModelConfig, opt_cfg: OptimizerConfig
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = init_model(rng, model_cfg)
    tx = make_optimizer(opt_cfg)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def _obj_and_metrics(params, batch, model_cfg, rng, train, loss="ctc",
                     with_argmax=True):
    """Unnormalized objective sum + monitor metrics for one batch.

    loss="ctc": per-utterance CTC negative log-likelihood (the reference's
    train-ctc objective).  loss="ce": per-frame cross entropy against
    frame-aligned labels (reference: src/netbin/train-ce.cc /
    train-ce-parallel.cc; labels [B, T] padded to the feature length —
    BatchConfig(frame_labels=True)); metrics gain a `correct` count, the
    frame-accuracy monitor of src/net/ce-loss.cc."""
    logits = apply_model(
        params, batch["feats"], batch["feat_lengths"], model_cfg,
        train=train, rng=rng,
    )
    metrics = {}
    if with_argmax:
        # the greedy-decode TER monitor input; EXPENSIVE on TPU relative
        # to the step (~2.8 ms for [32,768,72] on v5e — a non-128 reduce
        # axis lowers poorly), so the trainer requests it only on the
        # batches whose TER it will actually compute (cfg.ter_step)
        metrics["argmax"] = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if loss == "ce":
        t = logits.shape[1]
        _, m = ce_loss(logits, batch["feat_lengths"], batch["labels"][:, :t])
        metrics.update(
            obj_sum=m["obj_sum"], frames=m["frames"], correct=m["correct"],
        )
        return m["obj_sum"], metrics
    nll = ctc_loss(
        logits, batch["feat_lengths"], batch["labels"],
        batch["label_lengths"],
    )
    metrics.update(
        obj_sum=jnp.sum(nll), frames=jnp.sum(batch["feat_lengths"]),
    )
    return jnp.sum(nll), metrics


def _loss_and_metrics(params, batch, model_cfg, rng, train, loss="ctc",
                      with_argmax=True):
    obj, metrics = _obj_and_metrics(params, batch, model_cfg, rng, train,
                                    loss, with_argmax)
    frames = metrics["frames"]
    return obj / jnp.maximum(frames, 1).astype(obj.dtype), metrics


def make_train_step(
    model_cfg: AcousticModelConfig,
    tx: optax.GradientTransformation,
    donate: bool = True,
    loss: str = "ctc",
    with_argmax: bool = False,
) -> Callable:
    """Returns jitted train_step(state, batch, rng, learn_rate) ->
    (state, metrics).

    Sharding is placement-driven: put the state on a mesh with
    `parallel.shard_state` and the batch with `parallel.shard_batch`, and
    jit infers the SPMD partitioning (gradient psum over `data`, sharded
    matmuls over `model`).  The same compiled step serves single-chip and
    multi-chip runs.
    """

    loss_kind = loss

    def train_step(state: TrainState, batch, rng, learn_rate):
        def loss_fn(p):
            return _loss_and_metrics(p, batch, model_cfg, rng, True,
                                     loss_kind, with_argmax)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # inject the epoch learning rate (newbob decides it outside jit)
        opt_state = state.opt_state._replace(
            hyperparams=dict(
                state.opt_state.hyperparams, learning_rate=learn_rate
            )
        )
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, new_opt_state, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_shard_map_train_step(
    model_cfg: AcousticModelConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    loss: str = "ctc",
    with_argmax: bool = False,
) -> Callable:
    """Train step as `shard_map`: MANUAL data parallelism (explicit
    gradient pmean over the `data` axis) with the `model` axis left to the
    auto-sharding partitioner.

    This is required when the per-direction LSTM recurrence runs as a
    Pallas kernel: XLA cannot auto-partition a pallas_call over the batch,
    so under plain jit a multi-chip run would all-gather and replicate it.
    Inside shard_map each device runs the kernel on its local batch shard,
    which is the intended SPMD (the shard_map analogue of the reference's
    one-process-per-GPU data parallelism, minus the file averaging —
    src/net/communicator.h)."""
    from jax.sharding import PartitionSpec as P

    from eesen_tpu.parallel.sharding import batch_pspec

    loss_kind = loss

    def local_step(state: TrainState, batch, rng, learn_rate):
        def loss_fn(p):
            obj, metrics = _obj_and_metrics(
                p, batch, model_cfg, rng, True, loss_kind, with_argmax
            )
            # normalize by GLOBAL frame count so every shard computes the
            # same objective scale
            frames = jax.lax.psum(metrics["frames"], "data")
            metrics["frames"] = frames
            if "correct" in metrics:
                metrics["correct"] = jax.lax.psum(metrics["correct"], "data")
            return obj / jnp.maximum(frames, 1).astype(obj.dtype), metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.psum(grads, "data")   # sum of per-frame-normalized
        opt_state = state.opt_state._replace(
            hyperparams=dict(
                state.opt_state.hyperparams, learning_rate=learn_rate
            )
        )
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(
            metrics,
            loss=jax.lax.psum(loss, "data"),
            obj_sum=jax.lax.psum(metrics["obj_sum"], "data"),
        )
        return TrainState(params, new_opt_state, state.step + 1), metrics

    # build in/out specs: params replicated over data (model handled by
    # the auto axis), batch sharded over data
    def state_specs(state):
        return TrainState(
            params=jax.tree_util.tree_map(lambda _: P(), state.params),
            opt_state=jax.tree_util.tree_map(lambda _: P(), state.opt_state),
            step=P(),
        )

    b_specs = batch_pspec()
    metric_specs = {"obj_sum": P(), "frames": P(), "loss": P()}
    if with_argmax:
        metric_specs["argmax"] = P("data")
    if loss == "ce":
        metric_specs["correct"] = P()

    def step(state, batch, rng, learn_rate):
        sm = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_specs(state), b_specs, P(), P()),
            out_specs=(state_specs(state), metric_specs),
            axis_names={"data"},     # manual over data; model stays auto
            check_vma=False,
        )
        return sm(state, batch, rng, learn_rate)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model_cfg: AcousticModelConfig, loss: str = "ctc",
) -> Callable:
    """Cross-validation step (no backprop) — the reference's
    --cross-validate=true mode (train-ctc-parallel.cc:116-119,206)."""

    def eval_step(params, batch):
        _, metrics = _loss_and_metrics(
            params, batch, model_cfg, None, False, loss
        )
        return metrics

    return jax.jit(eval_step)


@dataclasses.dataclass
class TrainerConfig:
    model: AcousticModelConfig = AcousticModelConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    newbob: NewbobConfig = NewbobConfig()
    seed: int = 777
    report_step: int = 100       # log every N batches (reference report_step)
    checkpoint_dir: Optional[str] = None
    # compute the (host-side) token-error-rate monitor every N train
    # batches; 1 = every batch like the reference's ErrorRateMSeq
    # (ctc-loss.cc:235).  CV epochs always use every batch since newbob
    # halves on CV accuracy.  The monitor is also processed one step
    # LATE so the host edit distance overlaps the next device step
    # instead of serializing with it.
    ter_step: int = 1
    # objective: "ctc" (train-ctc-parallel) or "ce" (train-ce-parallel,
    # frame-aligned labels — pair with BatchConfig(frame_labels=True))
    loss: str = "ctc"


class Trainer:
    """Epoch-level driver: newbob LR schedule, CV early stop, checkpointing."""

    def __init__(self, cfg: TrainerConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state, self.tx = create_train_state(
            init_rng, cfg.model, cfg.optimizer
        )
        if mesh is not None:
            self.state = shard_state(self.state, mesh)
            # manual-DP shard_map step: required for the Pallas LSTM to
            # run on local shards instead of being replicated by jit
            self.train_step = make_shard_map_train_step(
                cfg.model, self.tx, mesh, loss=cfg.loss
            )
            self.train_step_ter = make_shard_map_train_step(
                cfg.model, self.tx, mesh, loss=cfg.loss, with_argmax=True
            )
        else:
            self.train_step = make_train_step(cfg.model, self.tx,
                                              loss=cfg.loss)
            self.train_step_ter = make_train_step(
                cfg.model, self.tx, loss=cfg.loss, with_argmax=True
            )
        self.eval_step = make_eval_step(cfg.model, loss=cfg.loss)
        self.sched = NewbobScheduler(cfg.newbob)

    def run_epoch(
        self, batches: Iterable[Dict[str, np.ndarray]], train: bool,
        learn_rate: float,
    ) -> EpochReport:
        report = EpochReport()
        timer = Timer()
        n = 0
        ter_step = max(self.cfg.ter_step, 1) if train else 1
        # metrics are processed ONE STEP LATE: the host fetch + edit
        # distance for step t runs while step t+1 executes on device, so
        # the loop never serializes host against device (the round-1
        # implementation fetched synchronously every batch and idled the
        # chip; bench.py's chained-step throughput is now the real loop's)
        pending = None   # (metrics, batch_meta, want_ter)

        def process(entry):
            metrics, meta, want_ter = entry
            feat_lengths, labels, label_lengths = meta
            if want_ter and "correct" in metrics:
                # CE: frame accuracy (src/net/ce-loss.cc monitor), no
                # host edit distance needed
                refs = int(metrics["frames"])
                errs = refs - int(metrics["correct"])
            elif want_ter:
                errs, refs = token_error_counts(
                    np.asarray(metrics["argmax"]),
                    feat_lengths, labels, label_lengths,
                )
            else:
                errs = refs = 0
            report.update(
                float(metrics["obj_sum"]), int(metrics["frames"]),
                errs, refs, int(np.sum(feat_lengths > 0)),
            )

        for batch in batches:
            keys = batch.pop("keys", None)
            if self.mesh is not None:
                dev_batch = shard_batch(batch, self.mesh)
            else:
                dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if train:
                self.rng, step_rng = jax.random.split(self.rng)
                # the argmax-bearing variant only on TER batches: the
                # [B,T,V] argmax costs ~10% of a step on TPU (see
                # _obj_and_metrics); CE needs no argmax at all
                want_ter_now = (n + 1) % ter_step == 0
                step_fn = (
                    self.train_step_ter
                    if want_ter_now and self.cfg.loss != "ce"
                    else self.train_step
                )
                self.state, metrics = step_fn(
                    self.state, dev_batch, step_rng,
                    jnp.float32(learn_rate),
                )
            else:
                metrics = self.eval_step(self.state.params, dev_batch)
            n += 1
            if pending is not None:
                process(pending)
            pending = (
                metrics,
                (batch["feat_lengths"], batch["labels"],
                 batch["label_lengths"]),
                n % ter_step == 0,
            )
            if n % self.cfg.report_step == 0:
                fps = report.total_frames / max(timer.elapsed(), 1e-9)
                log.info(
                    "%s batch %d: %s (%.0f frames/sec)",
                    "TRAIN" if train else "CV", n, report.report(), fps,
                )
        if pending is not None:
            process(pending)
        return report

    def fit(
        self,
        train_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
        cv_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
        resume: bool = True,
    ) -> Dict[str, float]:
        """Run newbob epochs until convergence; returns final metrics.

        With a checkpoint_dir and resume=True, training continues from the
        latest saved epoch (the reference resumed via .epoch/.cvacc/
        .halving/.lrate dotfiles + nnet.iterN —
        steps/train_ctc_parallel.sh:74-78)."""
        if resume and self.cfg.checkpoint_dir:
            latest = self.latest_checkpoint()
            if latest is not None:
                log.info("resuming from epoch %d checkpoint", latest)
                self.restore_checkpoint(latest)
        # batch sources may take the (1-based) epoch number — the hook
        # the multi-tag augmentation rotation uses
        # (steps/train_ctc_parallel_mult.sh:205 picks the feature view
        # by (iter-1) % n_tags)
        import inspect
        takes_epoch = bool(inspect.signature(train_batches_fn).parameters)
        history = {}
        while True:
            if self.sched.finished or self.sched.epoch > self.sched.cfg.max_iters:
                # restored schedule already signalled completion — do NOT
                # train a phantom extra epoch; proceed straight to whatever
                # follows (decode).  Matches the reference, where a final
                # `.epoch` dotfile ends the shell loop before another iter
                # starts (steps/train_ctc_parallel.sh:132-190).
                log.info(
                    "schedule complete (epoch %d > max_iters %d or finished) "
                    "— skipping training",
                    self.sched.epoch, self.sched.cfg.max_iters,
                )
                break
            epoch = self.sched.epoch
            lr = self.sched.learn_rate
            tr = self.run_epoch(
                train_batches_fn(epoch) if takes_epoch
                else train_batches_fn(),
                True, lr,
            )
            cv = self.run_epoch(cv_batches_fn(), False, lr)
            log.info(
                "EPOCH %d: lrate %.6g, TRAIN ACCURACY %.4f%%, "
                "VALID ACCURACY %.4f%%",
                epoch, lr, tr.token_accuracy, cv.token_accuracy,
            )
            history[epoch] = {
                "train_acc": tr.token_accuracy,
                "cv_acc": cv.token_accuracy,
                "train_obj": tr.obj_per_frame,
                "cv_obj": cv.obj_per_frame,
            }
            stop, _ = self.sched.report(cv.token_accuracy)
            if self.cfg.checkpoint_dir:
                # saved after the schedule update, so a resume continues
                # with the NEXT epoch (the reference's `.epoch` dotfile
                # stores iter+1 the same way)
                self.save_checkpoint(epoch)
            if stop:
                break
        return history

    # ---- checkpointing (replaces nnet.iterN files + dotfiles) ----
    def latest_checkpoint(self) -> Optional[int]:
        d = self.cfg.checkpoint_dir
        if not d or not os.path.isdir(d):
            return None
        epochs = [
            int(name.split("_", 1)[1])
            for name in os.listdir(d)
            if name.startswith("epoch_") and name.split("_", 1)[1].isdigit()
        ]
        return max(epochs) if epochs else None

    def save_checkpoint(self, epoch: int) -> None:
        import orbax.checkpoint as ocp

        path = os.path.join(
            os.path.abspath(self.cfg.checkpoint_dir), f"epoch_{epoch}"
        )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
            force=True,
        )
        ckptr.wait_until_finished()
        self.sched.save(
            os.path.join(os.path.abspath(self.cfg.checkpoint_dir), "sched.json")
        )

    def restore_checkpoint(self, epoch: int) -> None:
        import orbax.checkpoint as ocp

        path = os.path.join(
            os.path.abspath(self.cfg.checkpoint_dir), f"epoch_{epoch}"
        )
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = ckptr.restore(path, target)
        self.state = TrainState(
            restored["params"], restored["opt_state"], restored["step"]
        )
        sched_path = os.path.join(
            os.path.abspath(self.cfg.checkpoint_dir), "sched.json"
        )
        if os.path.exists(sched_path):
            self.sched = NewbobScheduler.load(sched_path, self.cfg.newbob)
