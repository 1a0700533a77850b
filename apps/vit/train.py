"""Finetune ViT on downstream datasets while freezing selected components.

Reference: apps/vit/train.py (TrainingConfig :43-101, train :109-345, main
:349-387). The run-dir layout, metric record fields (loss/step/lr/grad_norm/
elapsed_steps/ts), best-model checkpoint policy (save only on new best val
accuracy, rewind saved_step at exit so the best checkpoint survives,
train.py:334-343) and the OmegaConf-style CLI contract are preserved.

TPU redesign (SURVEY §7.0):
  - forward + backward + clip + optimizer + schedule run as ONE jitted step on
    a ``Mesh(('dp','tp'))``; gradient all-reduce is inserted by XLA from the
    batch sharding (reference's dormant ComputingManager, distributed.py:140-283,
    is live here);
  - selective freezing = static optax mask (no retrace across the 7 freeze
    configs);
  - grad accumulation = lax.scan inside the step with identical loss scaling;
  - metrics stay on device between logging periods (one ``.item()``-style sync
    per logging_period, not per step);
  - data augment executes on device (see vitef_tpu.data.images.loader).
"""

from __future__ import annotations

import logging
import time
from contextlib import ExitStack
from dataclasses import asdict, dataclass, field

import jax
import jax.numpy as jnp

from vitef_tpu.data.images import build_train_val_loader, make_iterable
from vitef_tpu.models import build_model
from vitef_tpu.monitor import Checkpointer, Logger, Utility, build_orchestrator
from vitef_tpu.monitor.checkpoint import _unflatten_like
from vitef_tpu.optim import build_optimizer, build_scheduler
from vitef_tpu.parallel import (
    TrainState,
    build_mesh,
    init_train_state,
    make_train_step,
    shard_batch,
    shard_params,
)
from vitef_tpu.utils.cli import load_config_from_cli

from .eval import run_evaluation
from .utils import freeze_components

logger = logging.getLogger("vitef")


@dataclass
class TrainingConfig:
    """Reference TrainingConfig (train.py:43-101) + TPU execution knobs."""

    # Model
    model_name: str = "base"
    patch_size: int = 16
    image_dim: tuple = (3, 224, 224)
    components: list[str] | None = None
    pretrained: bool = True
    in21k: bool = True

    # Data
    dataset_name: str = "cifar10"
    train_size: float = 0.8
    batch_size: int = 512
    val_batch_size: int = 512
    data_dir: str | None = None
    num_workers: int = 8

    # Training
    n_steps: int = 10_000
    grad_acc_steps: int = 1
    grad_clip: float | None = None
    # Cap on the per-device microbatch (0 disables). Above it, the step
    # auto-selects exact gradient accumulation: on v5e a 1x512 ViT-B step
    # exceeds HBM and XLA panic-remats the fc1/patchify fusions (~29 ms of
    # recompute, 1108 img/s) while 2x256 accumulation runs 1229 img/s —
    # faster than even a plain 256 step (PERF.md "Batch-512 inversion").
    # Exact for LayerNorm models: mean of equal-microbatch mean-gradients
    # == full-batch gradient (grad-acc equivalence test, tests/test_parallel.py).
    auto_microbatch: int = 256

    # Evaluation
    eval_period: int = 1000

    # Optimizer
    optimizer: str = "sgd"
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 0.0

    # Scheduler
    scheduler: str = "constant"
    warmup: int = 2000
    min_factor: float = 0

    # TPU execution (replaces the reference's ``device`` field)
    dp: int = -1
    tp: int = 1
    fsdp: bool = False
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"
    remat: bool = False
    # log per-block gradient norms each logging period (computed on device
    # inside the jitted step; BASELINE.json north-star capability)
    log_block_grad_norms: bool = False

    # Orchestrator
    log_dir: str = ""
    overwrite: bool = False
    logging_period: int = 10
    logging_level: str = "INFO"
    seed: int = 42
    utility_period: int = 1000

    def __post_init__(self):
        if (self.eval_period <= 0) or (self.eval_period > self.n_steps):
            self.eval_period = self.n_steps
        if self.seed is None:
            self.seed = 42
        if isinstance(self.image_dim, list):
            self.image_dim = tuple(self.image_dim)


def _auto_grad_acc(per_dev: int, cap: int) -> int:
    """Smallest in-step microbatch split (1..8) bringing the per-device rows
    under ``cap`` — 1 if already under, not evenly splittable, or cap<=0.

    Numerically exact (equal microbatches -> mean of mean-gradients is the
    full-batch gradient); on v5e it turns the batch-512 HBM panic-remat
    regression into the FASTEST config (PERF.md "Batch-512 inversion")."""
    if cap <= 0 or per_dev <= cap:
        return 1
    for acc in range(2, 9):
        if per_dev % acc == 0 and per_dev // acc <= cap:
            return acc
    return 1


def train(config: TrainingConfig) -> None:
    """Run training, checkpointing the best evaluated model (train.py:109-345)."""
    with ExitStack() as context_stack:
        # -- orchestrator / logger / utility -------------------------------
        orchestrator = build_orchestrator({
            "log_dir": config.log_dir,
            "overwrite": config.overwrite,
            "config_file": asdict(config),
            "checkpoint_period": 0,
            "checkpoint_n_kept": 1,
            "logging_period": config.logging_period,
            "logging_level": config.logging_level,
            "seed": config.seed,
            "utility_period": config.utility_period,
        })
        metric_logger = Logger(config=orchestrator["logger"], eval=False)
        context_stack.enter_context(metric_logger)
        utils = Utility(config=orchestrator["utility"])
        context_stack.enter_context(utils)  # seeds numpy globally (split parity)

        # -- mesh ----------------------------------------------------------
        mesh = build_mesh(dp=config.dp, tp=config.tp)
        # Multi-chip execution path (PARITY.md round 2): dp-only meshes use
        # the EXPLICIT shard_map train step so the packed bf16 MHA kernel can
        # run per-device (no SPMD rule exists for a pallas_call); tp/fsdp
        # meshes stay on pjit auto-sharding with XLA attention.
        use_shard_map = (mesh.size > 1 and mesh.shape["tp"] == 1
                         and not config.fsdp)

        # -- data ----------------------------------------------------------
        logger.info("Building dataloaders.")
        loader_config = {
            "dataset_name": config.dataset_name,
            "batch_size": config.batch_size,
            "val_batch_size": config.val_batch_size,
            "size": config.image_dim[-1],
            "num_workers": config.num_workers,
            "compute_dtype": config.compute_dtype,
            "seed": config.seed,
            # multi-host DP: each process loads a disjoint shard of each epoch
            "shard_index": jax.process_index(),
            "shard_count": jax.process_count(),
        }
        if config.data_dir:
            loader_config["save_dir"] = config.data_dir
        train_loader, val_loader, n_classes = build_train_val_loader(
            config=loader_config, train_size=config.train_size, return_n_classes=True
        )
        logger.info("Done building dataloaders.")

        # -- model ---------------------------------------------------------
        logger.info("Building model.")
        model, model_config = build_model(
            config={
                "implementation": "vit",
                "model_name": config.model_name,
                "pretrained": config.pretrained,
                "in21k": config.in21k,
                "patch_size": config.patch_size,
                "image_dim": config.image_dim,
                "finetuning": True,
                "n_classes": n_classes,
                "compute_dtype": config.compute_dtype,
                # Under the shard_map DP step the kernel runs per-device, so
                # 'auto' may resolve to pallas (resolve_impl's own device_count
                # guard would veto it at trace time — force it here for the
                # TPU bf16 case). On pjit-sharded meshes 'auto' must become
                # xla (a pallas_call has no SPMD partitioning rule).
                "attn_impl": (
                    "pallas" if config.attn_impl == "auto" and use_shard_map
                    and jax.default_backend() == "tpu"
                    and config.compute_dtype == "bfloat16"
                    else "xla" if config.attn_impl == "auto" and mesh.size > 1
                    else config.attn_impl),
                "norm_impl": config.norm_impl,
                "remat": config.remat,
            },
            key=jax.random.key(config.seed),
            return_config=True,
        )
        trainable = freeze_components(model.params, config.components)
        params = shard_params(model.params, mesh, fsdp=config.fsdp)
        logger.info("Done building model.")

        # -- optimizer / scheduler / jitted step ---------------------------
        logger.info("Building optimizer.")
        schedule = build_scheduler(
            {"scheduler": config.scheduler, "warmup": config.warmup,
             "min_factor": config.min_factor},
            n_steps=config.n_steps,
        )
        tx, _ = build_optimizer(
            {"optimizer": config.optimizer, "lr": config.lr,
             "momentum": config.momentum, "weight_decay": config.weight_decay},
            schedule=schedule,
            params=params,
            components=config.components,
            grad_clip=config.grad_clip,
        )
        grad_acc_steps = config.grad_acc_steps
        if grad_acc_steps == 1 and config.auto_microbatch > 0:
            # Per-process batch rows per local dp-device per microbatch.
            local_dp = max(mesh.shape["dp"] // jax.process_count(), 1)
            per_dev = config.batch_size // min(local_dp, jax.local_device_count())
            grad_acc_steps = _auto_grad_acc(per_dev, config.auto_microbatch)
            if grad_acc_steps > 1:
                logger.info(
                    f"Per-device batch {per_dev} > auto_microbatch "
                    f"{config.auto_microbatch}: using exact gradient "
                    f"accumulation x{grad_acc_steps} (see PERF.md).")
        step_fn = make_train_step(
            model.apply, tx, grad_acc_steps=grad_acc_steps,
            schedule=schedule, base_lr=config.lr, trainable=trainable,
            mesh=mesh if use_shard_map else None,
            block_grad_norms=config.log_block_grad_norms,
        )
        state = init_train_state(params, tx)
        state_box = {"state": state}
        logger.info("Done building optimizer.")

        # -- checkpointer (bridges TrainState <-> reference state dict) ----
        def get_state():
            s: TrainState = state_box["state"]
            return {
                "model": s.params,
                "optim": s.opt_state,
                "training": {"step": int(s.step), "acc_step": int(s.acc_step)},
            }

        def set_state(model_flat, optim_flat, training):
            s: TrainState = state_box["state"]
            # _unflatten_like reads only tree structure + shapes — never
            # device_get the live state: on >1 process the FSDP-sharded
            # arrays span non-addressable devices and cannot be fetched.
            params = _unflatten_like(s.params, model_flat)
            params = shard_params(params, mesh, fsdp=config.fsdp)
            opt_state = s.opt_state
            if optim_flat is not None:
                # restore mesh-sharded leaves onto their live sharding (plain
                # device_put would build single-device arrays that a
                # multi-process pjit step cannot consume); scalar counters etc.
                # stay uncommitted so jit places them freely
                from jax.sharding import NamedSharding

                opt_state = jax.tree.map(
                    lambda live, host: jax.device_put(host, live.sharding)
                    if isinstance(live.sharding, NamedSharding)
                    else jnp.asarray(host),
                    s.opt_state, _unflatten_like(s.opt_state, optim_flat))
            state_box["state"] = TrainState(
                params=params, opt_state=opt_state,
                step=jnp.asarray(int(training["step"]), jnp.int32),
                acc_step=jnp.asarray(int(training.get("acc_step", 0)), jnp.int32),
            )

        checkpoint = Checkpointer(
            config=orchestrator["checkpointer"],
            get_state=get_state, set_state=set_state,
            model_config=model_config,
        )
        context_stack.enter_context(checkpoint)  # auto-resume

        metric_logger.report_model_size(state_box["state"].params, trainable)
        current_time = time.time()
        current_step = int(state_box["state"].step)
        checkpoint.sync_step(current_step)

        logging_period = orchestrator["logger"].period
        eval_period = config.eval_period
        best_eval_accuracy = 0.0
        best_eval_step = 0

        iterator = iter(make_iterable(train_loader))
        rng = jax.random.key(config.seed)

        # Preemption safety (beyond the reference, SURVEY §5.3): SIGTERM sets
        # a flag; the loop below checkpoints the CURRENT state and exits
        # cleanly, and the next launch auto-resumes from that step.
        from vitef_tpu.monitor.preemption import PreemptionGuard

        preempt = context_stack.enter_context(PreemptionGuard())
        preempted = False

        # Python-side step mirror: avoids a device sync on state.step per
        # iteration (the jitted step keeps the device queue full).
        py_step = current_step
        last_metrics = None
        while py_step < config.n_steps:
            # -- batch (grad_acc_steps microbatches per optimizer step) ----
            if config.grad_acc_steps > 1:
                xs, ys = zip(*(next(iterator) for _ in range(config.grad_acc_steps)))
                x_batch = jnp.concatenate(xs)
                y_batch = jnp.concatenate(ys)
            else:
                x_batch, y_batch = next(iterator)
            batch = shard_batch((x_batch, y_batch), mesh)

            rng, step_rng = jax.random.split(rng)
            state_box["state"], last_metrics = step_fn(
                state_box["state"], batch, step_rng
            )
            py_step += 1
            step = py_step

            utils()
            checkpoint()

            if preempt.requested:
                logger.info(
                    f"Preemption requested: saving checkpoint at step {step} "
                    "and exiting (resume will continue from here)."
                )
                checkpoint.update()
                preempted = True
                break

            # -- log metrics (device sync only at logging period) ----------
            if (logging_period > 0) and (step % logging_period == 0):
                logger.info(f"Metric logging at step {step}.")
                elapsed_time = time.time() - current_time
                elapsed_steps = step - current_step
                current_time, current_step = time.time(), step
                metric_logger({
                    "loss": float(last_metrics["loss"]),
                    "step": step,
                    "lr": float(last_metrics["lr"]),
                    "grad_norm": float(last_metrics["grad_norm"]),
                    **{k: float(v) for k, v in last_metrics.items()
                       if k.startswith("grad_norm_block_")},
                    "elapsed_steps": elapsed_steps,
                    "ts": elapsed_time,
                })

            # -- evaluation + best-model checkpoint ------------------------
            if (eval_period > 0) and (step % eval_period == 0):
                logger.info(f"Evaluation at step {step}.")
                metrics = run_evaluation(
                    model, state_box["state"].params, val_loader, mesh=mesh
                )
                metrics |= {"step": step}
                metric_logger(metrics)
                if metrics["eval_acc"] > best_eval_accuracy:
                    best_eval_accuracy = metrics["eval_acc"]
                    best_eval_step = step
                    logger.info(
                        f"Saving the current best model (validation accuracy of "
                        f"{best_eval_accuracy * 100:.2f}%)."
                    )
                    checkpoint.update()

        # Ensure the surviving checkpoint is the best evaluated model
        # (reference train.py:343 + checkpoint.py:142-148). On preemption the
        # LATEST state must survive instead — no best-step rewind.
        if not preempted:
            checkpoint.sync_step(best_eval_step)

    logger.info("Training preempted." if preempted else "Training done.")


def main() -> None:
    """``python -m apps.vit.train config=<yaml> [k=v ...]`` — defaults ← yaml ←
    dotted CLI overrides (reference train.py:349-387)."""
    config = load_config_from_cli(TrainingConfig)
    train(config)


if __name__ == "__main__":
    main()
