"""Evaluate finetuned ViT checkpoints (top-1 accuracy on the test split).

Reference: apps/vit/eval.py (run_evaluation :45-89, EvaluationConfig :97-128,
eval :139-200, main :204-243). Flow preserved: reload run config.json + pick a
checkpoint (last if unspecified), rebuild the model from the checkpoint's
params.json, load only the ``model`` entry, sweep the test loader accumulating
mean-of-batch-means accuracy/loss, log ``test_acc`` to metrics/eval.jsonl.

TPU redesign: the per-batch forward is one jitted eval step; accuracy/loss stay
on device until the end-of-loader reduction (one host sync per batch, matching
the reference's ``.item()``).
"""

from __future__ import annotations

import json
import logging
from contextlib import ExitStack
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax

from vitef_tpu.data.images import build_loader
from vitef_tpu.models import build_model
from vitef_tpu.monitor import Logger, Utility, build_eval_orchestrator, load_checkpoint_params
from vitef_tpu.parallel import make_eval_step
from vitef_tpu.utils.cli import load_config_from_cli

from .utils import EvalState

logger = logging.getLogger("vitef")


def run_evaluation(model, params, loader, mesh=None) -> dict[str, Any]:
    """Mean-of-batch-means accuracy and loss (reference eval.py:45-89).

    ``model`` is the Model bundle — its ``eval_step`` cached_property holds
    the one compiled step per model, so periodic eval never recompiles.

    Multi-host: the validation loader is deliberately UNsharded (every host
    iterates the identical full set so best-checkpoint decisions agree), so
    each batch is the same value on every process — replicate it onto the
    global mesh before feeding params that span non-addressable devices.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    state = EvalState()
    eval_step = model.eval_step if hasattr(model, "eval_step") \
        else make_eval_step(model)
    replicate = mesh is not None and jax.process_count() > 1
    for x_batch, y_batch in loader:
        if replicate:
            sharding = NamedSharding(mesh, PartitionSpec())
            x_batch = jax.device_put(x_batch, sharding)
            y_batch = jax.device_put(y_batch, sharding)
        acc, loss = eval_step(params, (x_batch, y_batch))
        state.accuracy += float(acc)
        state.loss += float(loss)
        state.step += 1
    return {
        "eval_acc": state.accuracy / max(state.step, 1),
        "eval_loss": state.loss / max(state.step, 1),
    }


@dataclass
class EvaluationConfig:
    """Reference eval.py:97-128 (+ loader/TPU knobs)."""

    log_dir: str = ""
    checkpoint_step: str | None = None

    dataset_name: str | None = None
    batch_size: int = 512
    data_dir: str | None = None

    seed: int = 42
    logging_level: str = "INFO"

    # TPU knobs
    compute_dtype: str = "float32"
    num_workers: int = 8

    def __post_init__(self):
        if self.seed is None:
            self.seed = 42


def eval(config: EvaluationConfig) -> dict[str, Any]:
    with ExitStack() as context_stack:
        orchestrator = build_eval_orchestrator({
            "log_dir": config.log_dir,
            "checkpoint_step": config.checkpoint_step,
            "logging_level": config.logging_level,
            "seed": config.seed,
        })
        metric_logger = Logger(config=orchestrator["logger"], eval=True)
        context_stack.enter_context(metric_logger)
        utils = Utility(config=orchestrator["utility"])
        context_stack.enter_context(utils)

        exp_config = orchestrator["exp_config"]
        checkpoint_dir = Path(orchestrator["checkpoint_dir"])
        with open(checkpoint_dir / "params.json") as f:
            model_config = json.load(f)

        if config.dataset_name is None:
            config.dataset_name = exp_config["dataset_name"]

        logger.info("Building dataloader.")
        loader_config = {
            "dataset_name": config.dataset_name,
            "batch_size": config.batch_size,
            "mode": "test",
            "size": exp_config["image_dim"][-1],
            "num_workers": config.num_workers,
            "compute_dtype": config.compute_dtype,
        }
        if config.data_dir:
            loader_config["save_dir"] = config.data_dir
        test_loader, n_classes = build_loader(
            config=loader_config, drop_last=False, return_n_classes=True
        )
        logger.info("Done building dataloader.")

        logger.info("Building model.")
        model = build_model(config=model_config, key=jax.random.key(config.seed))
        logger.info("Done building model.")

        # Load only the model entry from the checkpoint (reference eval.py:189-191)
        params = load_checkpoint_params(checkpoint_dir, model.params)

        metrics = run_evaluation(model, params, test_loader)
        metric_logger({"test_acc": metrics["eval_acc"]})
        logger.info(f"Test accuracy: {metrics['eval_acc'] * 100:.2f}%")

    logger.info("Evaluation done.")
    return metrics


def main() -> None:
    """``python -m apps.vit.eval config=<yaml> [k=v ...]`` (reference eval.py:204-243)."""
    config = load_config_from_cli(EvaluationConfig)
    eval(config)


if __name__ == "__main__":
    main()
