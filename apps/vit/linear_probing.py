"""Linear probing of hidden representations after every ViT sub-component.

Reference: apps/vit/linear_probing.py (get_embeddings :58-116,
run_linear_probing :119-165, LinearProbingConfig :173-213, linear_probing
:220-326, main :330-368). Output contract preserved:
``savings/probes/<name>/{config.json, linear_probing.json}`` with per-key test
accuracies for the 8 stages × n_layers probe keys, probing either a finetuned
checkpoint or the pretrained-in21k backbone (finetuned=False forces in21k,
reference :252-254), CLS-token or mean pooling, sklearn
StandardScaler+LogisticRegression(max_iter=5000, random_state=seed).

TPU redesign: ``get_probes`` + pooling + L2-normalization run inside ONE jitted
function, so only the pooled (N, E) embeddings cross to host — the reference
moves every (N, L, E) component activation to CPU per batch
(architecture.py:420-502 + linear_probing.py:94-111, SURVEY §3.3).
"""

from __future__ import annotations

import json
import logging
from contextlib import ExitStack
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.config import SAVING_DIR
from vitef_tpu.data.images import build_loader, build_train_val_loader
from vitef_tpu.models import build_model
from vitef_tpu.monitor import Utility, build_eval_orchestrator, load_checkpoint_params
from vitef_tpu.utils.cli import load_config_from_cli
from vitef_tpu.utils.tree import get_numpy, json_serializable

logger = logging.getLogger("vitef")

PROBE_DIR = SAVING_DIR / "probes"


def make_probe_embed_fn(model, cls_pooling: bool):
    """Jitted (params, x) → dict of pooled per-component embeddings (N, E)."""

    @jax.jit
    def probe_embed(params, x):
        probes = model.get_probes(params, x)
        out = {}
        for key, val in probes.items():
            emb = val[:, 0, :] if cls_pooling else val.mean(axis=1)
            out[key] = emb.astype(jnp.float32)
        return out

    return probe_embed


def get_embeddings(model, params, loader, cls_pooling: bool) -> tuple:
    """L2-normalized pooled embeddings per probe key (reference :58-116)."""
    probe_embed = make_probe_embed_fn(model, cls_pooling)
    embeddings: dict[str, list] = {}
    labels = []
    for x_batch, y_batch in loader:
        pooled = probe_embed(params, x_batch)
        for key, emb in pooled.items():
            embeddings.setdefault(key, []).append(get_numpy(emb))
        labels.append(get_numpy(y_batch))
    out = {}
    for key, value in embeddings.items():
        value = np.concatenate(value)
        value = value / np.linalg.norm(value, axis=-1, keepdims=True)
        out[key] = value
    return out, np.concatenate(labels)


def run_linear_probing(model, params, train_loader, test_loader,
                       cls_pooling: bool, seed: int,
                       probe_impl: str = "sklearn") -> dict[str, Any]:
    """Per-key probe accuracies (reference :119-165).

    ``probe_impl='sklearn'`` is the reference-exact host probe
    (StandardScaler + LogisticRegression(max_iter=5000)); ``'jax'`` runs the
    same objective on device via L-BFGS (vitef_tpu.probe) — much faster for
    the 8×n_layers keys (SURVEY §7.3 #7).
    """
    train_embeddings, train_labels = get_embeddings(
        model, params, train_loader, cls_pooling
    )
    test_embeddings, test_labels = get_embeddings(
        model, params, test_loader, cls_pooling
    )

    metrics = {}
    if probe_impl == "jax":
        from vitef_tpu.probe import probe_accuracy_jax

        for key in train_embeddings:
            metrics[key] = probe_accuracy_jax(
                train_embeddings[key], train_labels.ravel(),
                test_embeddings[key], test_labels.ravel(),
            )
        return metrics

    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    clf = make_pipeline(
        StandardScaler(),
        LogisticRegression(max_iter=5000, random_state=seed),
    )
    for key in train_embeddings:
        clf.fit(train_embeddings[key], train_labels.ravel())
        metrics[key] = clf.score(test_embeddings[key], test_labels.ravel())
    return metrics


@dataclass
class LinearProbingConfig:
    """Reference linear_probing.py:173-213 (+ loader/TPU knobs)."""

    log_dir: str = ""
    checkpoint_step: str | None = None
    finetuned: bool = True
    cls_pooling: bool = False

    dataset_name: str = "cifar10"
    train_size: float = 0.8
    batch_size: int = 512
    val_batch_size: int = 512
    test_batch_size: int = 512
    data_dir: str | None = None

    seed: int = 42
    logging_level: str = "INFO"

    # TPU knobs
    compute_dtype: str = "float32"
    num_workers: int = 8
    probe_impl: str = "sklearn"  # sklearn (reference-exact) | jax (on-device L-BFGS)

    def __post_init__(self):
        if self.seed is None:
            self.seed = 42


def linear_probing(config: LinearProbingConfig) -> dict[str, Any]:
    """Reference linear_probing (:220-326)."""
    with ExitStack() as context_stack:
        orchestrator = build_eval_orchestrator({
            "log_dir": config.log_dir,
            "checkpoint_step": config.checkpoint_step,
            "logging_level": config.logging_level,
            "seed": config.seed,
        })
        utils = Utility(config=orchestrator["utility"])
        context_stack.enter_context(utils)

        exp_config = orchestrator["exp_config"]
        checkpoint_dir = Path(orchestrator["checkpoint_dir"])
        with open(checkpoint_dir / "params.json") as f:
            model_config = json.load(f)

        # Model only pretrained on ImageNet-21k (reference :252-254)
        if not config.finetuned:
            model_config["pretrained"] = True
            model_config["in21k"] = True

        logger.info("Building model.")
        model = build_model(config=model_config, key=jax.random.key(config.seed))
        params = model.params
        if config.finetuned:
            params = load_checkpoint_params(checkpoint_dir, model.params)
        logger.info("Done building model.")

        logger.info("Building dataloaders.")
        loader_config = {
            "dataset_name": config.dataset_name,
            "batch_size": config.batch_size,
            "val_batch_size": config.val_batch_size,
            "size": exp_config["image_dim"][-1],
            "num_workers": config.num_workers,
            "compute_dtype": config.compute_dtype,
        }
        if config.data_dir:
            loader_config["save_dir"] = config.data_dir
        train_loader, val_loader, n_classes = build_train_val_loader(
            config=loader_config, train_size=config.train_size, return_n_classes=True
        )
        test_loader_config = {
            "dataset_name": config.dataset_name,
            "batch_size": config.test_batch_size,
            "mode": "test",
            "size": exp_config["image_dim"][-1],
            "num_workers": config.num_workers,
            "compute_dtype": config.compute_dtype,
        }
        if config.data_dir:
            test_loader_config["save_dir"] = config.data_dir
        test_loader = build_loader(config=test_loader_config, drop_last=False)
        logger.info("Done building dataloaders.")

        # Saving dir naming (reference :295-311)
        if config.cls_pooling:
            if config.finetuned:
                save_dir = PROBE_DIR / f"{config.log_dir}_cls_pooling"
            else:
                save_dir = PROBE_DIR / (
                    f"vit_{config.dataset_name}_seed_{exp_config['seed']}"
                    "_pretrained_cls_pooling"
                )
        else:
            if config.finetuned:
                save_dir = PROBE_DIR / config.log_dir
            else:
                save_dir = PROBE_DIR / (
                    f"vit_{config.dataset_name}_seed_{exp_config['seed']}_pretrained"
                )
        save_dir.mkdir(exist_ok=True, parents=True)
        with open(save_dir / "config.json", "w") as f:
            json.dump(json_serializable(asdict(config)), f, indent=4)

        metrics = run_linear_probing(
            model, params, train_loader, test_loader,
            cls_pooling=config.cls_pooling, seed=config.seed,
            probe_impl=config.probe_impl,
        )
        with open(save_dir / "linear_probing.json", "w") as f:
            json.dump(metrics, f, indent=4)

    logger.info("Linear probing done.")
    return metrics


def main() -> None:
    """``python -m apps.vit.linear_probing config=<yaml> [k=v ...]``."""
    config = load_config_from_cli(LinearProbingConfig)
    linear_probing(config)


if __name__ == "__main__":
    main()
