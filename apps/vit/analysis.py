"""Plasticity analysis: per-component rate of change under distribution shift.

Reference: apps/vit/analysis.py (distance :40-81, AnalysisConfig :89-120,
analysis :123-248, fire CLI run :251-293). Output contract preserved:
``savings/analysis/analysis_<model>_pretrained_<bool>_<dataset>/
{config.json, distances.pkl}`` — a dict of per-sample Frobenius distances per
``embedding`` / ``block{i}_{component}`` key, accumulated over n_steps batches
of (ImageNet-val, downstream-test) pairs. The decomposition quirks the
statistic depends on (every block decomposed on the SAME embedding output;
fc2 on the zero-padded input) live in
vitef_tpu.models.transformer.get_decomposition.

TPU redesign: decomposition of BOTH batches and the per-sample Frobenius
distances are computed inside ONE jitted function — only the (N,) distance
vectors cross to host, where the reference moves every (N, L, E) component
output to CPU per batch (architecture.py:402-416, SURVEY §3.4).
"""

from __future__ import annotations

import json
import logging
import pickle
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp

from vitef_tpu.config import SAVING_DIR, set_seed
from vitef_tpu.data.images import build_loader, make_iterable
from vitef_tpu.models import build_model
from vitef_tpu.utils.cli import make_cli
from vitef_tpu.utils.tree import get_numpy, json_serializable, update_dict

logger = logging.getLogger("vitef")

SAVE_DIR = SAVING_DIR / "analysis"


def distance(x, y, reduction: str = "none"):
    """Per-sample Frobenius distance between token clouds (reference :40-81).

    x, y: (N, n, d) (a missing batch dim is added). Returns (N,) for
    reduction='none', scalar for 'mean'/'sum'.
    """
    from vitef_tpu.utils.tree import get_valid_tensor

    x = get_valid_tensor(x)
    y = get_valid_tensor(y)
    d2 = jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32))
    dist = jnp.sqrt(d2.reshape(d2.shape[0], -1).sum(axis=-1))
    match reduction.lower():
        case "none":
            return dist
        case "mean":
            return dist.mean()
        case "sum":
            return dist.sum()
        case _:
            raise ValueError(
                f"Unknown reduction'{reduction}'. Choose between 'none', 'mean' "
                "or 'sum'."
            )


def make_decomposition_distance_fn(model):
    """Jitted (params, x1, x2) → {key: (N,) per-sample Frobenius distances}."""

    @jax.jit
    def decomp_dist(params, x1, x2):
        outputs1 = model.get_decomposition(params, x1)
        outputs2 = model.get_decomposition(params, x2)
        return {k: distance(outputs1[k], outputs2[k], "none") for k in outputs1}

    return decomp_dist


@dataclass
class AnalysisConfig:
    """Reference analysis.py:89-120 (+ loader/TPU knobs)."""

    # Model
    model_name: str = "base"
    pretrained: bool = True
    patch_size: int = 16
    image_dim: tuple = (3, 224, 224)

    # Data
    dataset_name: str = "cifar10"
    batch_size: int = 128
    n_steps: int = 100
    data_dir: str | None = None
    imagenet_dir: str | None = None

    # Randomness
    seed: int = 42

    # TPU knobs
    compute_dtype: str = "float32"
    num_workers: int = 8

    def __post_init__(self):
        if self.n_steps is None:
            self.n_steps = 1
        if self.seed is None:
            self.seed = 42
        if isinstance(self.image_dim, list):
            self.image_dim = tuple(self.image_dim)


def analysis(config: AnalysisConfig) -> dict:
    """Reference analysis (:123-248)."""
    set_seed(config.seed)

    logger.info("Building model.")
    model = build_model(
        config={
            "implementation": "vit",
            "model_name": config.model_name,
            "pretrained": config.pretrained,
            "in21k": True,
            "patch_size": config.patch_size,
            "image_dim": config.image_dim,
            "compute_dtype": config.compute_dtype,
        },
        key=jax.random.key(config.seed),
    )
    logger.info("Done building model.")

    logger.info("Building dataloaders.")
    # Subset of the pretraining data (ImageNet validation — reference :152-158)
    loader1_config = {
        "dataset_name": "imagenet",
        "batch_size": config.batch_size,
        "mode": "val",
        "size": config.image_dim[-1],
        "num_workers": config.num_workers,
        "compute_dtype": config.compute_dtype,
    }
    if config.imagenet_dir:
        loader1_config["save_dir"] = config.imagenet_dir
    loader1 = build_loader(config=loader1_config)

    # Subset of the downstream data (reference :161-168)
    loader2_config = {
        "dataset_name": config.dataset_name,
        "batch_size": config.batch_size,
        "mode": "test",
        "size": config.image_dim[-1],
        "num_workers": config.num_workers,
        "compute_dtype": config.compute_dtype,
    }
    if config.data_dir:
        loader2_config["save_dir"] = config.data_dir
    loader2 = build_loader(config=loader2_config)
    logger.info("Done building dataloaders.")

    config_name = f"analysis_{model.name}_pretrained_{config.pretrained}"
    config_name += f"_{config.dataset_name}"
    save_dir = SAVE_DIR / config_name
    save_dir.mkdir(exist_ok=True, parents=True)
    with open(save_dir / "config.json", "w") as f:
        json.dump(json_serializable(asdict(config)), f, indent=4)

    decomp_dist = make_decomposition_distance_fn(model)

    distances: dict = {}
    step = 0
    iterator1 = iter(make_iterable(loader1))
    iterator2 = iter(make_iterable(loader2))
    while step < config.n_steps:
        x_batch1, _ = next(iterator1)
        x_batch2, _ = next(iterator2)
        dists = decomp_dist(model.params, x_batch1, x_batch2)
        for key, value in dists.items():
            update_dict(distances, {key: get_numpy(value)})
        if step % 10 == 0:
            print(f"Iteration {step}")
        step += 1

    logger.info(f"Saving results in {save_dir}.")
    with open(save_dir / "distances.pkl", "wb") as f:
        pickle.dump(distances, f)
    return distances


def run_analysis(
    model_name: str = "base",
    pretrained: bool = True,
    patch_size: int = 16,
    image_dim: tuple = (3, 224, 224),
    dataset_name: str = "cifar10",
    batch_size: int = 128,
    n_steps: int = 100,
    **kwargs,
) -> None:
    config = AnalysisConfig(
        model_name=model_name,
        pretrained=pretrained,
        patch_size=patch_size,
        image_dim=image_dim,
        dataset_name=dataset_name,
        batch_size=batch_size,
        n_steps=n_steps,
        **kwargs,
    )
    logger.info(f"Running experiments with {config=}.")
    analysis(config=config)


def main() -> None:
    """``python -m apps.vit.analysis run --dataset_name cifar10`` (fire-style CLI,
    reference analysis.py:276-293)."""
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(filename)s:%(lineno)d - %(message)s",
        handlers=[logging.StreamHandler()],
    )
    make_cli({"run": run_analysis})


if __name__ == "__main__":
    main()
