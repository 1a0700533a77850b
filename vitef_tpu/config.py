"""Global configuration: repo-relative path constants and seeding.

Reference: src/vitef/config.py:17-46 (DEVICE autodetect, path constants, set_seed).
TPU-native differences: there is no global mutable DEVICE — JAX places arrays via
shardings; ``default_backend()`` is reported for logging only. Seeding covers numpy's
global RNG (for dataset splits, parity with the reference's numpy streams) and returns
both a numpy Generator and a ``jax.random.key`` for explicit functional PRNG.
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np

# Repo-relative path constants (reference: src/vitef/config.py:21-26).
ROOT_DIR = Path(os.environ.get("VITEF_ROOT_DIR", Path(__file__).resolve().parents[1]))
DATASET_DIR = Path(os.environ.get("VITEF_DATASET_DIR", ROOT_DIR / "datasets"))
FIGURE_DIR = Path(os.environ.get("VITEF_FIGURE_DIR", ROOT_DIR / "figures"))
MODEL_DIR = Path(os.environ.get("VITEF_MODEL_DIR", ROOT_DIR / "checkpoints"))
RESULT_DIR = Path(os.environ.get("VITEF_RESULT_DIR", ROOT_DIR / "results"))
SAVING_DIR = Path(os.environ.get("VITEF_SAVING_DIR", ROOT_DIR / "savings"))


def default_backend() -> str:
    """Report the JAX backend ('tpu'/'cpu'/...) without importing jax at module load."""
    import jax

    return jax.default_backend()


def set_seed(seed: int):
    """Seed python/numpy global RNGs and return (np.Generator, jax PRNG key).

    Reference: src/vitef/config.py:29-46 seeds numpy+torch and returns an np
    Generator. JAX PRNG is explicit/functional, so we additionally return a key for
    threading through jitted code.
    """
    import jax

    random.seed(seed)
    np.random.seed(seed)
    gen = np.random.default_rng(seed)
    key = jax.random.key(seed)
    return gen, key
