"""Array/pytree helpers: numpy conversion, dict accumulation, deterministic splits.

Reference: src/vitef/utils.py:173-230 (`get_numpy`, `update_dict`,
`deterministic_split`, `json_serializable`). The deterministic split must be
bit-exact with the reference (fixed numpy seed 42 permutation with global RNG
save/restore — src/vitef/utils.py:221-230) so dataset membership matches.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def get_valid_tensor(x) -> np.ndarray:
    """Array with a batch dimension added if 2-D (reference: utils.py:173-179).

    The torch original converts to tensor + unsqueezes; arrays here stay
    jax/numpy — used for the distance computation's batch-dim normalization.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[None]
    return x


def get_numpy(x) -> np.ndarray:
    """Device array / scalar → host numpy (reference: utils.py:182-187)."""
    out = np.asarray(x)
    if not out.ndim:
        out = np.expand_dims(out, axis=0)
    return out


def keystr_dotted(path) -> str:
    """jax keypath → dotted string ('blocks.0.attn.qkv_mat.weight').

    The single owner of this mapping: freeze masks, TP sharding rules, and the
    checkpoint key layout all match on these strings, so they must agree on
    DictKey/SequenceKey/GetAttrKey handling.
    """
    import jax

    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts)


def move_to_host(x):
    """Device pytree → host numpy pytree (reference move_to_cpu, utils.py:190-193).

    On TPU this is one ``jax.device_get`` round trip for the whole tree.
    """
    import jax

    return jax.device_get(x)


def json_serializable(d: dict) -> dict:
    """Make a flat config dict json-safe: Paths → str (reference: utils.py:195-205)."""
    out = {}
    for k, v in d.items():
        if isinstance(v, Path):
            out[k] = str(v)
        elif isinstance(v, dict):
            out[k] = json_serializable(v)
        elif isinstance(v, (list, tuple)):
            out[k] = [str(x) if isinstance(x, Path) else x for x in v]
        else:
            out[k] = v
    return out


def update_dict(acc: dict, new: dict) -> dict:
    """Accumulate dict-of-arrays by np.concatenate (reference: utils.py:208-218)."""
    for k, v in new.items():
        v = np.asarray(v)
        if k in acc:
            acc[k] = np.concatenate([acc[k], v], axis=0)
        else:
            acc[k] = v
    return acc


def deterministic_split(n: int, split: float = 0.8) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-seed-42 permutation split — bit-exact with reference utils.py:221-230.

    The reference saves the global numpy RNG state, seeds 42, permutes, restores.
    We reproduce the identical permutation via the same legacy global-seed API.
    """
    state = np.random.get_state()
    np.random.seed(42)
    perm = np.random.permutation(n)
    np.random.set_state(state)
    n_train = int(split * n)
    return perm[:n_train], perm[n_train:]
