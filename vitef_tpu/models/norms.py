"""Functional normalization layers: layer / rms / batch.

Reference: src/vitef/models/transformer/utils.py:184-347 (BatchNorm wrapper,
LayerNorm, RMSNorm). Params are dicts {'weight': (E,)[, 'bias': (E,)]}.

BatchNorm (used only by PatchTST) mirrors nn.BatchNorm1d semantics on (N, L, E)
inputs (the reference wrapper transposes to (N, E, L)): training mode
(``deterministic=False``) normalizes each channel with batch statistics over
(N, L); eval mode uses the ``running_mean``/``running_var`` entries carried in
the param dict (loaded from torch checkpoints by torch_import, initialized to
0/1 otherwise).

Running-stat EMA updates (nn.BatchNorm1d momentum=0.1, reference
transformer/utils.py:184-230) are threaded functionally: a train-mode apply
with ``return_stats=True`` additionally returns the BATCH statistics
(mean over (N, L); UNBIASED variance — torch updates running_var with the
n/(n-1)-corrected batch variance while normalizing with the biased one), and
the train step chains the EMA across microbatches via :func:`ema_update_stats`
and writes the result back into the params with :func:`merge_running_stats`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layernorm import layer_norm


def init_norm(dim: int, bias: bool, kind: str = "layer") -> dict:
    p = {"weight": jnp.ones((dim,), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    if kind.lower() == "batch":
        p["running_mean"] = jnp.zeros((dim,), jnp.float32)
        p["running_var"] = jnp.ones((dim,), jnp.float32)
    return p


def apply_norm(params: dict, x, *, kind: str = "layer", eps: float = 1e-5,
               impl: str = "auto", deterministic: bool = True,
               return_stats: bool = False):
    """Apply a norm; with ``return_stats`` also return batch stats (or None).

    The stats dict (train-mode batch norm only) carries the BATCH mean and the
    UNBIASED batch variance under the running-stat key names, ready for the
    EMA ``running = (1 - m) * running + m * batch`` (nn.BatchNorm1d momentum
    semantics; torch normalizes with the biased variance but updates the
    running variance with the unbiased one).
    """
    w = params["weight"]
    b = params.get("bias")
    kind = kind.lower()
    stats = None
    if kind == "layer":
        out = layer_norm(x, w, b, eps=eps, impl=impl)
    elif kind == "rms":
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
        out = xf * rms * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        out = out.astype(x.dtype)
    elif kind == "batch":
        # (N, L, E): normalize each channel over (N, L) — BatchNorm1d on (N, E, L)
        # semantics (reference transformer/utils.py:184-230).
        xf = x.astype(jnp.float32)
        if deterministic and "running_mean" in params:
            mean = params["running_mean"].astype(jnp.float32)
            var = params["running_var"].astype(jnp.float32)
        else:
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.var(xf, axis=(0, 1))
            if return_stats and "running_mean" in params:
                count = x.shape[0] * x.shape[1]
                correction = count / max(count - 1, 1)
                stats = {"running_mean": mean, "running_var": var * correction}
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        out = out.astype(x.dtype)
    else:
        raise ValueError(
            f"Unknown normalization layer {kind!r}. Choose batch/layer/rms."
        )
    if return_stats:
        return out, stats
    return out


def ema_update_stats(running: dict, batch: dict, momentum: float = 0.1) -> dict:
    """One nn.BatchNorm1d running-stat step per site: (1-m)·running + m·batch.

    Both arguments are flat ``{dotted_path: {"running_mean", "running_var"}}``
    dicts; sites absent from ``batch`` pass through unchanged.
    """
    out = {}
    for path, old in running.items():
        new = batch.get(path)
        if new is None:
            out[path] = old
        else:
            out[path] = {
                k: (1.0 - momentum) * old[k].astype(jnp.float32) + momentum * new[k]
                for k in ("running_mean", "running_var")
            }
    return out


def extract_running_stats(params) -> dict:
    """Flat ``{dotted_path: {"running_mean", "running_var"}}`` of every
    batch-norm site in a param pytree (paths match apply_transformer's
    ``return_stats`` keys)."""
    out = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            if "running_mean" in node:
                out[prefix] = {"running_mean": node["running_mean"],
                               "running_var": node["running_var"]}
                return
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}" if prefix else str(i))

    walk(params, "")
    return out


def merge_running_stats(params, stats: dict):
    """Return a copy of ``params`` with the running stats at each flat-dict
    path replaced (shallow-copies only the touched branches)."""

    def set_path(node, parts, value):
        key = parts[0]
        if isinstance(node, dict):
            new = dict(node)
            idx = key
        else:
            new = list(node)
            idx = int(key)
        if len(parts) == 1:
            site = dict(new[idx])
            for k, v in value.items():
                site[k] = v.astype(site[k].dtype)
            new[idx] = site
        else:
            new[idx] = set_path(new[idx], parts[1:], value)
        return new

    for path, value in stats.items():
        params = set_path(params, path.split("."), value)
    return params
