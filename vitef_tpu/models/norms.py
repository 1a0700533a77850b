"""Functional normalization layers: layer / rms / batch.

Reference: src/vitef/models/transformer/utils.py:184-347 (BatchNorm wrapper,
LayerNorm, RMSNorm). Params are dicts {'weight': (E,)[, 'bias': (E,)]}.

BatchNorm (used only by PatchTST) mirrors nn.BatchNorm1d semantics on (N, L, E)
inputs (the reference wrapper transposes to (N, E, L)): training mode
(``deterministic=False``) normalizes each channel with batch statistics over
(N, L); eval mode uses the ``running_mean``/``running_var`` entries carried in
the param dict (loaded from torch checkpoints by torch_import, initialized to
0/1 otherwise). Running-stat EMA *updates* during training are not performed by
the pure apply (a functional train step would thread them as state); no app in
scope trains PatchTST.
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
               impl: str = "auto", deterministic: bool = True):
    w = params["weight"]
    b = params.get("bias")
    kind = kind.lower()
    if kind == "layer":
        return layer_norm(x, w, b, eps=eps, impl=impl)
    if kind == "rms":
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
        out = xf * rms * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(x.dtype)
    if kind == "batch":
        # (N, L, E): normalize each channel over (N, L) — BatchNorm1d on (N, E, L)
        # semantics (reference transformer/utils.py:184-230).
        xf = x.astype(jnp.float32)
        if deterministic and "running_mean" in params:
            mean = params["running_mean"].astype(jnp.float32)
            var = params["running_var"].astype(jnp.float32)
        else:
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.var(xf, axis=(0, 1))
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(x.dtype)
    raise ValueError(f"Unknown normalization layer {kind!r}. Choose batch/layer/rms.")
