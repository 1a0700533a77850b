"""Functional normalization layers: layer / rms / batch.

Reference: src/vitef/models/transformer/utils.py:184-347 (BatchNorm wrapper,
LayerNorm, RMSNorm). Params are dicts {'weight': (E,)[, 'bias': (E,)]}.

BatchNorm note: the reference wraps nn.BatchNorm1d (used only by PatchTST). Here
batch statistics are computed over (batch, sequence) per channel; running-stats
tracking for eval mode lives in the model state (see patchtst preset). For the
experiment suite in scope (training-time PatchTST), batch statistics are used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layernorm import layer_norm


def init_norm(dim: int, bias: bool) -> dict:
    p = {"weight": jnp.ones((dim,), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    return p


def apply_norm(params: dict, x, *, kind: str = "layer", eps: float = 1e-5,
               impl: str = "auto"):
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
        mean = jnp.mean(xf, axis=(0, 1), keepdims=True)
        var = jnp.var(xf, axis=(0, 1), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(x.dtype)
    raise ValueError(f"Unknown normalization layer {kind!r}. Choose batch/layer/rms.")
