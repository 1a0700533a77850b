"""Shared op utilities: implementation dispatch and dropout."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def best_precision(*operands):
    """Matmul precision policy: true-fp32 ('highest') when any operand is float32.

    On TPU the DEFAULT precision for float32 matmuls truncates inputs to
    bfloat16-grade passes (fine for bf16 activations, wrong for fp32 parity
    paths). bf16 inputs keep DEFAULT: exact bf16 multiply + fp32 accumulate.
    """
    if any(jnp.dtype(x.dtype) == jnp.float32 for x in operands):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def resolve_impl(impl: str) -> str:
    """Resolve 'auto' to 'pallas' on TPU, 'xla' elsewhere."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl not in ("pallas", "xla"):
        raise ValueError(f"unknown impl {impl!r}; choose auto/pallas/xla")
    return impl


def dropout(x: jax.Array, rate: float, rng: jax.Array | None, deterministic: bool) -> jax.Array:
    """Inverted dropout (reference semantics of F.dropout: train-time scaling)."""
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout with rate>0 in train mode requires an rng")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
