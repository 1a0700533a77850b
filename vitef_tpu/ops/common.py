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


def resolve_impl(impl: str, *, seq_len: int | None = None,
                 pallas_min_seq: int = 512) -> str:
    """Resolve 'auto' to the fastest implementation for the situation.

    Measured on v5e (ViT-B/16, batch 256, bf16): XLA's fused attention/norm
    beats separate Pallas calls at ViT sequence lengths (XLA fuses the
    surrounding elementwise work; a pallas_call is a fusion barrier), while the
    flash kernel wins once the O(L²) score tensor XLA materializes stops
    fitting cache-friendly shapes — so 'auto' picks Pallas attention only for
    long sequences (L ≥ ``pallas_min_seq``, e.g. GPT2's 1024) on TPU, XLA
    otherwise. Both implementations are always available explicitly.
    """
    if impl == "auto":
        if jax.default_backend() != "tpu":
            return "xla"
        if seq_len is not None and seq_len >= pallas_min_seq:
            return "pallas"
        return "xla"
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
