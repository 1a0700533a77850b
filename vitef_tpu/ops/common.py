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


def resolve_impl(impl: str, *, seq_len: int | None = None, dtype=None,
                 pallas_min_seq: int = 512) -> str:
    """Resolve 'auto' to the fastest implementation for the situation.

    Measured on v5e (ViT-B/16, batch 256):

    - bf16 attention: the packed fused MHA kernel (ops/attention.py) wins at
      EVERY length — at L=197 it took the end-to-end train step from 344 to
      240 ms (packed fwd 3.1 ms + bwd 2.3 ms per layer vs XLA's ~13 ms core
      plus ~7 ms of head-split/merge copies and softmax HBM passes). The
      blocked flash kernel also won at L >= 1024 (+24%/+55%).
    - fp32 attention stays on XLA below ``pallas_min_seq``: fp32 is the
      golden-parity/analysis path, where XLA's HIGHEST-precision einsums are
      the reference semantics (Mosaic f32 matmul passes differ); the L**2
      materialization only starts losing at long L.
    - norms (no seq_len passed): XLA fuses the surrounding elementwise work;
      a standalone pallas_call is a fusion barrier and measured slower.

    Both implementations are always available explicitly.
    """
    if impl == "auto":
        if jax.default_backend() != "tpu":
            return "xla"
        if jax.device_count() > 1:
            # A pallas_call has no SPMD partitioning rule: under a >1-device
            # mesh XLA would run it replicated (gathering sharded operands).
            # 'auto' therefore never picks it multi-device; per-process
            # single-device setups (one chip per host process) still do.
            # Explicit impl='pallas' remains available (e.g. under shard_map).
            return "xla"
        if seq_len is not None and dtype is not None \
                and jnp.dtype(dtype) == jnp.bfloat16:
            return "pallas"
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
