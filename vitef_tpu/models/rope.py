"""Rotary position embeddings (RoPE) — llama-family positional encoding.

Beyond-parity addition (the reference has only a learned absolute position
table, architecture.py:595-607): modern decoder families (llama/mistral)
encode positions by ROTATING each head's q/k pairs by position-dependent
angles, so relative offsets fall out of the q·k inner product and the
learned table (and its seq_len cap) disappears.

Convention: llama/HF "rotate_half" pairing — the head dim splits into two
halves (x1, x2) and pair i rotates by ``pos * theta^(-2i/d)``:

    out = [x1*cos - x2*sin, x2*cos + x1*sin]

Angles are computed in f32 (bf16 loses position resolution past ~256) and
the rotation is applied in f32 before casting back to the compute dtype —
one fused elementwise pass per q/k tensor, which XLA folds into the
surrounding projection fusion.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for integer ``positions`` (any shape).

    Returns ``(cos, sin)`` shaped ``positions.shape + (head_dim // 2,)``,
    f32.
    """
    assert head_dim % 2 == 0, "RoPE needs an even head dim"
    inv_freq = theta ** (
        -jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """Rotate the last axis of ``x`` (..., d) by per-position angles.

    ``cos``/``sin``: (..., d/2), broadcastable against ``x``'s leading axes
    (e.g. (L, d/2) against (N, h, L, d), or (N, 1, L, d/2) for per-sample
    ragged positions).
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
