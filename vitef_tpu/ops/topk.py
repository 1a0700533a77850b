"""TPU-fast exact top-k over a large last axis (sampling-head sizes).

``jax.lax.top_k`` lowers to a full variadic sort of the operand on TPU: at
GPT2 logits shape (256, 50257) f32 that is 17-19 ms on v5e — it was 75% of
the whole decode token-step (device trace, PERF.md "Decode loop" section).
Top-k selection is O(V), not O(V sort); the classic exact decomposition:

  1. reshape the vocab axis into G groups of ``group`` and take the top-k of
     every group (short sorts — comparator depth log2(group), not log2(V));
  2. take the top-k of the G*k surviving candidates.

Every element of the true global top-k has fewer than k elements above it,
hence fewer than k above it *inside its own group*, so it survives stage 1 —
the result is EXACT (bit-identical values and indices to ``lax.top_k``,
including its descending-value / ascending-index tie order, because stage-2
candidate order preserves group-major index order). This holds even for
rows containing -inf (e.g. caller-masked logits): the -inf PAD slots sit at
the highest in-group indices of the LAST group, so ``lax.top_k``'s
lower-index-first tie rule ranks every real entry — including real -inf
entries — ahead of them in both stages, and with g >= 2 (guaranteed by the
fallback guard) stage 2 always has >= (g-1)*k >= k real candidates; a pad
slot can therefore never reach the output (regression-tested on all--inf
and fewer-than-k-finite rows in tests/test_ops.py). Measured on v5e at
(256, 50257) k=40: 4.6 ms vs 18.9 ms for ``lax.top_k`` (.topk_bench.py
methodology: 20 reps chained in one jit, value-fetch sync).

``approx=True`` switches to ``jax.lax.approx_max_k`` (the TPU PartialReduce
instruction, Chern et al. 2022): 1.6 ms at the same shape but ~95% recall —
opt-in for serving where sampling exactness is not contractual.

The reference has no sampling/serving path at all (SURVEY §5.7); this op
exists for vitef_tpu's added generation capability (models/generation.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k(x, k: int, *, group: int = 512, approx: bool = False):
    """Exact (default) top-k over the last axis of ``x``.

    Returns ``(values, indices)`` exactly like ``jax.lax.top_k``. ``group``
    is the stage-1 group size (512 measured best on v5e across 256-2048).
    Falls back to ``lax.top_k`` when the axis is too small for two stages to
    help, or when ``k > group`` (stage 1 would need k per group anyway).
    """
    if approx:
        return jax.lax.approx_max_k(x, k)
    v = x.shape[-1]
    g = -(-v // group)
    if k > group or g * k >= v or g < 2 or not jnp.issubdtype(x.dtype, jnp.floating):
        return jax.lax.top_k(x, k)
    lead = x.shape[:-1]
    pad = g * group - v
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=-jnp.inf)
    xg = x.reshape(*lead, g, group)
    vals, idx = jax.lax.top_k(xg, k)                    # (..., g, k) local
    base = (jnp.arange(g, dtype=jnp.int32) * group)[:, None]
    cand_vals = vals.reshape(*lead, g * k)
    cand_idx = (idx.astype(jnp.int32) + base).reshape(*lead, g * k)
    out_vals, pos = jax.lax.top_k(cand_vals, k)         # (..., k)
    out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
    return out_vals, out_idx
