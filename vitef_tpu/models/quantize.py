"""Weight-only int8 quantization for the decode/serving path.

Low-batch decode is WEIGHT-bandwidth-bound: at batch 1 every token step
streams the full parameter set from HBM (GPT2-small: ~248 MB bf16 → ~0.3 ms
at the ~830 GB/s the tunnel-measured cache reads sustain) while the matmul
FLOPs are negligible. Halving the weight bytes halves the dominant traffic —
the same argument (and the same "scales OUTSIDE the contraction" trick) as
the int8 KV cache (generation.quantize_kv), applied to the weights.

Scheme: symmetric per-OUT-CHANNEL int8. A linear ``y = x @ W + b`` with
``W (in, out)`` stores ``Wq int8`` and ``scale (out,) f32`` with
``W ≈ Wq * scale``; the forward computes ``(x @ Wq) * scale + b`` — the
int8→compute-dtype convert fuses into the contraction (the MXU reads int8
values ≤ 127, exact in bf16) and the scale is one per-column multiply on the
small ``(N, out)`` output, so dequantized weights never materialise in HBM.
Per-out-channel granularity makes the scale a COLUMN operation on the output
(a per-IN-channel scale would have to touch ``x`` before the matmul).

Exactness: scales are snapped DOWN to powers of two (``power_of_two_scales``
default True). Power-of-two scaling is a float exponent shift — it commutes
bit-exactly with the contraction's sums — so ``(x @ Wq) * scale`` equals
``x @ (Wq * scale)`` EXACTLY, and a model whose weights are exactly
representable as int8×2^k round-trips with bit-identical logits (tested).
For real weights the snap costs at most 2× scale resolution (≤ 1 extra bit
of quantization error) and buys reproducible, associativity-free numerics.

The reference has no quantization or serving path (SURVEY §5.7); this module
extends vitef_tpu's added generation capability. Inference-only: quantized
params are not differentiable (round/clip) — the training path never sees
them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _scale_shape(w, channel_axis: int | tuple[int, ...]):
    axes = ((channel_axis,) if isinstance(channel_axis, int)
            else tuple(channel_axis))
    return axes, tuple(w.shape[a] if a in axes else 1 for a in range(w.ndim))


def quantize_weight_int8(w, *, channel_axis: int | tuple[int, ...] = 1,
                         power_of_two_scales: bool = True) -> dict:
    """Symmetric int8 quantization of a weight matrix.

    ``channel_axis`` indexes the OUT-feature axis (1 for ``(in, out)``
    linear weights, 0 for the ``(vocab, emb)`` tied embedding read as a
    ``(emb → vocab)`` head; a TUPLE for stacked weights, e.g. ``(0, 2)``
    for the MoE ``(n_experts, in, out)`` expert stacks — one scale per
    (expert, out-column)). Returns ``{"weight": int8, "scale": f32}`` with
    ``scale`` shaped as the kept axes and ``w ≈ weight * scale`` broadcast
    over the reduced axes.
    """
    wf = jnp.asarray(w, jnp.float32)
    axes, shape = _scale_shape(wf, channel_axis)
    reduce_axes = tuple(a for a in range(wf.ndim) if a not in axes)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    if power_of_two_scales:
        # exponent shift only: ceil to the next power of two so |q| ≤ 127
        scale = jnp.exp2(jnp.ceil(jnp.log2(scale)))
    q = jnp.round(wf / scale.reshape(shape))
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return {"weight": q, "scale": scale}


def dequantize_weight(qp: dict, dtype=jnp.float32, *,
                      channel_axis: int | tuple[int, ...] = 1):
    """Materialise ``weight * scale`` (tests / debugging only)."""
    w = qp["weight"].astype(jnp.float32)
    _, shape = _scale_shape(w, channel_axis)
    return (w * qp["scale"].reshape(shape)).astype(dtype)


def _quantize_linear(p: dict, **kw) -> dict:
    out = quantize_weight_int8(p["weight"], channel_axis=1, **kw)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_decode_params(params: dict, *,
                           power_of_two_scales: bool = True) -> dict:
    """Quantize a decoder param tree for serving (generate / DecodeServer).

    Quantized: every block's qkv/out-projection and fc1/fc2, the token
    embedding table (per-vocab-row — it doubles as the tied LM head, where
    the row axis IS the out-channel axis), and an untied output head if
    present. Kept full-precision: biases, norm gains/offsets, positional
    embeddings (tiny, and positional adds are accuracy-sensitive).

    The result is consumed transparently by ``generate()``/``prefill()``/
    ``DecodeServer`` — ``transformer._linear`` and the embedding/head helpers
    dispatch on the int8 weight dtype.
    """
    kw = dict(power_of_two_scales=power_of_two_scales)
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy of the tree

    def q(path_dict, key):
        path_dict[key] = _quantize_linear(path_dict[key], **kw)

    out["blocks"] = [dict(bp) for bp in params["blocks"]]
    for bp in out["blocks"]:
        bp["attn"] = dict(bp["attn"])
        q(bp["attn"], "qkv_mat")
        q(bp["attn"], "output")
        bp["ffn"] = dict(bp["ffn"])
        if "router" in bp["ffn"]:
            # MoE block: (n_experts, in, out) expert stacks, one scale per
            # (expert, out-column) — scales applied after the expert einsum
            # (parallel/moe._expert_ffn). The router stays full precision
            # (tiny, and gate numerics are accuracy-sensitive).
            for k in ("fc1", "fc2"):
                ql = quantize_weight_int8(bp["ffn"][k]["weight"],
                                          channel_axis=(0, 2), **kw)
                if "bias" in bp["ffn"][k]:
                    ql["bias"] = bp["ffn"][k]["bias"]
                bp["ffn"][k] = ql
        else:
            q(bp["ffn"], "fc1")
            q(bp["ffn"], "fc2")
    emb = out["embedding"] = dict(params["embedding"])
    tok = emb["token_emb"]
    # (vocab, emb): out-channel axis for the tied head is the vocab axis 0
    emb["token_emb"] = {**quantize_weight_int8(tok["weight"], channel_axis=0,
                                               **kw)}
    if "output" in params and "output_layer" in params["output"]:
        ol = params["output"]["output_layer"]
        out["output"] = {"output_layer": dict(ol)}
        if "head" in ol:
            q(out["output"]["output_layer"], "head")
    return out


def embed_rows(tok_emb: dict | None, token, compute_dtype):
    """Gather token-embedding rows, dequantizing int8 tables on the fly.

    ``tok_emb`` is either ``{"weight": (V, E)}`` (full precision) or the
    quantized ``{"weight": int8 (V, E), "scale": f32 (V,)}``. The gather
    reads only the selected rows; per-row scales multiply in f32 (exact for
    power-of-two scales) before the compute-dtype cast.
    """
    w = tok_emb["weight"]
    if w.dtype == jnp.int8:
        rows = w[token].astype(jnp.float32) * tok_emb["scale"][token][..., None]
        return rows.astype(compute_dtype)
    return w.astype(compute_dtype)[token]


def quantized_nbytes(params) -> int:
    """Total parameter bytes of a (possibly quantized) tree — for reporting."""
    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in jax.tree.leaves(params)))
