"""Autoregressive decoding with a static-shape KV cache — the serving path.

The reference stops at the causal training forward (architecture.py:787 notes
decoder-only support; there is no generate/sampling/KV-cache code anywhere in
the repo — SURVEY §5.7). Serving a decoder-only model efficiently on TPU needs
exactly what a naive "re-run the full forward per token" loop cannot give:

  - **Static shapes**: the KV cache is allocated once at ``prompt_len +
    max_new_tokens`` and updated in place with ``lax.dynamic_update_slice`` —
    no per-step retrace, no recompilation, XLA buffer-donates the cache
    through the scan carry.
  - **One compiled program**: prefill (a single batched causal forward over
    the whole prompt that also materialises every layer's K/V) plus a
    ``lax.scan`` over the ``max_new_tokens`` decode steps. The whole
    generation is a single dispatch; per-token work is O(L·E) attention reads
    plus the parameter matmuls (bandwidth-bound, as decode always is).
  - **Sampling on device**: greedy / temperature / top-k via
    ``jax.random.categorical``; the PRNG key is split inside the scan.

Functions here are pure and jittable; wrap :func:`generate` in ``jax.jit`` with
``static_argnums`` for ``max_new_tokens``/``temperature``/``top_k`` (the
:class:`~vitef_tpu.models.registry.Model.generate` convenience does this).

Numerics match the training forward exactly (same ``_linear``/``_norm``
helpers, fp32 softmax, ``best_precision`` fp32 matmuls on fp32 paths), so
greedy decode reproduces argmax over the full forward's logits bit-for-bit in
fp32 — tested in tests/test_generation.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.attention import fused_mha_packed, packed_mha_supported
from ..ops.common import best_precision, resolve_impl
from ..ops.topk import top_k as fast_top_k
from .quantize import embed_rows
from .transformer import TransformerConfig, _linear, _norm, get_activation

_NEG_INF = -1e30


def _check_decoder(cfg: TransformerConfig) -> None:
    if not cfg.causal:
        raise ValueError("generate() requires a causal (decoder-only) model")
    if cfg.patch_type or cfg.cls_token:
        raise ValueError("generate() is for token-sequence models (no patching/cls)")
    if cfg.emb_type.lower() != "dict":
        raise ValueError("generate() requires a dict token embedding")
    if cfg.output_type.lower() != "sequence_to_sequence":
        raise ValueError("generate() requires output_type=sequence_to_sequence")
    if cfg.norm.lower() == "batch":
        raise ValueError("batch-norm models are not supported for decoding")


def init_kv_cache(cfg: TransformerConfig, batch: int, max_len: int,
                  kv_cache_dtype: str | None = None) -> list[dict]:
    """Per-layer K/V buffers in the compute dtype (or quantized int8).

    Layout is HEAD-SPLIT — (batch, n_kv_heads, max_len, head_dim) — so decode
    steps read the cache directly in the attention einsum layout: a
    (batch, max_len, emb) layout would force a full-cache head-split
    transpose every step, tripling the per-token HBM traffic of the
    bandwidth-bound decode loop. GQA models (n_kv_heads < n_heads) shrink
    the cache — and decode's dominant HBM traffic — by the group factor.

    ``kv_cache_dtype="int8"`` stores symmetric per-row int8 values plus
    ``k_scale``/``v_scale`` (batch, n_kv_heads, max_len) f32 entries — half
    the cache bandwidth and memory (see :func:`quantize_kv`)."""
    cd = cfg.cdtype()
    shape = (batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    if kv_cache_dtype is None:
        return [
            {"k": jnp.zeros(shape, cd), "v": jnp.zeros(shape, cd)}
            for _ in range(cfg.n_layers)
        ]
    if kv_cache_dtype != "int8":
        raise ValueError(f"kv_cache_dtype must be None or 'int8', got {kv_cache_dtype!r}")
    sshape = shape[:3]
    return [
        {"k": jnp.zeros(shape, jnp.int8), "v": jnp.zeros(shape, jnp.int8),
         "k_scale": jnp.zeros(sshape, jnp.float32),
         "v_scale": jnp.zeros(sshape, jnp.float32)}
        for _ in range(cfg.n_layers)
    ]


def _split_heads(t, n_heads: int):
    """(N, L, E) -> (N, h, L, d)."""
    n, l, e = t.shape
    return t.reshape(n, l, n_heads, e // n_heads).transpose(0, 2, 1, 3)


def quantize_kv(t):
    """Symmetric per-row int8 quantization of (..., d) K/V vectors.

    Returns ``(int8 values, f32 scales (...,))`` with ``t ≈ values * scales``.
    One scale per (sample, head, position) row — the granularity that keeps
    dequantization OUT of the attention einsums: K's scale multiplies the
    (N, h, 1, L) scores AFTER the QK contraction and V's scale folds into the
    softmax weights BEFORE the AV contraction, so the cache is only ever read
    as int8 (half the HBM traffic of the bf16 cache — decode's bound).
    """
    scale = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.round(t.astype(jnp.float32) / scale[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _attend_cached(q, k_cache, v_cache, n_heads: int, pos, key_mask=None,
                   k_scale=None, v_scale=None):
    """One-token attention against the (N, h, Lmax, d) cache.

    q: (N, E) for the token at position ``pos``. Positions > pos are masked
    (cache slots not yet written); ``key_mask`` (N, Lmax) additionally masks
    left-padding slots of ragged prompts. fp32 softmax, matmul precision
    follows the training path (best_precision).

    int8 caches (``kv_cache_dtype="int8"``) carry per-row f32 scales
    (N, h, Lmax): K's scale is applied to the (N, h, 1, Lmax) scores after
    the contraction and V's folds into the softmax weights, so the cache is
    read as int8 — halving decode's dominant HBM traffic. int8 operands are
    converted to the compute dtype inside the einsum fusion (values ≤ 127
    are exact in bf16).
    """
    n, kvh, lmax, d = k_cache.shape
    g = n_heads // kvh  # query heads per kv head (1 = standard MHA)
    quantized = k_cache.dtype == jnp.int8
    cd = q.dtype
    kc = k_cache.astype(cd) if quantized else k_cache
    valid = jnp.arange(lmax)[None, :] <= pos  # (1, Lmax)
    if key_mask is not None:
        valid = jnp.logical_and(valid, key_mask)  # (N, Lmax)
    vc = v_cache.astype(cd) if quantized else v_cache

    def one(qh):
        """(N, kvh, 1, d) queries vs the cache — the proven MHA-decode shape.

        GQA runs this once per query GROUP (unrolled python loop, g small)
        instead of one grouped 5-axis einsum: with a g>1 free axis XLA's
        layout assignment flips the loop-carried cache to an L-minor layout
        whose dynamic_update_slice can no longer alias — every decode tick
        then COPIES the whole cache (llama-124m batch 256: 29.9k tok/s
        grouped vs 47.8k GPT2/MHA; per-group loop 102.3k, v5e-measured).
        The g cache reads stay in the einsum fusions and the in-place DUS
        survives — and the 3x-smaller GQA cache finally pays as 2.1x
        MHA decode throughput.
        """
        scores = jnp.einsum("nkqd,nkKd->nkqK", qh, kc,
                            precision=best_precision(qh, kc),
                            preferred_element_type=jnp.float32)
        if quantized:
            scores = scores * k_scale[:, :, None, :]
        scores = scores * (1.0 / math.sqrt(d))
        scores = jnp.where(valid[:, None, None, :], scores, _NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        if quantized:
            weights = (weights * v_scale[:, :, None, :]).astype(cd)
        else:
            weights = weights.astype(v_cache.dtype)
        return jnp.einsum("nkqK,nkKd->nkqd", weights, vc,
                          precision=best_precision(weights, vc),
                          preferred_element_type=jnp.float32).astype(q.dtype)

    if g == 1:
        return one(q.reshape(n, kvh, 1, d)).reshape(n, n_heads * d)
    # head-major q grouped llama-style: q heads [k*g, (k+1)*g) share kv head k
    qh = q.reshape(n, kvh, g, d)
    outs = [one(qh[:, :, j][:, :, None, :])[:, :, 0] for j in range(g)]
    return jnp.stack(outs, axis=2).reshape(n, n_heads * d)


def _rope_cos_sin(cfg: TransformerConfig, positions):
    """(cos, sin) for rope models, else (None, None)."""
    if not cfg.uses_rope:
        return None, None
    from .rope import rope_angles

    return rope_angles(positions, cfg.head_dim, cfg.rope_theta)


def _attention_prefill(params: dict, cfg: TransformerConfig, x, key_mask=None,
                       positions=None):
    """Causal self-attention over the prompt that also returns (k, v).

    Mirrors ops.attention.multi_head_attention's XLA path (fp32 softmax,
    best_precision matmuls) while exposing the per-layer K/V for the cache.
    ``key_mask`` (N, L) masks left-padding keys of ragged prompts.

    GQA (n_kv_heads < n_heads): k/v are (N, L, kv_dim); queries attend via a
    grouped einsum. RoPE: q/k are rotated at ``positions`` ((N, L) logical
    positions for ragged prompts; arange(L) default) BEFORE attention, and
    the ROTATED k is returned for the cache — decode steps then rotate only
    their own q/k. MHA rope models keep the packed fused kernel (the
    rotation is elementwise on the projection output).
    """
    cd = cfg.cdtype()
    n, l, e = x.shape
    d = cfg.head_dim
    kv = cfg.n_kv_heads
    qkv_p, out_p = params["qkv_mat"], params["output"]
    # same einsum as transformer._linear (int8 weight-only quantization of
    # the projection dispatches there too, models/quantize.py)
    qkv = _linear(qkv_p, x, cd)
    from .transformer import split_qkv

    q, k, v = split_qkv(cfg, qkv)
    if cfg.uses_rope:
        from .rope import apply_rope

        pos_ids = jnp.arange(l) if positions is None else positions
        cos, sin = _rope_cos_sin(cfg, pos_ids)
        # broadcast (L, d/2) -> (L, 1, d/2) over (N, L, heads, d); per-sample
        # (N, L, d/2) -> (N, L, 1, d/2)
        cos, sin = cos[..., :, None, :], sin[..., :, None, :]
        q = apply_rope(q.reshape(n, l, cfg.n_heads, d), cos, sin).reshape(
            n, l, e)
        k = apply_rope(k.reshape(n, l, kv, d), cos, sin).reshape(
            n, l, kv * d)
    # Packed fused MHA kernel for the bf16 prefill (the K/V returned for the
    # cache are slices of qkv either way; qkv is already biased, so no
    # in-kernel bias). Ragged (left-padded) prompts pass the key_mask into
    # the kernel — per-row key masking happens in VMEM, so serving batches
    # keep the fused prefill instead of materialising the L^2 f32 scores in
    # the einsum path. fp32 keeps the einsum (golden-parity semantics).
    # Honors cfg.attn_impl / cfg.flash exactly like the training forward
    # (transformer.py:363): an explicit attn_impl="xla" model must prefill
    # with XLA numerics too.
    if (cd == jnp.bfloat16 and packed_mha_supported(l, e, 2)
            and resolve_impl(cfg.attn_impl if cfg.flash else "xla",
                             seq_len=l, dtype=cd) == "pallas"):
        if kv < cfg.n_heads:
            # GQA: repeat kv heads over their query groups so the packed
            # kernel's layout holds (see transformer._attention_modern);
            # the CACHE still stores the small (kv-head) k/v below.
            g = cfg.n_heads // kv
            rep = (lambda t: jnp.broadcast_to(
                t.reshape(n, l, kv, 1, d), (n, l, kv, g, d)).reshape(n, l, e))
            kq, vq = rep(k), rep(v)
        else:
            kq, vq = k, v
        if cfg.uses_rope or kv < cfg.n_heads:  # kernel reads rotated q/k
            qkv = jnp.concatenate([q, kq, vq], axis=-1)
        z = fused_mha_packed(qkv, cfg.n_heads, causal=True,
                             key_mask=key_mask)
        return _linear(out_p, z, cd), k, v
    g = cfg.n_heads // kv
    qh = _split_heads(q, cfg.n_heads).reshape(n, kv, g, l, d)
    kh = _split_heads(k, kv)
    vh = _split_heads(v, kv)
    scores = jnp.einsum("nkgqd,nkKd->nkgqK", qh, kh,
                        precision=best_precision(qh, kh),
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(d))
    causal = jnp.arange(l)[None, :] <= jnp.arange(l)[:, None]
    mask = causal[None, None, None]
    if key_mask is not None:
        mask = jnp.logical_and(mask, key_mask[:, None, None, None, :])
    scores = jnp.where(mask, scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    z = jnp.einsum("nkgqK,nkKd->nkgqd", weights, vh,
                   precision=best_precision(weights, vh),
                   preferred_element_type=jnp.float32).astype(cd)
    z = z.reshape(n, cfg.n_heads, l, d).transpose(0, 2, 1, 3).reshape(n, l, e)
    out = _linear(out_p, z, cd)
    return out, k, v


def _ffn(params: dict, cfg: TransformerConfig, x):
    cd = cfg.cdtype()
    if cfg.n_experts:
        from ..parallel.moe import (apply_moe_ffn, apply_moe_ffn_sparse,
                                    resolve_moe_impl)

        n_tokens = x.size // x.shape[-1]
        if resolve_moe_impl(cfg, params, n_tokens) == "sparse":
            # batch-1 decode is weight-HBM-bound: the grouped matmul streams
            # only the selected experts' weight tiles. Mid-size decode
            # batches resolve to dense — all experts get claims anyway and
            # the per-tick dispatch glue loses (measured, resolve_moe_impl).
            return apply_moe_ffn_sparse(params, cfg, x, top_k=cfg.moe_top_k)
        return apply_moe_ffn(params, cfg, x, top_k=cfg.moe_top_k)
    out = _linear(params["fc1"], x, cd)
    if cfg.ffn_type.lower() == "swiglu":
        gate, up = jnp.split(out, 2, axis=-1)
        out = jax.nn.silu(gate) * up
    else:
        out = get_activation(cfg.activation)(out)
    return _linear(params["fc2"], out, cd)


def _block_prefill(bp: dict, cfg: TransformerConfig, x, key_mask=None,
                   positions=None):
    """apply_block (deterministic) that also returns the block's (k, v)."""
    if cfg.pre_norm:
        att, k, v = _attention_prefill(bp["attn"], cfg,
                                       _norm(bp["attn_norm"], cfg, x),
                                       key_mask, positions)
        out = x + att
        out = out + _ffn(bp["ffn"], cfg, _norm(bp["ffn_norm"], cfg, out))
    else:
        att, k, v = _attention_prefill(bp["attn"], cfg, x, key_mask, positions)
        out = _norm(bp["attn_norm"], cfg, x + att)
        out = _norm(bp["ffn_norm"], cfg, out + _ffn(bp["ffn"], cfg, out))
    return out, k, v


def _block_decode(bp: dict, cfg: TransformerConfig, x, layer_cache: dict, pos,
                  key_mask=None, positions=None):
    """One-token block step; writes this token's k/v into the cache at ``pos``.

    ``x``: (N, E). Returns (out, updated layer cache). ``positions``: (N,)
    per-sample LOGICAL positions for RoPE (ragged prompts decode at a shared
    cache index but different logical positions); defaults to ``pos``.
    """
    cd = cfg.cdtype()

    def attn(x_in):
        qkv_p = bp["attn"]["qkv_mat"]
        qkv = _linear(qkv_p, x_in, cd)
        from .transformer import split_qkv

        q, k, v = split_qkv(cfg, qkv)
        n = k.shape[0]
        d = cfg.head_dim
        if cfg.uses_rope:
            from .rope import apply_rope

            pos_ids = jnp.broadcast_to(
                pos if positions is None else positions, (n,))
            cos, sin = _rope_cos_sin(cfg, pos_ids)  # (N, d/2)
            q = apply_rope(q.reshape(n, cfg.n_heads, d),
                           cos[:, None], sin[:, None]).reshape(n, -1)
            k = apply_rope(k.reshape(n, cfg.n_kv_heads, d),
                           cos[:, None], sin[:, None]).reshape(n, -1)
        # (N, kv_dim) -> (N, kv, 1, d): head-major, matching the cache layout.
        kh = k.reshape(n, cfg.n_kv_heads, 1, d)
        vh = v.reshape(n, cfg.n_kv_heads, 1, d)
        cache = {}
        if layer_cache["k"].dtype == jnp.int8:
            kh, ks = quantize_kv(kh)
            vh, vs = quantize_kv(vh)
            cache["k_scale"] = jax.lax.dynamic_update_slice(
                layer_cache["k_scale"], ks, (0, 0, pos))
            cache["v_scale"] = jax.lax.dynamic_update_slice(
                layer_cache["v_scale"], vs, (0, 0, pos))
        cache["k"] = jax.lax.dynamic_update_slice(
            layer_cache["k"], kh.astype(layer_cache["k"].dtype), (0, 0, pos, 0))
        cache["v"] = jax.lax.dynamic_update_slice(
            layer_cache["v"], vh.astype(layer_cache["v"].dtype), (0, 0, pos, 0))
        z = _attend_cached(q, cache["k"], cache["v"], cfg.n_heads, pos, key_mask,
                           cache.get("k_scale"), cache.get("v_scale"))
        return _linear(bp["attn"]["output"], z, cd), cache

    if cfg.pre_norm:
        att, cache = attn(_norm(bp["attn_norm"], cfg, x))
        out = x + att
        out = out + _ffn(bp["ffn"], cfg, _norm(bp["ffn_norm"], cfg, out))
    else:
        att, cache = attn(x)
        out = _norm(bp["attn_norm"], cfg, x + att)
        out = _norm(bp["ffn_norm"], cfg, out + _ffn(bp["ffn"], cfg, out))
    return out, cache


def _logits(params: dict, cfg: TransformerConfig, x):
    """seq2seq head on (..., E) hidden states -> (..., V) fp32 logits.

    int8-quantized token embeddings (models/quantize.py) keep the tied head
    reading int8 from HBM — the (V, E) table is the single largest weight of
    the decode step — with the per-vocab-row scale applied to the (N, V) f32
    logits after the contraction.
    """
    cd = cfg.cdtype()
    p = params["output"]["output_layer"]
    out = _norm(p["norm"], cfg, x)
    if cfg.weight_tying:
        tok = params["embedding"]["token_emb"]
        if tok["weight"].dtype == jnp.int8:
            outc = out.astype(cd)
            raw = jnp.einsum("...e,ve->...v", outc,
                             tok["weight"].astype(cd),
                             precision=best_precision(outc),
                             preferred_element_type=jnp.float32)
            return raw * tok["scale"]
        w = tok["weight"].astype(cd)
        return jnp.einsum("...e,ve->...v", out.astype(cd), w,
                          precision=best_precision(w),
                          preferred_element_type=jnp.float32).astype(jnp.float32)
    return _linear(p["head"], out, cd).astype(jnp.float32)


def _embed_token(params: dict, cfg: TransformerConfig, token, positions):
    """(N,) int tokens at per-sample logical ``positions`` -> (N, E)."""
    cd = cfg.cdtype()
    emb = params["embedding"]
    x = embed_rows(emb["token_emb"], token, cd)
    if cfg.pos_emb:
        x = x + emb["pos_emb"][0][positions].astype(cd)
    return x


def prefill(params: dict, cfg: TransformerConfig, prompt, max_len: int,
            prompt_mask=None, kv_cache_dtype: str | None = None):
    """Batched causal forward over the prompt, materialising the KV cache.

    ``prompt``: (N, P) int32 token ids. Ragged batches are LEFT-padded to a
    shared length with ``prompt_mask`` (N, P) bool marking real tokens
    (right-aligned, the serving convention: every sample's next token then
    lands in the same cache slot P). Positional embeddings use per-sample
    logical positions (``cumsum(mask) - 1``); padded keys are masked out of
    every attention. Returns ``(last_logits (N, V) fp32, cache)`` with cache
    buffers sized ``max_len`` and positions [0, P) filled.
    """
    _check_decoder(cfg)
    n, p = prompt.shape
    cd = cfg.cdtype()
    emb = params["embedding"]
    x = embed_rows(emb["token_emb"], prompt, cd)
    positions = None  # (N, P) logical positions of ragged prompts
    if prompt_mask is not None:
        positions = jnp.maximum(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
    if cfg.pos_emb:
        if prompt_mask is None:
            x = x + emb["pos_emb"][:, :p].astype(cd)
        else:
            x = x + emb["pos_emb"][0][positions].astype(cd)
    if kv_cache_dtype not in (None, "int8"):
        raise ValueError(f"kv_cache_dtype must be None or 'int8', got {kv_cache_dtype!r}")
    cache = []
    pad = ((0, 0), (0, 0), (0, max_len - p), (0, 0))
    for bp in params["blocks"]:
        x, k, v = _block_prefill(bp, cfg, x, prompt_mask, positions)
        kh = _split_heads(k.astype(cd), cfg.n_kv_heads)
        vh = _split_heads(v.astype(cd), cfg.n_kv_heads)
        if kv_cache_dtype == "int8":
            kq, ks = quantize_kv(kh)
            vq, vs = quantize_kv(vh)
            spad = ((0, 0), (0, 0), (0, max_len - p))
            cache.append({
                "k": jnp.pad(kq, pad), "v": jnp.pad(vq, pad),
                "k_scale": jnp.pad(ks, spad), "v_scale": jnp.pad(vs, spad),
            })
        else:
            cache.append({"k": jnp.pad(kh, pad), "v": jnp.pad(vh, pad)})
    return _logits(params, cfg, x[:, -1, :]), cache


def sample_token(logits, rng, temperature: float = 1.0, top_k: int | None = None,
                 approx_top_k: bool = False, top_p: float | None = None,
                 top_p_candidates: int = 256):
    """Sample next tokens from (N, V) fp32 logits.

    ``temperature == 0`` (or ``top_k == 1``) is greedy argmax; otherwise
    temperature-scaled categorical sampling, optionally restricted to the
    ``top_k`` highest-logit tokens and/or the ``top_p`` probability nucleus.

    The top-k/top-p paths sample over the CANDIDATE logits and gather the
    chosen index — the same renormalised distribution as masking the full
    vocabulary to -inf and sampling that, without materialising or scanning
    (N, V) again. Combined with :func:`vitef_tpu.ops.topk.top_k` (exact
    two-stage selection instead of ``lax.top_k``'s full vocab sort) this took
    the GPT2-small decode token-step from 23.1 ms to ~10 ms at batch 256 on
    v5e (PERF.md). ``approx_top_k=True`` opts into ``lax.approx_max_k``
    candidates (~95% recall, another ~3 ms off); exact is the default.

    ``top_p`` (nucleus) keeps the smallest prefix of descending-probability
    tokens whose cumulative probability reaches ``top_p`` (HF semantics:
    token i survives iff the cumulative probability BEFORE it is <= top_p, so
    at least one token always survives). Probabilities are normalised against
    the FULL vocabulary (one logsumexp pass), so the cutoff is exact; only
    the candidate SET is limited to the ``top_k`` (or ``top_p_candidates``)
    highest-logit tokens — a full-vocab sort is exactly the 17 ms/step TPU
    cost this module avoids. If the true nucleus is wider than the candidate
    set (very flat distributions), sampling gracefully restricts to all
    candidates.
    """
    if temperature == 0.0 or top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_p is not None:
        k = min(top_k or top_p_candidates, logits.shape[-1])
        vals, idx = fast_top_k(logits, k, approx=approx_top_k)
        scaled = vals / temperature  # descending
        # TRUE probabilities: normalise against the FULL-vocab partition
        # function, not just the candidates — renormalising over candidates
        # inflates cumulative mass and silently shrinks the nucleus whenever
        # the discarded tail is non-negligible (e.g. high temperature).
        lse = jax.nn.logsumexp(logits / temperature, axis=-1, keepdims=True)
        probs = jnp.exp(scaled - lse)
        before = jnp.cumsum(probs, axis=-1) - probs  # cumulative BEFORE i
        scaled = jnp.where(before <= top_p, scaled, _NEG_INF)
        choice = jax.random.categorical(rng, scaled, axis=-1)
        return jnp.take_along_axis(
            idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
    if top_k is not None:
        vals, idx = fast_top_k(logits, top_k, approx=approx_top_k)
        choice = jax.random.categorical(rng, vals / temperature, axis=-1)
        return jnp.take_along_axis(
            idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
    return jax.random.categorical(rng, logits / temperature, axis=-1).astype(jnp.int32)


def generate(params: dict, cfg: TransformerConfig, prompt, max_new_tokens: int,
             *, temperature: float = 1.0, top_k: int | None = None, rng=None,
             prompt_mask=None, approx_top_k: bool = False,
             kv_cache_dtype: str | None = None, top_p: float | None = None,
             eos_token_id: int | None = None):
    """Generate ``max_new_tokens`` tokens after ``prompt``.

    ``prompt``: (N, P) int32. Ragged batches are LEFT-padded to the shared
    length P with ``prompt_mask`` (N, P) bool marking the real (right-aligned)
    tokens — padded keys never participate in attention and positional
    embeddings follow each sample's logical positions, so the result matches
    generating each sample unpadded. Returns (N, max_new_tokens) int32. Pure
    and jittable — ``max_new_tokens``/``temperature``/``top_k`` are static.

    ``kv_cache_dtype="int8"`` stores the KV cache as per-row symmetric int8
    (+f32 scales): half the decode HBM traffic and cache memory, at a ~1%
    quantization error on K/V rows (see :func:`quantize_kv`). Sampling-level
    behaviour is preserved; exact greedy parity is only guaranteed by the
    full-precision cache (the default).

    ``top_p`` enables nucleus sampling (see :func:`sample_token`).
    ``eos_token_id``: once a sample emits EOS, all its later positions are
    filled with EOS (HF padding semantics) — the scan stays static-shape, the
    finished sample just stops influencing its own output.
    """
    _check_decoder(cfg)
    n, p = prompt.shape
    total = p + max_new_tokens
    if total > cfg.seq_len:
        raise ValueError(
            f"prompt ({p}) + max_new_tokens ({max_new_tokens}) exceeds "
            f"seq_len {cfg.seq_len}"
        )
    if rng is None:
        rng = jax.random.key(0)

    if prompt_mask is None:
        lengths = jnp.full((n,), p, jnp.int32)
        key_mask = None
    else:
        lengths = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
        # pad slots stay masked for the whole generation; decoded slots valid
        key_mask = jnp.concatenate(
            [prompt_mask.astype(bool),
             jnp.ones((n, max_new_tokens), bool)], axis=1)

    last_logits, cache = prefill(params, cfg, prompt, total, prompt_mask,
                                 kv_cache_dtype)
    rng, r0 = jax.random.split(rng)
    first = sample_token(last_logits, r0, temperature, top_k, approx_top_k,
                         top_p)
    done = (first == eos_token_id) if eos_token_id is not None \
        else jnp.zeros((n,), bool)
    if max_new_tokens == 1:
        return first[:, None]

    def step(carry, _):
        cache, token, pos, rng, done = carry
        # logical position of this token = sample length + tokens decoded so far
        logical = lengths + (pos - p)
        x = _embed_token(params, cfg, token, logical)
        new_cache = []
        for i, bp in enumerate(params["blocks"]):
            x, lc = _block_decode(bp, cfg, x, cache[i], pos, key_mask,
                                  positions=logical)
            new_cache.append(lc)
        logits = _logits(params, cfg, x)
        rng, r = jax.random.split(rng)
        nxt = sample_token(logits, r, temperature, top_k, approx_top_k, top_p)
        if eos_token_id is not None:
            nxt = jnp.where(done, jnp.int32(eos_token_id), nxt)
            done = jnp.logical_or(done, nxt == eos_token_id)
        return (new_cache, nxt, pos + 1, rng, done), token

    (_, last, _, _, _), tokens = jax.lax.scan(
        step, (cache, first, jnp.int32(p), rng, done), None,
        length=max_new_tokens - 1,
    )
    # tokens: (max_new-1, N) of all but the final sample; append it.
    return jnp.concatenate([tokens, last[None]], axis=0).T
