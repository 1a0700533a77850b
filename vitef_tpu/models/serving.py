"""Continuous batching: a slot-based decode server over the KV cache.

Beyond-parity serving capability (the reference has no serving path at all;
our ``generate()`` is batch-synchronous — every sequence in a batch starts
and stops together). Production decode wants **continuous batching**: a
fixed pool of ``n_slots`` cache rows, new requests admitted into free slots
the moment one finishes (EOS or budget), so the chip never idles waiting for
the longest request in a wave.

Design (host-orchestrated, device-resident state — the TPU-native shape of
vLLM-style scheduling without its paged allocator, which XLA's static shapes
don't want anyway):

  - The KV cache is a (n_slots, h, Lmax, d) pool per layer. Each slot has an
    independent write position ``pos`` (its token count): the decode step is
    ONE jitted SPMD program over all slots — per-slot positions ride as a
    (S,) vector, the attention validity mask is ``arange(Lmax) <= pos[s]``
    per row, and the cache write is a per-row scatter at ``pos[s]``.
  - **Admission** = a single-row prefill written into the slot's cache rows
    ``[0, len)`` (prompts sit at the START of their slot — no left-padding,
    unlike the batch-synchronous path). Prompts are right-padded to a small
    set of bucket lengths so admission compiles once per bucket, not once
    per prompt length.
  - Finished slots are freed by the host; their stale cache contents are
    dead weight masked by ``pos`` until the next admission overwrites them.
  - Inactive slots still execute the step (SPMD — no dynamic shapes); their
    writes land at their frozen ``pos`` and are overwritten on admission.

Greedy invariant (tested): every request's output through the server —
admitted at arbitrary times, sharing steps with arbitrary co-tenants,
through recycled slots — is token-for-token identical to a standalone
``generate()`` on that prompt.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from .quantize import embed_rows
from .generation import (
    _attend_cached,
    _check_decoder,
    _embed_token,
    _ffn,
    _logits,
    _norm,
    sample_token,
)
from .transformer import TransformerConfig, _linear


# ---------------------------------------------------------------------------
# Jitted device programs
# ---------------------------------------------------------------------------


def _block_decode_slots(bp: dict, cfg: TransformerConfig, x, layer_cache,
                        pos):
    """One-token block step with PER-SLOT cache positions.

    ``x``: (S, E); ``pos``: (S,) int32 — each row writes its k/v at its own
    cache slot and attends to its own prefix (arange(Lmax) <= pos[s]).
    """
    cd = cfg.cdtype()
    s_idx = jnp.arange(x.shape[0])

    def attn(x_in):
        from .transformer import split_qkv

        qkv = _linear(bp["attn"]["qkv_mat"], x_in, cd)
        q, k, v = split_qkv(cfg, qkv)
        n = k.shape[0]
        d = cfg.head_dim
        if cfg.uses_rope:
            from .generation import _rope_cos_sin
            from .rope import apply_rope

            # slot prompts start at cache index 0: logical position == pos
            cos, sin = _rope_cos_sin(cfg, pos)  # (S, d/2)
            q = apply_rope(q.reshape(n, cfg.n_heads, d),
                           cos[:, None], sin[:, None]).reshape(n, -1)
            k = apply_rope(k.reshape(n, cfg.n_kv_heads, d),
                           cos[:, None], sin[:, None]).reshape(n, -1)
        kh = k.reshape(n, cfg.n_kv_heads, d)
        vh = v.reshape(n, cfg.n_kv_heads, d)
        cache = {
            "k": layer_cache["k"].at[s_idx, :, pos].set(
                kh.astype(layer_cache["k"].dtype)),
            "v": layer_cache["v"].at[s_idx, :, pos].set(
                vh.astype(layer_cache["v"].dtype)),
        }
        z = _attend_cached(q, cache["k"], cache["v"], cfg.n_heads,
                           pos[:, None])
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


def _make_window_fn(cfg: TransformerConfig, temperature, top_k, top_p,
                    eos_id, window: int):
    """``window`` decode ticks for every slot in ONE device program.

    Per-tick host syncs are the latency tax of a host-driven decode loop
    (over a remote-dispatch link each tick costs ~2 RTTs; measured 28x
    slower than wave batching at window=1 despite doing 29% fewer ticks).
    The window scan keeps budget (``pos < limit``) and EOS enforcement
    ON-DEVICE so a slot never decodes past its request mid-window; the host
    harvests ``window`` token vectors per round-trip and admits into freed
    slots between windows. Inactive slots compute but their ``pos`` does not
    advance (their writes overwrite the same dead cell)."""

    def tick(params, cache, token, pos, act, rng):
        x = _embed_token(params, cfg, token, pos)
        new_cache = []
        for i, bp in enumerate(params["blocks"]):
            x, lc = _block_decode_slots(bp, cfg, x, cache[i], pos)
            new_cache.append(lc)
        logits = _logits(params, cfg, x)
        nxt = sample_token(logits, rng, temperature, top_k, top_p=top_p)
        nxt = jnp.where(act, nxt, token)
        pos = jnp.where(act, pos + 1, pos)
        return new_cache, nxt, pos

    def run_window(params, cache, token, pos, active, limit, rng):
        rngs = jax.random.split(rng, window)

        def body(carry, r):
            cache, token, pos, act = carry
            act_t = jnp.logical_and(act, pos < limit)  # per-slot budget
            cache, token, pos = tick(params, cache, token, pos, act_t, r)
            if eos_id is not None:  # freeze a slot after it emits EOS
                act = jnp.logical_and(act, token != eos_id)
            return (cache, token, pos, act), token

        (cache, token, pos, _), toks = jax.lax.scan(
            body, (cache, token, pos, active), rngs)
        return cache, token, pos, toks  # toks: (window, S)

    return jax.jit(run_window, donate_argnums=(1,))


def _attend_window_slots(q, k_cache, v_cache, n_heads: int, pos):
    """W-query attention against the slot cache pool, PER-SLOT positions.

    ``q``: (S, W, E); caches (S, kvh, Lmax, d) with the window's own K/V
    already written at each slot's [pos[s], pos[s]+W). Query w of slot s sees
    cache indices <= pos[s] + w. fp32 softmax like the one-token path.
    """
    import math as _math

    from ..ops.common import best_precision

    s, w, e = q.shape
    kvh = k_cache.shape[1]
    g = n_heads // kvh
    d = e // n_heads
    lmax = k_cache.shape[2]
    qh = q.reshape(s, w, kvh, g, d).transpose(0, 2, 3, 1, 4)  # (S,kvh,g,W,d)
    scores = jnp.einsum("skgwd,skKd->skgwK", qh, k_cache,
                        precision=best_precision(qh, k_cache),
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / _math.sqrt(d))
    valid = (jnp.arange(lmax)[None, None, :]
             <= (pos[:, None] + jnp.arange(w)[None, :])[:, :, None])  # (S,W,L)
    scores = jnp.where(valid[:, None, None], scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("skgwK,skKd->skgwd", weights, v_cache,
                     precision=best_precision(weights, v_cache),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    # (S, kvh, g, W, d) -> (S, W, E) in head-major order
    return out.reshape(s, n_heads, w, d).transpose(0, 2, 1, 3).reshape(s, w, e)


def _block_decode_window_slots(bp: dict, cfg: TransformerConfig, x,
                               layer_cache, pos):
    """W-token block step writing each slot's K/V at [pos[s], pos[s]+W)."""
    cd = cfg.cdtype()
    s, w, e = x.shape

    def attn(x_in):
        from .transformer import split_qkv

        d = cfg.head_dim
        qkv = _linear(bp["attn"]["qkv_mat"], x_in, cd)
        q, k, v = split_qkv(cfg, qkv)
        if cfg.uses_rope:
            from .generation import _rope_cos_sin
            from .rope import apply_rope

            positions = pos[:, None] + jnp.arange(w)[None, :]  # (S, W)
            cos, sin = _rope_cos_sin(cfg, positions)  # (S, W, d/2)
            cs = (cos[:, :, None], sin[:, :, None])  # over (S, W, heads, d)
            q = apply_rope(q.reshape(s, w, cfg.n_heads, d), *cs).reshape(
                s, w, e)
            k = apply_rope(k.reshape(s, w, cfg.n_kv_heads, d), *cs).reshape(
                s, w, -1)
        kh = k.reshape(s, w, cfg.n_kv_heads, d)
        vh = v.reshape(s, w, cfg.n_kv_heads, d)
        # scatter W cells per slot: cache[s, :, pos[s]+w, :] = kh[s, w]
        idx_s = jnp.broadcast_to(jnp.arange(s)[:, None], (s, w))[..., None]
        idx_l = (pos[:, None] + jnp.arange(w)[None, :])[..., None]
        idx_h = jnp.arange(cfg.n_kv_heads)[None, None, :]
        cache = {
            "k": layer_cache["k"].at[idx_s, idx_h, idx_l].set(
                kh.astype(layer_cache["k"].dtype)),
            "v": layer_cache["v"].at[idx_s, idx_h, idx_l].set(
                vh.astype(layer_cache["v"].dtype)),
        }
        z = _attend_window_slots(q, cache["k"], cache["v"], cfg.n_heads, pos)
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


def _forward_window_slots(params, cfg: TransformerConfig, tokens, cache, pos):
    """Verify pass over all slots: (S, W) tokens at positions [pos[s], +W).

    Returns ((S, W, V) fp32 logits, updated cache)."""
    cd = cfg.cdtype()
    emb = params["embedding"]
    x = embed_rows(emb["token_emb"], tokens, cd)
    if cfg.pos_emb:
        positions = pos[:, None] + jnp.arange(tokens.shape[1])[None, :]
        x = x + emb["pos_emb"][0][positions].astype(cd)
    new_cache = []
    for i, bp in enumerate(params["blocks"]):
        x, lc = _block_decode_window_slots(bp, cfg, x, cache[i], pos)
        new_cache.append(lc)
    return _logits(params, cfg, x), new_cache


def _make_spec_window_fn(cfg: TransformerConfig, draft_cfg: TransformerConfig,
                         gamma: int, eos_id, rounds: int):
    """``rounds`` speculative draft-and-verify rounds over ALL slots in ONE
    device program (the continuous-batching composition of
    models/speculative.py — greedy acceptance, per-slot commit pointers).

    Each round: the draft model proposes ``gamma`` tokens per slot
    (gamma+1 one-token slot steps — the last SAMPLE is discarded but its K/V
    write is load-bearing, exactly like the batch-1 path), the target
    verifies all slots in one (S, gamma+1)-query windowed forward, and each
    slot commits its longest matching prefix plus the target's correction.
    Rollback of rejected proposals is free: the per-slot ``pos`` just doesn't
    advance past the accepted prefix and stale cells are masked until
    overwritten by a later round (idx-vs-pos, both caches).

    Budget (``pos < limit``) and EOS cut the commit ON-DEVICE mid-round, so
    a slot never decodes past its request — the host applies the returned
    per-round commit counts verbatim. Greedy only: the emitted stream is
    token-for-token the target model's own greedy continuation (the
    models/speculative.py invariant, asserted per-request in tests).
    """
    w = gamma + 1

    def spec_round(params, dparams, cache, dcache, token, pos, act, limit):
        s = token.shape[0]

        # -- draft: gamma+1 one-token slot steps from `token` at index pos
        def draft_step(carry, i):
            dcache, tok = carry
            x = _embed_token(dparams, draft_cfg, tok, pos + i)
            new = []
            for li, bp in enumerate(dparams["blocks"]):
                x, lc = _block_decode_slots(bp, draft_cfg, x, dcache[li],
                                            pos + i)
                new.append(lc)
            logits = _logits(dparams, draft_cfg, x)  # (S, V)
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (new, g), g

        (dcache, _), g_all = jax.lax.scan(
            draft_step, (dcache, token), jnp.arange(gamma + 1))
        g = g_all[:gamma].T  # (S, gamma)

        # -- target: ONE windowed forward over [token, g_1..g_gamma] --------
        window = jnp.concatenate([token[:, None], g], axis=1)  # (S, W)
        logits, cache = _forward_window_slots(params, cfg, window, cache, pos)
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (S, W)

        # greedy acceptance: longest matching prefix + the correction token
        matches = (g == t[:, :gamma]).astype(jnp.int32)  # (S, gamma)
        a = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)  # (S,)
        emit = jnp.where(jnp.arange(w)[None, :] < a[:, None],
                         jnp.concatenate(
                             [g, jnp.zeros((s, 1), jnp.int32)], axis=1),
                         t)  # (S, W)

        # commit count: acceptance, cut by per-slot budget, cut at EOS
        n_emit = jnp.where(act, jnp.minimum(a + 1,
                                            jnp.maximum(limit - pos, 0)), 0)
        if eos_id is not None:
            is_eos = emit == eos_id
            first_eos = jnp.argmax(is_eos, axis=1)  # 0 when none
            has_eos = jnp.any(is_eos, axis=1)
            cut = jnp.where(has_eos, first_eos + 1, w)
            n_emit = jnp.minimum(n_emit, cut)
            act = jnp.logical_and(
                act, ~(has_eos & (first_eos < n_emit)))  # freeze after EOS
        pos = pos + n_emit
        last = jnp.take_along_axis(
            emit, jnp.maximum(n_emit, 1)[:, None] - 1, axis=1)[:, 0]
        token = jnp.where(n_emit > 0, last, token)
        return cache, dcache, token, pos, act, emit, n_emit

    def run_window(params, dparams, cache, dcache, token, pos, active, limit):
        def body(carry, _):
            cache, dcache, token, pos, act = carry
            cache, dcache, token, pos, act, emit, n_emit = spec_round(
                params, dparams, cache, dcache, token, pos, act, limit)
            return (cache, dcache, token, pos, act), (emit, n_emit)

        (cache, dcache, token, pos, _), (emits, counts) = jax.lax.scan(
            body, (cache, dcache, token, pos, active), None, length=rounds)
        return cache, dcache, token, pos, emits, counts  # (R,S,W), (R,S)

    return jax.jit(run_window, donate_argnums=(2, 3))


def _make_admit_prefix_fn(cfg: TransformerConfig):
    """Admission with a PRECOMPUTED shared prefix (prefix caching).

    A serving deployment typically runs every request through one system
    prompt. Recomputing its prefill per admission wastes exactly
    ``plen/(plen+len)`` of the admission FLOPs; instead the server prefills
    the prefix ONCE (``DecodeServer.register_prefix``) and admission (a)
    COPIES the stored per-layer (h, plen, d) K/V into the slot's cache rows
    ``[0, plen)`` — an HBM copy, no recompute — and (b) prefills only the
    request's OWN tokens at positions ``[plen, plen+len)``, with each block's
    queries attending to [prefix K/V ++ own causal K/V].

    The prefix length is STATIC per compiled admission (shape-keyed jit —
    one compile per registered-prefix length + prompt bucket). Exactness:
    the concatenated-key attention computes the same contractions as a
    standalone prefill of [prefix ++ prompt], so greedy outputs match
    ``generate()`` on the concatenation token-for-token (tested).
    """
    import math as _math

    from .generation import _ffn as _gen_ffn, _split_heads

    cd = cfg.cdtype()

    def attn_ctx(ap: dict, x, ctx_k, ctx_v):
        """Own-token causal attention with the prefix as leading context.

        ``x``: (1, pb, E) normed input; ``ctx_k``/``ctx_v``: (kv, plen, d)
        (already ROTATED for rope models — register_prefix stores the
        prefill cache). Right-padded own rows are harmless: causality keeps
        real queries off padded keys, and padded rows' K/V land beyond
        ``pos`` in the cache.
        """
        from .transformer import split_qkv

        plen = ctx_k.shape[1]
        pb = x.shape[1]
        d = cfg.head_dim
        kvh = cfg.n_kv_heads
        g = cfg.n_heads // kvh
        qkv = _linear(ap["qkv_mat"], x, cd)
        q, k, v = split_qkv(cfg, qkv)
        if cfg.uses_rope:
            from .generation import _rope_cos_sin
            from .rope import apply_rope

            cos, sin = _rope_cos_sin(cfg, plen + jnp.arange(pb))
            cs = (cos[:, None], sin[:, None])  # over (1, pb, heads, d)
            q = apply_rope(q.reshape(1, pb, cfg.n_heads, d), *cs).reshape(
                1, pb, -1)
            k = apply_rope(k.reshape(1, pb, kvh, d), *cs).reshape(1, pb, -1)
        qh = _split_heads(q, cfg.n_heads)  # (1, h, pb, d)
        kh = _split_heads(k, kvh)
        vh = _split_heads(v, kvh)
        ck = jnp.concatenate([ctx_k[None].astype(qh.dtype), kh], axis=2)
        cv = jnp.concatenate([ctx_v[None].astype(vh.dtype), vh], axis=2)
        from ..ops.common import best_precision
        qg = qh.reshape(1, kvh, g, pb, d)
        scores = jnp.einsum("nkgqd,nkKd->nkgqK", qg, ck,
                            precision=best_precision(qg, ck),
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / _math.sqrt(d))
        j = jnp.arange(plen + pb)[None, :]
        visible = (j < plen) | ((j - plen) <= jnp.arange(pb)[:, None])
        scores = jnp.where(visible[None, None, None], scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
        z = jnp.einsum("nkgqK,nkKd->nkgqd", weights, cv,
                       precision=best_precision(weights, cv),
                       preferred_element_type=jnp.float32).astype(cd)
        z = z.reshape(1, cfg.n_heads, pb, d).transpose(0, 2, 1, 3).reshape(
            1, pb, -1)
        return _linear(ap["output"], z, cd), kh, vh

    def admit(params, cache, pos, slot, prefix_kv, prompt, length):
        pb = prompt.shape[0]
        plen = prefix_kv[0]["k"].shape[1]
        emb = params["embedding"]
        x = embed_rows(emb["token_emb"], prompt[None], cd)
        if cfg.pos_emb:
            x = x + emb["pos_emb"][0][plen + jnp.arange(pb)].astype(cd)[None]
        new_cache = []
        for bp, pkv, lc in zip(params["blocks"], prefix_kv, cache):
            if cfg.pre_norm:
                att, kh, vh = attn_ctx(bp["attn"], _norm(bp["attn_norm"],
                                                         cfg, x),
                                       pkv["k"], pkv["v"])
                out = x + att
                out = out + _gen_ffn(bp["ffn"], cfg,
                                     _norm(bp["ffn_norm"], cfg, out))
            else:
                att, kh, vh = attn_ctx(bp["attn"], x, pkv["k"], pkv["v"])
                out = _norm(bp["attn_norm"], cfg, x + att)
                out = _norm(bp["ffn_norm"], cfg,
                            out + _gen_ffn(bp["ffn"], cfg, out))
            k_slot = jax.lax.dynamic_update_slice(
                lc["k"], pkv["k"][None].astype(lc["k"].dtype),
                (slot, 0, 0, 0))
            k_slot = jax.lax.dynamic_update_slice(
                k_slot, kh.astype(lc["k"].dtype), (slot, 0, plen, 0))
            v_slot = jax.lax.dynamic_update_slice(
                lc["v"], pkv["v"][None].astype(lc["v"].dtype),
                (slot, 0, 0, 0))
            v_slot = jax.lax.dynamic_update_slice(
                v_slot, vh.astype(lc["v"].dtype), (slot, 0, plen, 0))
            new_cache.append({"k": k_slot, "v": v_slot})
            x = out
        logits = _logits(params, cfg, x[0, length - 1])
        pos = pos.at[slot].set(plen + length)
        return new_cache, pos, logits

    return jax.jit(admit, donate_argnums=(1,))


def _make_admit_fn(cfg: TransformerConfig):
    """Prefill ONE right-padded prompt row, install it into ``slot``, and
    return the last REAL token's logits (to sample the first output from).

    Right padding is harmless: causal attention means every real query row
    only reads real keys, and the padded tail's cache cells sit beyond
    ``pos`` forever (and are overwritten on the slot's next admission).
    Compiles once per prompt-length bucket (shape-keyed jit cache).
    """
    from .generation import _block_prefill, _split_heads

    def admit(params, cache, pos, slot, prompt, length):
        pb = prompt.shape[0]
        cd = cfg.cdtype()
        emb = params["embedding"]
        x = embed_rows(emb["token_emb"], prompt[None], cd)
        if cfg.pos_emb:
            x = x + emb["pos_emb"][:, :pb].astype(cd)
        new_cache = []
        for bp, lc in zip(params["blocks"], cache):
            x, k, v = _block_prefill(bp, cfg, x)
            kh = _split_heads(k.astype(cd), cfg.n_kv_heads)  # (1, kv, Pb, d)
            vh = _split_heads(v.astype(cd), cfg.n_kv_heads)
            new_cache.append({
                "k": jax.lax.dynamic_update_slice(
                    lc["k"], kh.astype(lc["k"].dtype), (slot, 0, 0, 0)),
                "v": jax.lax.dynamic_update_slice(
                    lc["v"], vh.astype(lc["v"].dtype), (slot, 0, 0, 0)),
            })
        logits = _logits(params, cfg, x[0, length - 1])
        pos = pos.at[slot].set(length)
        return new_cache, pos, logits

    return jax.jit(admit, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


@dataclass
class Request:
    prompt: Any  # 1-D int32 array/list of token ids
    max_new_tokens: int
    prefix: int | None = None  # handle from DecodeServer.register_prefix
    tokens: list = field(default_factory=list)  # output, filled by the server
    slot: int | None = None
    done: bool = False


class DecodeServer:
    """Continuous-batching decode server over ``n_slots`` KV-cache rows.

    ``serve(requests)`` runs the admit/step loop until every request is
    complete; outputs land in ``request.tokens``. Greedy by default
    (temperature=0) — the mode with an exact standalone-``generate()``
    equivalence guarantee. Sampling modes reuse the same machinery with a
    per-step rng (streams differ from batch-synchronous ``generate()`` by
    construction — acceptance of a step depends on co-tenancy).

    ``mesh``: multi-chip serving. Params are sharded by the training TP
    rules (qkv/fc1 column-parallel, output/fc2 row-parallel), the slot cache
    pool slots-over-'dp' / heads-over-'tp'; pjit propagates the shardings
    through admission and the window scan and inserts the row-parallel
    psums. Outputs are token-for-token the single-device server's (tested
    on the CPU mesh; the model must already fit TP: n_heads % tp == 0,
    n_slots % dp == 0). Composes with int8 weights and prefix caching.

    ``draft_params``/``draft_cfg``: speculative continuous batching — every
    window becomes ``harvest_every`` draft-and-verify rounds over all slots
    (``gamma`` proposals each; see :func:`_make_spec_window_fn`). Greedy
    only (``temperature == 0`` — the mode with the exactness guarantee);
    admission additionally prefills the draft model's slot cache. Outputs
    stay token-for-token identical to the non-speculative server (tested).
    Not composable with ``register_prefix`` (the draft cache would need its
    own prefix prefill; unsupported, asserted at admission).
    """

    def __init__(self, params, cfg: TransformerConfig, *, n_slots: int,
                 max_len: int | None = None, temperature: float = 0.0,
                 top_k: int | None = None, top_p: float | None = None,
                 eos_token_id: int | None = None, bucket: int = 64,
                 harvest_every: int = 8, rng=None, mesh=None,
                 draft_params=None, draft_cfg: TransformerConfig | None = None,
                 gamma: int = 4):
        _check_decoder(cfg)
        self.params, self.cfg = params, cfg
        self.n_slots = n_slots
        self.max_len = max_len or cfg.seq_len
        assert self.max_len <= cfg.seq_len
        self.temperature, self.top_k, self.top_p = temperature, top_k, top_p
        self.eos_token_id = eos_token_id
        self.bucket = bucket
        self.rng = rng if rng is not None else jax.random.key(0)

        # Multi-chip serving: shard params by the training TP rules
        # (qkv/fc1 column-parallel, output/fc2 row-parallel) and the cache
        # pool over the mesh — heads ride 'tp' (each chip holds its heads'
        # K/V, matching the column-parallel qkv it computes), slots ride
        # 'dp' (throughput scaling). pjit propagates the shardings through
        # admission and the window scan and inserts the row-parallel psums;
        # outputs are exactly the single-device server's (tested on the CPU
        # mesh). The host orchestration is unchanged.
        cache_sharding = None
        self._replicate = lambda x: x  # host state -> mesh (identity off-mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import shard_params

            self.params = shard_params(params, mesh)
            dp = "dp" if mesh.shape.get("dp", 1) > 1 else None
            tp = "tp" if mesh.shape.get("tp", 1) > 1 else None
            if dp:
                assert n_slots % mesh.shape["dp"] == 0, (
                    "n_slots must divide over the dp axis")
            if tp:
                assert cfg.n_heads % mesh.shape["tp"] == 0
                assert cfg.n_kv_heads % mesh.shape["tp"] == 0, (
                    "GQA cache sharding needs n_kv_heads % tp == 0")
            cache_sharding = NamedSharding(mesh, P(dp, tp, None, None))
            repl = NamedSharding(mesh, P())
            self._replicate = lambda x: jax.device_put(x, repl)
        self.rng = self._replicate(self.rng)

        d = cfg.head_dim
        cd = cfg.cdtype()
        self.cache = [
            {"k": jnp.zeros((n_slots, cfg.n_kv_heads, self.max_len, d), cd),
             "v": jnp.zeros((n_slots, cfg.n_kv_heads, self.max_len, d), cd)}
            for _ in range(cfg.n_layers)
        ]
        if cache_sharding is not None:
            self.cache = jax.device_put(self.cache, cache_sharding)
        self.pos = self._replicate(jnp.zeros((n_slots,), jnp.int32))
        self.token = self._replicate(jnp.zeros((n_slots,), jnp.int32))
        self.limit = self._replicate(jnp.zeros((n_slots,), jnp.int32))
        self.active = [False] * n_slots
        self._owner: list[Request | None] = [None] * n_slots
        self.steps = 0  # decode ticks executed (telemetry)
        self.window = max(1, harvest_every)
        self._window_fn = _make_window_fn(cfg, temperature, top_k, top_p,
                                          eos_token_id, self.window)
        self._admit_fn = _make_admit_fn(cfg)
        self._admit_prefix_fn = _make_admit_prefix_fn(cfg)
        self._prefixes: dict[int, dict] = {}
        self.prefill_tokens_saved = 0  # telemetry: prefix tokens not recomputed

        # speculative continuous batching (draft model over the same slots)
        self._spec = draft_params is not None
        self.spec_rounds = 0      # telemetry: draft-and-verify rounds run
        self.spec_committed = 0   # telemetry: tokens committed by those rounds
        if self._spec:
            assert draft_cfg is not None
            _check_decoder(draft_cfg)
            assert temperature == 0.0, (
                "speculative serving is greedy-only (the mode with the "
                "exact standalone-generate() equivalence guarantee)")
            assert draft_cfg.vocab_size == cfg.vocab_size
            assert gamma >= 1
            self.gamma = gamma
            self._draft_params, self._draft_cfg = draft_params, draft_cfg
            dd = draft_cfg.head_dim
            self._draft_cache = [
                {"k": jnp.zeros((n_slots, draft_cfg.n_kv_heads, self.max_len,
                                 dd), draft_cfg.cdtype()),
                 "v": jnp.zeros((n_slots, draft_cfg.n_kv_heads, self.max_len,
                                 dd), draft_cfg.cdtype())}
                for _ in range(draft_cfg.n_layers)
            ]
            assert mesh is None, (
                "speculative serving is the single-device latency/throughput "
                "path (shard the target alone for multi-chip)")
            self._draft_admit_fn = _make_admit_fn(draft_cfg)
            self._spec_window_fn = _make_spec_window_fn(
                cfg, draft_cfg, gamma, eos_token_id, self.window)

    def reset(self, rng=None) -> None:
        """Clear all slots (compiled step/admit closures stay hot).

        The cache itself needs no zeroing: admission overwrites ``[0, len)``
        and ``pos`` masks everything beyond."""
        self.pos = self._replicate(jnp.zeros((self.n_slots,), jnp.int32))
        self.token = self._replicate(jnp.zeros((self.n_slots,), jnp.int32))
        self.limit = self._replicate(jnp.zeros((self.n_slots,), jnp.int32))
        self.active = [False] * self.n_slots
        self._owner = [None] * self.n_slots
        self.steps = 0
        self.spec_rounds = 0
        self.spec_committed = 0
        if rng is not None:
            self.rng = self._replicate(rng)

    # -- prefix caching ------------------------------------------------------

    def register_prefix(self, prefix_tokens) -> int:
        """Prefill a shared prefix (system prompt) ONCE; returns a handle.

        Requests carrying ``prefix=handle`` skip the prefix's prefill at
        admission: its per-layer (h, plen, d) K/V is COPIED into the slot and
        only the request's own tokens run the transformer. The prefix length
        is static per compiled admission program (one compile per distinct
        registered length + prompt bucket — register long-lived prefixes, not
        per-request ones). Greedy outputs are token-for-token identical to a
        standalone ``generate()`` on [prefix ++ prompt] (tested).
        """
        from .generation import prefill

        p = jnp.asarray(prefix_tokens, jnp.int32)
        assert p.ndim == 1 and p.shape[0] >= 1
        plen = int(p.shape[0])
        assert plen < self.max_len, "prefix must leave room for prompts"
        _, cache = jax.jit(
            lambda params, toks: prefill(params, self.cfg, toks, plen)
        )(self.params, p[None])
        kv = [{"k": lc["k"][0], "v": lc["v"][0]} for lc in cache]
        handle = len(self._prefixes)
        self._prefixes[handle] = {"kv": kv, "plen": plen}
        return handle

    # -- admission ---------------------------------------------------------

    def _bucketed(self, prompt, room: int | None = None):
        p = jnp.asarray(prompt, jnp.int32)
        pb = max(self.bucket, -(-p.shape[0] // self.bucket) * self.bucket)
        # bucket never exceeds the cache rows available to the prompt
        pb = min(pb, self.max_len if room is None else room)
        assert p.shape[0] <= pb
        return jnp.pad(p, (0, pb - p.shape[0])), p.shape[0]

    def _sample(self, logits):
        self.rng, r = jax.random.split(self.rng)
        return sample_token(logits[None], r, self.temperature, self.top_k,
                            top_p=self.top_p)[0]

    def admit(self, req: Request, slot: int) -> None:
        if self._spec:
            assert req.prefix is None, (
                "prefix caching is not composable with speculative serving")
        if req.prefix is not None:
            pre = self._prefixes[req.prefix]
            plen = pre["plen"]
            padded, length = self._bucketed(req.prompt,
                                            room=self.max_len - plen)
            assert plen + length + req.max_new_tokens <= self.max_len, (
                f"request needs {plen + length + req.max_new_tokens} > "
                f"max_len {self.max_len}")
            self.cache, self.pos, logits = self._admit_prefix_fn(
                self.params, self.cache, self.pos, jnp.int32(slot),
                pre["kv"], padded, jnp.int32(length))
            self.prefill_tokens_saved += plen
        else:
            plen = 0
            padded, length = self._bucketed(req.prompt)
            assert length + req.max_new_tokens <= self.max_len, (
                f"request needs {length + req.max_new_tokens} > max_len "
                f"{self.max_len}")
            self.cache, self.pos, logits = self._admit_fn(
                self.params, self.cache, self.pos, jnp.int32(slot), padded,
                jnp.int32(length))
            if self._spec:
                # the verify window writes up to gamma cells past the commit
                # pointer; keep them inside the cache rows
                assert (length + req.max_new_tokens + self.gamma
                        <= self.max_len), (
                    f"speculative request needs {length + req.max_new_tokens}"
                    f" + gamma {self.gamma} cache rows > max_len "
                    f"{self.max_len}")
                self._draft_cache, _, _ = self._draft_admit_fn(
                    self._draft_params, self._draft_cache, self.pos,
                    jnp.int32(slot), padded, jnp.int32(length))
        first = self._sample(logits)
        self.token = self.token.at[slot].set(first)
        # device-side budget: the remaining max_new - 1 ticks end when the
        # write position reaches prefix + length + max_new - 1
        self.limit = self.limit.at[slot].set(
            plen + length + req.max_new_tokens - 1)
        self.active[slot] = True
        self._owner[slot] = req
        req.slot = slot
        req.tokens.append(int(first))
        self._maybe_finish(slot, int(first))

    def _maybe_finish(self, slot: int, tok: int) -> None:
        req = self._owner[slot]
        if req is None:
            return
        if (self.eos_token_id is not None and tok == self.eos_token_id) or \
                len(req.tokens) >= req.max_new_tokens:
            req.done = True
            self.active[slot] = False
            self._owner[slot] = None

    # -- the loop ----------------------------------------------------------

    def step(self) -> None:
        """One WINDOW of decode ticks for all active slots; harvests the
        (window, n_slots) token block in one device round-trip. Budget and
        EOS freezes happen on-device mid-window; the host truncates each
        owner's stream exactly as the per-tick protocol would."""
        if self._spec:
            return self._spec_step()
        active = jnp.asarray(self.active)
        self.rng, r = jax.random.split(self.rng)
        self.cache, self.token, self.pos, toks = self._window_fn(
            self.params, self.cache, self.token, self.pos, active,
            self.limit, r)
        self.steps += self.window
        toks = jax.device_get(toks)  # (window, S)
        for t in range(self.window):
            for slot, owner in enumerate(self._owner):
                if owner is not None and self.active[slot]:
                    tok = int(toks[t, slot])
                    owner.tokens.append(tok)
                    self._maybe_finish(slot, tok)

    def _spec_step(self) -> None:
        """One window of ``self.window`` speculative rounds over all slots.

        The device returns per-round (S, gamma+1) emit blocks and per-slot
        commit counts (already cut at budget/EOS on device); the host appends
        exactly the committed prefixes. ``steps`` counts committed tokens —
        the tick-equivalents a non-speculative server would have spent — so
        slot-tick utilisation stays comparable; the speculative cost unit is
        ``spec_rounds`` (each = gamma+1 draft steps + one verify window)."""
        active = jnp.asarray(self.active)
        (self.cache, self._draft_cache, self.token, self.pos, emits,
         counts) = self._spec_window_fn(
            self.params, self._draft_params, self.cache, self._draft_cache,
            self.token, self.pos, active, self.limit)
        emits = jax.device_get(emits)    # (rounds, S, gamma+1)
        counts = jax.device_get(counts)  # (rounds, S)
        self.spec_rounds += self.window
        for r in range(emits.shape[0]):
            for slot, owner in enumerate(self._owner):
                if owner is None or not self.active[slot]:
                    continue
                for t in range(int(counts[r, slot])):
                    tok = int(emits[r, slot, t])
                    owner.tokens.append(tok)
                    self.steps += 1
                    self.spec_committed += 1
                    self._maybe_finish(slot, tok)
                    if not self.active[slot]:
                        break

    def serve(self, requests: list[Request]) -> list[Request]:
        """Admit-and-step until every request completes (FIFO admission)."""
        queue = list(requests)
        while queue or any(self.active):
            while queue and not all(self.active):
                slot = self.active.index(False)
                self.admit(queue.pop(0), slot)
            if any(self.active):
                self.step()
        return requests
