"""Speculative decoding — draft-and-verify serving for latency-bound decode.

Single-sample (batch 1) autoregressive decode is HBM-bound on the TARGET
model's parameters: every token pays a full parameter read for one token of
useful work. Speculative decoding (Leviathan et al. 2023) amortises that
read: a cheap DRAFT model proposes ``gamma`` tokens autoregressively, then
the target verifies all of them in ONE windowed forward (gamma+1 queries
against its KV cache — parameters are read once per WINDOW, not per token).
The longest prefix of proposals matching the target's own predictions is
accepted, plus the target's correction token. Greedy mode's output is
EXACTLY the target model's greedy decode (tested token-for-token against
:func:`~vitef_tpu.models.generation.generate`); the draft only changes how
fast tokens commit, never which tokens.

TPU-first mechanics (everything one compiled program, static shapes):

- Both KV caches are allocated once; "rollback" of rejected proposals is
  FREE — the commit pointer just doesn't advance past the accepted prefix,
  and the stale slots are masked (idx-vs-pos) until overwritten by a later
  round. No data movement.
- The outer loop is a ``lax.while_loop`` over verify rounds (worst case
  ``max_new_tokens`` rounds, best case ``max_new/(gamma+1)``); each round is
  a static-gamma draft scan plus one static-(gamma+1) window forward.
- Tokens commit into a fixed (max_new + gamma + 1) buffer with a
  ``dynamic_update_slice`` window write; the tail junk beyond the accepted
  count is overwritten by the next round's window.

The reference has no serving path at all (SURVEY §5.7); this extends
vitef_tpu's generation capability for the latency regime the batched
``generate()`` does not target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import math

from ..ops.common import best_precision
from .quantize import embed_rows
from .generation import (
    _block_decode,
    _check_decoder,
    _embed_token,
    _ffn,
    _logits,
    _split_heads,
    prefill,
)
from .transformer import TransformerConfig, _linear, _norm

_NEG_INF = -1e30


def _attend_window(q, k_cache, v_cache, n_heads: int, pos):
    """W-query attention against the cache: query w sees keys idx <= pos + w.

    q: (N, W, E); caches (N, h, Lmax, d) with the window's own K/V already
    written at [pos, pos+W). fp32 softmax like the one-token path.
    """
    n, w, e = q.shape
    kvh = k_cache.shape[1]
    g = n_heads // kvh  # GQA query groups (1 = standard MHA)
    d = e // n_heads
    lmax = k_cache.shape[2]
    qh = _split_heads(q, n_heads).reshape(n, kvh, g, w, d)
    scores = jnp.einsum("nkgwd,nkKd->nkgwK", qh, k_cache,
                        precision=best_precision(qh, k_cache),
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(d))
    valid = jnp.arange(lmax)[None, :] <= (pos + jnp.arange(w))[:, None]
    scores = jnp.where(valid[None, None, None], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("nkgwK,nkKd->nkgwd", weights, v_cache,
                     precision=best_precision(weights, v_cache),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.reshape(n, n_heads, w, d)
    return out.transpose(0, 2, 1, 3).reshape(n, w, e)


def _block_decode_window(bp: dict, cfg: TransformerConfig, x, layer_cache, pos):
    """W-token block step writing the window's K/V at [pos, pos+W)."""
    cd = cfg.cdtype()

    def attn(x_in):
        from .transformer import split_qkv

        n, w, e = x_in.shape
        d = cfg.head_dim
        qkv = _linear(bp["attn"]["qkv_mat"], x_in, cd)
        q, k, v = split_qkv(cfg, qkv)
        if cfg.uses_rope:
            from .generation import _rope_cos_sin
            from .rope import apply_rope

            cos, sin = _rope_cos_sin(cfg, pos + jnp.arange(w))  # (W, d/2)
            cs = (cos[:, None], sin[:, None])  # over (N, W, heads, d)
            q = apply_rope(q.reshape(n, w, cfg.n_heads, d), *cs).reshape(
                n, w, e)
            k = apply_rope(k.reshape(n, w, cfg.n_kv_heads, d), *cs).reshape(
                n, w, -1)
        kc = jax.lax.dynamic_update_slice(
            layer_cache["k"],
            _split_heads(k, cfg.n_kv_heads).astype(layer_cache["k"].dtype),
            (0, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(
            layer_cache["v"],
            _split_heads(v, cfg.n_kv_heads).astype(layer_cache["v"].dtype),
            (0, 0, pos, 0))
        z = _attend_window(q, kc, vc, cfg.n_heads, pos)
        return _linear(bp["attn"]["output"], z, cd), {"k": kc, "v": vc}

    if cfg.pre_norm:
        att, cache = attn(_norm(bp["attn_norm"], cfg, x))
        out = x + att
        out = out + _ffn(bp["ffn"], cfg, _norm(bp["ffn_norm"], cfg, out))
    else:
        att, cache = attn(x)
        out = _norm(bp["attn_norm"], cfg, x + att)
        out = _norm(bp["ffn_norm"], cfg, out + _ffn(bp["ffn"], cfg, out))
    return out, cache


def _forward_window(params, cfg: TransformerConfig, tokens, cache, pos):
    """Target verify pass: (1, W) tokens at sequence positions [pos, pos+W).

    Returns ((1, W, V) fp32 logits, updated cache)."""
    positions = pos + jnp.arange(tokens.shape[1])
    emb = params["embedding"]
    x = embed_rows(emb["token_emb"], tokens, cfg.cdtype())
    if cfg.pos_emb:
        x = x + emb["pos_emb"][0][positions].astype(cfg.cdtype())[None]
    new_cache = []
    for i, bp in enumerate(params["blocks"]):
        x, lc = _block_decode_window(bp, cfg, x, cache[i], pos)
        new_cache.append(lc)
    return _logits(params, cfg, x), new_cache


def generate_speculative(params, cfg: TransformerConfig, prompt,
                         max_new_tokens: int, *, draft_params,
                         draft_cfg: TransformerConfig, gamma: int = 4,
                         temperature: float = 0.0, rng=None,
                         return_stats: bool = False):
    """Speculative decoding; the output DISTRIBUTION equals target decoding.

    ``temperature == 0``: greedy — proposals accepted while they match the
    target argmax; output token-for-token equals plain greedy decode.
    ``temperature > 0``: the Leviathan et al. (2023) acceptance rule —
    proposal g_i drawn from the draft distribution q is accepted with
    probability min(1, p(g_i)/q(g_i)); the first rejection is resampled from
    the normalised residual max(0, p - q), and a full acceptance earns a
    bonus token from p — provably EXACTLY the target sampling distribution,
    whatever the draft (checked empirically in tests/test_speculative.py).

    ``prompt``: (1, P) int32 (batch 1 — the latency regime; batched serving
    uses :func:`~vitef_tpu.models.generation.generate`). The draft model must
    share the target's tokenizer/vocabulary. Returns (1, max_new_tokens)
    int32, plus ``{"rounds", "drafted", "accepted"}`` when ``return_stats``
    (acceptance rate = accepted/drafted is THE serving metric to watch: the
    speedup is ~(1 + accepted/round) target-forwards' worth of tokens per
    round). Both counters include only proposals within the
    ``max_new_tokens`` budget — the final round always drafts ``gamma``
    proposals mechanically, but ones that would land past the cap are
    excluded so short generations don't understate the acceptance rate.
    Pure and jittable.
    """
    _check_decoder(cfg)
    _check_decoder(draft_cfg)
    n, p = prompt.shape
    if n != 1:
        raise ValueError("generate_speculative is the batch-1 latency path")
    if gamma < 1:
        raise ValueError("gamma must be >= 1")
    total = p + max_new_tokens + gamma + 1
    if total > min(cfg.seq_len, draft_cfg.seq_len):
        raise ValueError(
            f"prompt + max_new_tokens + gamma + 1 = {total} exceeds "
            f"seq_len {min(cfg.seq_len, draft_cfg.seq_len)}")

    if rng is None:
        rng = jax.random.key(0)
    sampling = temperature > 0.0

    t_logits, t_cache = prefill(params, cfg, prompt, total)
    d_logits, d_cache = prefill(draft_params, draft_cfg, prompt, total)
    if sampling:
        rng, r0 = jax.random.split(rng)
        first = jax.random.categorical(
            r0, t_logits / temperature, axis=-1).astype(jnp.int32)  # (1,)
    else:
        first = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # (1,)

    buf = jnp.zeros((max_new_tokens + gamma + 1,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, first, (0,))

    # carry: (n_done, last committed-but-uncached token, commit pointer c,
    #         target cache, draft cache, token buffer, rounds, accepted)
    # cache slots [0, c) hold K/V of sequence tokens [0, c); `tok` sits at
    # sequence index c and is processed by the next round's forwards.
    def cond(carry):
        return carry[0] < max_new_tokens

    def body(carry):
        n_done, tok, c, t_cache, d_cache, buf, rounds, acc, drf, rng = carry
        rng, r_draft, r_accept, r_fix = jax.random.split(rng, 4)

        # -- draft: gamma+1 one-token steps from `tok` at index c. The
        # (gamma+1)-th step's SAMPLE is discarded, but its K/V write at slot
        # c+gamma is load-bearing: a fully-accepted round advances the commit
        # pointer past that slot, and without the write the draft cache would
        # permanently hold zeros there — silently corrupting every later
        # draft distribution (and with it the acceptance rate).
        def draft_step(dc, i):
            d_cache, w = dc
            x = _embed_token(draft_params, draft_cfg, w[None], (c + i)[None])
            new = []
            for li, bp in enumerate(draft_params["blocks"]):
                x, lc = _block_decode(bp, draft_cfg, x, d_cache[li], c + i)
                new.append(lc)
            logits = _logits(draft_params, draft_cfg, x)[0]  # (V,)
            if sampling:
                g = jax.random.categorical(
                    jax.random.fold_in(r_draft, i),
                    logits / temperature).astype(jnp.int32)
            else:
                g = jnp.argmax(logits).astype(jnp.int32)
            return (new, g), (g, logits)

        (d_cache, _), (g_all, d_logits) = jax.lax.scan(
            draft_step, (d_cache, tok[0]), jnp.arange(gamma + 1))
        g, d_logits = g_all[:gamma], d_logits[:gamma]

        # -- target: ONE windowed forward over [tok, g_1..g_gamma] ----------
        window = jnp.concatenate([tok, g], axis=0)[None]  # (1, gamma+1)
        logits, t_cache = _forward_window(params, cfg, window, t_cache, c)

        if sampling:
            # Leviathan acceptance: accept g_i with prob min(1, p(g_i)/q(g_i));
            # first rejection resamples from the residual max(0, p - q); a
            # full acceptance samples the bonus token from p directly (the
            # zero-padded Q row makes the residual formula cover it).
            P = jax.nn.softmax(logits[0] / temperature, axis=-1)  # (g+1, V)
            Q = jnp.concatenate([
                jax.nn.softmax(d_logits / temperature, axis=-1),
                jnp.zeros((1, P.shape[-1]), P.dtype)], axis=0)    # (g+1, V)
            p_g = jnp.take_along_axis(P[:gamma], g[:, None], axis=1)[:, 0]
            q_g = jnp.take_along_axis(Q[:gamma], g[:, None], axis=1)[:, 0]
            u = jax.random.uniform(r_accept, (gamma,))
            accepted = u * q_g <= p_g  # u <= min(1, p/q) without the divide
            a = jnp.sum(jnp.cumprod(accepted.astype(jnp.int32)))
            resid = jnp.maximum(P[a] - Q[a], 0.0)
            # numerical guard: identical p/q rows make the residual all-zero
            # (acceptance should then always fire; float round-off aside)
            resid = jnp.where(jnp.sum(resid) > 0, resid, P[a])
            fix = jax.random.categorical(
                r_fix, jnp.log(jnp.maximum(resid, 1e-38))).astype(jnp.int32)
            emit = jnp.where(jnp.arange(gamma + 1) < a,
                             jnp.concatenate([g, jnp.zeros((1,), jnp.int32)]),
                             fix)
        else:
            t = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (gamma+1,)
            matches = (g == t[:gamma])
            a = jnp.sum(jnp.cumprod(matches.astype(jnp.int32)))
            emit = jnp.where(jnp.arange(gamma + 1) < a,
                             jnp.concatenate([g, jnp.zeros((1,), jnp.int32)]),
                             t)
        buf = jax.lax.dynamic_update_slice(buf, emit, (n_done,))

        # Proposal i would commit at output position n_done + i; only the ones
        # inside the max_new_tokens budget count toward the acceptance stats.
        useful = jnp.minimum(gamma, max_new_tokens - n_done)
        return (n_done + a + 1, emit[a][None], c + a + 1,
                t_cache, d_cache, buf, rounds + 1,
                acc + jnp.minimum(a, useful), drf + useful, rng)

    # n_done counts committed generated tokens; `first` is already in buf[0].
    n_done, _, _, _, _, buf, rounds, acc, drf, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), first, jnp.int32(p),
                     t_cache, d_cache, buf, jnp.int32(0), jnp.int32(0),
                     jnp.int32(0), rng))

    tokens = buf[:max_new_tokens][None]
    if return_stats:
        return tokens, {"rounds": rounds, "accepted": acc, "drafted": drf}
    return tokens
