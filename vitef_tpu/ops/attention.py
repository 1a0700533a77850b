"""Multi-head attention: Pallas TPU flash kernel + XLA reference einsum path.

Replaces the reference's two-path SelfAttention
(src/vitef/models/transformer/architecture.py:205-239): a manual
``q@k^T/sqrt(d) -> softmax -> @v`` path that can return attention matrices
(verbose=True), and torch's fused F.scaled_dot_product_attention. Here:

  - :func:`attention_reference` — the XLA einsum path, fp32 softmax, optionally
    returning the (N, h, L, L) attention matrix for probing parity.
  - :func:`flash_attention` — an online-softmax Pallas kernel. K/V for one
    (batch, head) are resident in VMEM (L ≤ a few K for every model family in
    scope: 197 for ViT, 1024 for GPT2), the query dimension is tiled, and the
    kv dimension is looped with running (max, sum) accumulation so the kernel
    also holds for longer L with kv-tiling. Backward recomputes attention via
    the XLA path (flash-style rematerialisation: O(L) residuals, not O(L²)).

All matmuls use fp32 accumulation (preferred_element_type), inputs may be bf16.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import best_precision, resolve_impl

_NEG_INF = -1e30
# Forward-kernel softmax: exp(x) == exp2(x * log2 e), so fold log2(e) into
# the (epilogue-fused) score scale and compute exp2 on the compute-dtype
# (bf16) difference — drops the separate f32->bf16 probability convert and
# halves the transcendental VPU data width. A/B'd -3% on the fwd kernel at
# ViT shapes with bit-identical bf16 outputs (.exp2_ab.py, interleaved min:
# v0 2.40 -> v4 2.33 ms/apply incl. chain overhead; kernel ~0.99 -> ~0.92).
# The BACKWARD keeps the f32-p form: the same refold (and a full (ex, 1/sum)
# row-scale refold onto the narrow operands) measured +9% SLOWER there
# (.bwd_exp2_ab.py: 4.11 old / 4.13 exp2-f32 / 4.52 refold) — Mosaic's
# interleave of the old form is already optimal; do not retry.
_LOG2E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path (also the verbose / attention-matrix path)
# ---------------------------------------------------------------------------


def attention_reference(q, k, v, *, causal: bool = False, kv_len: int | None = None,
                        return_weights: bool = False):
    """Softmax attention on (N, h, L, d) tensors with fp32 softmax.

    ``kv_len`` masks out padded key positions (keys with index >= kv_len).
    """
    n, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        precision=best_precision(q, k),
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if kv_len is not None and kv_len < lk:
        kmask = jnp.arange(lk) < kv_len
        scores = jnp.where(kmask[None, None, None, :], scores, _NEG_INF)
    if causal:
        qi = jnp.arange(lq)[:, None]
        ki = jnp.arange(lk)[None, :]
        scores = jnp.where(ki <= qi, scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    wts = weights.astype(v.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", wts, v,
                     precision=best_precision(wts, v),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if return_weights:
        return out, weights
    return out


# ---------------------------------------------------------------------------
# Packed-qkv fused MHA kernel (the ViT hot path)
# ---------------------------------------------------------------------------
#
# Consumes the fused qkv projection output (N, L, 3E) DIRECTLY — no head
# split/transpose ever touches HBM (the (N,L,E)<->(N,h,L,d) transposes were
# ~60-90 ms/step of pure copies in the v5e trace) — and keeps the whole
# (L, 3E) slab of one image VMEM-resident. Heads are an UNROLLED python loop
# of per-head 2-D matmuls: Mosaic statically interleaves head h's softmax
# (VPU) with head h+1's score matmul (MXU), which measured ~2x faster than
# a single h-batched dot_general at ViT shapes (2.16 ms vs 4.0 ms fwd,
# B=256 H=12 L=197 D=64 — the d=64 MXU-padding floor is ~2.1 ms).


def _packed_mha_fwd_kernel(qkv_ref, b_ref, *rest, scale, n_heads, d, causal,
                           q_block=None, masked=False):
    if masked:
        mask_ref, o_ref = rest
        kmask = mask_ref[...] != 0  # (1, L) — per-row valid keys
    else:
        (o_ref,) = rest
        kmask = None
    qkv = qkv_ref[...] + b_ref[...]  # (L, 3E); qkv bias folded in-kernel
    l = qkv.shape[0]
    e = n_heads * d
    if causal and q_block:
        # Block-triangular causal path: q-block i's scores are a SINGLE
        # (BQ, (i+1)·BQ) matmul against the static key PREFIX — the upper
        # triangle is never computed (≈2x less attention FLOPs at long L;
        # the full-L path pays it and masks). Only the diagonal block needs
        # an in-block causal mask.
        nq = l // q_block
        outs = []
        for h in range(n_heads):
            qh = qkv[:, h * d:(h + 1) * d]
            kh = qkv[:, e + h * d:e + (h + 1) * d]
            vh = qkv[:, 2 * e + h * d:2 * e + (h + 1) * d]
            blocks = []
            for qi in range(nq):
                kv_len = (qi + 1) * q_block
                qb = qh[qi * q_block:kv_len]
                s = jax.lax.dot_general(
                    qb, kh[:kv_len], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * (scale * _LOG2E)
                # Diagonal-only causal mask: full past blocks are entirely
                # visible (where(True, s) ≡ s), so the iota+where VPU pass
                # runs on the (BQ, BQ) diagonal block only — ~2.5x less
                # mask work per strip at L=1024, bit-identical.
                past = qi * q_block
                qp = jax.lax.broadcasted_iota(
                    jnp.int32, (q_block, q_block), 0)
                kp = jax.lax.broadcasted_iota(
                    jnp.int32, (q_block, q_block), 1)
                diag = jnp.where(kp <= qp, s[:, past:], _NEG_INF)
                s = jnp.concatenate([s[:, :past], diag], -1) if past else diag
                if kmask is not None:
                    s = jnp.where(kmask[:, :kv_len], s, _NEG_INF)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2((s - m).astype(vh.dtype))
                denom = jnp.sum(p, axis=-1, keepdims=True,
                                dtype=jnp.float32)
                o = jnp.dot(p, vh[:kv_len],
                            preferred_element_type=jnp.float32)
                blocks.append((o / denom).astype(o_ref.dtype))
            outs.append(jnp.concatenate(blocks, axis=0))
        o_ref[...] = jnp.concatenate(outs, axis=-1)
        return
    mask = None
    if causal:
        qp = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        kp = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        mask = kp <= qp

    # NB: a two-pass restructure of THIS forward (all softmaxes, then all AV
    # matmuls — the backward kernel's 23% win) was A/B-measured NEUTRAL e2e
    # (1206 vs 1210 img/s, within noise): the fwd softmax is lighter and the
    # one-pass head loop already interleaves it fully. Kept one-pass.
    outs = []
    for h in range(n_heads):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, e + h * d:e + (h + 1) * d]
        vh = qkv[:, 2 * e + h * d:2 * e + (h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        if kmask is not None:
            s = jnp.where(kmask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m).astype(vh.dtype))
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        outs.append((o / denom).astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _packed_mha_bwd_causal_blocked_kernel(qkv_ref, b_ref, g_ref, dqkv_ref,
                                          db_ref, *, scale, n_heads, d,
                                          q_block, two_pass):
    """Block-triangular causal backward: per q-block, recompute the softmax
    STRIP (BQ, (qi+1)·BQ) against the static key prefix and run the gradient
    algebra on the strip only — the upper triangle is never touched (the
    full-L backward computes and masks it). dk/dv accumulate per-head in a
    zero-padded (L, d) f32 buffer via static-slice adds.

    ``two_pass``: the kv-STRIP-tiled variant of the full-L backward's
    two-pass scheduling win (+23% there) for the long-L case where all
    heads' full (L, L) probabilities exceed VMEM: within each q-strip,
    pass 1 recomputes EVERY head's (BQ, kv_len) softmax strip (MXU score
    matmuls interleaving with VPU softmaxes across heads), pass 2 runs all
    heads' gradient matmuls back-to-back. Only n_heads (BQ, kv_len) f32
    strips are ever resident. Bit-identical to the interleaved order.
    """
    qkv = qkv_ref[...] + b_ref[...]  # (L, 3E)
    g = g_ref[...]  # (L, E)
    l = qkv.shape[0]
    e = n_heads * d
    nq = l // q_block

    def strip_softmax(h, qi):
        kv_len = (qi + 1) * q_block
        qb = qkv[qi * q_block:kv_len, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qb, qkv[:kv_len, e + h * d:e + (h + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # Diagonal-only causal mask (see the fwd kernel): past blocks are
        # fully visible; mask the (BQ, BQ) diagonal block only.
        past = qi * q_block
        qp = jax.lax.broadcasted_iota(jnp.int32, (q_block, q_block), 0)
        kp = jax.lax.broadcasted_iota(jnp.int32, (q_block, q_block), 1)
        diag = jnp.where(kp <= qp, s[:, past:], _NEG_INF)
        s = jnp.concatenate([s[:, :past], diag], -1) if past else diag
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        return ex / jnp.sum(ex, axis=-1, keepdims=True)  # (BQ, kv_len)

    def strip_grads(h, qi, p):
        kv_len = (qi + 1) * q_block
        qb = qkv[qi * q_block:kv_len, h * d:(h + 1) * d]
        kh = qkv[:kv_len, e + h * d:e + (h + 1) * d]
        vh = qkv[:kv_len, 2 * e + h * d:2 * e + (h + 1) * d]
        gb = g[qi * q_block:kv_len, h * d:(h + 1) * d]
        pb = p.astype(qkv.dtype)
        dv = jax.lax.dot_general(pb, gb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gb, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(qkv.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, qb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dq, dk, dv

    dq_blocks = [[] for _ in range(n_heads)]
    dk_acc = [jnp.zeros((l, d), jnp.float32) for _ in range(n_heads)]
    dv_acc = [jnp.zeros((l, d), jnp.float32) for _ in range(n_heads)]
    for qi in range(nq):
        kv_len = (qi + 1) * q_block
        tail = ((0, l - kv_len), (0, 0))
        if two_pass:
            strips = [strip_softmax(h, qi) for h in range(n_heads)]
        for h in range(n_heads):
            p = strips[h] if two_pass else strip_softmax(h, qi)
            dq, dk, dv = strip_grads(h, qi, p)
            dq_blocks[h].append(dq)
            # static-shape accumulate (scatter/.at[] captures consts in pallas)
            dk_acc[h] = dk_acc[h] + jnp.pad(dk, tail)
            dv_acc[h] = dv_acc[h] + jnp.pad(dv, tail)
    dqs = [jnp.concatenate(b, axis=0).astype(dqkv_ref.dtype)
           for b in dq_blocks]
    dks = [a.astype(dqkv_ref.dtype) for a in dk_acc]
    dvs = [a.astype(dqkv_ref.dtype) for a in dv_acc]
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[...] = dqkv
    partial_db = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    db_ref[...] += partial_db


def _packed_mha_bwd_kernel(qkv_ref, b_ref, g_ref, dqkv_ref, db_ref, *,
                           scale, n_heads, d, causal):
    """Packed backward: recompute per-head softmax from the VMEM-resident qkv
    slab (flash-style: no O(L^2) residual in HBM), then the standard algebra
    dv = p^T g, dp = g v^T, ds = p (dp - rowsum(p dp)) scale, dq = ds k,
    dk = ds^T q — written back into the packed (L, 3E) gradient layout.

    The qkv-bias gradient (db = column sums of dqkv over the whole batch) is
    accumulated in-kernel into a grid-revisited f32 block: doing it here is a
    VMEM reduction over values the kernel just produced, vs a separate XLA
    pass re-reading the full (N, L, 3E) cotangent from HBM (~4 ms/step on
    the v5e trace)."""
    qkv = qkv_ref[...] + b_ref[...]  # (L, 3E)
    g = g_ref[...]  # (L, E)
    l = qkv.shape[0]
    e = n_heads * d
    mask = None
    if causal:
        qp = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        kp = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        mask = kp <= qp
    def softmax_of(h):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, e + h * d:e + (h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        return ex / jnp.sum(ex, axis=-1, keepdims=True)  # (L, L) f32

    # Two-pass structure (A/B-measured 23% faster than interleaving the
    # softmax recompute with the gradient matmuls, bit-identical): pass 1
    # recomputes every head's softmax (MXU score matmul + VPU softmax
    # interleave across heads), pass 2 runs the per-head gradient algebra
    # (long MXU stretches). Requires all n_heads (L, L) f32 probability mats
    # resident in VMEM (1.9 MB at ViT shapes) — long-L shapes (e.g. GPT2's
    # 50 MB) keep the interleaved one-pass recompute.
    two_pass = n_heads * l * l * 4 <= 12 * 1024 * 1024
    probs = [softmax_of(h) for h in range(n_heads)] if two_pass else None

    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, e + h * d:e + (h + 1) * d]
        vh = qkv[:, 2 * e + h * d:2 * e + (h + 1) * d]
        gh = g[:, h * d:(h + 1) * d]
        p = probs[h] if two_pass else softmax_of(h)
        pb = p.astype(qkv.dtype)
        # dv[k, d] = sum_q p[q, k] g[q, d]
        dv = jax.lax.dot_general(pb, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp[q, k] = sum_d g[q, d] v[k, d]
        dp = jax.lax.dot_general(gh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(qkv.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[...] = dqkv
    partial_db = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    db_ref[...] += partial_db


def _causal_q_block(l: int, causal: bool) -> int | None:
    """Block size for the block-triangular causal path (None = full-L path).

    256 is the MXU-friendly strip height; below 2 blocks there is no upper
    triangle to skip. Short/odd lengths keep the (already fast) full path."""
    if causal and l % 256 == 0 and l >= 512:
        return 256
    return None


def _packed_call_fwd(qkv, bias2d, n_heads, causal, key_mask=None):
    n, l, f = qkv.shape
    e = f // 3
    d = e // n_heads
    kernel = functools.partial(
        _packed_mha_fwd_kernel, scale=1.0 / math.sqrt(d), n_heads=n_heads,
        d=d, causal=causal, q_block=_causal_q_block(l, causal),
        masked=key_mask is not None,
    )
    in_specs = [pl.BlockSpec((None, l, f), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [qkv, bias2d]
    if key_mask is not None:
        in_specs.append(pl.BlockSpec((None, 1, l), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(key_mask.astype(jnp.int32).reshape(n, 1, l))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, l, e), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, e), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_heads * l * l * d * n,
            bytes_accessed=(f + e) * l * n * qkv.dtype.itemsize,
            transcendentals=n_heads * l * l * n,
        ),
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _packed_mha(qkv, bias, n_heads, causal):
    return _packed_call_fwd(qkv, bias.reshape(1, -1), n_heads, causal)


def _packed_mha_fwd(qkv, bias, n_heads, causal):
    out = _packed_call_fwd(qkv, bias.reshape(1, -1), n_heads, causal)
    return out, (qkv, bias)


def _packed_mha_bwd(n_heads, causal, residuals, g):
    qkv, bias = residuals
    n, l, f = qkv.shape
    e = f // 3
    d = e // n_heads
    qb = _causal_q_block(l, causal)
    if qb:
        # strip two-pass needs all heads' (BQ, kv_len<=L) f32 strips resident
        kernel = functools.partial(
            _packed_mha_bwd_causal_blocked_kernel, scale=1.0 / math.sqrt(d),
            n_heads=n_heads, d=d, q_block=qb,
            two_pass=n_heads * qb * l * 4 <= 24 * 1024 * 1024,
        )
    else:
        kernel = functools.partial(
            _packed_mha_bwd_kernel, scale=1.0 / math.sqrt(d), n_heads=n_heads,
            d=d, causal=causal,
        )
    spec3 = pl.BlockSpec((None, l, f), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((None, l, e), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, f), lambda b: (0, 0), memory_space=pltpu.VMEM)
    dqkv, db = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec3, bspec, spec1],
        out_specs=(spec3, bspec),
        out_shape=(jax.ShapeDtypeStruct((n, l, f), qkv.dtype),
                   jax.ShapeDtypeStruct((1, f), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * n_heads * l * l * d * n,
            bytes_accessed=2 * (f + e) * l * n * qkv.dtype.itemsize,
            transcendentals=n_heads * l * l * n,
        ),
    )(qkv, bias.reshape(1, -1), g.astype(qkv.dtype))
    return dqkv, db.reshape(f).astype(bias.dtype)


_packed_mha.defvjp(_packed_mha_fwd, _packed_mha_bwd)

# VMEM budget gate for the packed kernel: the dominant per-program buffers are
# the (L, 3E) qkv slab (+grad copy in bwd) and one (L, L) f32 score matrix.
# The estimate undercounts Mosaic's real scoped stack by ~2.2x (llama-1b
# E=2048 L=1024 estimates 46.1M here but the forward's scoped allocation is
# 100.95M vs the 100M limit — a measured compile failure); 44M keeps every
# geometry that compiles today (max: GPT2-large E=1280 at 33.6M) and routes
# bigger E to the tiled flash path (models/transformer._attention_modern).
# (Note: the 1b geometry lands on EXACTLY 44MiB here — 40MiB keeps it out.)
_PACKED_VMEM_BUDGET = 40 * 1024 * 1024


def packed_mha_supported(l: int, e: int, itemsize: int = 2) -> bool:
    per_program = 2 * (4 * e * l * itemsize) + 3 * (l * l * 4)
    return per_program <= _PACKED_VMEM_BUDGET


def fused_mha_packed(qkv, n_heads: int, causal: bool = False, bias=None,
                     key_mask=None):
    """Fused softmax attention on packed qkv (N, L, 3E) -> (N, L, E).

    Head layout matches the torch fused-qkv Linear (reference
    architecture.py:172, :205-212): columns [q | k | v], head-major within
    each. ``bias`` is the qkv Linear's bias, added in-kernel so its gradient
    (column sums of the dqkv cotangent) accumulates inside the backward
    kernel instead of a separate full-cotangent XLA reduce pass.
    Differentiable via the packed backward kernel.

    ``key_mask`` (N, L) bool marks VALID keys (False = padding, e.g. the
    left-pad region of ragged serving prompts) — masked keys are excluded
    per row inside the kernel. The masked path is forward-only (the serving
    prefill); training never uses it.
    """
    if key_mask is not None:
        bias2d = (jnp.zeros((1, qkv.shape[-1]), qkv.dtype) if bias is None
                  else bias.astype(qkv.dtype).reshape(1, -1))
        return _packed_call_fwd(qkv, bias2d, n_heads, causal,
                                key_mask=key_mask)
    if bias is None:
        bias = jnp.zeros((qkv.shape[-1],), qkv.dtype)
    return _packed_mha(qkv, bias.astype(qkv.dtype), n_heads, causal)


# ---------------------------------------------------------------------------
# Pallas flash kernel (blocked; long-L path)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, causal, kv_len,
                  block_q, block_kv):
    """One program = ALL heads for one (batch, q-block).

    Batching the heads into a single 3-D ``dot_general`` gives the MXU
    (h, block_q, d)×(h, block_kv, d) work per program instead of a tiny
    per-head tile — per-program arithmetic intensity is what decides whether
    the kernel is launch-bound. Matmuls run in the input dtype (bf16 on the
    production path) with fp32 accumulation via ``preferred_element_type``;
    softmax statistics are fp32 (matching torch SDPA's bf16 semantics).
    """
    qi = pl.program_id(1)
    q = q_ref[:]  # (h, block_q, d) input dtype
    h, lk_pad, d = k_ref.shape
    num_kv = lk_pad // block_kv

    m0 = jnp.full((h, block_q, 1), _NEG_INF, dtype=jnp.float32)
    s0 = jnp.zeros((h, block_q, 1), dtype=jnp.float32)
    a0 = jnp.zeros((h, block_q, d), dtype=jnp.float32)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (h, block_q, block_kv), 1
    )

    def body(j, carry):
        m, s, acc = carry
        k = k_ref[:, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[:, pl.ds(j * block_kv, block_kv), :]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (h, block_q, block_kv) fp32
        kv_pos = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (h, block_q, block_kv), 2
        )
        mask = kv_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, kv_pos <= q_pos)
        scores = jnp.where(mask, scores, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        s_new = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, s_new, acc_new

    m, s, acc = jax.lax.fori_loop(0, num_kv, body, (m0, s0, a0))
    o_ref[:] = (acc / jnp.maximum(s, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal: bool, kv_len: int, block_q: int, block_kv: int):
    n, h, lq_pad, d = q.shape
    lk_pad = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d)
    grid = (n, lq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
    )
    # Leading None dim squeezes batch: refs arrive 3-D (h, block, d).
    q_spec = pl.BlockSpec((None, h, block_q, d), lambda b, i: (b, 0, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((None, h, lk_pad, d), lambda b, i: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, lq_pad, d), q.dtype),
        # Full-L k/v per program is the design (see kernel docstring); at
        # many-head geometries (llama-1b: h=32, L=1024 → 20M with input
        # pipelining) that exceeds Mosaic's conservative 16M default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * lq_pad * lk_pad * d,
            bytes_accessed=3 * h * lk_pad * d * q.dtype.itemsize
            + h * lq_pad * d * q.dtype.itemsize,
            transcendentals=h * lq_pad * lk_pad,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, kv_len, block_q, block_kv):
    return _flash_forward(q, k, v, causal, kv_len, block_q, block_kv)


def _flash_fwd(q, k, v, causal, kv_len, block_q, block_kv):
    out = _flash_forward(q, k, v, causal, kv_len, block_q, block_kv)
    return out, (q, k, v)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                      sm_scale, causal, kv_len):
    """Fused backward for the small-L case (whole (h, L, L) fits in VMEM).

    Recomputes the softmax from (q, k) — no O(L²) residual ever touches HBM —
    then applies the standard flash backward algebra batched over heads:
    dv = pᵀ·g, ds = p ⊙ (g·vᵀ − rowsum(p ⊙ g·vᵀ)) · scale, dq = ds·k,
    dk = dsᵀ·q. Rows/cols beyond kv_len carry zero p, hence zero gradient
    contribution (padded grads are sliced off by the caller anyway).
    """
    q = q_ref[:]  # (h, L, d)
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    h, l, d = q.shape

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ) * sm_scale  # (h, L, L) fp32
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (h, l, l), 2)
    mask = kv_pos < kv_len
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (h, l, l), 1)
        mask = jnp.logical_and(mask, kv_pos <= q_pos)
    scores = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    pb = p.astype(v.dtype)

    # dv[h, k, d] = Σ_q p[h, q, k] · g[h, q, d]
    dv = jax.lax.dot_general(
        pb, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    # dp[h, q, k] = Σ_d g[h, q, d] · v[h, k, d]
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
    # dq[h, q, d] = Σ_k ds[h, q, k] · k[h, k, d]
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    # dk[h, k, d] = Σ_q ds[h, q, k] · q[h, q, d]
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


# VMEM budget for the fused backward's fp32 (h, L, L) tensors (bytes).
_BWD_VMEM_BUDGET = 10 * 1024 * 1024


def _flash_bwd(causal, kv_len, block_q, block_kv, residuals, g):
    q, k, v = residuals
    n, h, l_pad, d = q.shape
    if 2 * h * l_pad * l_pad * 4 <= _BWD_VMEM_BUDGET:
        spec = pl.BlockSpec((None, h, l_pad, d), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _flash_bwd_kernel, sm_scale=1.0 / math.sqrt(d), causal=causal,
            kv_len=kv_len,
        )
        shape = jax.ShapeDtypeStruct((n, h, l_pad, d), q.dtype)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[spec, spec, spec, spec],
            out_specs=(spec, spec, spec),
            out_shape=(shape, shape, shape),
            cost_estimate=pl.CostEstimate(
                flops=2 * 4 * h * l_pad * l_pad * d,
                bytes_accessed=7 * h * l_pad * d * q.dtype.itemsize,
                transcendentals=h * l_pad * l_pad,
            ),
        )(q, k, v, g)
    # Long-L fallback: flash-style rematerialisation — recompute the attention
    # in XLA and differentiate it (residuals are O(N·h·L·d); L² lives only
    # inside this backward computation where XLA fuses it).
    def f(q, k, v):
        return attention_reference(q, k, v, causal=causal, kv_len=kv_len)
    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, causal: bool = False, impl: str = "auto",
                    block_q: int = 128, block_kv: int = 128):
    """Flash attention on (N, h, L, d). Pads L internally to block multiples."""
    impl = resolve_impl(impl, seq_len=q.shape[2])
    if impl == "xla":
        return attention_reference(q, k, v, causal=causal)
    n, h, l, d = q.shape
    block_q = min(block_q, _round_up(l, 128))
    block_kv = min(block_kv, _round_up(l, 128))
    l_pad = _round_up(l, max(block_q, block_kv))
    if l_pad != l:
        pad = ((0, 0), (0, 0), (0, l_pad - l), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = _flash(q, k, v, causal, l, block_q, block_kv)
    if l_pad != l:
        out = out[:, :, :l, :]
    return out


def multi_head_attention(x, qkv_w, qkv_b, out_w, out_b, *, n_heads: int,
                         causal: bool = False, impl: str = "auto",
                         verbose: bool = False, compute_dtype=None):
    """Full MHA: fused qkv matmul → attention → output projection.

    Mirrors reference SelfAttention.forward (architecture.py:205-239): fused qkv
    Linear(E, 3E), head split E→(h, E/h) head-major, softmax attention, output
    Linear(E, E). ``verbose=True`` forces the reference path and also returns the
    (N, h, L, L) attention matrix (architecture.py:214-226, 237-238).

    TPU path choices: matmuls emit the compute dtype (fp32 MXU accumulation is
    implicit for bf16; fp32 inputs get best_precision — emitting bf16 measured
    identical to f32+cast, but keeps cotangents bf16). The head split uses the
    explicit (N, h, L, d) transpose: the transpose-free nlhd einsum layout was
    A/B-measured ~19% SLOWER fwd+bwd on v5e (XLA fuses these transposes well).
    """
    n, l, e = x.shape
    d = e // n_heads
    cd = x.dtype if compute_dtype is None else jnp.dtype(compute_dtype)
    xc = x.astype(cd)
    w = qkv_w.astype(cd)
    qkv = jnp.einsum("nle,ef->nlf", xc, w, precision=best_precision(xc, w),
                     preferred_element_type=cd)

    weights = None
    resolved = resolve_impl(impl, seq_len=l, dtype=cd) if not verbose else "xla"
    # Packed kernel is bf16-only: fp32 'pallas' (long-L analysis paths) keeps
    # the blocked flash kernel whose numerics were validated in round 1 —
    # Mosaic f32 matmul passes differ from XLA HIGHEST-precision semantics
    # (CLAUDE.md fp32-parity invariant).
    if resolved == "pallas" and jnp.dtype(cd) == jnp.bfloat16 \
            and packed_mha_supported(l, e, jnp.dtype(cd).itemsize):
        # Packed fused path: no head split/transpose ever reaches HBM; the
        # qkv bias (and its gradient) lives inside the kernel.
        z = fused_mha_packed(qkv, n_heads, causal=causal,
                             bias=qkv_b.astype(cd) if qkv_b is not None else None)
    else:
        if qkv_b is not None:
            qkv = qkv + qkv_b.astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # (N, L, E) -> (N, h, L, d)
        q, k, v = (t.reshape(n, l, n_heads, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        if verbose:
            z, weights = attention_reference(q, k, v, causal=causal,
                                             return_weights=True)
        else:
            z = flash_attention(q, k, v, causal=causal, impl=resolved)
        z = z.transpose(0, 2, 1, 3).reshape(n, l, e)
    ow = out_w.astype(cd)
    out = jnp.einsum("nle,ef->nlf", z, ow, precision=best_precision(z, ow),
                     preferred_element_type=cd)
    if out_b is not None:
        out = out + out_b.astype(cd)
    out = out.astype(x.dtype)
    if verbose:
        return out, weights
    return out
