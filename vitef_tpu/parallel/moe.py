"""Mixture-of-experts FFN with expert parallelism over an 'ep' mesh axis.

Beyond-parity capability: the reference has a single dense FeedForward
(src/vitef/models/transformer/architecture.py:247-299) and no expert/MoE
support of any kind. This module provides the TPU-native building block that
completes the parallelism-axis sweep (dp / tp / fsdp / pp / sp / **ep**):

  - :func:`apply_moe_ffn` — the golden semantics: softmax router over
    ``n_experts``, top-k expert selection per token, output = gate-weighted
    sum of the selected experts' FFN outputs (gates renormalised over the
    top-k, Switch/GShard convention).
  - :func:`apply_moe_ffn_ep` — the same math distributed: expert parameters
    sharded over 'ep' (each device owns ``n_experts/ep`` experts), tokens
    dispatched to their experts' owners with ``lax.all_to_all``, expert FFNs
    applied batched per owner, results returned by the reverse ``all_to_all``
    and combined with the gate weights. Dispatch/combine are the GShard
    one-hot einsums — dense, static-shaped, MXU-friendly (no scatter/gather,
    no dynamic shapes for XLA to choke on).
  - Capacity semantics: each expert processes at most ``capacity`` tokens per
    device per step; overflow tokens are DROPPED from that expert (their gate
    contribution becomes zero — Switch Transformer behaviour). With
    ``capacity >= tokens`` the EP output equals the dense reference exactly
    (asserted in tests/test_moe.py).

The router/dispatch math runs in fp32 (gate numerics), expert matmuls in the
compute dtype.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.transformer import TransformerConfig, get_activation
from ..ops.common import best_precision


def init_moe_ffn(key, cfg: TransformerConfig, n_experts: int) -> dict:
    """Router + per-expert fc1/fc2 stacks (leading (n_experts,) axis — the
    axis 'ep' shards)."""
    e, f = cfg.emb_dim, cfg.ffn_dim
    # swiglu experts pack [gate ++ up] in fc1, like the dense FFN
    # (models/transformer.py init_block) — the Mixtral expert recipe.
    f1 = 2 * f if cfg.ffn_type.lower() == "swiglu" else f
    kr, k1, k2 = jax.random.split(key, 3)
    # torch nn.Linear init parity with models/transformer.py init helpers:
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and biases.
    def u(k, shape, fan_in):
        b = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -b, b)

    params = {
        "router": {"weight": u(kr, (e, n_experts), e)},
        "fc1": {"weight": u(k1, (n_experts, e, f1), e)},
        "fc2": {"weight": u(k2, (n_experts, f, e), f)},
    }
    if cfg.ffn_bias:
        kb1, kb2 = jax.random.split(jax.random.fold_in(key, 1))
        params["fc1"]["bias"] = u(kb1, (n_experts, f1), e)
        params["fc2"]["bias"] = u(kb2, (n_experts, e), f)
    return params


def _router_topk(scores, top_k: int):
    """``lax.top_k`` semantics (ties → lower index first) without the full
    per-row variadic sort for the router's small-E case.

    ``lax.top_k`` on TPU lowers to a per-row sort; for the (T, n_experts)
    router with n_experts ≤ 16 and k ≤ 4, k unrolled argmax+mask passes are
    pure vectorized VPU work. ``argmax`` returns the LOWEST index of a tied
    maximum and the mask removes exactly that index, so repeated ties come
    out in ascending-index order — identical to ``lax.top_k``'s tie order.
    Gradients match too: the value reads are gathers at the selected indices.
    Works on raw LOGITS (can be arbitrarily negative): masking uses a large
    finite negative, not -1 (which only dominates softmax probabilities).
    """
    n = scores.shape[-1]
    if top_k >= n or n > 16 or top_k > 4:
        return jax.lax.top_k(scores, top_k)
    iota = jnp.arange(n, dtype=jnp.int32)
    vals, idxs = [], []
    p = scores
    for _ in range(top_k):
        i = jnp.argmax(p, axis=-1).astype(jnp.int32)
        onehot = (iota == i[..., None])
        # Value read as a masked multiply-reduce, NOT take_along_axis: the
        # (T, 1)-per-row gather runs at ~6 GB/s on v5e (sub-lane scalar
        # churn — ~0.08 ms × 3 launches × 12 layers on the 8x124m trace);
        # the (T, E) select+reduce is one vectorized VPU pass. Same value,
        # same gradient (cotangent lands on exactly the argmax index).
        vals.append(jnp.sum(jnp.where(onehot, p, 0.0), axis=-1))
        idxs.append(i)
        # finite sentinel (not -inf): masked entries only re-enter argmax
        p = jnp.where(onehot, jnp.float32(-1e30), p)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _route(params, cfg, x, top_k, need_probs: bool = True):
    """fp32 router forward shared by dispatch AND the auxiliary losses.

    Returns ``(logits, probs, sel, top_p)`` for (T, d) tokens: raw fp32
    logits, softmax probabilities, the (T, top_k) selected expert ids and
    the renormalised (T, top_k) gate weights. The aux losses are computed
    from THESE tensors (``router_aux_from_route``), so they provably share
    the dispatch path's routing — no reliance on XLA CSE de-duplicating a
    second router einsum (which remat or precision drift could break).

    Selection and gates come straight from the LOGITS with (T, k)-sized
    math: renormalising the top-k of a softmax is EXACTLY the softmax over
    the top-k logits (monotonic exp, shared normaliser cancels) — same
    reals, same gradients, same tie order. The full (T, E) softmax is only
    computed when the aux losses need it (``need_probs=True``), so the
    forward is BIT-IDENTICAL with and without aux collection (tested), and
    the aux-free dispatch path skips ~10 ms/step of fwd+bwd (T, E)-shaped
    elementwise passes the round-4 8x124m trace charged to the
    softmax→top-k→renorm chain.
    """
    logits = jnp.einsum(
        "te,en->tn", x.astype(jnp.float32),
        params["router"]["weight"].astype(jnp.float32),
        precision=best_precision(x.astype(jnp.float32)),
        preferred_element_type=jnp.float32)
    top_l, sel = _router_topk(logits, top_k)  # (T, k)
    top_p = jax.nn.softmax(top_l, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1) if need_probs else None
    return logits, probs, sel, top_p


def _gates(params, cfg, x, top_k):
    """(tokens, E) fp32 router probabilities, top-k selected and renormalised.

    Returns (gate_full, sel, top_p) where ``gate_full`` is (T, n_experts)
    with zeros outside each token's top-k, ``sel`` the (T, top_k) expert ids
    and ``top_p`` the renormalised (T, top_k) gate weights.
    """
    logits, probs, sel, top_p = _route(params, cfg, x, top_k,
                                       need_probs=False)
    n_experts = params["router"]["weight"].shape[-1]
    onehot = jax.nn.one_hot(sel, n_experts, dtype=jnp.float32)  # (T, k, E)
    gate_full = jnp.einsum("tk,tke->te", top_p, onehot)
    return gate_full, sel, top_p


def router_aux_from_route(logits, probs, sel) -> dict:
    """Differentiable router auxiliary losses from a shared router forward.

      - ``lb``: Switch/Mixtral load-balancing loss
        ``E * sum_e mean_t[frac of top-k picks on e] * mean_t[prob_e]`` —
        1.0 when perfectly balanced, up to E when collapsed onto one expert.
        Gradient flows through the softmax means (the count factor is the
        standard stop-grad-by-construction indicator).
      - ``z``: ST-MoE router z-loss ``mean_t logsumexp(logits_t)^2`` —
        keeps router logits small/stable in bf16 training.

    Weighted into the train loss by ``TransformerConfig.moe_lb_coef`` /
    ``moe_z_coef`` (see parallel/train_step.py).
    """
    n_experts = logits.shape[-1]
    counts = jnp.sum(jax.nn.one_hot(sel, n_experts, dtype=jnp.float32),
                     axis=(0, 1))  # (E,) picks per expert
    frac = counts / (sel.shape[0] * sel.shape[1])
    lb = n_experts * jnp.sum(frac * jnp.mean(probs, axis=0))
    z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    return {"lb": lb, "z": z}


def router_aux(params: dict, cfg: TransformerConfig, x, top_k: int) -> dict:
    """Standalone aux-loss entry point (tests / external callers): one router
    forward through the SAME ``_route`` the dispatch paths use. Inside the
    model, ``apply_moe_ffn*`` fill their ``aux`` collector from their own
    routing instead (one einsum by construction, not by CSE)."""
    xt = x.reshape(-1, x.shape[-1])
    logits, probs, sel, _ = _route(params, cfg, xt, top_k)
    return router_aux_from_route(logits, probs, sel)


def _expert_matmul(p, x, cd, spec):
    """Stacked expert linear with the int8 weight-only path of
    models/transformer._linear: int8 streams into the contraction, the
    per-(expert, out-column) f32 scale multiplies the small output AFTER
    (exact for the power-of-two scales models/quantize.py emits)."""
    if p["weight"].dtype == jnp.int8:
        out = jnp.einsum(spec, x, p["weight"].astype(cd),
                         precision=best_precision(x),
                         preferred_element_type=jnp.float32)
        out = (out * p["scale"][:, None, :]).astype(cd)
    else:
        w = p["weight"].astype(cd)
        out = jnp.einsum(spec, x, w, precision=best_precision(x, w),
                         preferred_element_type=cd)
    if "bias" in p:
        out = out + p["bias"][:, None, :].astype(cd)
    return out


def _expert_ffn(fc1, fc2, cfg: TransformerConfig, x):
    """Per-expert FFN on (E_loc, C, d) batched inputs (fc1/fc2 stacked)."""
    cd = cfg.cdtype()
    h = _expert_matmul(fc1, x.astype(cd), cd, "ecd,edf->ecf")
    if cfg.ffn_type.lower() == "swiglu":
        gate, up = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate) * up
    else:
        h = get_activation(cfg.activation)(h)
    return _expert_matmul(fc2, h, cd, "ecf,efd->ecd")


def apply_moe_ffn(params: dict, cfg: TransformerConfig, x, *, top_k: int = 1,
                  aux: dict | None = None):
    """Dense golden MoE FFN on (..., E) inputs: every expert evaluates every
    token; the gate mask zeroes the unselected ones. O(n_experts) FLOPs — the
    numerics oracle for the EP path, and the right single-device form for
    tiny expert counts. ``aux`` (a dict collector) receives the router
    auxiliary losses computed from this call's OWN routing."""
    shape = x.shape
    xt = x.reshape(-1, shape[-1])
    logits, probs, sel, top_p = _route(params, cfg, xt, top_k,
                                       need_probs=aux is not None)
    n_experts = params["router"]["weight"].shape[-1]
    onehot = jax.nn.one_hot(sel, n_experts, dtype=jnp.float32)  # (T, k, E)
    gate = jnp.einsum("tk,tke->te", top_p, onehot)
    if aux is not None:
        aux.update(router_aux_from_route(logits, probs, sel))
    # (E, T, d) all-experts evaluation
    outs = _expert_ffn(params["fc1"], params["fc2"], cfg,
                       jnp.broadcast_to(xt, (gate.shape[1], *xt.shape)))
    out = jnp.einsum("te,etd->td", gate.astype(outs.dtype), outs,
                     precision=best_precision(outs),
                     preferred_element_type=outs.dtype)
    return out.reshape(shape).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dispatch_rows(x, src, inv, top_k):
    """Fused expand-and-sort dispatch gather: ``x[src]`` for (T, d) tokens.

    ``src[g] = perm[g] % T`` maps each sorted claim row directly to its
    source token (claims are K-MAJOR: claim j·T + t is token t's j-th
    expert — see apply_moe_ffn_sparse), fusing the k-way repeat into the
    dispatch gather (no (G, d) claim buffer is ever materialised). The
    custom VJP keeps the transpose gather-shaped: un-sort the cotangent
    with ``inv`` and sum each token's k claim rows — no scatter-add.
    ``mode='clip'``: indices are in-bounds by construction; the jnp default
    ('fill') appends a (rows, d) oob-select pass to every gather (~0.12 ms
    × 24 launches on the 8x124m trace).
    """
    return jnp.take(x, src, axis=0, mode="clip")


def _dispatch_rows_fwd(x, src, inv, top_k):
    return jnp.take(x, src, axis=0, mode="clip"), (inv,)


def _dispatch_rows_bwd(top_k, res, g):
    (inv,) = res
    # Unrolled over top_k (same rationale as _combine_rows): one loop
    # fusion reading k gathered rows per token, no (T, k, d) reshape of a
    # gathered operand, no materialised claim buffer.
    invk = inv.reshape(top_k, -1)
    out = None
    for j in range(top_k):
        c = jnp.take(g, invk[j], axis=0, mode="clip")
        out = c if out is None else out + c
    return out, None, None


_dispatch_rows.defvjp(_dispatch_rows_fwd, _dispatch_rows_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _combine_rows(ys, gate, inv, src, perm, top_k):
    """Un-sort + GATE-scale + per-token k-claim sum in ONE gather-reduce.

    ``ys`` is the (G, d) SORTED claim outputs; ``gate`` the (T, k) renormed
    router weights (token-major — exactly ``top_p``, no permutation gather
    needed forward); ``inv`` maps K-MAJOR claim j·T + t to its sorted row.
    The result is ``out[t] = Σ_j gate[t,j] · ys[inv[j·T+t]]``.

    Folding the gate HERE (round 4) instead of into the fc1 activation
    epilogue keeps the expert matmul chain a pure function of the routed
    rows — which lets the swiglu epilogue fuse into the grouped-matmul
    kernels (ops/gmm_fused.py) — and deletes the per-layer sorted-order
    gate gather from the forward. Backward stays gather-shaped:
    ``d ys[r] = gate_flat[perm[r]] · dout[src[r]]``,
    ``d gate[t,j] = <ys[inv[j·T+t]], dout[t]>`` — no scatter-add anywhere.

    Shape discipline (round-4/5 traces): claims are unrolled over the small
    ``top_k`` (a (T, k, d) reshape of a gathered operand broke XLA's
    gather→multiply→reduce fusion), K-MAJOR (a token-major (T, k, d)
    broadcast in the backward produced a T(2,128)-tiled intermediate +
    layout-fix reshape, ~3.8 ms/step; k-major builds the same buffer as a
    fused concat of k aligned (T, d) multiplies), and every gather is
    ``mode='clip'`` (the 'fill' default pays a (rows, d) oob-select per
    gather). NO 1-D gathers anywhere: a (G,) gather runs at ~0.26 ms for
    64 KB on v5e (sub-lane scalar churn — the round-4 form's
    gate_sorted/d_gate 1-D takes cost ~6 ms/step); every move below is a
    (rows, d) ROW gather (rides HBM) or a vectorized reduce.
    """
    invk = inv.reshape(top_k, -1)  # invk[j, t] = sorted row of claim (t, j)
    out = None
    for j in range(top_k):
        c = (jnp.take(ys, invk[j], axis=0, mode="clip")
             * gate[:, j, None].astype(ys.dtype))
        out = c if out is None else out + c
    return out


def _combine_rows_fwd(ys, gate, inv, src, perm, top_k):
    return _combine_rows(ys, gate, inv, src, perm, top_k), (ys, gate, inv,
                                                            src, perm)


def _combine_rows_bwd(top_k, res, g):
    ys, gate, inv, src, perm = res
    # d_ys[r] = gate_flat[perm[r]] · g[src[r]] == (gate ⊙ g claims)[perm[r]]:
    # pre-scale the cotangent per k-major claim — a fused CONCAT of k
    # aligned (T, d) multiplies — then ONE row gather un-permutes into
    # sorted order.
    gd = jnp.concatenate(
        [g * gate[:, j, None].astype(g.dtype) for j in range(top_k)], axis=0)
    d_ys = jnp.take(gd, perm, axis=0, mode="clip").astype(ys.dtype)
    # d_gate[t,j] = <ys[inv[j·T+t]], g[t]>: k row gathers of ys + row dots
    # (the same gathers the forward takes).
    invk = inv.reshape(top_k, -1)
    gf = g.astype(jnp.float32)
    dg = [jnp.sum(jnp.take(ys, invk[j], axis=0,
                           mode="clip").astype(jnp.float32) * gf, axis=-1)
          for j in range(top_k)]
    d_gate = jnp.stack(dg, axis=-1).astype(gate.dtype)
    return d_ys, d_gate, None, None, None


_combine_rows.defvjp(_combine_rows_fwd, _combine_rows_bwd)


@jax.custom_vjp
def _permute_rows(x, perm, inv):
    """``x[perm]`` for a PERMUTATION ``perm`` with a gather-only transpose.

    Plain ``jnp.take`` differentiates to a scatter-add (XLA can't see that
    ``perm`` is bijective); for a permutation the cotangent is exactly
    ``g[inv]`` — another gather, which TPUs execute at memory speed.
    """
    return jnp.take(x, perm, axis=0, mode="clip")


def _permute_rows_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0, mode="clip"), (inv,)


def _permute_rows_bwd(res, g):
    (inv,) = res
    return jnp.take(g, inv, axis=0, mode="clip"), None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def resolve_moe_impl(cfg: TransformerConfig, params: dict,
                     n_tokens: int | None = None,
                     n_devices: int | None = None) -> str:
    """Resolve the MoE FFN implementation for a single-device evaluation.

    ``sparse`` (sorted dropless dispatch + megablox grouped matmul) computes
    only the top-k experts' FLOPs per token and streams only the selected
    experts' weights. ``dense`` evaluates every expert with a gate mask —
    the numerics oracle and the only form with an SPMD story (the tp
    expert-axis GSPMD rule) and an int8/bias path.

    'auto' mirrors ops.common.resolve_impl: the pallas grouped-matmul kernel
    has no partitioning rule, so it is only picked on a single-device TPU
    backend (multi-chip goes through dense-under-GSPMD or the explicit
    ep/shard_map path). ``n_devices`` overrides the host-visible
    ``jax.device_count()`` for that gate: a single-DEVICE jit on a
    multi-chip host, or a per-device program under shard_map (where the
    kernel IS legal), should pass 1 — the host-wide count is only the safe
    default, not the devices the program actually uses. ``n_tokens`` (the
    trace-time token count) picks the regime — v5e-measured on 8x124m
    top-2:

      - claims <= n_experts/2: weight-streaming decode (batch-1: sparse 811
        vs dense 545 tok/s — only the selected experts' weights are read),
      - claims >= 4096: compute-bound train/prefill (sparse 65.7k vs dense
        14.4k tok/s at b16 train — activated FLOPs only),
      - in between: DENSE. All experts get claims anyway (no traffic
        saving) and the per-tick dispatch glue loses: measured decode b4
        1.7k sparse vs 2.4k dense, b64 7.9k vs 8.7k, b256 42.3k vs 47.3k.
    """
    impl = getattr(cfg, "moe_impl", "auto")
    if impl not in ("auto", "dense", "sparse", "ep_sparse"):
        raise ValueError(f"unknown moe_impl {impl!r}; choose "
                         "auto/dense/sparse/ep_sparse")
    fc1 = params["fc1"]
    unsupported = fc1["weight"].dtype == jnp.int8 or "bias" in fc1
    if impl in ("sparse", "ep_sparse"):
        if unsupported:
            raise ValueError(
                f"moe_impl={impl!r} supports bf16/f32 bias-free experts only "
                "(int8-quantized or biased expert stacks use 'dense')")
        return impl
    if impl == "auto":
        if unsupported:
            return "dense"
        if n_devices is None:
            n_devices = jax.device_count()
        if jax.default_backend() != "tpu" or n_devices > 1:
            return "dense"
        if n_tokens is not None:
            n_experts = fc1["weight"].shape[0]
            claims = n_tokens * cfg.moe_top_k
            if claims > max(2, n_experts // 2) and claims < 4096:
                return "dense"
        return "sparse"
    return "dense"


def _mb_backend():
    import importlib

    return importlib.import_module(
        "jax.experimental.pallas.ops.tpu.megablox.gmm")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gmm(lhs, rhs, group_sizes, dtype, t_fwd, t_dx, t_dw):
    """megablox gmm with PER-PASS tilings.

    The stock ``megablox.ops.gmm`` custom VJP reuses the forward tiling for
    both backward kernels, but the three passes have different shapes —
    forward (G,k)@(E,k,n), dx (G,n)@(E,n,k) on the transposed weight,
    dw (k,G)@(G,n) grouped — and v5e-measured optima differ per pass (the
    (128,128,128) default runs them ALL at ~10 TF/s, 5x off; tuned they hit
    150-163 TF/s on the 8x124m step). ``t_dx`` uses normal-gmm roles on the
    swapped dims; ``t_dw``'s (tgmm) are (G-rows — must divide the padded
    row count, k, n).
    """
    return _mb_backend().gmm(lhs, rhs, group_sizes, dtype, t_fwd)


def _gmm_fwd(lhs, rhs, group_sizes, dtype, t_fwd, t_dx, t_dw):
    out = _mb_backend().gmm(lhs, rhs, group_sizes, dtype, t_fwd)
    return out, (lhs, rhs, group_sizes)


def _gmm_bwd(dtype, t_fwd, t_dx, t_dw, res, g):
    lhs, rhs, group_sizes = res
    b = _mb_backend()
    # dx as a NORMAL gmm on an explicitly transposed weight: transpose_rhs
    # reads strided (k, n-tile) slabs of the k-major weight and measured
    # 80 TF/s vs the contiguous form's 159 on the 8x124m step — one
    # (E, k, n) transpose per weight per step (~0.07 ms) buys the fast
    # layout for all m-tiles.
    dlhs = b.gmm(g, rhs.swapaxes(1, 2), group_sizes, lhs.dtype, t_dx)
    drhs = b.tgmm(lhs.swapaxes(0, 1), g, group_sizes, rhs.dtype, t_dw,
                  num_actual_groups=rhs.shape[0])
    return dlhs, drhs, None


_gmm.defvjp(_gmm_fwd, _gmm_bwd)


def _sparse_tilings(g_rows, k, n, dtype=jnp.bfloat16):
    """v5e-tuned (t_fwd, t_dx, t_dw) for one expert matmul (G,k)@(E,k,n).

    Measured at the 8x124m step shapes (G=16k: d=768, f1=4096, f=2048 —
    52/34/41 and 33/24/33 TF/s vs ~10 at the (128,128,128) default); the
    min() clamps keep the rules legal for other geometries. Small row counts
    (decode) keep small tiles: fewer wasted pad rows, and the weight-tile
    streaming (only the selected experts' tiles are read) is the win there,
    not MXU utilisation.

    ``dtype`` is the io/compute dtype the tiles hold: 4-byte dtypes halve
    the row tile — the bf16-tuned (1024, ·, 1024) tiles at f32 width blow
    megablox's 16 MiB scoped-vmem stack (measured on-device: 16.41M vs the
    16.01M limit at G=4096, k=768, n=3072 with an f32 out tile).
    """
    wide = jnp.dtype(dtype).itemsize >= 4
    if g_rows < 4096:
        t = (128, min(k, 512), min(n, 512))
        return t, (128, min(n, 512), min(k, 512)), (128, min(k, 512),
                                                    min(n, 512))
    def fwd_rule(k_, n_):
        tm = 1024 if n_ >= 1024 else 512
        return (tm // 2 if wide else tm, min(k_, 1024), min(n_, 1024))
    t_fwd = fwd_rule(k, n)
    t_dx = fwd_rule(n, k)  # dx is a normal gmm on the transposed weight
    tg = 256 if n >= 1024 else 1024
    t_dw = (tg // 2 if wide and tg > 256 else tg,
            min(k, 1024) if k <= 1024 else 512, min(n, 1024))
    return t_fwd, t_dx, t_dw


@jax.custom_vjp
def _swiglu_plain(h):
    """One-pass swiglu with a concat-shaped backward (no f32 pad+add, no
    XLA remat): the fallback for geometries the fused grouped-matmul
    segment (:func:`_ffn_segment_swiglu`) can't tile regularly, and the
    EP-sparse owner side (gates apply at the source device after the
    return all_to_all)."""
    f = h.shape[-1] // 2
    return jax.nn.silu(h[..., :f]) * h[..., f:]


def _swiglu_plain_fwd(h):
    return _swiglu_plain(h), h


def _swiglu_plain_bwd(h, g):
    f = h.shape[-1] // 2
    gate = h[..., :f].astype(jnp.float32)
    up = h[..., f:].astype(jnp.float32)
    s = jax.nn.sigmoid(gate)
    gf = g.astype(jnp.float32)
    dgate = gf * up * (s * (1.0 + gate * (1.0 - s)))
    dup = gf * gate * s
    return (jnp.concatenate([dgate, dup], axis=-1).astype(h.dtype),)


_swiglu_plain.defvjp(_swiglu_plain_fwd, _swiglu_plain_bwd)


def _fit_tile(t: int, dim: int) -> int:
    """Largest multiple of 128 that divides ``dim`` and is ≤ ``t`` (the
    fused kernels assert regular tiling; snapping to a divisor instead of a
    plain min keeps geometries like f=1536 with a tuned tk=1024 eligible —
    1536 % 1024 != 0, but 768 divides). Returns ``t`` unchanged when ``dim``
    has no 128-multiple divisor ≤ t, which makes the eligibility check
    fail → plain-gmm fallback."""
    if dim % 128 != 0:
        return t
    best = t
    for cand in range(min(t, dim), 127, -128):
        if dim % cand == 0:
            best = cand
            break
    return best


def _clamp_tiling(t, k: int, n: int):
    """Fit a (tm, tk, tn) tuning tuple to the kernel's ACTUAL (k, n) dims
    (the tuned tuples come from :func:`_sparse_tilings` for the PACKED fc1
    geometry; e.g. the dual dx kernel contracts k=f, not k=f1)."""
    return (t[0], _fit_tile(t[1], k), _fit_tile(t[2], n))


def _fused_tilings(t1, t2, f: int, d: int):
    """Per-kernel clamped tilings for the fused segment: (fc1-fwd, swiglu-
    fwd, dy, dual-dx, dw2) — each clamped to its own (k, n) geometry."""
    return (
        t1[0],                               # fc1 gmm: k=d, n=f1 (as tuned)
        _clamp_tiling(t2[0], f, d),          # gmm_swiglu: k=f, n=d
        _clamp_tiling(t2[1], d, f),          # gmm_dy_swiglu: k=d, n=f
        _clamp_tiling(t1[1], f, d),          # gmm_dual: k=f, n=d
        _clamp_tiling(t2[2], f, d),          # tgmm_swiglu: k=f, n=d
    )


def _fused_swiglu_ok(t1, t2, f: int, d: int) -> bool:
    """True when the fc1/fc2 geometry divides the fused kernels' (clamped)
    tilings (ops/gmm_fused.py asserts regular tiling; irregular geometries
    keep the plain _gmm + _swiglu_plain path)."""
    if f % 128 != 0 or d % 128 != 0:
        return False
    _, ts, tdy, tdx, tdw = _fused_tilings(t1, t2, f, d)
    return (f % ts[1] == 0 and d % ts[2] == 0
            and d % tdy[1] == 0 and f % tdy[2] == 0
            and f % tdx[1] == 0 and d % tdx[2] == 0
            and f % tdw[1] == 0 and d % tdw[2] == 0)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ffn_segment_swiglu(xs, w1, w2, group_sizes, dtype, t1, t2):
    """The whole grouped expert FFN — fc1 → swiglu → fc2 — as ONE custom-VJP
    segment built on the swiglu-fused grouped matmuls (ops/gmm_fused.py).

    Forward: ``h = gmm(xs, w1)`` (packed [gate ++ up]), then
    ``ys = gmm_swiglu(h, w2)`` — the gated activation ``y`` lives only in
    kernel tiles, never HBM. Backward: ``dw2 = tgmm_swiglu`` (y recomputed in
    the prologue), ``(dhg, dhu) = gmm_dy_swiglu`` (the swiglu backward in the
    store epilogue — no dh concatenate, the round-4 trace's 0.82 ms/layer
    pad+select pass), ``dxs = gmm_dual(dhg, dhu, w1ᵀ)`` (each cotangent half
    contracts its own weight half, summing in the accumulator), and the dw1
    halves re-join in one cheap (E, d, f1) concatenate. Residuals are
    (xs, w1, w2, h) — y is gone from the saved set too (134 MB/layer at the
    8x124m shapes), which also relieves the XLA remat pressure that was
    re-running the jax-level swiglu forward every backward.

    Tilings: ``t1`` = (fwd, dx, dw) for the fc1 geometry, ``t2`` for fc2 —
    the same per-pass v5e-tuned tuples :func:`_sparse_tilings` feeds
    :func:`_gmm`; the fused kernels inherit them pass-for-pass.
    """
    b = _mb_backend()
    f, d = w2.shape[1], w2.shape[2]
    tf1, ts, _, _, _ = _fused_tilings(t1, t2, f, d)
    h = b.gmm(xs, w1, group_sizes, dtype, tf1)
    from ..ops.gmm_fused import gmm_swiglu

    return gmm_swiglu(h, w2, group_sizes, dtype, ts)


def _ffn_segment_swiglu_fwd(xs, w1, w2, group_sizes, dtype, t1, t2):
    b = _mb_backend()
    from ..ops.gmm_fused import gmm_swiglu

    f, d = w2.shape[1], w2.shape[2]
    tf1, ts, _, _, _ = _fused_tilings(t1, t2, f, d)
    h = b.gmm(xs, w1, group_sizes, dtype, tf1)
    ys = gmm_swiglu(h, w2, group_sizes, dtype, ts)
    return ys, (xs, w1, w2, h, group_sizes)


def _ffn_segment_swiglu_bwd(dtype, t1, t2, res, g):
    xs, w1, w2, h, group_sizes = res
    b = _mb_backend()
    from ..ops.gmm_fused import gmm_dual, gmm_dy_swiglu, tgmm_swiglu

    f, d = w2.shape[1], w2.shape[2]
    _, _, tdy, tdx, tdw = _fused_tilings(t1, t2, f, d)
    dw2 = tgmm_swiglu(h, g, group_sizes, w2.dtype, tdw)
    # explicit transposes (not transpose_rhs): contiguous normal-gmm layout,
    # the parallel/moe._gmm dx trick (80 -> 163 TF/s measured round 3)
    dhg, dhu = gmm_dy_swiglu(g, w2.swapaxes(1, 2), h, group_sizes,
                             xs.dtype, tdy)
    dxs = gmm_dual(dhg, dhu, w1.swapaxes(1, 2), group_sizes, xs.dtype, tdx)
    td = t1[2]
    tdw_half = (td[0], td[1], min(td[2], f))
    dwg = b.tgmm(xs.swapaxes(0, 1), dhg, group_sizes, w1.dtype, tdw_half,
                 num_actual_groups=w1.shape[0])
    dwu = b.tgmm(xs.swapaxes(0, 1), dhu, group_sizes, w1.dtype, tdw_half,
                 num_actual_groups=w1.shape[0])
    dw1 = jnp.concatenate([dwg, dwu], axis=2)
    return dxs, dw1, dw2, None


_ffn_segment_swiglu.defvjp(_ffn_segment_swiglu_fwd, _ffn_segment_swiglu_bwd)


def _counting_sort(flat_ids, n_experts: int):
    """Stable counting sort of (G,) small-int expert ids → (perm, inv,
    group_sizes) without ``argsort``.

    The round-3 dispatch paid a full (G,) variadic argsort (~0.24 ms × 12
    layers on the 8x124m step) to sort 3-bit keys. With n_experts small, a
    rank-by-cumsum counting sort is pure vectorized work: one (G, E) int32
    occupancy matrix, one cumsum down the rows, one scatter-set.
    ``inv[g] = offset[id[g]] + (# earlier claims on the same expert)`` is the
    stable sorted position; ``perm`` is its inverse (scatter of arange).
    """
    g_rows = flat_ids.shape[0]
    occ = (flat_ids[:, None]
           == jnp.arange(n_experts, dtype=flat_ids.dtype)).astype(jnp.int32)
    cum = jnp.cumsum(occ, axis=0)  # inclusive per-expert running count
    group_sizes = cum[-1]  # (E,)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes)[:-1]])
    rank = jnp.sum((cum - occ) * occ, axis=1)  # exclusive rank in own expert
    inv = (jnp.take(offsets, flat_ids) + rank).astype(jnp.int32)
    perm = jnp.zeros((g_rows,), jnp.int32).at[inv].set(
        jnp.arange(g_rows, dtype=jnp.int32), unique_indices=True)
    return perm, inv, group_sizes


def apply_moe_ffn_sparse(params: dict, cfg: TransformerConfig, x, *,
                         top_k: int = 1, aux: dict | None = None):
    """Dropless sparse MoE FFN: sorted dispatch + grouped matmul.

    Same semantics as :func:`apply_moe_ffn` (every token's top-k experts are
    evaluated, NO capacity drops) at the ACTIVATED FLOP count instead of the
    all-experts one — the single-chip operating point for real expert counts
    (the dense form computes ``n_experts/top_k``× the useful expert FLOPs).

    TPU-native structure (Megablocks recipe on the MXU):

      1. expand tokens to their k claims (token-major) and COUNTING-sort the
         claim expert ids (:func:`_counting_sort` — rank-by-cumsum, no
         argsort) so each expert's tokens become one CONTIGUOUS row group
         (permutation gathers only; custom VJPs keep every transpose a
         gather too, no scatter-add anywhere),
      2. ``megablox`` grouped matmuls for fc1/fc2 over the row groups, with
         per-pass v5e-tuned tilings (:func:`_sparse_tilings` — the stock
         shared-tiling VJP leaves 4-5x on the floor); each row tile loads
         ONLY the owning expert's weight tiles, so FLOPs and weight HBM
         traffic both scale with top-k, not n_experts (decode at small
         batch reads just the selected experts' weights),
      3. gate weights fold into the fc1 activation epilogue (the expert FFN
         is linear past that point, so scaling h ≡ scaling the output), and
         :func:`_combine_rows` un-sorts + k-sums in one gather-reduce.

    Rows are padded to the row-tile multiple; pad rows are appended to the
    LAST expert's group and RE-READ token 0's embedding (zeros as gather
    indices), with a zero gate: their forward output is sliced off before
    the combine and their backward cotangent is the zero-padding of that
    slice's transpose, so they are inert both directions.

    ``aux`` (a dict collector) receives the router auxiliary losses computed
    from this call's own routing.
    """
    shape = x.shape
    cd = cfg.cdtype()
    xt = x.reshape(-1, shape[-1])
    t_tokens, d = xt.shape
    n_experts, _, f1 = params["fc1"]["weight"].shape
    f = params["fc2"]["weight"].shape[1]
    logits, probs, sel, top_p = _route(params, cfg, xt, top_k,
                                       need_probs=aux is not None)  # (T, k)
    if aux is not None:
        aux.update(router_aux_from_route(logits, probs, sel))

    # K-MAJOR claims (claim j·T + t = token t's j-th expert): the combine
    # backward's pre-scaled cotangent buffer is then a fused concat of k
    # aligned (T, d) multiplies instead of a (T, k, d) broadcast+reshape
    # with a T(2,128) tile fix (~3.8 ms/step on the round-5 trace). The
    # counting sort is stable either way; within an expert group the row
    # ORDER differs from the token-major form but every row's value is
    # identical, so the combined outputs are bit-equal.
    flat_ids = sel.transpose(1, 0).reshape(-1)
    g_rows = t_tokens * top_k
    perm, inv, group_sizes = _counting_sort(flat_ids, n_experts)
    t1 = _sparse_tilings(g_rows, d, f1, cd)
    t2 = _sparse_tilings(g_rows, f, d, cd)
    # every row-tile size in play must divide the padded row count
    tm = max(t1[0][0], t2[0][0], t1[1][0], t2[1][0], t1[2][0], t2[2][0])
    g_pad = (g_rows + tm - 1) // tm * tm
    group_sizes = group_sizes.at[n_experts - 1].add(g_pad - g_rows)

    # Sorted claim row g reads token perm[g] % T straight from x —
    # repeat and sort fused into ONE gather (src doubles as the combine
    # transpose map).
    src = perm % t_tokens
    src_pad = src
    if g_pad != g_rows:
        src_pad = jnp.concatenate(
            [src, jnp.zeros((g_pad - g_rows,), src.dtype)])
    xs = _dispatch_rows(xt.astype(cd), src_pad, inv, top_k)

    # Gate weights fold into the COMBINE gather-reduce (not the activation
    # epilogue): the expert chain stays gate-free, so the swiglu epilogue
    # can fuse into the grouped matmuls, and pad rows are inert because the
    # [:g_rows] slice's transpose zero-pads their cotangent.
    w1 = params["fc1"]["weight"].astype(cd)  # (E, d, f1)
    w2 = params["fc2"]["weight"].astype(cd)  # (E, f, d)
    if cfg.ffn_type.lower() == "swiglu" and _fused_swiglu_ok(t1, t2, f, d):
        ys = _ffn_segment_swiglu(xs, w1, w2, group_sizes, cd, t1, t2)[:g_rows]
    else:
        h = _gmm(xs, w1, group_sizes, cd, *t1)
        if cfg.ffn_type.lower() == "swiglu":
            h = _swiglu_plain(h)
        else:
            h = get_activation(cfg.activation)(h)
        ys = _gmm(h, w2, group_sizes, cd, *t2)[:g_rows]
    out = _combine_rows(ys, top_p.astype(cd), inv, src, perm, top_k)
    return out.reshape(shape).astype(x.dtype)


def apply_moe_ffn_ep(params: dict, cfg: TransformerConfig, x, *,
                     top_k: int = 1, capacity: int | None = None,
                     axis_name: str = "ep"):
    """Expert-parallel MoE FFN inside ``shard_map``.

    ``x``: the local (T_loc, E) token shard (tokens data-sharded over 'ep').
    ``params``: the LOCAL shard — router replicated, fc1/fc2 leading expert
    axis sharded over 'ep' (n_experts = ep · E_loc).

    GShard dispatch: per-device one-hot ``D (T_loc, n_experts, capacity)``
    marks token t as occupant c of expert e's buffer; ``all_to_all`` swaps
    the expert axis for a source-device axis so each owner receives its
    experts' buffers from every device, applies its local experts, and the
    reverse ``all_to_all`` + combine einsum restores token order. Overflow
    beyond ``capacity`` (counted per device per expert) is dropped.
    """
    ep = jax.lax.axis_size(axis_name)
    t_loc, dmodel = x.shape
    e_loc = jax.tree.leaves(params["fc1"])[0].shape[0]
    n_experts = ep * e_loc
    if capacity is None:
        capacity = t_loc  # lossless default
    gate, sel, _ = _gates(params, cfg, x, top_k)  # (T, E), (T, k)

    # Position of each (token, k) claim inside its expert's capacity buffer:
    # rank among same-expert claims in (k-major, token) order.
    claims = jax.nn.one_hot(sel, n_experts, dtype=jnp.int32)  # (T, k, E)
    flat = claims.transpose(1, 0, 2).reshape(-1, n_experts)  # (k*T, E)
    pos = jnp.cumsum(flat, axis=0) - flat  # rank within expert
    keep = (pos < capacity) & (flat > 0)
    # dispatch one-hot (T, E, C) — k slots merged (a token claims each
    # expert at most once)
    disp = jnp.zeros((t_loc, n_experts, capacity), jnp.float32)
    pos_c = jnp.clip(pos, 0, capacity - 1)
    kk = sel.shape[1]
    token_idx = jnp.tile(jnp.arange(t_loc), kk)
    expert_idx = sel.transpose(1, 0).reshape(-1)
    slot_idx = jnp.take_along_axis(pos_c, expert_idx[:, None],
                                   axis=1).squeeze(-1)
    val = jnp.take_along_axis(keep, expert_idx[:, None], axis=1
                              ).squeeze(-1).astype(jnp.float32)
    disp = disp.at[token_idx, expert_idx, slot_idx].add(val)

    # expert inputs per (global) expert: (E, C, d)
    ex_in = jnp.einsum("tec,td->ecd", disp, x.astype(jnp.float32),
                       precision=best_precision(disp),
                       preferred_element_type=jnp.float32)
    # swap expert-owner axis (tiled): (E, C, d) -> (E_loc, ep*C, d) on the
    # owner — owner j receives expert rows [j*E_loc, (j+1)*E_loc) from every
    # source, concatenated source-major along capacity.
    ex_in = jax.lax.all_to_all(ex_in, axis_name, split_axis=0, concat_axis=1,
                               tiled=True)
    ex_out = _expert_ffn(params["fc1"], params["fc2"], cfg, ex_in)
    # return to the dispatching devices: (E_loc, ep*C, d) -> (E, C, d)
    ex_out = jax.lax.all_to_all(ex_out.astype(jnp.float32), axis_name,
                                split_axis=1, concat_axis=0, tiled=True)
    # combine with gate weights folded into the dispatch mask
    comb = disp * gate[:, :, None]
    out = jnp.einsum("tec,ecd->td", comb, ex_out,
                     precision=best_precision(comb),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def apply_moe_ffn_ep_sparse(params: dict, cfg: TransformerConfig, x, *,
                            top_k: int = 1, capacity: int | None = None,
                            capacity_factor: float | None = None,
                            axis_name: str = "ep", aux: dict | None = None):
    """Dropless SPARSE expert parallelism inside ``shard_map`` — the
    multi-chip composition of :func:`apply_moe_ffn_sparse`.

    Replaces the GShard one-hot form (:func:`apply_moe_ffn_ep`) whose
    (T, n_experts, capacity) dispatch/combine einsums are O(T·E·C) dense
    work — exactly the all-experts shape the sparse path exists to kill. The
    sparse composition moves per-claim ROWS instead of one-hot tensors:

      1. route locally, counting-sort the (T_loc·k) claims by expert OWNER
         (device ``expert // e_loc`` — experts are block-sharded over 'ep',
         matching :func:`moe_param_shardings`),
      2. pack each owner's claims into a fixed ``capacity``-row send bucket
         (claim ranks beyond capacity are DROPPED — see the bound below),
         one ``all_to_all`` for the token rows + one for the target
         local-expert ids,
      3. each owner counting-sorts its received rows by LOCAL expert and
         runs the same per-pass-tuned megablox grouped matmuls as the
         single-chip sparse path (:func:`_gmm` — activated FLOPs, only the
         owner's expert weights are read),
      4. un-sort, reverse ``all_to_all`` (slot-symmetric: results land back
         at their send slots), gate-combine at the source.

    Dispatch traffic per device is ``2 · ep·capacity · d`` row bytes vs the
    one-hot form's ``2 · n_experts·C·d`` expert-buffer bytes PLUS the
    O(T·E·C) dispatch/combine einsum FLOPs; unfilled bucket slots re-read
    row 0 and are inert (their gate is zero at the combine, so forward
    garbage and backward cotangents both vanish).

    Drop bound: a claim is dropped iff more than ``capacity`` local claims
    target the same owner. Three ways to set it, strongest first:

      - ``capacity=None, capacity_factor=None`` (the default): ``T_loc·top_k``
        — provably dropless (ALL local claims could target one owner) at the
        cost of ep× bucket over-allocation. The equivalence/oracle setting.
      - ``capacity_factor=c``: ``capacity = ceil(T_loc·top_k/ep · c)`` — the
        Switch-Transformer capacity-factor recipe (Fedus et al.; expected
        per-owner load is T_loc·top_k/ep under the load-balance loss, c is
        the slack). ``c=ep`` recovers dropless exactly; the production
        train step (:func:`make_moe_ep_train_step`) defaults to ``c=2``.
      - explicit ``capacity=n`` rows.

    The actual bucket is rounded up so every grouped-matmul row tile divides
    the received row count (no dynamic padding anywhere); the drop bound
    stays at the requested capacity.

    ``aux`` receives this shard's router losses (callers ``pmean`` over the
    axis — both terms are means over tokens, and token shards are equal).
    """
    if "bias" in params["fc1"] or params["fc1"]["weight"].dtype == jnp.int8:
        raise ValueError(
            "apply_moe_ffn_ep_sparse supports bf16/f32 bias-free experts "
            "only (the grouped-matmul contract of apply_moe_ffn_sparse); "
            "biased or int8 expert stacks use apply_moe_ffn_ep")
    ep = jax.lax.axis_size(axis_name)
    cd = cfg.cdtype()
    t_loc, d = x.shape
    e_loc, _, f1 = params["fc1"]["weight"].shape
    f = params["fc2"]["weight"].shape[1]
    logits, probs, sel, top_p = _route(params, cfg, x, top_k,
                                       need_probs=aux is not None)
    if aux is not None:
        aux.update(router_aux_from_route(logits, probs, sel))

    flat_ids = sel.reshape(-1)  # (G,) global expert ids, token-major
    g_rows = t_loc * top_k
    owner = (flat_ids // e_loc).astype(jnp.int32)  # (G,) owning device

    # Static bucket size: dropless default, rounded so ep·B divides the
    # grouped-matmul row tiles (tilings only depend on static shapes). The
    # DROP bound stays at the requested capacity — the tile round-up only
    # adds inert slots, it must not silently admit more claims.
    if capacity is not None:
        cap_req = capacity
    elif capacity_factor is not None:
        cap_req = max(1, math.ceil(g_rows * capacity_factor / ep))
    else:
        cap_req = g_rows
    bucket = cap_req
    t1 = _sparse_tilings(ep * bucket, d, f1, cd)
    t2 = _sparse_tilings(ep * bucket, f, d, cd)
    tm = max(t1[0][0], t2[0][0], t1[1][0], t2[1][0], t1[2][0], t2[2][0])
    while (ep * bucket) % tm:
        bucket += 1
    g_send = ep * bucket

    # Rank of each claim within its owner's bucket (counting sort ranks).
    occ = (owner[:, None] == jnp.arange(ep, dtype=jnp.int32)).astype(jnp.int32)
    cum = jnp.cumsum(occ, axis=0)
    rank = jnp.sum((cum - occ) * occ, axis=1)
    dest = owner * bucket + rank  # send-slot of claim g
    valid = rank < cap_req  # dropped claims exceed the requested capacity

    # slot -> claim map: scatter claims into their slots (dropped claims go
    # out of bounds and are discarded by mode="drop"); unfilled slots keep
    # the sentinel and re-read token 0 with zero gate (inert).
    slot_claim = jnp.full((g_send,), g_rows, jnp.int32).at[
        jnp.where(valid, dest, g_send)].set(
            jnp.arange(g_rows, dtype=jnp.int32), mode="drop",
            unique_indices=True)
    slot_live = slot_claim < g_rows
    claim_clamped = jnp.minimum(slot_claim, g_rows - 1)
    slot_tok = jnp.where(slot_live, claim_clamped // top_k, 0)
    slot_le = jnp.where(slot_live,
                        jnp.take(flat_ids, claim_clamped) % e_loc, 0)

    xs_send = jnp.take(x.astype(cd), slot_tok, axis=0)  # (ep·B, d)
    xr = jax.lax.all_to_all(xs_send, axis_name, split_axis=0, concat_axis=0,
                            tiled=True)  # owner's rows, source-major slots
    le_recv = jax.lax.all_to_all(slot_le, axis_name, split_axis=0,
                                 concat_axis=0, tiled=True)

    # Owner side: group received rows by local expert, grouped-matmul FFN —
    # the SAME fused-swiglu segment as the single-chip path (the gated
    # activation lives only in kernel tiles; ops/gmm_fused.py), falling back
    # to plain gmm + activation for non-swiglu or tiling-irregular geometries.
    perm_o, inv_o, gsz = _counting_sort(le_recv, e_loc)
    xg = _permute_rows(xr, perm_o, inv_o)
    w1 = params["fc1"]["weight"].astype(cd)
    w2 = params["fc2"]["weight"].astype(cd)
    if cfg.ffn_type.lower() == "swiglu" and _fused_swiglu_ok(t1, t2, f, d):
        ys = _ffn_segment_swiglu(xg, w1, w2, gsz, cd, t1, t2)
    else:
        h = _gmm(xg, w1, gsz, cd, *t1)
        if cfg.ffn_type.lower() == "swiglu":
            h = _swiglu_plain(h)
        else:
            h = get_activation(cfg.activation)(h)
        ys = _gmm(h, w2, gsz, cd, *t2)
    ys = _permute_rows(ys, inv_o, perm_o)  # back to slot order

    # Results return to their senders' slots (the all_to_all is its own
    # slot inverse: owner o's rows [s·B, (s+1)·B) go back to source s).
    back = jax.lax.all_to_all(ys, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)

    # Gate-combine: claim g's output sits at slot dest[g]; dropped claims
    # contribute zero (Switch semantics), like the one-hot form's overflow.
    gate = (top_p.reshape(-1) * valid.astype(jnp.float32)).astype(cd)
    rows = jnp.take(back, jnp.where(valid, dest, 0), axis=0) * gate[:, None]
    out = rows.reshape(t_loc, top_k, d).sum(axis=1)
    return out.astype(x.dtype)


def moe_param_shardings(params: dict, mesh):
    """NamedSharding pytree: router replicated, expert stacks sharded P('ep')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def rule(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top in ("fc1", "fc2"):
            return NamedSharding(
                mesh, P(*("ep",) + (None,) * (leaf.ndim - 1)))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


# ---------------------------------------------------------------------------
# The expert-parallel train step (moe_impl="ep_sparse" end to end)
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    return ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def _is_expert_leaf(path, leaf) -> bool:
    """Expert-stack leaves: (n_experts, ·, ·) weights under a block FFN's
    fc1/fc2 (the router and every non-MoE leaf stay replicated)."""
    name = f".{_path_str(path)}."
    return ((".fc1." in name or ".fc2." in name) and ".ffn." in name
            and getattr(leaf, "ndim", 0) == 3)


def moe_ep_state_shardings(state, mesh):
    """NamedSharding pytree for a full-model TrainState under expert
    parallelism: expert stacks (params AND their mirrored optimizer moments)
    sharded P('ep') on the expert axis, everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def rule(path, leaf):
        if _is_expert_leaf(path, leaf):
            return NamedSharding(mesh, P("ep", None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def _ep_state_pspecs(state):
    from jax.sharding import PartitionSpec as P

    def rule(path, leaf):
        if _is_expert_leaf(path, leaf):
            return P("ep", None, None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, state)


def make_moe_ep_train_step(cfg: TransformerConfig, tx, mesh, *,
                           loss_fn=None, grad_clip: float | None = None,
                           capacity_factor: float | None = 2.0,
                           donate: bool = True):
    """Full-model MoE train step with experts sharded over 'ep' — the
    end-to-end production form of :func:`apply_moe_ffn_ep_sparse`.

    Mesh: ``('ep',)`` or ``('dp', 'ep')``. The batch is sharded over ALL
    devices (each device runs the backbone on its own tokens); expert
    stacks are block-sharded over 'ep' (replicated over 'dp');
    every other parameter is replicated. Each block's FFN dispatches its
    local tokens' claims to their expert owners with the row-bucket
    all_to_all (``capacity_factor`` — the Switch recipe, default 2; None =
    provably-dropless buckets).

    shard_map AD contract (CLAUDE.md): the differentiated scalar is the
    per-device objective scaled by 1/n_devices — NO psum inside. SPMD AD
    then accumulates each expert shard's gradient over its 'ep' group
    through the transposed all_to_all, so afterwards expert-shard grads
    only need a psum over 'dp', while replicated-param grads psum over the
    whole mesh. Aux router losses (``cfg.moe_lb_coef/moe_z_coef``) join the
    objective per shard and are reported pmean'd as ``moe_lb``/``moe_z``.

    Use :func:`moe_ep_state_shardings` to place the TrainState.
    """
    import optax
    from dataclasses import replace

    from jax.sharding import PartitionSpec as P

    from ..optim import global_grad_norm
    from .train_step import TrainState, cross_entropy_loss

    assert "ep" in mesh.axis_names, f"mesh {mesh.axis_names} has no 'ep' axis"
    assert cfg.n_experts > 0, "make_moe_ep_train_step needs an MoE config"
    has_dp = "dp" in mesh.axis_names and mesh.shape["dp"] > 1
    n_dev = mesh.shape["ep"] * (mesh.shape["dp"] if has_dp else 1)
    axes = ("dp", "ep") if has_dp else ("ep",)
    if loss_fn is None:
        loss_fn = cross_entropy_loss
    inner_cfg = replace(cfg, moe_impl="ep_sparse",
                        moe_capacity_factor=capacity_factor)
    coefs = (cfg.moe_lb_coef, cfg.moe_z_coef)
    need_aux = any(c != 0.0 for c in coefs)

    from ..models.transformer import apply_transformer

    def per_shard(state: TrainState, tokens, labels, rng):
        if rng is not None:
            ix = jax.lax.axis_index("ep")
            if has_dp:
                ix = ix + mesh.shape["ep"] * jax.lax.axis_index("dp")
            rng = jax.random.fold_in(rng, ix)

        def local_obj(p):
            out = apply_transformer(p, inner_cfg, tokens,
                                    deterministic=rng is None, rng=rng,
                                    return_moe_aux=need_aux)
            if need_aux:
                logits, aux = out
            else:
                logits, aux = out, {"lb": jnp.zeros(()), "z": jnp.zeros(())}
            loss = loss_fn(logits, labels)
            obj = loss + coefs[0] * aux["lb"] + coefs[1] * aux["z"]
            # 1/n_dev: SPMD AD differentiates Σ_devices obj_dev; the global
            # objective is the device MEAN (equal token shards).
            return obj / n_dev, (loss, aux["lb"], aux["z"])

        (_, (loss, lb, z)), grads = jax.value_and_grad(
            local_obj, has_aux=True)(state.params)

        # Expert shards: AD already summed this shard's grad over its 'ep'
        # group (transposed all_to_all); add the other 'dp' rows. Replicated
        # params: each device holds only its own tokens' share — sum all.
        def reduce_grad(path, g):
            if _is_expert_leaf(path, g):
                return jax.lax.psum(g, "dp") if has_dp else g
            return jax.lax.psum(g, axes)

        grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)
        loss = jax.lax.pmean(loss, axes)
        lb = jax.lax.pmean(lb, axes)
        z = jax.lax.pmean(z, axes)

        # Global grad norm: replicated leaves are identical everywhere;
        # expert shards contribute their psum over 'ep'.
        rep_sq = exp_sq = jnp.zeros((), jnp.float32)
        for path, g in jax.tree_util.tree_leaves_with_path(grads):
            s = jnp.sum(g.astype(jnp.float32) ** 2)
            if _is_expert_leaf(path, g):
                exp_sq = exp_sq + s
            else:
                rep_sq = rep_sq + s
        gnorm = jnp.sqrt(rep_sq + jax.lax.psum(exp_sq, "ep"))
        if grad_clip is not None:
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1,
                               acc_step=state.acc_step * 0)
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "moe_lb": lb, "moe_z": z}

    def train_step(state: TrainState, batch, rng=None):
        tokens, labels = batch
        state_specs = _ep_state_pspecs(state)
        dspec = P(axes if has_dp else "ep")
        sharded = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(state_specs, dspec, dspec, P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        return sharded(state, tokens, labels, rng)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
