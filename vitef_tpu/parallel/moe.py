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


def _gates(params, cfg, x, top_k):
    """(tokens, E) fp32 router probabilities, top-k selected and renormalised.

    Returns (gate_full, sel) where ``gate_full`` is (T, n_experts) with
    zeros outside each token's top-k and ``sel`` the (T, top_k) expert ids.
    """
    logits = jnp.einsum(
        "te,en->tn", x.astype(jnp.float32),
        params["router"]["weight"].astype(jnp.float32),
        precision=best_precision(x.astype(jnp.float32)),
        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, sel = jax.lax.top_k(probs, top_k)  # (T, k)
    top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    n_experts = probs.shape[-1]
    onehot = jax.nn.one_hot(sel, n_experts, dtype=jnp.float32)  # (T, k, E)
    gate_full = jnp.einsum("tk,tke->te", top_p, onehot)
    return gate_full, sel


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


def apply_moe_ffn(params: dict, cfg: TransformerConfig, x, *, top_k: int = 1):
    """Dense golden MoE FFN on (..., E) inputs: every expert evaluates every
    token; the gate mask zeroes the unselected ones. O(n_experts) FLOPs — the
    numerics oracle for the EP path, and the right single-device form for
    tiny expert counts."""
    shape = x.shape
    xt = x.reshape(-1, shape[-1])
    gate, _ = _gates(params, cfg, xt, top_k)
    # (E, T, d) all-experts evaluation
    outs = _expert_ffn(params["fc1"], params["fc2"], cfg,
                       jnp.broadcast_to(xt, (gate.shape[1], *xt.shape)))
    out = jnp.einsum("te,etd->td", gate.astype(outs.dtype), outs,
                     precision=best_precision(outs),
                     preferred_element_type=outs.dtype)
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
    gate, sel = _gates(params, cfg, x, top_k)  # (T, E), (T, k)

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
