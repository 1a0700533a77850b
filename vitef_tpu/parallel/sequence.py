"""Sequence parallelism: ring attention over an 'sp' mesh axis.

Beyond-parity capability (SURVEY §5.7 records the reference has NO
long-context / sequence-parallel support — its causal mask is a precomputed
O(L²) buffer, architecture.py:180-184). This module scales the sequence
dimension across devices the TPU-native way:

  - Every activation is sharded on L: embedding, norms, FFN, and the qkv /
    output projections are purely local (their math is position-wise).
  - Attention — the one op that couples positions — runs as **ring
    attention**: each device holds its (N, h, L/sp, d) query block
    permanently and its K/V block initially; K/V blocks rotate around the
    'sp' ring with ``lax.ppermute`` while a blockwise online softmax
    (running max / sum / weighted accumulator, all f32) folds each visiting
    block in. After ``sp`` hops every query has seen every key, and no
    device ever materialises more than ``L/sp`` keys — memory per device is
    O(L/sp · d + L/sp · L/sp), enabling sequences that exceed one chip's HBM.
  - The backward schedule is plain AD through the ``lax.scan`` of hops
    (ppermute transposes run the ring in reverse); gradients of the
    replicated parameters are ``pmean``'d over 'sp' exactly like data
    parallelism (each device's loss term is 1/sp of the global mean).

Causality is a position arithmetic, not a mask buffer: block (i, j) of the
score matrix is masked by comparing global indices ``i·Lloc + row`` vs
``j·Lloc + col``, so fully-future blocks contribute exp(-inf)=0 through the
same online-softmax path (no special-casing, SPMD-uniform control flow).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.norms import apply_norm
from ..models.transformer import (
    TransformerConfig,
    _linear,
    apply_ffn,
)
from ..ops.common import best_precision
from .train_step import TrainState

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Ring attention (the collective op)
# ---------------------------------------------------------------------------


def ring_attention(q, k, v, *, axis_name: str = "sp", causal: bool = False):
    """Blockwise-softmax attention over a sequence-sharded ring.

    ``q, k, v``: the local (N, h, Lloc, d) shards of (N, h, L, d) tensors with
    L = sp · Lloc sharded over ``axis_name``. Returns the local (N, h, Lloc, d)
    output of full-sequence softmax attention — numerically the blockwise
    online-softmax evaluation of :func:`vitef_tpu.ops.attention.attention_reference`.

    Must be called inside ``shard_map`` (uses ``axis_index``/``ppermute``).
    Differentiable: the scan over hops saves O(sp) block residuals and AD
    transposes the ppermute ring.
    """
    sp = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n, h, lq, d = q.shape
    scale = 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    qf = q.astype(jnp.float32) * scale
    m0 = jnp.full((n, h, lq, 1), _NEG_INF, jnp.float32)
    s0 = jnp.zeros((n, h, lq, 1), jnp.float32)
    acc0 = jnp.zeros((n, h, lq, d), jnp.float32)

    def hop(carry, t):
        m, s, acc, kt, vt = carry
        src = (me - t) % sp  # owner of the K/V block currently held
        scores = jnp.einsum(
            "nhqd,nhkd->nhqk", qf, kt.astype(jnp.float32),
            precision=best_precision(qf), preferred_element_type=jnp.float32)
        if causal:
            qpos = me * lq + jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 0)
            kpos = src * lq + jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 1)
            scores = jnp.where((kpos <= qpos)[None, None], scores, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        corr = jnp.exp(m - m_new)
        s = s * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("nhqk,nhkd->nhqd", p, vt.astype(jnp.float32),
                        precision=best_precision(p),
                        preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        kt, vt = jax.lax.ppermute((kt, vt), axis_name, perm)
        return (m_new, s, acc, kt, vt), None

    (m, s, acc, _, _), _ = jax.lax.scan(
        hop, (m0, s0, acc0, k, v), jnp.arange(sp))
    # causal: every query sees at least its own diagonal block → s > 0
    return (acc / jnp.maximum(s, 1e-30)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Sequence-parallel causal-LM forward
# ---------------------------------------------------------------------------


def apply_transformer_sp(params: dict, cfg: TransformerConfig, tokens, *,
                         axis_name: str = "sp"):
    """Pre-norm causal-LM forward on a LOCAL (N, Lloc) token shard.

    Mirrors apply_transformer/apply_block semantics (models/transformer.py)
    for the decoder configuration — dict embedding, learnable pos-emb, fused
    qkv, pre-norm blocks, seq2seq head — with every op local to the shard
    except attention (ring) and the pos-emb slice (offset by the shard's
    global position). Deterministic forward (sequence-parallel training is a
    long-context path; dropout there would need per-shard streams).
    """
    assert cfg.causal and cfg.pre_norm and not cfg.cls_token, (
        "apply_transformer_sp supports the pre-norm causal LM configuration"
    )
    assert cfg.emb_type.lower() == "dict" and not cfg.patch_type, (
        "sequence parallelism shards the token axis (dict embedding)"
    )
    assert cfg.output_type.lower() == "sequence_to_sequence", (
        "SP head must be position-wise (sequence_to_sequence)"
    )
    assert cfg.norm.lower() != "batch"
    cd = cfg.cdtype()
    me = jax.lax.axis_index(axis_name)
    lloc = tokens.shape[1]

    emb = params["embedding"]
    out = emb["token_emb"]["weight"].astype(cd)[tokens]
    if cfg.pos_emb:
        pos = jax.lax.dynamic_slice_in_dim(
            params["embedding"]["pos_emb"], me * lloc, lloc, axis=1)
        out = out + pos.astype(cd)

    n = out.shape[0]
    e = cfg.emb_dim
    h = cfg.n_heads
    d = e // h
    for bp in params["blocks"]:
        x = apply_norm(bp["attn_norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                       impl=cfg.norm_impl)
        qkv = _linear(bp["attn"]["qkv_mat"], x, cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(n, lloc, h, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        z = ring_attention(q, k, v, axis_name=axis_name, causal=True)
        z = z.transpose(0, 2, 1, 3).reshape(n, lloc, e)
        out = out + _linear(bp["attn"]["output"], z, cd)
        x = apply_norm(bp["ffn_norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                       impl=cfg.norm_impl)
        out = out + apply_ffn(bp["ffn"], cfg, x)

    op = params["output"]["output_layer"]
    out = apply_norm(op["norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                     impl=cfg.norm_impl)
    if cfg.weight_tying:
        w = emb["token_emb"]["weight"].astype(cd)
        logits = jnp.einsum("nle,ve->nlv", out.astype(cd), w,
                            precision=best_precision(w),
                            preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32)
    return _linear(op["head"], out, cd).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Sequence-parallel train step
# ---------------------------------------------------------------------------


def make_sp_train_step(
    cfg: TransformerConfig,
    tx,
    mesh: Mesh,
    *,
    loss_fn: Callable | None = None,
    grad_clip: float | None = None,
    donate: bool = True,
):
    """Train step with the SEQUENCE axis sharded over 'sp'.

    ``batch`` is ``(tokens, labels)`` of global shape (N, L) each, L sharded
    over 'sp' (labels pre-shifted by the caller, e.g. ``roll(tokens, -1)`` —
    the shift is global, so shifting before sharding keeps the shard
    boundaries consistent). Parameters are replicated; gradients are
    ``pmean``'d over 'sp' (each device's local mean loss is a 1/sp share of
    the global mean — the DP reduction, applied along sequence).
    """
    import optax

    from ..optim import global_grad_norm

    assert "sp" in mesh.axis_names
    if loss_fn is None:
        def loss_fn(logits, labels):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels).mean()

    def per_shard(state: TrainState, tokens, labels):
        def local_loss(p):
            logits = apply_transformer_sp(p, cfg, tokens)
            return loss_fn(logits, labels)

        loss, grads = jax.value_and_grad(local_loss)(state.params)
        loss = jax.lax.pmean(loss, "sp")
        grads = jax.lax.pmean(grads, "sp")
        gnorm = global_grad_norm(grads)
        if grad_clip is not None:
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1,
                               acc_step=state.acc_step * 0)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def train_step(state: TrainState, batch):
        tokens, labels = batch
        sharded = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(None, "sp"), P(None, "sp")),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, tokens, labels)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def build_sp_mesh(sp: int, devices=None) -> Mesh:
    """1-D ('sp',) mesh — stages adjacent on the ICI ring."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    assert sp == len(devices), f"sp={sp} must equal the device count"
    return Mesh(np.asarray(devices), axis_names=("sp",))
