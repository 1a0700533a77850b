"""Mixture-of-experts FFN + expert parallelism ('ep') tests on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vitef_tpu.models import TransformerConfig
from vitef_tpu.parallel.moe import (
    apply_moe_ffn,
    apply_moe_ffn_ep,
    init_moe_ffn,
    moe_param_shardings,
)


def ffn_cfg(**kw):
    args = dict(
        vocab_size=16, emb_type="dict", emb_dim=8, n_heads=2, n_layers=1,
        seq_len=8, ffn_dim=16, ffn_bias=True, activation="gelu",
        output_type="sequence_to_sequence", cls_token=False,
        attn_bias=True, norm_bias=True, attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


def make_mesh(ep):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:ep]), axis_names=("ep",))


def shard_expert_params(params, mesh):
    return jax.device_put(params, moe_param_shardings(params, mesh))


def run_ep(params, cfg, x, mesh, *, top_k=1, capacity=None):
    """x: (T, d) global tokens, sharded over 'ep'; params expert-sharded."""

    def per_shard(p, xx):
        return apply_moe_ffn_ep(p, cfg, xx, top_k=top_k, capacity=capacity)

    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))
    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(pspecs, P("ep")),
        out_specs=P("ep"), check_vma=False))
    return fn(shard_expert_params(params, mesh), x)


@pytest.mark.parametrize("ep,n_experts,top_k", [(4, 4, 1), (4, 8, 2), (8, 8, 1)])
def test_ep_matches_dense_at_full_capacity(ep, n_experts, top_k):
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(0), cfg, n_experts)
    rng = np.random.default_rng(0)
    t = 8 * ep
    x = jnp.asarray(rng.normal(size=(t, cfg.emb_dim)).astype(np.float32))

    dense = apply_moe_ffn(params, cfg, x, top_k=top_k)
    mesh = make_mesh(ep)
    got = run_ep(params, cfg, x, mesh, top_k=top_k)
    assert np.allclose(np.asarray(got), np.asarray(dense), atol=1e-5), (
        np.abs(np.asarray(got) - np.asarray(dense)).max())


def test_ep_capacity_drops_overflow():
    """capacity=1: at most one token per expert per device contributes; every
    other row of the output is exactly zero (Switch drop semantics)."""
    cfg = ffn_cfg()
    n_experts, ep = 4, 4
    params = init_moe_ffn(jax.random.key(1), cfg, n_experts)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4 * ep, cfg.emb_dim)).astype(np.float32))
    mesh = make_mesh(ep)
    got = np.asarray(run_ep(params, cfg, x, mesh, top_k=1, capacity=1))
    dense = np.asarray(apply_moe_ffn(params, cfg, x, top_k=1))
    kept = np.abs(got).sum(-1) > 0
    # every kept row matches the dense output; some rows must be dropped
    assert kept.sum() <= ep * n_experts
    assert np.allclose(got[kept], dense[kept], atol=1e-5)
    # per device (4 tokens each) at most 1 token per expert survives
    assert kept.sum() < len(kept) or kept.sum() == ep * n_experts


def test_moe_gradients_flow_through_ep():
    """Router AND expert grads through the all_to_all dispatch match dense."""
    cfg = ffn_cfg()
    n_experts, ep = 4, 4
    params = init_moe_ffn(jax.random.key(2), cfg, n_experts)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4 * ep, cfg.emb_dim)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4 * ep, cfg.emb_dim)).astype(np.float32))

    dense_grads = jax.grad(
        lambda p: jnp.sum(apply_moe_ffn(p, cfg, x, top_k=2) * g))(params)

    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))

    def per_shard(p, xx, gg):
        def local_loss(p):
            return jnp.sum(apply_moe_ffn_ep(p, cfg, xx, top_k=2) * gg)

        grads = jax.grad(local_loss)(p)
        # router is replicated: its grad accumulates over every device's
        # token shard
        return {
            "router": jax.lax.psum(grads["router"], "ep"),
            "fc1": grads["fc1"],
            "fc2": grads["fc2"],
        }

    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(pspecs, P("ep"), P("ep")),
        out_specs=pspecs, check_vma=False))
    got = fn(shard_expert_params(params, mesh), x, g)
    for a, b in zip(jax.tree.leaves(dense_grads), jax.tree.leaves(got)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max())


def test_expert_params_are_sharded():
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(3), cfg, 8)
    mesh = make_mesh(8)
    sharded = shard_expert_params(params, mesh)
    fc1 = sharded["fc1"]["weight"]
    assert {s.data.shape for s in fc1.addressable_shards} == {
        (1, cfg.emb_dim, cfg.ffn_dim)}
    r = sharded["router"]["weight"]
    assert all(s.data.shape == r.shape for s in r.addressable_shards)


def test_moe_ep_training_learns():
    """Full EP training loop: expert-sharded params, router psum'd over 'ep',
    sgd update inside shard_map — synthetic regression loss decreases."""
    import optax

    cfg = ffn_cfg()
    n_experts, ep = 4, 4
    params = init_moe_ffn(jax.random.key(5), cfg, n_experts)
    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))
    tx = optax.sgd(0.05, momentum=0.9)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))

    def per_shard(p, opt, xx, yy):
        def local_loss(p):
            out = apply_moe_ffn_ep(p, cfg, xx, top_k=2)
            return jnp.mean((out - yy) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(p)
        loss = jax.lax.pmean(loss, "ep")
        grads = {
            "router": jax.lax.psum(grads["router"], "ep"),
            "fc1": grads["fc1"],
            "fc2": grads["fc2"],
        }
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    from jax.sharding import PartitionSpec as P

    sharded_params = shard_expert_params(params, mesh)
    opt_state = tx.init(sharded_params)
    # momentum leaves mirror the params: leading (n_experts,) axis -> 'ep'
    opt_specs = jax.tree.map(
        lambda l: P(*("ep",) + (None,) * (l.ndim - 1))
        if getattr(l, "ndim", 0) >= 1 and l.shape[0] == n_experts else P(),
        opt_state)
    step = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(pspecs, opt_specs, P("ep"), P("ep")),
        out_specs=(pspecs, opt_specs, P()), check_vma=False))

    losses = []
    p, opt = sharded_params, opt_state
    for _ in range(50):
        p, opt, loss = step(p, opt, x, y)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses
    assert np.isfinite(losses).all()
