"""Dropless sparse × expert-parallel composition
(parallel/moe.apply_moe_ffn_ep_sparse) on the CPU mesh.

The sparse EP path moves per-claim ROWS through all_to_all + the megablox
grouped matmul instead of the GShard (T, n_experts, capacity) one-hot
einsums. It must match BOTH oracles: the dense gate-masked form and the
single-device sorted sparse dispatch — forward and gradients, including the
router. ep=4 submesh per the interpret-mode rule (8 concurrent interpreted
gmm programs deadlock the CPU client; see tests/test_moe_sparse.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from vitef_tpu.models import TransformerConfig
from vitef_tpu.parallel.moe import (
    apply_moe_ffn,
    apply_moe_ffn_ep_sparse,
    apply_moe_ffn_sparse,
    init_moe_ffn,
    moe_param_shardings,
)


def ffn_cfg(**kw):
    args = dict(
        vocab_size=16, emb_type="dict", emb_dim=8, n_heads=2, n_layers=1,
        seq_len=8, ffn_dim=16, ffn_bias=False, activation="gelu",
        output_type="sequence_to_sequence", cls_token=False,
        attn_bias=True, norm_bias=True, attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


def make_mesh(ep):
    return Mesh(np.asarray(jax.devices()[:ep]), axis_names=("ep",))


def run_ep_sparse(params, cfg, x, mesh, *, top_k=1, capacity=None):
    """x: (T, d) global tokens sharded over 'ep'; params expert-sharded."""
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))
    fn = jax.jit(jax.shard_map(
        lambda p, xx: apply_moe_ffn_ep_sparse(
            p, cfg, xx, top_k=top_k, capacity=capacity),
        mesh=mesh, in_specs=(pspecs, P("ep")), out_specs=P("ep"),
        check_vma=False))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))
    with pltpu.force_tpu_interpret_mode():
        return fn(sharded, x)


@pytest.mark.parametrize("n_experts,top_k,ffn_type", [
    (4, 1, "plain"), (8, 2, "plain"), (8, 2, "swiglu")])
def test_ep_sparse_matches_both_oracles(n_experts, top_k, ffn_type):
    ep = 4
    cfg = ffn_cfg(**({"ffn_type": "swiglu"} if ffn_type == "swiglu" else {}))
    params = init_moe_ffn(jax.random.key(0), cfg, n_experts)
    rng = np.random.default_rng(0)
    t = 8 * ep
    x = jnp.asarray(rng.normal(size=(t, cfg.emb_dim)).astype(np.float32))

    dense = apply_moe_ffn(params, cfg, x, top_k=top_k)
    with pltpu.force_tpu_interpret_mode():
        sparse1 = apply_moe_ffn_sparse(params, cfg, x, top_k=top_k)
    got = run_ep_sparse(params, cfg, x, make_mesh(ep), top_k=top_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(sparse1),
                               atol=2e-5, rtol=2e-5)


def test_ep_sparse_gradients_match_dense():
    """Router AND expert grads through the row all_to_all dispatch match the
    dense oracle (router psum'd over 'ep', expert shards compared in place)."""
    ep, n_experts, top_k = 4, 8, 2
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(2), cfg, n_experts)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))

    dense_grads = jax.grad(
        lambda p: jnp.sum(apply_moe_ffn(p, cfg, x, top_k=top_k) * g))(params)

    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))

    def per_shard(p, xx, gg):
        grads = jax.grad(lambda pp: jnp.sum(
            apply_moe_ffn_ep_sparse(pp, cfg, xx, top_k=top_k) * gg))(p)
        return {
            "router": jax.lax.psum(grads["router"], "ep"),
            "fc1": grads["fc1"],
            "fc2": grads["fc2"],
        }

    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(pspecs, P("ep"), P("ep")),
        out_specs=pspecs, check_vma=False))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))
    with pltpu.force_tpu_interpret_mode():
        got = fn(sharded, x, g)
    for a, b in zip(jax.tree.leaves(dense_grads), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ep_sparse_input_gradient_matches_dense():
    """dL/dx flows back through combine → reverse all_to_all → gmm →
    dispatch gather → forward all_to_all and matches the dense oracle."""
    ep, n_experts, top_k = 4, 4, 2
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(3), cfg, n_experts)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4 * ep, cfg.emb_dim)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4 * ep, cfg.emb_dim)).astype(np.float32))

    dense_dx = jax.grad(
        lambda xx: jnp.sum(apply_moe_ffn(params, cfg, xx, top_k=top_k) * g))(x)

    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))
    fn = jax.jit(jax.shard_map(
        lambda p, xx, gg: jax.grad(lambda xi: jnp.sum(
            apply_moe_ffn_ep_sparse(p, cfg, xi, top_k=top_k) * gg))(xx),
        mesh=mesh, in_specs=(pspecs, P("ep"), P("ep")), out_specs=P("ep"),
        check_vma=False))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))
    with pltpu.force_tpu_interpret_mode():
        got = fn(sharded, x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense_dx),
                               atol=1e-4, rtol=1e-4)


def test_ep_sparse_capacity_drops_overflow():
    """A tiny per-owner bucket drops overflow claims (Switch semantics):
    kept rows still match dense for top_k=1 (an output row is either the
    full dense row or exactly zero)."""
    ep, n_experts = 4, 4
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(1), cfg, n_experts)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))
    got = np.asarray(run_ep_sparse(params, cfg, x, make_mesh(ep), top_k=1,
                                   capacity=1))
    dense = np.asarray(apply_moe_ffn(params, cfg, x, top_k=1))
    kept = np.abs(got).sum(-1) > 0
    assert kept.sum() < len(kept)  # something must drop at capacity 1
    np.testing.assert_allclose(got[kept], dense[kept], atol=2e-5, rtol=2e-5)


def test_ep_sparse_refuses_biased_experts():
    cfg = ffn_cfg(ffn_bias=True)
    params = init_moe_ffn(jax.random.key(4), cfg, 4)
    with pytest.raises(ValueError):
        apply_moe_ffn_ep_sparse(params, cfg, jnp.zeros((4, cfg.emb_dim)),
                                top_k=1)


def test_ep_sparse_aux_matches_router_aux():
    """The aux collector filled inside the shard reproduces router_aux on
    the local token shard (both terms are per-token means; global values
    are the pmean over shards)."""
    from vitef_tpu.parallel.moe import router_aux

    ep, n_experts, top_k = 4, 8, 2
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(5), cfg, n_experts)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8 * ep, cfg.emb_dim)).astype(np.float32))

    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))

    def per_shard(p, xx):
        aux = {}
        apply_moe_ffn_ep_sparse(p, cfg, xx, top_k=top_k, aux=aux)
        return jax.lax.pmean(aux["lb"], "ep"), jax.lax.pmean(aux["z"], "ep")

    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(pspecs, P("ep")),
        out_specs=(P(), P()), check_vma=False))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))
    with pltpu.force_tpu_interpret_mode():
        lb, z = fn(sharded, x)
    # per-shard aux averaged over shards vs the same mean taken shard-wise
    shard_aux = [router_aux(params, cfg, x[i * 8:(i + 1) * 8], top_k)
                 for i in range(ep)]
    np.testing.assert_allclose(
        float(lb), np.mean([float(a["lb"]) for a in shard_aux]), rtol=1e-5)
    np.testing.assert_allclose(
        float(z), np.mean([float(a["z"]) for a in shard_aux]), rtol=1e-5)
