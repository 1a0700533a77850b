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


# ---------------------------------------------------------------------------
# Round 5: productionization — capacity recipe, fused owner FFN, train step
# ---------------------------------------------------------------------------


def test_ep_sparse_capacity_factor_drop_bound():
    """The Switch recipe ``capacity = ceil(T_loc·k/ep · factor)``: a claim is
    dropped iff more than ``capacity`` of its shard's claims target the same
    owner — the kept count per shard equals Σ_owner min(count, capacity),
    predicted from the routing computed independently; kept rows equal the
    dense oracle exactly; and factor=ep recovers dropless."""
    import math

    from vitef_tpu.parallel.moe import _route

    ep, n_experts, top_k = 4, 8, 1
    cfg = ffn_cfg()
    params = init_moe_ffn(jax.random.key(7), cfg, n_experts)
    rng = np.random.default_rng(7)
    t_loc = 8
    x = jnp.asarray(rng.normal(size=(t_loc * ep, cfg.emb_dim)).astype(np.float32))
    dense = np.asarray(apply_moe_ffn(params, cfg, x, top_k=top_k))

    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))

    def run(factor):
        fn = jax.jit(jax.shard_map(
            lambda p, xx: apply_moe_ffn_ep_sparse(
                p, cfg, xx, top_k=top_k, capacity_factor=factor),
            mesh=mesh, in_specs=(pspecs, P("ep")), out_specs=P("ep"),
            check_vma=False))
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(fn(sharded, x))

    # factor = ep -> capacity = T_loc*k: provably dropless == exact oracle
    np.testing.assert_allclose(run(float(ep)), dense, atol=2e-5, rtol=2e-5)

    # tight factor: predict the kept count from the routing itself
    factor = 0.5
    capacity = max(1, math.ceil(t_loc * top_k * factor / ep))
    e_loc = n_experts // ep
    expected_kept = 0
    for s in range(ep):
        _, _, sel, _ = _route(params, cfg, x[s * t_loc:(s + 1) * t_loc],
                              top_k, need_probs=False)
        owners = np.asarray(sel).reshape(-1) // e_loc
        counts = np.bincount(owners, minlength=ep)
        expected_kept += int(np.minimum(counts, capacity).sum())

    got = run(factor)
    kept = np.abs(got).sum(-1) > 0
    assert kept.sum() == expected_kept, (kept.sum(), expected_kept)
    assert expected_kept < t_loc * ep  # the bound must actually bite here
    np.testing.assert_allclose(got[kept], dense[kept], atol=2e-5, rtol=2e-5)


def test_ep_sparse_fused_swiglu_owner_matches_oracle():
    """A 128-multiple swiglu geometry takes the fused-segment owner FFN
    (ops/gmm_fused.py inside the EP path) and still matches the dense
    oracle — forward and expert-weight gradients."""
    from vitef_tpu.parallel.moe import (_fused_swiglu_ok, _sparse_tilings,
                                        _route)

    ep, n_experts, top_k = 4, 8, 2
    cfg = ffn_cfg(emb_dim=128, ffn_dim=128, ffn_type="swiglu", n_heads=4)
    params = init_moe_ffn(jax.random.key(8), cfg, n_experts)
    rng = np.random.default_rng(8)
    t_loc = 8
    x = jnp.asarray(rng.normal(size=(t_loc * ep, cfg.emb_dim)).astype(np.float32))

    # the geometry must be fused-eligible for the bucket row count in play
    g_rows = t_loc * top_k
    d = cfg.emb_dim
    f1 = params["fc1"]["weight"].shape[2]
    f = params["fc2"]["weight"].shape[1]
    t1 = _sparse_tilings(ep * g_rows, d, f1, jnp.float32)
    t2 = _sparse_tilings(ep * g_rows, f, d, jnp.float32)
    assert _fused_swiglu_ok(t1, t2, f, d), "geometry must take the fused path"

    dense = apply_moe_ffn(params, cfg, x, top_k=top_k)
    got = run_ep_sparse(params, cfg, x, make_mesh(ep), top_k=top_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               atol=3e-4, rtol=3e-4)

    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    dense_grads = jax.grad(
        lambda p: jnp.sum(apply_moe_ffn(p, cfg, x, top_k=top_k) * g))(params)
    mesh = make_mesh(ep)
    pspecs = jax.tree.map(lambda s: s.spec, moe_param_shardings(params, mesh))

    def per_shard(p, xx, gg):
        grads = jax.grad(lambda pp: jnp.sum(
            apply_moe_ffn_ep_sparse(pp, cfg, xx, top_k=top_k) * gg))(p)
        return {"router": jax.lax.psum(grads["router"], "ep"),
                "fc1": grads["fc1"], "fc2": grads["fc2"]}

    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(pspecs, P("ep"), P("ep")),
        out_specs=pspecs, check_vma=False))
    sharded = jax.device_put(params, moe_param_shardings(params, mesh))
    with pltpu.force_tpu_interpret_mode():
        got_g = fn(sharded, x, g)
    for a, b in zip(jax.tree.leaves(dense_grads), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_moe_ep_train_step_matches_single_device():
    """make_moe_ep_train_step (dropless) ≡ the plain single-device step on
    the same global batch: loss, grad norm, and updated params (the expert
    shards compared slice-for-slice)."""
    from vitef_tpu.models import TransformerConfig
    from vitef_tpu.models.transformer import apply_transformer, init_transformer
    from vitef_tpu.optim import build_optimizer
    from vitef_tpu.parallel import init_train_state, make_train_step
    from vitef_tpu.parallel.moe import (make_moe_ep_train_step,
                                        moe_ep_state_shardings)

    ep = 4
    cfg = TransformerConfig(
        vocab_size=32, emb_type="dict", emb_dim=16, n_heads=2, n_layers=2,
        seq_len=8, ffn_dim=16, ffn_bias=False, causal=True, pre_norm=True,
        weight_tying=True, output_type="sequence_to_sequence",
        cls_token=False, pos_emb=True, attn_bias=True, norm_bias=True,
        attn_impl="xla", norm_impl="xla", n_experts=8, moe_top_k=2,
    )
    params = init_transformer(jax.random.key(9), cfg)
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2 * ep, 8)),
                       jnp.int32)
    batch = (toks, toks)

    tx_ref, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.05, "momentum": 0.9},
        params=params, components=[], grad_clip=1.0)
    ref_step = make_train_step(
        lambda p, x, **kw: apply_transformer(p, cfg, x, **kw),
        tx_ref, donate=False)
    ref_state = init_train_state(params, tx_ref)
    ref_state, ref_m = ref_step(ref_state, batch)

    mesh = Mesh(np.asarray(jax.devices()[:ep]), axis_names=("ep",))
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9})
    step = make_moe_ep_train_step(cfg, tx, mesh, grad_clip=1.0,
                                  capacity_factor=None, donate=False)
    state = init_train_state(params, tx)
    state = jax.device_put(state, moe_ep_state_shardings(state, mesh))
    with pltpu.force_tpu_interpret_mode():
        state, m = step(state, batch)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    np.testing.assert_allclose(float(m["grad_norm"]),
                               float(ref_m["grad_norm"]), atol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_moe_ep_train_step_dp_composition():
    """('dp','ep') mesh: 2×2 composition still matches the single-device
    reference (expert grads psum over 'dp', replicated over the mesh)."""
    from vitef_tpu.models import TransformerConfig
    from vitef_tpu.models.transformer import apply_transformer, init_transformer
    from vitef_tpu.optim import build_optimizer
    from vitef_tpu.parallel import init_train_state, make_train_step
    from vitef_tpu.parallel.moe import (make_moe_ep_train_step,
                                        moe_ep_state_shardings)

    dp = ep = 2
    cfg = TransformerConfig(
        vocab_size=32, emb_type="dict", emb_dim=16, n_heads=2, n_layers=1,
        seq_len=8, ffn_dim=16, ffn_bias=False, causal=True, pre_norm=True,
        weight_tying=True, output_type="sequence_to_sequence",
        cls_token=False, pos_emb=True, attn_bias=True, norm_bias=True,
        attn_impl="xla", norm_impl="xla", n_experts=4, moe_top_k=2,
    )
    params = init_transformer(jax.random.key(10), cfg)
    rng = np.random.default_rng(10)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2 * dp * ep, 8)),
                       jnp.int32)
    batch = (toks, toks)

    tx_ref, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.05}, params=params, components=[])
    ref_step = make_train_step(
        lambda p, x, **kw: apply_transformer(p, cfg, x, **kw),
        tx_ref, donate=False)
    ref_state = init_train_state(params, tx_ref)
    ref_state, ref_m = ref_step(ref_state, batch)

    mesh = Mesh(np.asarray(jax.devices()[:dp * ep]).reshape(dp, ep),
                axis_names=("dp", "ep"))
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05})
    step = make_moe_ep_train_step(cfg, tx, mesh, capacity_factor=None,
                                  donate=False)
    state = init_train_state(params, tx)
    state = jax.device_put(state, moe_ep_state_shardings(state, mesh))
    with pltpu.force_tpu_interpret_mode():
        state, m = step(state, batch)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
