"""Sparse (sorted dropless dispatch + grouped matmul) MoE FFN vs the dense
all-experts oracle — parallel/moe.py::apply_moe_ffn_sparse.

The sparse path is the single-chip TPU operating point: activated FLOPs and
selected-experts-only weight traffic through the megablox grouped-matmul
pallas kernel. Numerics must EQUAL the dense gate-masked form (no capacity
drops), forward and backward, including inside the model core and the
KV-cache decode path. CPU runs the kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitef_tpu.models import build_model
from vitef_tpu.models.generation import generate
from vitef_tpu.models.moe import MoeConfig, moe_transformer_config
from vitef_tpu.parallel.moe import (
    apply_moe_ffn,
    apply_moe_ffn_sparse,
    init_moe_ffn,
    resolve_moe_impl,
)


def tiny_cfg(**kw):
    return moe_transformer_config(MoeConfig(model_name="tiny", **kw))


@pytest.fixture(scope="module")
def ffn_setup():
    cfg = tiny_cfg()
    params = init_moe_ffn(jax.random.PRNGKey(0), cfg, cfg.n_experts)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 37, cfg.emb_dim),
                          jnp.float32)
    return cfg, params, x


def test_sparse_matches_dense_forward(ffn_setup):
    cfg, params, x = ffn_setup
    dense = apply_moe_ffn(params, cfg, x, top_k=cfg.moe_top_k)
    with pltpu.force_tpu_interpret_mode():
        sparse = apply_moe_ffn_sparse(params, cfg, x, top_k=cfg.moe_top_k)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               atol=2e-5, rtol=2e-5)


def test_sparse_matches_dense_gradients(ffn_setup):
    cfg, params, x = ffn_setup

    def loss(fn, p, xx):
        return jnp.sum(fn(p, cfg, xx, top_k=cfg.moe_top_k) ** 2)

    gd_p, gd_x = jax.grad(lambda p, xx: loss(apply_moe_ffn, p, xx),
                          argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gs_p, gs_x = jax.grad(
            lambda p, xx: loss(apply_moe_ffn_sparse, p, xx),
            argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4),
        (gd_p, gd_x), (gs_p, gs_x))


def test_sparse_top1_and_full_topk(ffn_setup):
    """top_k=1 (Switch) and top_k=n_experts (every expert selected) both
    agree with the dense oracle — the dispatch edge cases."""
    cfg, params, x = ffn_setup
    for k in (1, cfg.n_experts):
        dense = apply_moe_ffn(params, cfg, x, top_k=k)
        with pltpu.force_tpu_interpret_mode():
            sparse = apply_moe_ffn_sparse(params, cfg, x, top_k=k)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                                   atol=2e-5, rtol=2e-5)


def test_resolve_moe_impl_routing(ffn_setup):
    cfg, params, _ = ffn_setup
    # CPU backend: auto stays on the dense oracle
    assert resolve_moe_impl(cfg, params) == "dense"
    from dataclasses import replace

    assert resolve_moe_impl(replace(cfg, moe_impl="sparse"), params) == "sparse"
    assert resolve_moe_impl(replace(cfg, moe_impl="dense"), params) == "dense"
    # int8 expert stacks have no grouped-matmul path: auto falls back,
    # explicit sparse refuses
    int8_params = dict(params)
    int8_params["fc1"] = {
        "weight": params["fc1"]["weight"].astype(jnp.int8),
        "scale": jnp.ones(params["fc1"]["weight"].shape[::2], jnp.float32),
    }
    assert resolve_moe_impl(replace(cfg, moe_impl="auto"), int8_params) == "dense"
    with pytest.raises(ValueError):
        resolve_moe_impl(replace(cfg, moe_impl="sparse"), int8_params)


def test_sparse_model_forward_matches_dense():
    """The whole moe-family forward with moe_impl='sparse' equals
    moe_impl='dense' (the routing rides TransformerConfig through every
    block)."""
    md = build_model(dict(implementation="moe", model_name="tiny",
                          moe_impl="dense", attn_impl="xla",
                          norm_impl="xla"), key=jax.random.key(0))
    ms = build_model(dict(implementation="moe", model_name="tiny",
                          moe_impl="sparse", attn_impl="xla",
                          norm_impl="xla"), key=jax.random.key(0))
    toks = jnp.asarray(np.random.default_rng(5).integers(
        0, md.config.vocab_size, size=(2, 12)), jnp.int32)
    ld = md.apply(md.params, toks)
    with pltpu.force_tpu_interpret_mode():
        ls = ms.apply(ms.params, toks)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ls),
                               atol=3e-5, rtol=3e-5)


def test_sparse_greedy_decode_matches_dense():
    """KV-cache generate() through the sparse FFN (generation._ffn routes
    per decode step, T=batch tokens) is token-for-token greedy-equal to the
    dense path."""
    md = build_model(dict(implementation="moe", model_name="tiny",
                          moe_impl="dense", attn_impl="xla",
                          norm_impl="xla"), key=jax.random.key(0))
    ms = build_model(dict(implementation="moe", model_name="tiny",
                          moe_impl="sparse", attn_impl="xla",
                          norm_impl="xla"), key=jax.random.key(0))
    prompts = jnp.asarray(np.random.default_rng(7).integers(
        0, md.config.vocab_size, size=(2, 8)), jnp.int32)
    out_d = generate(md.params, md.config, prompts, max_new_tokens=6)
    with pltpu.force_tpu_interpret_mode():
        out_s = generate(ms.params, ms.config, prompts, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_sparse_dp_shard_map_matches_single_device():
    """Multi-chip DP keeps the grouped-matmul kernel: a dp=4 shard_map
    train step with moe_impl='sparse' (explicit — 'auto' resolves dense
    off-TPU/multi-device) matches the single-device sparse step: same loss,
    same updated params. Mirrors the packed-MHA shard_map rationale — a
    pallas_call has no SPMD partitioning rule, so pjit cannot ride it, but
    per-device execution under shard_map can.

    dp=4 on a submesh, NOT the full 8-device mesh: interpret-mode gmm
    blocks a host thread per device and deadlocks the CPU client at 8
    concurrent programs (probed at dp∈{2,4,8}: 2/4 pass, 8 hangs with the
    process at 0% CPU — a CI-interpreter thread-pool limit, not a product
    bug; real TPUs run the kernel on-chip)."""
    from vitef_tpu.ops import next_token_cross_entropy as lm_loss
    from vitef_tpu.optim import build_optimizer
    from vitef_tpu.parallel import (build_mesh, init_train_state,
                                    make_train_step, shard_batch,
                                    shard_params)

    m = build_model(dict(implementation="moe", model_name="tiny",
                         moe_impl="sparse", attn_impl="xla",
                         norm_impl="xla"), key=jax.random.key(0))
    cfg = m.config
    toks = jnp.asarray(np.random.default_rng(11).integers(
        0, cfg.vocab_size, size=(8, 16)), jnp.int32)

    def run(mesh):
        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05,
                                 "momentum": 0.9})
        step = make_train_step(m.apply, tx, loss_fn=lm_loss, donate=False,
                               mesh=mesh)
        p = m.params if mesh is None else shard_params(m.params, mesh)
        b = (toks, toks) if mesh is None else shard_batch((toks, toks), mesh)
        state = init_train_state(p, tx)
        with pltpu.force_tpu_interpret_mode():
            state, metrics = step(state, b)
        return jax.tree.leaves(state.params), float(metrics["loss"])

    single_leaves, loss_single = run(None)
    dp_leaves, loss_dp = run(
        build_mesh(dp=4, tp=1, devices=jax.devices()[:4]))
    assert np.allclose(loss_single, loss_dp, atol=1e-5)
    for a, b in zip(single_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_swiglu_segment_matches_oracle():
    """The swiglu-fused grouped-matmul segment (ops/gmm_fused.py via
    parallel/moe._ffn_segment_swiglu) equals the per-group dense oracle,
    forward AND backward, at a geometry that satisfies _fused_swiglu_ok.
    The gated activation never exists in HBM; the backward runs the
    two-output dy kernel + the dual-lhs dx kernel + the prologue-recompute
    dw2 kernel — all checked here in interpret mode."""
    from vitef_tpu.parallel.moe import (_ffn_segment_swiglu,
                                        _fused_swiglu_ok, _sparse_tilings)

    E, d, f = 4, 128, 128
    f1 = 2 * f
    G = 256
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(G, d)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(E, d, f1)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(E, f, d)) * 0.05, jnp.float32)
    sizes = jnp.asarray([64, 32, 96, 64], jnp.int32)
    t1 = _sparse_tilings(G, d, f1)
    t2 = _sparse_tilings(G, f, d)
    assert _fused_swiglu_ok(t1, t2, f, d)

    def oracle(xs, w1, w2):
        outs, start = [], 0
        for e in range(E):
            n = int(sizes[e])
            h = xs[start:start + n] @ w1[e]
            y = jax.nn.silu(h[:, :f]) * h[:, f:]
            outs.append(y @ w2[e])
            start += n
        return jnp.concatenate(outs, 0)

    def loss_o(xs, w1, w2):
        return jnp.sum(jnp.sin(oracle(xs, w1, w2)))

    def loss_f(xs, w1, w2):
        with pltpu.force_tpu_interpret_mode():
            ys = _ffn_segment_swiglu(xs, w1, w2, sizes, jnp.float32, t1, t2)
        return jnp.sum(jnp.sin(ys))

    with pltpu.force_tpu_interpret_mode():
        got = _ffn_segment_swiglu(xs, w1, w2, sizes, jnp.float32, t1, t2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle(xs, w1, w2)),
                               atol=1e-5, rtol=1e-5)
    g_o = jax.grad(loss_o, argnums=(0, 1, 2))(xs, w1, w2)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss_f, argnums=(0, 1, 2))(xs, w1, w2)
    for a, b in zip(g_o, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_sparse_fused_geometry_matches_dense():
    """apply_moe_ffn_sparse at a fused-eligible geometry (d, f multiples of
    128) routes through the fused segment and still equals the dense
    oracle, forward and backward — the integration guard for
    _fused_swiglu_ok + the gate-in-combine fold."""
    from dataclasses import replace

    cfg = replace(tiny_cfg(), emb_dim=128, ffn_dim=128, n_heads=4)
    params = init_moe_ffn(jax.random.PRNGKey(2), cfg, cfg.n_experts)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, cfg.emb_dim),
                          jnp.float32)

    def loss(fn, p, xx):
        return jnp.sum(fn(p, cfg, xx, top_k=cfg.moe_top_k) ** 2)

    dense = apply_moe_ffn(params, cfg, x, top_k=cfg.moe_top_k)
    with pltpu.force_tpu_interpret_mode():
        sparse = apply_moe_ffn_sparse(params, cfg, x, top_k=cfg.moe_top_k)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               atol=2e-5, rtol=2e-5)
    gd = jax.grad(lambda p, xx: loss(apply_moe_ffn, p, xx),
                  argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gs = jax.grad(lambda p, xx: loss(apply_moe_ffn_sparse, p, xx),
                      argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4), gd, gs)
