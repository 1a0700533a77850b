"""Mesh / sharding / jitted-train-step tests on the 8-device CPU host mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitef_tpu.models import TransformerConfig, apply_transformer, init_transformer
from vitef_tpu.optim import build_optimizer, build_scheduler, trainable_mask
from vitef_tpu.parallel import (
    build_mesh,
    cross_entropy_loss,
    init_train_state,
    make_eval_step,
    make_train_step,
    param_shardings,
    shard_batch,
    shard_params,
)


def tiny_vit_cfg(**kw):
    args = dict(
        patch_type="computer_vision", image_dim=(3, 16, 16), image_patch="hybrid",
        patch_size=8, emb_type="linear", emb_dim=16, n_heads=2, n_layers=2,
        attn_bias=True, ffn_bias=True, ffn_dim=32, norm="layer", norm_bias=True,
        norm_eps=1e-12, pre_norm=True, cls_token=True,
        output_type="classification", n_classes=3, weight_tying=False,
        attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


def make_batch(n, cfg, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, *cfg.image_dim)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, cfg.n_classes, size=(n,)))
    return x, y


def test_mesh_shapes():
    mesh = build_mesh()
    assert mesh.size == 8
    mesh = build_mesh(dp=4, tp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2


def test_param_shardings_tp_fsdp():
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    mesh = build_mesh(dp=4, tp=2)
    sh = param_shardings(params, mesh, fsdp=True)
    qkv = sh["blocks"][0]["attn"]["qkv_mat"]["weight"].spec
    assert qkv[1] == "tp"  # column-parallel
    fc2 = sh["blocks"][0]["ffn"]["fc2"]["weight"].spec
    assert fc2[0] == "tp"  # row-parallel
    # fsdp shards something over dp too
    any_dp = any(
        "dp" in tuple(s.spec) for s in jax.tree.leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any_dp


@pytest.mark.parametrize("dp,tp,fsdp", [(8, 1, False), (4, 2, False), (4, 2, True)])
def test_train_step_runs_and_learns(dp, tp, fsdp):
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    mesh = build_mesh(dp=dp, tp=tp)
    params = shard_params(params, mesh, fsdp=fsdp)

    sched = build_scheduler({"scheduler": "constant"}, n_steps=20)
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9},
                            schedule=sched, grad_clip=1.0)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    step_fn = make_train_step(apply_fn, tx, schedule=sched, base_lr=0.05)
    state = init_train_state(params, tx)

    batch = shard_batch(make_batch(16, cfg), mesh)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"no learning: {losses}"
    assert int(state.step) == 10
    assert np.isfinite(losses).all()


def test_grad_accumulation_equivalence():
    """grad_acc_steps=4 over batch 16 ≡ one step over the full batch."""
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(1), cfg)
    batch = make_batch(16, cfg, seed=3)

    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    results = {}
    for acc in (1, 4):
        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.1})
        step_fn = make_train_step(apply_fn, tx, grad_acc_steps=acc, donate=False)
        state = init_train_state(params, tx)
        state, metrics = step_fn(state, batch)
        results[acc] = (jax.tree.leaves(state.params), float(metrics["loss"]))
    for a, b in zip(results[1][0], results[4][0]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.allclose(results[1][1], results[4][1], atol=1e-5)


def test_dp_matches_single_device():
    """Same batch, dp=8 sharded vs single-device: identical params after a step."""
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(2), cfg)
    batch = make_batch(16, cfg, seed=5)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)

    # SGD: update linear in grad, so reduction-order ULP noise stays ULP-sized.
    # (Adam would normalize near-zero grads, amplifying ULP noise to O(lr).)
    def run(shard):
        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9})
        step_fn = make_train_step(apply_fn, tx, donate=False)
        p = params
        b = batch
        if shard:
            mesh = build_mesh(dp=8, tp=1)
            p = shard_params(p, mesh)
            b = shard_batch(b, mesh)
        state = init_train_state(p, tx)
        state, m = step_fn(state, b)
        return jax.tree.leaves(state.params), float(m["loss"])

    single, loss_s = run(False)
    dp, loss_dp = run(True)
    # all-reduce reduction order differs from single-device summation → ~ULP noise
    assert np.allclose(loss_s, loss_dp, atol=1e-5)
    for a, b in zip(single, dp):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step():
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    eval_step = make_eval_step(apply_fn)
    acc, loss = eval_step(params, make_batch(8, cfg))
    assert 0.0 <= float(acc) <= 1.0
    assert np.isfinite(float(loss))


def test_freeze_inside_jitted_step():
    """Frozen components stay bit-identical through jitted optimizer steps."""
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    comps = ["mha", "emb"]
    sched = build_scheduler({"scheduler": "constant"}, n_steps=5)
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.1, "momentum": 0.9},
                            schedule=sched, params=params, components=comps,
                            grad_clip=1.0)
    mask = trainable_mask(params, comps)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    step_fn = make_train_step(apply_fn, tx, trainable=mask, donate=False)
    state = init_train_state(params, tx)
    batch = make_batch(8, cfg)
    for _ in range(3):
        state, _ = step_fn(state, batch)
    old_qkv = params["blocks"][0]["attn"]["qkv_mat"]["weight"]
    new_qkv = state.params["blocks"][0]["attn"]["qkv_mat"]["weight"]
    assert np.array_equal(np.asarray(old_qkv), np.asarray(new_qkv))
    old_emb = params["embedding"]["patching"]["conv"]["weight"]
    new_emb = state.params["embedding"]["patching"]["conv"]["weight"]
    assert np.array_equal(np.asarray(old_emb), np.asarray(new_emb))
    # and trainable ones moved
    old_fc1 = params["blocks"][0]["ffn"]["fc1"]["weight"]
    new_fc1 = state.params["blocks"][0]["ffn"]["fc1"]["weight"]
    assert not np.array_equal(np.asarray(old_fc1), np.asarray(new_fc1))


def test_remat_forward_and_grads():
    """remat=True must compile and match the non-remat forward/gradients."""
    cfg = tiny_vit_cfg()
    cfg_r = tiny_vit_cfg(remat=True)
    params = init_transformer(jax.random.key(3), cfg)
    x, y = make_batch(4, cfg, seed=9)

    def loss(c):
        def f(p):
            logits = apply_transformer(p, c, x, deterministic=False)
            return cross_entropy_loss(logits, y)
        return f

    l0, g0 = jax.value_and_grad(loss(cfg))(params)
    l1, g1 = jax.value_and_grad(loss(cfg_r))(params)
    assert np.allclose(float(l0), float(l1), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_dp_step_matches_pjit():
    """Explicit shard_map DP step (mesh=...) == pjit auto-sharded step ==
    the DDP semantics: loss pmean'd over shards, identical updated params.
    This is the multi-chip path that keeps pallas kernels per-device
    (PARITY.md round-2; reference DDP topology distributed.py:234-240)."""
    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(3), cfg)
    batch = make_batch(16, cfg, seed=9)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    mesh = build_mesh(dp=8, tp=1)

    def run(use_shard_map):
        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9})
        step_fn = make_train_step(apply_fn, tx, donate=False,
                                  mesh=mesh if use_shard_map else None)
        p = shard_params(params, mesh)
        b = shard_batch(batch, mesh)
        state = init_train_state(p, tx)
        state, m = step_fn(state, b)
        return jax.tree.leaves(state.params), float(m["loss"])

    pjit_leaves, loss_pjit = run(False)
    sm_leaves, loss_sm = run(True)
    assert np.allclose(loss_pjit, loss_sm, atol=1e-5)
    for a, b in zip(pjit_leaves, sm_leaves):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_dp_rejects_tp_mesh():
    import pytest

    cfg = tiny_vit_cfg()
    params = init_transformer(jax.random.key(3), cfg)
    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    mesh = build_mesh(dp=4, tp=2)
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05})
    with pytest.raises(AssertionError, match="data-parallel only"):
        make_train_step(apply_fn, tx, donate=False, mesh=mesh)
