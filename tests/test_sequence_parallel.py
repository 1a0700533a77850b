"""Sequence-parallel (ring attention over 'sp') tests on the 8-device CPU mesh.

Load-bearing assertions: ring attention is numerically the reference softmax
attention (values AND gradients), and the sp-sharded causal-LM train step
matches the single-device step parameter-for-parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vitef_tpu.models import TransformerConfig, apply_transformer, init_transformer
from vitef_tpu.optim import build_optimizer
from vitef_tpu.ops.attention import attention_reference
from vitef_tpu.parallel import (
    apply_transformer_sp,
    build_sp_mesh,
    init_train_state,
    make_sp_train_step,
    make_train_step,
    ring_attention,
)


def lm_cfg(**kw):
    args = dict(
        vocab_size=32, emb_type="dict", emb_dim=16, n_heads=2, n_layers=3,
        seq_len=32, causal=True, pre_norm=True, weight_tying=True,
        output_type="sequence_to_sequence", attn_bias=True, ffn_bias=True,
        norm_bias=True, cls_token=False, pos_emb=True,
        attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


@pytest.mark.parametrize("causal,sp", [(False, 4), (True, 4), (True, 8)])
def test_ring_attention_matches_reference(causal, sp):
    rng = np.random.default_rng(0)
    n, h, l, d = 2, 2, 32, 8
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))
               for _ in range(3))
    ref = attention_reference(q, k, v, causal=causal)

    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])
    ring = jax.jit(jax.shard_map(
        lambda *a: ring_attention(*a, causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, "sp"),
                  P(None, None, "sp")),
        out_specs=P(None, None, "sp"),
        check_vma=False,
    ))
    got = ring(q, k, v)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ring_attention_gradients_match_reference():
    """AD through the ppermute ring equals the reference attention gradients."""
    rng = np.random.default_rng(1)
    n, h, l, d = 1, 2, 32, 8
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))
               for _ in range(3))
    g = jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))

    def ref_loss(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) * g)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    mesh = build_sp_mesh(4, devices=jax.devices()[:4])

    def ring_loss(q, k, v, g):
        # LOCAL scalar — no psum inside the differentiated function: SPMD AD
        # of the per-device scalars accumulates d(sum over devices)/d(shard)
        # through the transposed ppermutes (a psum here would multiply every
        # cotangent by sp under check_vma=False).
        return jnp.sum(ring_attention(q, k, v, causal=True) * g)

    def per_shard(q, k, v, g):
        return jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v, g)

    spec = P(None, None, "sp")
    grads = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec,) * 4,
        out_specs=(spec,) * 3, check_vma=False))(q, k, v, g)
    for got, ref in zip(grads, ref_grads):
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4), (
            np.abs(np.asarray(got) - np.asarray(ref)).max())


def test_sp_forward_matches_apply_transformer():
    cfg = lm_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
    ref = apply_transformer(params, cfg, tokens)

    mesh = build_sp_mesh(8)
    fwd = jax.jit(jax.shard_map(
        lambda p, t: apply_transformer_sp(p, cfg, t),
        mesh=mesh, in_specs=(P(), P(None, "sp")),
        out_specs=P(None, "sp"), check_vma=False))
    got = fwd(params, tokens)
    assert got.shape == ref.shape
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5), (
        np.abs(np.asarray(got) - np.asarray(ref)).max())


@pytest.mark.parametrize("sp", [4, 8])
def test_sp_train_step_matches_single_device(sp):
    cfg = lm_cfg(n_layers=2)
    params = init_transformer(jax.random.key(1), cfg)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
    labels = jnp.roll(tokens, -1, axis=1)

    # single-device reference step (global-norm clip in tx)
    import optax

    def lm_loss(logits, labels):
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels).mean()

    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    tx_ref, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05,
                                 "momentum": 0.9},
                                params=params, components=[], grad_clip=1.0)
    ref_step = make_train_step(apply_fn, tx_ref, loss_fn=lm_loss, donate=False)
    ref_state = init_train_state(params, tx_ref)
    ref_state, ref_m = ref_step(ref_state, (tokens, labels))

    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9})
    step = make_sp_train_step(cfg, tx, mesh, grad_clip=1.0, donate=False)
    state = init_train_state(params, tx)
    state, m = step(state, (tokens, labels))

    assert np.allclose(float(m["loss"]), float(ref_m["loss"]), atol=1e-5)
    assert np.allclose(float(m["grad_norm"]), float(ref_m["grad_norm"]),
                       atol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(state.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_train_learns():
    cfg = lm_cfg(n_layers=2)
    params = init_transformer(jax.random.key(2), cfg)
    mesh = build_sp_mesh(8)
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.1, "momentum": 0.9})
    step = make_sp_train_step(cfg, tx, mesh, grad_clip=1.0, donate=False)
    state = init_train_state(params, tx)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(8, 32)))
    labels = jnp.roll(tokens, -1, axis=1)
    losses = []
    for _ in range(10):
        state, m = step(state, (tokens, labels))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"no learning: {losses}"
    assert np.isfinite(losses).all()
    assert int(state.step) == 10


# ---------------------------------------------------------------------------
# Round-4 production upgrades: zigzag layout, chunked hops, grad-acc, dropout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("zigzag,chunk", [(True, None), (True, 8), (False, 8)])
def test_ring_attention_zigzag_chunk_matches_reference(zigzag, chunk):
    """Zigzag layout and inner key-chunking are exact re-evaluations of the
    same softmax attention (values in the permuted layout)."""
    from vitef_tpu.parallel.sequence import zigzag_permutation

    rng = np.random.default_rng(10)
    n, h, l, d, sp = 2, 2, 64, 8, 4
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))
               for _ in range(3))
    ref = attention_reference(q, k, v, causal=True)

    perm = zigzag_permutation(l, sp) if zigzag else np.arange(l)
    inv = np.argsort(perm)
    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])
    ring = jax.jit(jax.shard_map(
        lambda *a: ring_attention(*a, causal=True, zigzag=zigzag, chunk=chunk),
        mesh=mesh,
        in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"),
        check_vma=False,
    ))
    got = ring(q[:, :, perm], k[:, :, perm], v[:, :, perm])[:, :, inv]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ring_attention_zigzag_gradients_match_reference():
    from vitef_tpu.parallel.sequence import zigzag_permutation

    rng = np.random.default_rng(11)
    n, h, l, d, sp = 1, 2, 64, 8, 4
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))
               for _ in range(3))
    g = jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))

    def ref_loss(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) * g)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    perm = zigzag_permutation(l, sp)
    inv = np.argsort(perm)
    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])

    def ring_loss(q, k, v, g):
        # local scalar — no psum inside the differentiated function
        return jnp.sum(ring_attention(q, k, v, causal=True, zigzag=True,
                                      chunk=8) * g)

    def per_shard(q, k, v, g):
        return jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v, g)

    spec = P(None, None, "sp")
    grads = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec,) * 4,
        out_specs=(spec,) * 3, check_vma=False))(
            q[:, :, perm], k[:, :, perm], v[:, :, perm], g[:, :, perm])
    for got, ref in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got)[:, :, inv],
                                   np.asarray(ref), atol=1e-4)


def test_sp_zigzag_train_step_matches_single_device():
    """The zigzag step is the SAME optimization trajectory as the plain
    single-device step (the loss is a position-wise mean, permutation
    invariant)."""
    import optax

    cfg = lm_cfg(n_layers=2)
    params = init_transformer(jax.random.key(5), cfg)
    rng = np.random.default_rng(12)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
    labels = jnp.roll(tokens, -1, axis=1)

    def lm_loss(logits, labels):
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels).mean()

    apply_fn = lambda p, x, **kw: apply_transformer(p, cfg, x, **kw)
    tx_ref, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05,
                                 "momentum": 0.9},
                                params=params, components=[], grad_clip=1.0)
    ref_step = make_train_step(apply_fn, tx_ref, loss_fn=lm_loss, donate=False)
    ref_state = init_train_state(params, tx_ref)
    ref_state, ref_m = ref_step(ref_state, (tokens, labels))

    mesh = build_sp_mesh(4, devices=jax.devices()[:4])
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05, "momentum": 0.9})
    step = make_sp_train_step(cfg, tx, mesh, grad_clip=1.0, donate=False,
                              zigzag=True, chunk=8)
    state = init_train_state(params, tx)
    state, m = step(state, (tokens, labels))

    assert np.allclose(float(m["loss"]), float(ref_m["loss"]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_grad_accumulation_matches_plain():
    """grad_acc_steps=2 gives the same update as the full-batch sp step
    (mean-of-microbatch grads == full-batch grad, up to reassociation)."""
    cfg = lm_cfg(n_layers=2)
    params = init_transformer(jax.random.key(6), cfg)
    rng = np.random.default_rng(13)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
    labels = jnp.roll(tokens, -1, axis=1)
    mesh = build_sp_mesh(4, devices=jax.devices()[:4])

    def run(acc):
        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.05,
                                 "momentum": 0.9})
        step = make_sp_train_step(cfg, tx, mesh, grad_clip=1.0, donate=False,
                                  zigzag=True, chunk=8, grad_acc_steps=acc)
        state = init_train_state(params, tx)
        state, m = step(state, (tokens, labels))
        return state, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_dropout_runs_and_is_deterministic_per_key():
    """Dropout in the sp step: same key → same loss; different key →
    different loss; no rng → the deterministic forward."""
    cfg = lm_cfg(n_layers=2, dropout=0.5)
    params = init_transformer(jax.random.key(7), cfg)
    rng = np.random.default_rng(14)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 32)))
    labels = jnp.roll(tokens, -1, axis=1)
    mesh = build_sp_mesh(4, devices=jax.devices()[:4])
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.0})
    step = make_sp_train_step(cfg, tx, mesh, donate=False, zigzag=True,
                              chunk=8)
    state = init_train_state(params, tx)

    _, m_det = step(state, (tokens, labels))
    _, m_a = step(state, (tokens, labels), jax.random.key(0))
    _, m_a2 = step(state, (tokens, labels), jax.random.key(0))
    _, m_b = step(state, (tokens, labels), jax.random.key(1))
    assert float(m_a["loss"]) == float(m_a2["loss"])
    assert float(m_a["loss"]) != float(m_b["loss"])
    assert float(m_a["loss"]) != float(m_det["loss"])
    assert np.isfinite(float(m_a["loss"]))


def test_ring_attention_chunk_bounds_live_scores():
    """The memory contract: with chunking, NO f32 intermediate of the hop
    has Lloc×Lloc elements — the biggest score tensor is (N, h, Lloc, chunk)
    (VERDICT r3 #6's 'peak live per hop independent of Lloc² in f32')."""
    n, h, lq, d, sp, chunk = 1, 1, 128, 8, 4, 16
    l = lq * sp
    rng = np.random.default_rng(15)
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)).astype(np.float32))
               for _ in range(3))
    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])
    fn = jax.shard_map(
        lambda *a: ring_attention(*a, causal=True, chunk=chunk),
        mesh=mesh, in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"), check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(q, k, v)

    def walk(jx):
        for eqn in jx.eqns:
            for var in eqn.outvars:
                aval = var.aval
                if getattr(aval, "dtype", None) == jnp.float32:
                    yield aval
            for val in eqn.params.values():
                for sub in _subjaxprs(val):
                    yield from walk(sub)

    def _subjaxprs(val):
        import jax.extend.core as jcore
        if isinstance(val, jcore.ClosedJaxpr):
            yield val.jaxpr
        elif isinstance(val, jcore.Jaxpr):
            yield val
        elif isinstance(val, (tuple, list)):
            for item in val:
                yield from _subjaxprs(item)

    sizes = [int(np.prod(a.shape)) for a in walk(jaxpr.jaxpr)]
    # scores at full block size would be n*h*lq*lq = 16384; chunked is 2048
    assert max(sizes) < n * h * lq * lq, max(sizes)
    assert max(sizes) <= 4 * n * h * lq * chunk, max(sizes)


@pytest.mark.parametrize("causal,zigzag", [(False, False), (True, False),
                                           (True, True)])
def test_ring_attention_pallas_hop_matches_xla(causal, zigzag):
    """impl='pallas' (the hop state-update kernel, interpret mode) matches
    the einsum hop on the same bf16 inputs — values and gradients. dp=4
    submesh: interpret-mode pallas under shard_map deadlocks the CPU client
    at 8 concurrent programs (dev-guide rule)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    n, h, l, d = 1, 2, 1024, 64
    sp = 4
    q, k, v = (jnp.asarray(rng.normal(size=(n, h, l, d)), jnp.bfloat16)
               for _ in range(3))
    g = jnp.asarray(rng.normal(size=(n, h, l, d)), jnp.bfloat16)
    mesh = build_sp_mesh(sp, devices=jax.devices()[:sp])
    spec = P(None, None, "sp")

    def run(impl):
        def per_shard(q, k, v, g):
            def loss(q, k, v):
                out = ring_attention(q, k, v, causal=causal, zigzag=zigzag,
                                     impl=impl)
                return jnp.sum(out.astype(jnp.float32) *
                               g.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            fwd = ring_attention(q, k, v, causal=causal, zigzag=zigzag,
                                 impl=impl)
            return fwd, grads

        fn = jax.jit(jax.shard_map(
            per_shard, mesh=mesh, in_specs=(spec,) * 4,
            out_specs=(spec, (spec,) * 3), check_vma=False))
        return fn(q, k, v, g)

    with pltpu.force_tpu_interpret_mode():
        fwd_p, grads_p = run("pallas")
    fwd_x, grads_x = run("xla")
    assert np.allclose(np.asarray(fwd_p, np.float32),
                       np.asarray(fwd_x, np.float32), atol=3e-2), np.abs(
        np.asarray(fwd_p, np.float32) - np.asarray(fwd_x, np.float32)).max()
    for gp, gx in zip(grads_p, grads_x):
        assert np.allclose(np.asarray(gp, np.float32),
                           np.asarray(gx, np.float32), atol=8e-2), np.abs(
            np.asarray(gp, np.float32) - np.asarray(gx, np.float32)).max()
