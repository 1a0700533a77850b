"""Fused vocab-head + cross-entropy (ops/losses.fused_next_token_ce).

The fused op must match the unfused composition — apply_output(seq2seq)
followed by next_token_cross_entropy — in loss AND in every gradient
(hidden rows, vocab weight, bias), for both the tied (V, d) and untied
(d, V) head layouts, under chunking/padding that doesn't divide the row
count. The fused path exists so no (M, V) logits or dlogits tensor is ever
materialised (GPT2-small batch 64 OOMs without it); these tests pin the
numerics contract on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitef_tpu.models.transformer import TransformerConfig, init_transformer, \
    apply_transformer, apply_output
from vitef_tpu.ops import next_token_cross_entropy, fused_next_token_ce, \
    make_fused_head_loss


def _cfg(weight_tying):
    return TransformerConfig(
        vocab_size=257, emb_type="dict", emb_dim=64, ffn_dim=128, n_heads=4,
        n_layers=2, seq_len=24, causal=True, pre_norm=True,
        output_type="sequence_to_sequence", weight_tying=weight_tying,
        cls_token=False, compute_dtype="float32")


def _unfused_loss(params, cfg, x, y):
    logits = apply_transformer(params, cfg, x, deterministic=True)
    return next_token_cross_entropy(logits, y)


def _fused_loss(params, cfg, x, y, chunk=16):
    hidden = apply_transformer(params, cfg, x, deterministic=True,
                               return_hidden=True)
    return make_fused_head_loss(cfg, chunk=chunk)(params, hidden, y)


@pytest.mark.parametrize("weight_tying", [True, False])
def test_fused_ce_matches_unfused(weight_tying):
    cfg = _cfg(weight_tying)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(3, cfg.seq_len)),
                    jnp.int32)

    lu = _unfused_loss(params, cfg, x, x)
    lf = _fused_loss(params, cfg, x, x)
    np.testing.assert_allclose(float(lu), float(lf), rtol=1e-6)

    gu = jax.grad(lambda p: _unfused_loss(p, cfg, x, x))(params)
    gf = jax.grad(lambda p: _fused_loss(p, cfg, x, x))(params)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gu),
                               jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5,
            err_msg=jax.tree_util.keystr(kp))


def test_fused_ce_chunk_invariance_and_padding():
    """Chunk size must not change the value: chunk == M, chunk dividing M,
    and a chunk that forces pad rows all agree."""
    cfg = _cfg(True)
    params = init_transformer(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(3, cfg.seq_len)),
                    jnp.int32)
    # M = 3 * 23 = 69 rows: chunk=16 pads to 80, chunk=69 exact, chunk=7000
    # clamps to M.
    vals = [float(_fused_loss(params, cfg, x, x, chunk=c))
            for c in (16, 69, 7000)]
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-6)


def test_fused_ce_ignore_index():
    cfg = _cfg(True)
    params = init_transformer(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, cfg.seq_len)),
                    jnp.int32)
    y = x.at[:, 5:9].set(0)  # 0 = padding label
    logits = apply_transformer(params, cfg, x, deterministic=True)
    want = next_token_cross_entropy(logits, y, ignore_index=0)
    hidden = apply_transformer(params, cfg, x, deterministic=True,
                               return_hidden=True)
    w = params["embedding"]["token_emb"]["weight"]
    got = fused_next_token_ce(hidden, w, y, w_layout="vd", ignore_index=0,
                              chunk=16)
    np.testing.assert_allclose(float(want), float(got), rtol=1e-6)


def test_fused_ce_bias_grad():
    """Untied head WITH bias (injected — the stock seq2seq head is
    bias-free): db must match the unfused composition."""
    cfg = _cfg(False)
    params = init_transformer(jax.random.PRNGKey(6), cfg)
    head = params["output"]["output_layer"]["head"]
    head["bias"] = jax.random.normal(jax.random.PRNGKey(60),
                                     (cfg.vocab_size,), jnp.float32) * 0.1
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, cfg.seq_len)),
                    jnp.int32)

    def unfused(p):
        return _unfused_loss(p, cfg, x, x)

    def fused(p):
        return _fused_loss(p, cfg, x, x, chunk=11)

    gu = jax.grad(unfused)(params)["output"]["output_layer"]["head"]
    gf = jax.grad(fused)(params)["output"]["output_layer"]["head"]
    np.testing.assert_allclose(np.asarray(gu["bias"]), np.asarray(gf["bias"]),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu["weight"]),
                               np.asarray(gf["weight"]), atol=1e-6, rtol=1e-5)


def test_return_hidden_is_pre_head():
    """return_hidden gives exactly the rows apply_output would project."""
    cfg = _cfg(True)
    params = init_transformer(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, cfg.seq_len)),
                    jnp.int32)
    hidden = apply_transformer(params, cfg, x, deterministic=True,
                               return_hidden=True)
    w = params["embedding"]["token_emb"]["weight"]
    logits_manual = jnp.einsum("nle,ve->nlv", hidden, w)
    logits = apply_transformer(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits_manual), np.asarray(logits),
                               atol=1e-5, rtol=1e-5)


def test_train_step_hidden_loss_matches_loss_fn():
    """make_train_step(hidden_loss=...) produces the same loss and params
    trajectory as the plain loss_fn step (f32, exactness tolerance)."""
    import optax

    from vitef_tpu.parallel import init_train_state, make_train_step
    from vitef_tpu.models import build_model

    cfg = _cfg(True)
    params = init_transformer(jax.random.PRNGKey(10), cfg)
    tx = optax.sgd(1e-2)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, cfg.seq_len)),
                    jnp.int32)

    def apply_fn(p, xx, **kw):
        kw.pop("deterministic", None)
        kw.pop("rng", None)
        return apply_transformer(p, cfg, xx, deterministic=True, **kw)

    step_a = make_train_step(apply_fn, tx, loss_fn=next_token_cross_entropy,
                             donate=False)
    step_b = make_train_step(apply_fn, tx, donate=False,
                             hidden_loss=make_fused_head_loss(cfg, chunk=16))
    sa = init_train_state(params, tx)
    sb = init_train_state(params, tx)
    for _ in range(3):
        sa, ma = step_a(sa, (x, x))
        sb, mb = step_b(sb, (x, x))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
