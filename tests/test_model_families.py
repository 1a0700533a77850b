"""Training-path smoke tests for the non-ViT model families (GPT2, PatchTST)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.models import TransformerConfig, apply_transformer, init_transformer
from vitef_tpu.optim import build_optimizer
from vitef_tpu.parallel import init_train_state, make_train_step


def test_gpt2_like_causal_lm_trains():
    """Causal + dict embedding + weight tying: loss decreases on a fixed batch."""
    cfg = TransformerConfig(
        patch_type=None, vocab_size=50, emb_type="dict", emb_dim=32, n_heads=2,
        n_layers=2, pos_emb=True, seq_len=16, attn_bias=True, causal=True,
        activation="gelu", ffn_bias=True, norm="layer", norm_bias=True,
        pre_norm=True, cls_token=False, output_type="sequence_to_sequence",
        weight_tying=True, attn_impl="xla", norm_impl="xla",
    )
    params = init_transformer(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 50, size=(8, 17)))
    x, y = tokens[:, :-1], tokens[:, 1:]

    tx, _ = build_optimizer({"optimizer": "adamw", "lr": 3e-3})
    apply_fn = lambda p, xx, **kw: apply_transformer(p, cfg, xx, **kw)
    step_fn = make_train_step(apply_fn, tx, donate=False)
    state = init_train_state(params, tx)
    losses = []
    for _ in range(15):
        state, m = step_fn(state, (x, y))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses

    # causality: future-token perturbation must not change earlier logits
    logits_a = apply_transformer(state.params, cfg, x)
    x_mod = x.at[:, -1].set((x[:, -1] + 1) % 50)
    logits_b = apply_transformer(state.params, cfg, x_mod)
    np.testing.assert_allclose(np.asarray(logits_a[:, :-1]),
                               np.asarray(logits_b[:, :-1]), atol=1e-5)


def test_patchtst_like_forecasting_trains():
    """Time-series patching + batch norm + post-norm + forecasting head + MSE."""
    cfg = TransformerConfig(
        length=64, patch_type="time_series", patch_size=16, stride=8,
        emb_type="linear", emb_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
        pos_emb=True, attn_bias=True, causal=False, activation="gelu",
        ffn_bias=True, norm="batch", norm_bias=True, pre_norm=False,
        cls_token=False, output_type="forecasting", weight_tying=False,
        forecasting_horizon=24, attn_impl="xla", norm_impl="xla",
    )
    params = init_transformer(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    t = np.linspace(0, 8 * np.pi, 64 + 24)
    series = np.sin(t)[None] + 0.05 * rng.normal(size=(16, 64 + 24))
    x = jnp.asarray(series[:, :64], jnp.float32)
    y = jnp.asarray(series[:, 64:], jnp.float32)

    def mse(pred, target):
        return jnp.mean(jnp.square(pred - target))

    tx, _ = build_optimizer({"optimizer": "adamw", "lr": 1e-2})
    # batch norm in train mode (deterministic=False; rng only gates dropout=0)
    apply_fn = lambda p, xx, **kw: apply_transformer(p, cfg, xx, **kw)
    step_fn = make_train_step(apply_fn, tx, loss_fn=mse, donate=False)
    state = init_train_state(params, tx)
    key = jax.random.key(0)
    losses = []
    for i in range(20):
        key, sk = jax.random.split(key)
        state, m = step_fn(state, (x, y), sk)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
