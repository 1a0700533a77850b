"""Golden parity: vitef_tpu transformer vs the PyTorch reference oracle.

Copies the SAME weights into both implementations and compares forward logits,
attention matrices, decomposition, and probes (SURVEY.md §4b: tolerance 1e-3;
fp32 single-chip comparisons here use tighter bounds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitef_tpu.models.transformer import (
    TransformerConfig,
    apply_transformer,
    get_decomposition,
    get_probes,
)
from vitef_tpu.models.torch_import import from_vitef_state_dict


def make_ref_model(ref_arch, **kwargs):
    import torch

    torch.manual_seed(0)
    cfg = ref_arch.TransformerConfig(**kwargs)
    model = ref_arch.Transformer(cfg)
    model.eval()
    return model, cfg


VIT_LIKE = dict(
    image_dim=(3, 32, 32),
    patch_type="computer_vision",
    image_patch="hybrid",
    patch_size=8,
    emb_type="linear",
    emb_dim=48,
    n_heads=4,
    n_layers=3,
    ffn_dim=192,
    pos_emb=True,
    emb_dropout=0.0,
    attn_bias=True,
    attn_dropout=0.0,
    flash=False,
    causal=False,
    activation="gelu",
    ffn_bias=True,
    ffn_dropout=0.0,
    norm="layer",
    norm_bias=True,
    norm_eps=1e-12,
    pre_norm=True,
    cls_token=True,
    output_type="classification",
    weight_tying=False,
    output_dropout=0.0,
    n_classes=10,
)

GPT_LIKE = dict(
    patch_type=None,
    vocab_size=100,
    emb_type="dict",
    emb_dim=48,
    n_heads=4,
    n_layers=2,
    pos_emb=True,
    seq_len=16,
    emb_dropout=0.0,
    attn_bias=True,
    attn_dropout=0.0,
    flash=False,
    causal=True,
    activation="gelu",
    ffn_bias=True,
    ffn_dropout=0.0,
    norm="layer",
    norm_bias=True,
    norm_eps=1e-5,
    pre_norm=True,
    cls_token=False,
    output_type="sequence_to_sequence",
    weight_tying=True,
    output_dropout=0.0,
)


def to_jax(ref_model, n_layers):
    # np.array COPY is load-bearing: torch .numpy() shares memory with the
    # parameter tensors and jax CPU arrays may alias numpy buffers — without
    # the copy, torch in-place training (opt.step, BN running-stat updates)
    # after to_jax() silently mutates the "jax" params.
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in ref_model.state_dict().items()}
    return from_vitef_state_dict(sd, n_layers)


def my_config(**kwargs):
    return TransformerConfig(attn_impl="xla", norm_impl="xla", **kwargs)


class TestViTLike:
    @pytest.fixture(scope="class")
    def setup(self, reference_vitef):
        import torch

        ref_model, _ = make_ref_model(reference_vitef, **VIT_LIKE)
        params = to_jax(ref_model, VIT_LIKE["n_layers"])
        cfg = my_config(**VIT_LIKE)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.inference_mode():
            ref_logits = ref_model(torch.from_numpy(x)).numpy()
            ref_dec = {k: v.numpy() for k, v in ref_model.get_decomposition(torch.from_numpy(x)).items()}
            ref_probes = {k: v.numpy() for k, v in ref_model.get_probes(torch.from_numpy(x)).items()}
            _, ref_att = ref_model(torch.from_numpy(x), verbose=True)
        return ref_model, params, cfg, x, ref_logits, ref_dec, ref_probes, ref_att.numpy()

    def test_forward(self, setup):
        _, params, cfg, x, ref_logits, *_ = setup
        logits = apply_transformer(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-5, rtol=1e-4)

    def test_attention_matrices(self, setup):
        _, params, cfg, x, _, _, _, ref_att = setup
        _, att = apply_transformer(params, cfg, jnp.asarray(x), verbose=True)
        np.testing.assert_allclose(np.asarray(att), ref_att, atol=2e-5, rtol=1e-4)

    def test_decomposition(self, setup):
        _, params, cfg, x, _, ref_dec, _, _ = setup
        dec = get_decomposition(params, cfg, jnp.asarray(x))
        assert set(dec) == set(ref_dec)
        for k in ref_dec:
            np.testing.assert_allclose(
                np.asarray(dec[k]), ref_dec[k], atol=2e-5, rtol=1e-4, err_msg=k
            )

    def test_probes(self, setup):
        _, params, cfg, x, _, _, ref_probes, _ = setup
        probes = get_probes(params, cfg, jnp.asarray(x))
        assert set(probes) == set(ref_probes)
        for k in ref_probes:
            np.testing.assert_allclose(
                np.asarray(probes[k]), ref_probes[k], atol=3e-5, rtol=1e-4, err_msg=k
            )


class TestGPTLike:
    def test_forward_and_probes(self, reference_vitef):
        import torch

        ref_model, _ = make_ref_model(reference_vitef, **GPT_LIKE)
        params = to_jax(ref_model, GPT_LIKE["n_layers"])
        params["output"]["output_layer"].pop("head", None)  # weight-tied
        cfg = my_config(**GPT_LIKE)
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, 100, size=(2, 16))
        with torch.inference_mode():
            ref_logits = ref_model(torch.from_numpy(tokens)).numpy()
        logits = apply_transformer(params, cfg, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-5, rtol=1e-4)


class TestPostNormBatchNorm:
    def test_forward(self, reference_vitef):
        import torch

        kwargs = dict(
            length=64,
            patch_type="time_series",
            patch_size=16,
            stride=8,
            emb_type="linear",
            emb_dim=32,
            n_heads=4,
            n_layers=2,
            ffn_dim=64,
            pos_emb=True,
            attn_bias=True,
            flash=False,
            causal=False,
            activation="gelu",
            ffn_bias=True,
            norm="batch",
            norm_bias=True,
            norm_eps=1e-5,
            pre_norm=False,
            cls_token=False,
            output_type="forecasting",
            weight_tying=False,
            forecasting_horizon=24,
            dropout=0.0,
        )
        ref_model, _ = make_ref_model(reference_vitef, **kwargs)
        ref_model.train()  # batch statistics
        params = to_jax(ref_model, 2)
        cfg = my_config(**kwargs)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 64)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(x)).numpy()
        # train mode (deterministic=False) = batch statistics
        out = apply_transformer(params, cfg, jnp.asarray(x), deterministic=False)
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5, rtol=1e-3)

        # eval mode = running statistics (updated by the train-mode forward)
        ref_model.eval()
        params_eval = to_jax(ref_model, 2)
        with torch.no_grad():
            ref_eval = ref_model(torch.from_numpy(x)).numpy()
        out_eval = apply_transformer(params_eval, cfg, jnp.asarray(x),
                                     deterministic=True)
        np.testing.assert_allclose(np.asarray(out_eval), ref_eval,
                                   atol=5e-5, rtol=1e-3)

    def test_running_stat_ema_matches_torch_training(self, reference_vitef):
        """Train a 2-layer PatchTST-like model N steps in both frameworks:
        running stats must follow nn.BatchNorm1d EMA (momentum=0.1, unbiased
        batch var) and post-training eval outputs must agree (VERDICT.md
        round-1 gap #3; reference transformer/utils.py:184-230)."""
        import torch

        from vitef_tpu.models.norms import extract_running_stats
        from vitef_tpu.optim import build_optimizer
        from vitef_tpu.parallel import init_train_state, make_train_step

        kwargs = dict(
            length=64, patch_type="time_series", patch_size=16, stride=8,
            emb_type="linear", emb_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
            pos_emb=True, attn_bias=True, flash=False, causal=False,
            activation="gelu", ffn_bias=True, norm="batch", norm_bias=True,
            norm_eps=1e-5, pre_norm=False, cls_token=False,
            output_type="forecasting", weight_tying=False,
            forecasting_horizon=24, dropout=0.0,
        )
        ref_model, _ = make_ref_model(reference_vitef, **kwargs)
        params = to_jax(ref_model, 2)
        cfg = my_config(**kwargs)

        rng = np.random.default_rng(3)
        batches = [
            (rng.normal(size=(8, 64)).astype(np.float32),
             rng.normal(size=(8, 24)).astype(np.float32))
            for _ in range(4)
        ]

        # --- torch training (plain SGD; BN stats update every forward) ---
        ref_model.train()
        opt = torch.optim.SGD(ref_model.parameters(), lr=1e-2)
        for x, y in batches:
            opt.zero_grad()
            pred = ref_model(torch.from_numpy(x))
            loss = torch.nn.functional.mse_loss(pred, torch.from_numpy(y))
            loss.backward()
            opt.step()

        # --- ours ---
        def mse(pred, target):
            return jnp.mean(jnp.square(pred - target))

        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 1e-2, "momentum": 0.0})
        apply_fn = lambda p, xx, **kw: apply_transformer(p, cfg, xx, **kw)
        step_fn = make_train_step(apply_fn, tx, loss_fn=mse, donate=False,
                                  update_stats=True)
        state = init_train_state(params, tx)
        for x, y in batches:
            state, _ = step_fn(state, (jnp.asarray(x), jnp.asarray(y)))

        # running stats bit-close to torch's EMA
        ref_sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
        stats = extract_running_stats(state.params)
        assert set(stats) == {
            "blocks.0.attn_norm", "blocks.0.ffn_norm",
            "blocks.1.attn_norm", "blocks.1.ffn_norm",
        }
        for i in (0, 1):
            for ours_name, ref_name in (
                ("attn_norm", "attn_norm"), ("ffn_norm", "ffn_norm"),
            ):
                site = stats[f"blocks.{i}.{ours_name}"]
                prefix = f"blocks.{i}.{ref_name}.batchnorm"
                np.testing.assert_allclose(
                    np.asarray(site["running_mean"]),
                    ref_sd[f"{prefix}.running_mean"], atol=1e-5, rtol=1e-4,
                    err_msg=f"{prefix}.running_mean")
                np.testing.assert_allclose(
                    np.asarray(site["running_var"]),
                    ref_sd[f"{prefix}.running_var"], atol=1e-5, rtol=1e-4,
                    err_msg=f"{prefix}.running_var")

        # eval outputs after training agree
        ref_model.eval()
        xe = rng.normal(size=(4, 64)).astype(np.float32)
        with torch.no_grad():
            ref_eval = ref_model(torch.from_numpy(xe)).numpy()
        out_eval = apply_transformer(state.params, cfg, jnp.asarray(xe),
                                     deterministic=True)
        np.testing.assert_allclose(np.asarray(out_eval), ref_eval,
                                   atol=1e-4, rtol=1e-3)

    def test_running_stat_ema_grad_acc_chains_per_microbatch(self, reference_vitef):
        """grad_acc_steps=2 must EMA per microbatch forward (like the
        reference's per-microbatch forward passes, train.py:263-274)."""
        import torch

        from vitef_tpu.models.norms import extract_running_stats
        from vitef_tpu.optim import build_optimizer
        from vitef_tpu.parallel import init_train_state, make_train_step

        kwargs = dict(
            length=64, patch_type="time_series", patch_size=16, stride=8,
            emb_type="linear", emb_dim=32, n_heads=4, n_layers=1, ffn_dim=64,
            pos_emb=True, attn_bias=True, flash=False, causal=False,
            activation="gelu", ffn_bias=True, norm="batch", norm_bias=True,
            norm_eps=1e-5, pre_norm=False, cls_token=False,
            output_type="forecasting", weight_tying=False,
            forecasting_horizon=24, dropout=0.0,
        )
        ref_model, _ = make_ref_model(reference_vitef, **kwargs)
        params = to_jax(ref_model, 1)
        cfg = my_config(**kwargs)

        rng = np.random.default_rng(4)
        x = rng.normal(size=(8, 64)).astype(np.float32)  # 2 microbatches of 4
        y = rng.normal(size=(8, 24)).astype(np.float32)

        # torch: two forward/backward microbatches, one optimizer step
        ref_model.train()
        opt = torch.optim.SGD(ref_model.parameters(), lr=1e-2)
        opt.zero_grad()
        for sl in (slice(0, 4), slice(4, 8)):
            pred = ref_model(torch.from_numpy(x[sl]))
            loss = torch.nn.functional.mse_loss(
                pred, torch.from_numpy(y[sl])) / 2
            loss.backward()
        opt.step()

        def mse(pred, target):
            return jnp.mean(jnp.square(pred - target))

        tx, _ = build_optimizer({"optimizer": "sgd", "lr": 1e-2, "momentum": 0.0})
        apply_fn = lambda p, xx, **kw: apply_transformer(p, cfg, xx, **kw)
        step_fn = make_train_step(apply_fn, tx, loss_fn=mse, donate=False,
                                  update_stats=True, grad_acc_steps=2)
        state = init_train_state(params, tx)
        state, _ = step_fn(state, (jnp.asarray(x), jnp.asarray(y)))

        ref_sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
        stats = extract_running_stats(state.params)
        for name in ("attn_norm", "ffn_norm"):
            site = stats[f"blocks.0.{name}"]
            prefix = f"blocks.0.{name}.batchnorm"
            np.testing.assert_allclose(
                np.asarray(site["running_mean"]),
                ref_sd[f"{prefix}.running_mean"], atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(
                np.asarray(site["running_var"]),
                ref_sd[f"{prefix}.running_var"], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
class TestFullSizeViTB:
    """Full-size ViT-B/16@224 fp32 parity vs the torch oracle (VERDICT.md #5;
    SURVEY §4b names the 1e-3 tolerance). Shared random weights; forward
    logits, get_decomposition and get_probes — the paper statistic's whole
    surface at real scale (reference architecture.py:824-911)."""

    KW = dict(
        image_dim=(3, 224, 224), patch_type="computer_vision",
        image_patch="hybrid", patch_size=16, emb_type="linear", emb_dim=768,
        n_heads=12, n_layers=12, ffn_dim=3072, pos_emb=True, emb_dropout=0.0,
        attn_bias=True, attn_dropout=0.0, flash=False, causal=False,
        activation="gelu", ffn_bias=True, ffn_dropout=0.0, norm="layer",
        norm_bias=True, norm_eps=1e-12, pre_norm=True, cls_token=True,
        output_type="classification", weight_tying=False, output_dropout=0.0,
        n_classes=1000,
    )

    def test_full_size_parity(self, reference_vitef):
        import torch

        ref_model, _ = make_ref_model(reference_vitef, **self.KW)
        params = to_jax(ref_model, 12)
        cfg = my_config(**self.KW)
        x = np.random.default_rng(0).normal(size=(2, 3, 224, 224)).astype(np.float32)

        with torch.inference_mode():
            ref_logits = ref_model(torch.from_numpy(x)).numpy()
            ref_dec = {k: v.numpy() for k, v in
                       ref_model.get_decomposition(torch.from_numpy(x)).items()}
            ref_probes = {k: v.numpy() for k, v in
                          ref_model.get_probes(torch.from_numpy(x)).items()}

        xj = jnp.asarray(x)
        logits = np.asarray(apply_transformer(params, cfg, xj))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-3, rtol=1e-3)

        dec = get_decomposition(params, cfg, xj)
        assert set(dec) == set(ref_dec)
        for k in ref_dec:
            np.testing.assert_allclose(np.asarray(dec[k]), ref_dec[k],
                                       atol=1e-3, rtol=1e-3, err_msg=k)

        probes = get_probes(params, cfg, xj)
        assert set(probes) == set(ref_probes)
        for k in ref_probes:
            np.testing.assert_allclose(np.asarray(probes[k]), ref_probes[k],
                                       atol=1e-3, rtol=1e-3, err_msg=k)


def test_gelu_dtype_policy():
    """'gelu' = exact erf in fp32 (torch parity); tanh approx in bf16 with a
    delta below bf16 resolution (the measured v5e VPU win, PERF.md)."""
    import torch

    from vitef_tpu.models.transformer import get_activation

    x32 = np.linspace(-6, 6, 4001, dtype=np.float32)
    ours = np.asarray(get_activation("gelu")(jnp.asarray(x32)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x32)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)

    xb = jnp.asarray(x32, jnp.bfloat16)
    approx = np.asarray(get_activation("gelu")(xb).astype(jnp.float32))
    exact = np.asarray(get_activation("gelu_exact")(xb).astype(jnp.float32))
    # tanh-vs-erf difference stays within a few bf16 ulps of the activation
    assert float(np.max(np.abs(approx - exact))) < 0.04


def test_training_loss_curve_matches_torch(reference_vitef):
    """Full training-loop parity: same init, same fixed fp32 batches, SGD
    momentum + cosine schedule + global-norm clip in both frameworks — the
    loss curves must coincide. This is the strongest offline end-to-end
    gradient check (catches subtle backward/optimizer/schedule bugs that
    single-step parity tests miss)."""
    import torch

    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    kwargs = dict(VIT_LIKE)
    ref_model, _ = make_ref_model(reference_vitef, **kwargs)
    ref_model.train()
    params = to_jax(ref_model, kwargs["n_layers"])
    cfg = my_config(**kwargs)

    n_steps, base_lr, warmup = 12, 0.05, 2
    rng = np.random.default_rng(7)
    batches = [
        (rng.normal(size=(8, 3, 32, 32)).astype(np.float32),
         rng.integers(0, 10, size=(8,)))
        for _ in range(n_steps)
    ]

    # --- torch loop (mirrors reference apps/vit/train.py:243-283) ---
    opt = torch.optim.SGD(ref_model.parameters(), lr=base_lr, momentum=0.9)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda step: min(1.0, (step + 1) / warmup) * 0.5 * (
            1 + np.cos(np.pi * min(1.0, max(step + 1 - warmup, 0)
                                   / max(n_steps - warmup, 1)))))
    torch_losses = []
    for x, y in batches:
        opt.zero_grad()
        logits = ref_model(torch.from_numpy(x))
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(y))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 1.0)
        opt.step()
        sched.step()
        torch_losses.append(float(loss))

    # --- ours: one jitted step ---
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        wu = jnp.minimum(1.0, (s + 1) / warmup)
        prog = jnp.minimum(1.0, jnp.maximum(s + 1 - warmup, 0)
                           / max(n_steps - warmup, 1))
        return wu * 0.5 * (1 + jnp.cos(jnp.pi * prog))

    tx, _ = build_optimizer(
        {"optimizer": "sgd", "lr": base_lr, "momentum": 0.9},
        schedule=schedule, params=params, components=[], grad_clip=1.0,
    )
    step_fn = make_train_step(lambda p, xx, **kw: apply_transformer(
        p, cfg, xx, **kw), tx, donate=False)
    state = init_train_state(params, tx)
    our_losses = []
    for x, y in batches:
        state, m = step_fn(state, (jnp.asarray(x), jnp.asarray(y)))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_training_dynamics_long_horizon(reference_vitef):
    """300-step synthetic finetune vs the torch reference (VERDICT r2 next #7;
    reference flow apps/vit/train.py:243-345): loss curve, periodic eval
    accuracy, and the best-checkpoint step must coincide — with the REAL
    build_scheduler (warmup + cosine decay) on our side and the reference's
    own lr_cosine driving torch LambdaLR. The strongest affordable offline
    stand-in for BASELINE.md accuracy parity: it exercises gradients,
    momentum, clipping, schedule, eval, and best-model selection end-to-end
    over a horizon where systematic errors compound."""
    import torch

    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_eval_step, \
        make_train_step

    ref_optim = __import__("vitef.optim", fromlist=["lr_cosine"])

    kwargs = dict(VIT_LIKE)
    ref_model, _ = make_ref_model(reference_vitef, **kwargs)
    ref_model.train()
    params = to_jax(ref_model, kwargs["n_layers"])
    cfg = my_config(**kwargs)

    n_steps, base_lr, warmup, min_factor = 300, 0.02, 20, 0.01
    eval_period, batch = 25, 16

    # class-separable synthetic data: per-class mean patch + noise
    rng = np.random.default_rng(11)
    class_means = rng.normal(size=(10, 3, 32, 32)).astype(np.float32)

    def make_set(n, seed):
        r = np.random.default_rng(seed)
        y = r.integers(0, 10, size=n)
        x = class_means[y] + 0.7 * r.normal(size=(n, 3, 32, 32)).astype(np.float32)
        return x.astype(np.float32), y

    batches = [make_set(batch, 1000 + i) for i in range(n_steps)]
    eval_x, eval_y = make_set(64, 9)

    # --- torch loop (reference train.py:243-345 incl. best-model policy) ---
    opt = torch.optim.SGD(ref_model.parameters(), lr=base_lr, momentum=0.9)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda e: ref_optim.lr_cosine(e, warmup, min_factor, n_steps))
    t_losses, t_evals = [], {}
    t_best_acc, t_best_step = 0.0, 0
    for i, (x, y) in enumerate(batches):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(
            ref_model(torch.from_numpy(x)), torch.from_numpy(y))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 1.0)
        opt.step()
        sched.step()
        t_losses.append(float(loss))
        if (i + 1) % eval_period == 0:
            ref_model.eval()
            with torch.inference_mode():
                pred = ref_model(torch.from_numpy(eval_x)).argmax(-1).numpy()
            ref_model.train()
            acc = float((pred == eval_y).mean())
            t_evals[i + 1] = acc
            if acc > t_best_acc:
                t_best_acc, t_best_step = acc, i + 1

    # --- ours: the real optimizer/scheduler stack, one jitted step ---
    schedule = build_scheduler(
        {"scheduler": "cosine", "warmup": warmup, "min_factor": min_factor},
        n_steps=n_steps)
    tx, _ = build_optimizer(
        {"optimizer": "sgd", "lr": base_lr, "momentum": 0.9},
        schedule=schedule, params=params, components=[], grad_clip=1.0)
    apply = lambda p, xx, **kw: apply_transformer(p, cfg, xx, **kw)
    step_fn = make_train_step(apply, tx, donate=False)
    eval_fn = make_eval_step(apply)
    state = init_train_state(params, tx)
    o_losses, o_evals = [], {}
    o_best_acc, o_best_step = 0.0, 0
    for i, (x, y) in enumerate(batches):
        state, m = step_fn(state, (jnp.asarray(x), jnp.asarray(y)))
        o_losses.append(float(m["loss"]))
        if (i + 1) % eval_period == 0:
            acc, _ = eval_fn(state.params, (jnp.asarray(eval_x),
                                            jnp.asarray(eval_y)))
            acc = float(acc)
            o_evals[i + 1] = acc
            if acc > o_best_acc:
                o_best_acc, o_best_step = acc, i + 1

    t_losses, o_losses = np.asarray(t_losses), np.asarray(o_losses)
    # early curve: still numerically coincident
    np.testing.assert_allclose(o_losses[:50], t_losses[:50],
                               rtol=5e-3, atol=5e-4)
    # long horizon: fp round-off compounds chaotically, so compare the
    # TRAJECTORY statistically — windowed means within 5%
    for lo in range(0, n_steps, 50):
        tw, ow = t_losses[lo:lo + 50].mean(), o_losses[lo:lo + 50].mean()
        assert abs(ow - tw) / max(tw, 1e-3) < 0.05, (lo, tw, ow)
    # both learned the separable task, and agree on eval trajectory
    assert t_evals[n_steps] > 0.8 and o_evals[n_steps] > 0.8, (t_evals, o_evals)
    for s in t_evals:
        assert abs(o_evals[s] - t_evals[s]) <= 0.08, (s, t_evals[s], o_evals[s])
    # best-model selection agrees (within eval-accuracy ties)
    assert abs(o_best_acc - t_best_acc) <= 0.08
    assert o_best_step == t_best_step or \
        abs(o_evals[t_best_step] - o_best_acc) <= 0.05
