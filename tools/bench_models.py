"""Train-step throughput sweep across model families/sizes on the real TPU.

Extends bench.py's headline (ViT-B/16) with ViT-Large, ViT-Huge and a
GPT2-small causal-LM step, each against its own analytic bf16 roofline.
Run from the repo root:  python tools/bench_models.py [vit_base vit_large ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import detect_peak

WARMUP, STEPS = 3, 10


def vit_flops(emb, layers, tokens, patch, image=224, chans=3):
    per_layer = 12 * emb * emb + 2 * tokens * emb  # matmul + attention MACs/token
    patchify = patch * patch * chans * emb
    return 2 * tokens * (layers * per_layer + patchify)  # fwd FLOPs/img


def gpt2_flops(emb=768, layers=12, seq=1024, vocab=50257):
    per_tok = layers * (12 * emb * emb + 2 * (seq // 2) * emb) + emb * vocab
    return 2 * seq * per_tok  # fwd FLOPs per sequence


def bench_vit(name, batch, remat=False):
    from vitef_tpu.models import build_model
    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    patch = 14 if name == "huge" else 16
    model = build_model(dict(
        implementation="vit", model_name=name, patch_size=patch,
        image_dim=(3, 224, 224), pretrained=False, finetuning=True,
        n_classes=10, compute_dtype="bfloat16", remat=remat),
        key=jax.random.key(0))
    cfg = model.config
    tokens = (224 // patch) ** 2 + 1
    fwd = vit_flops(cfg.emb_dim, cfg.n_layers, tokens, patch)

    schedule = build_scheduler({"scheduler": "cosine", "warmup": 100}, n_steps=1000)
    tx, _ = build_optimizer({"optimizer": "sgd", "lr": 0.01, "momentum": 0.9},
                            schedule=schedule, grad_clip=1.0)
    step_fn = make_train_step(model.apply, tx, schedule=schedule, base_lr=0.01)
    state = init_train_state(model.params, tx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 3, 224, 224)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 10, size=(batch,)), jnp.int32)

    for _ in range(WARMUP):
        state, m = step_fn(state, (x, y))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, (x, y))
    float(m["loss"])
    dt = time.perf_counter() - t0

    ips = batch * STEPS / dt
    roof = detect_peak() / (3 * fwd)
    print(json.dumps({
        "metric": f"vit_{name}_train_throughput", "value": round(ips, 1),
        "unit": "images/sec/chip", "batch": batch,
        "ms_per_step": round(dt / STEPS * 1000, 1),
        "vs_roofline": round(ips / roof, 4)}), flush=True)


def bench_gpt2(batch=8, size="base"):
    from vitef_tpu.models import build_model
    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    model = build_model(dict(
        implementation="gpt2", model_name=size, pretrained=False,
        compute_dtype="bfloat16"), key=jax.random.key(0))
    seq = model.config.seq_len

    # Fused head+CE (ops/losses.fused_next_token_ce): the vocab matmul runs
    # inside the chunked loss — no (N, L, V) logits OR dlogits tensor in the
    # step. History: materialized log_softmax 278 ms/step @B=32 →
    # logsumexp-gather 229 (+22%) → fused head 219 (+4.6%), and batch 64
    # (which OOM'd even on the gather form) compiles and runs.
    from vitef_tpu.ops import make_fused_head_loss

    schedule = build_scheduler({"scheduler": "cosine", "warmup": 100}, n_steps=1000)
    tx, _ = build_optimizer({"optimizer": "adamw", "lr": 3e-4},
                            schedule=schedule, grad_clip=1.0)
    step_fn = make_train_step(model.apply, tx,
                              hidden_loss=make_fused_head_loss(model.config),
                              schedule=schedule, base_lr=3e-4)
    state = init_train_state(model.params, tx)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 50257, size=(batch, seq)), jnp.int32)

    for _ in range(WARMUP):
        state, m = step_fn(state, (toks, toks))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, (toks, toks))
    float(m["loss"])
    dt = time.perf_counter() - t0

    tps = batch * seq * STEPS / dt
    cfg = model.config
    roof = detect_peak() / (3 * gpt2_flops(cfg.emb_dim, cfg.n_layers, seq) / seq)
    print(json.dumps({
        "metric": f"gpt2_{size}_train_throughput", "value": round(tps, 0),
        "unit": "tokens/sec/chip", "batch": batch, "seq": seq,
        "ms_per_step": round(dt / STEPS * 1000, 1),
        "vs_roofline": round(tps / roof, 4)}), flush=True)


def llama_flops(emb, layers, seq, vocab, ffn, kv_dim):
    """fwd FLOPs per sequence: qkv (asymmetric GQA) + out + swiglu (3 matmuls)
    + causal-useful attention + untied head."""
    per_tok = layers * (emb * (emb + 2 * kv_dim) + emb * emb + 3 * emb * ffn
                        + 2 * (seq // 2) * emb) + emb * vocab
    return 2 * seq * per_tok


def bench_llama(batch=16, size="124m", implementation="llama",
                moe_impl="auto"):
    from vitef_tpu.models import build_model
    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    build_args = dict(
        implementation=implementation, model_name=size,
        seq_len=1024, compute_dtype="bfloat16")
    if implementation == "llama":
        build_args["pretrained"] = False
    if implementation == "moe":
        build_args["moe_impl"] = moe_impl
    model = build_model(build_args, key=jax.random.key(0))
    cfg = model.config
    seq = cfg.seq_len

    from vitef_tpu.ops import make_fused_head_loss

    schedule = build_scheduler({"scheduler": "cosine", "warmup": 100}, n_steps=1000)
    tx, _ = build_optimizer({"optimizer": "adamw", "lr": 3e-4},
                            schedule=schedule, grad_clip=1.0)
    step_fn = make_train_step(model.apply, tx,
                              hidden_loss=make_fused_head_loss(cfg),
                              schedule=schedule, base_lr=3e-4)
    state = init_train_state(model.params, tx)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)),
                       jnp.int32)

    for _ in range(WARMUP):
        state, m = step_fn(state, (toks, toks))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, (toks, toks))
    float(m["loss"])
    dt = time.perf_counter() - t0

    tps = batch * seq * STEPS / dt
    # MoE: the roofline counts ACTIVATED FLOPs (top_k of n_experts expert
    # FFNs per token): what the sparse dispatch actually executes, and what
    # the dense all-experts form pays n_experts/top_k x for.
    ffn_eff = cfg.ffn_dim * (cfg.moe_top_k if cfg.n_experts else 1)
    roof = detect_peak() / (3 * llama_flops(
        cfg.emb_dim, cfg.n_layers, seq, cfg.vocab_size, ffn_eff,
        cfg.kv_dim) / seq)
    out = {
        "metric": f"{implementation}_{size}_train_throughput",
        "value": round(tps, 0),
        "unit": "tokens/sec/chip", "batch": batch, "seq": seq,
        "ms_per_step": round(dt / STEPS * 1000, 1),
        "vs_roofline": round(tps / roof, 4)}
    if cfg.n_experts:
        from vitef_tpu.parallel import resolve_moe_impl

        out["moe_impl"] = resolve_moe_impl(
            cfg, model.params["blocks"][0]["ffn"], batch * seq)
        if out["moe_impl"] == "dense":
            out["dense_eval_expert_overhead"] = round(
                cfg.n_experts / cfg.moe_top_k, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["vit_base", "vit_large", "vit_huge", "gpt2"]
    if "vit_base" in which:
        bench_vit("base", 256)
    if "vit_large" in which:
        bench_vit("large", 128)
    if "vit_huge" in which:
        bench_vit("huge", 32)  # fits without remat; remat@64 measured 17% slower
    if "gpt2" in which:
        # best batch with the fused head+CE loss: 64 (61.6%) > 32 (60.8%) >
        # 16 (58.0%). Before the fused loss, 64 did not even compile (XLA's
        # 2x 6.1G bf16 logit remat copies) and 16 was the best fit.
        bench_gpt2(batch=64)
    if "gpt2_medium" in which:
        bench_gpt2(batch=16, size="medium")  # 62.9% vs 61.2% at batch 8
    if "gpt2_large" in which:
        bench_gpt2(batch=4, size="large")  # largest single-chip AdamW fit
    if "llama" in which:
        bench_llama(batch=16)  # 124m GQA/rope/swiglu preset at L=1024
    if "moe" in which:
        # Mixtral-style 8-expert top-2 on the llama-124m backbone through
        # the sorted dropless sparse dispatch (megablox grouped matmul —
        # activated FLOPs only, parallel/moe.apply_moe_ffn_sparse).
        bench_llama(batch=8, size="8x124m", implementation="moe")
    if "moe_b16" in which:
        bench_llama(batch=16, size="8x124m", implementation="moe")
    if "moe_dense" in which:
        # the gate-masked all-experts form (n_experts/top_k x the activated
        # FLOPs) — the pre-sparse-dispatch operating point, kept for A/B.
        bench_llama(batch=8, size="8x124m", implementation="moe",
                    moe_impl="dense")
    if "llama_1b" in which:
        # Llama-3.2-1B AdamW training does NOT fit one 16G v5e chip: the
        # f32 param+m+v state alone is ~18G (measured compile OOM: 24.25G
        # requested vs 15.75G — PERF.md "Llama family"). Training 1b+ is a
        # multi-chip FSDP job (parallel/mesh.py); the single-chip 1b story
        # is SERVING: tools/profile_decode.py --family llama
        # --model_name 1b --params_dtype bf16.
        bench_llama(batch=4, size="1b")
