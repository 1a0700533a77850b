"""Batch-1 decode latency: plain generate() vs speculative decoding.

GPT2-small target; draft = 2-layer same-width decoder (what a distilled
draft would look like; random weights here, so the ACCEPTANCE is what a
worst-case draft gives — the self-draft row shows the perfect-acceptance
mechanical upper bound). Run from the repo root on the real TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.models import build_model, generate_speculative


def gpt2ish(layers, seed):
    return build_model(dict(
        implementation="transformer", vocab_size=50257, emb_type="dict",
        emb_dim=768, n_heads=12, n_layers=layers, seq_len=1024, causal=True,
        pre_norm=True, weight_tying=True, output_type="sequence_to_sequence",
        attn_bias=True, ffn_bias=True, norm_bias=True,
        compute_dtype="bfloat16"), key=jax.random.key(seed))


def load_trained_pair(target, draft):
    """Load the distilled (target, draft) pair built by
    tools/distill_spec_pair.py — the NON-degenerate measurement (real
    partial acceptance instead of the random-weight ~100% artifact)."""
    from vitef_tpu.config import MODEL_DIR
    from vitef_tpu.monitor.checkpoint import _unflatten_like

    pair_dir = MODEL_DIR / "spec_pair"
    for model, name in ((target, "target"), (draft, "draft")):
        with np.load(pair_dir / f"{name}.npz") as z:
            flat = {k: z[k] for k in z.files}
        model.params = jax.device_put(_unflatten_like(model.params, flat))
    return target, draft


def main():
    prompt_len, new = 64, 128
    target = gpt2ish(12, 0)
    draft = gpt2ish(2, 7)
    if "--trained" in sys.argv:
        target, draft = load_trained_pair(target, draft)
        print("using distilled target/draft pair (tools/distill_spec_pair.py)")
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, 2048 if "--trained" in sys.argv else 50257,
        size=(1, prompt_len)), jnp.int32)

    if "--int8" in sys.argv:
        # weight-only int8 (models/quantize.py): batch-1 decode streams the
        # full parameter set per token — half the bytes, straight latency win
        target.params = jax.jit(target.quantize_int8)(target.params)
        draft.params = jax.jit(draft.quantize_int8)(draft.params)
        jax.block_until_ready((target.params, draft.params))
        print("int8 weight-only quantized target+draft")

    out = target.generate(target.params, prompt, new, temperature=0.0)
    np.asarray(out)
    t0 = time.perf_counter()
    out = target.generate(target.params, prompt, new, temperature=0.0)
    np.asarray(out)
    base = time.perf_counter() - t0
    print(f"plain greedy      {base*1000:7.1f} ms  {new/base:6.1f} tok/s", flush=True)

    # Plain SAMPLED baseline (the honest comparison point for sampled spec).
    plain = target.generate(target.params, prompt, new, temperature=0.8,
                            rng=jax.random.key(1))
    np.asarray(plain)
    t0 = time.perf_counter()
    plain = target.generate(target.params, prompt, new, temperature=0.8,
                            rng=jax.random.key(2))
    np.asarray(plain)
    base_s = time.perf_counter() - t0
    print(f"plain T=0.8       {base_s*1000:7.1f} ms  {new/base_s:6.1f} tok/s",
          flush=True)

    configs = [("draft-2L g=4", draft, 0.0, 4), ("self-draft g=4", target, 0.0, 4)]
    for gamma in (2, 3, 4, 6):
        configs.append((f"draft-2L T=0.8 g={gamma}", draft, 0.8, gamma))
    for name, dr, temp, gamma in configs:
        got, stats = target.generate_speculative(
            target.params, prompt, new, draft=dr, gamma=gamma, temperature=temp,
            rng=jax.random.key(1), return_stats=True)
        np.asarray(got)
        t0 = time.perf_counter()
        got, stats = target.generate_speculative(
            target.params, prompt, new, draft=dr, gamma=gamma, temperature=temp,
            rng=jax.random.key(2), return_stats=True)
        np.asarray(got)
        dt = time.perf_counter() - t0
        r, acc, drf = (int(stats[k]) for k in ("rounds", "accepted", "drafted"))
        same = bool(np.array_equal(np.asarray(got), np.asarray(out)))
        print(f"speculative {name:20s} {dt*1000:7.1f} ms  {new/dt:6.1f} tok/s  "
              f"rounds={r} accept={acc}/{drf} alpha={acc/max(drf,1):.2f}  "
              f"greedy-equal={same}", flush=True)


if __name__ == "__main__":
    main()
