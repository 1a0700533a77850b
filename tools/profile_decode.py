"""Time (and optionally trace) the KV-cache decode loop at serving shapes.

GPT2-small (124M, L=12 E=768 h=12 V=50257), batch 256, prompt 128 + 128 new
tokens — run from the repo root on the real TPU:

    python tools/profile_decode.py [--trace DIR] [--mode all|topk|approx|greedy|cat]

Wall time is synced with a value fetch (axon tunnel: block_until_ready does
not block — CLAUDE.md). One warm run first; the measured run is steady-state.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vitef_tpu.models import build_model

MODES = {
    "topk": dict(temperature=0.8, top_k=40),
    "approx": dict(temperature=0.8, top_k=40, approx_top_k=True),
    "cat": dict(temperature=0.8),
    "greedy": dict(temperature=0.0),
    "greedy_int8": dict(temperature=0.0, kv_cache_dtype="int8"),
    "topk_int8": dict(temperature=0.8, top_k=40, kv_cache_dtype="int8"),
    "topp": dict(temperature=0.8, top_p=0.95),
    "topp_k64": dict(temperature=0.8, top_k=64, top_p=0.95),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all", choices=["all", *MODES])
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = weight-only quantization (models/quantize.py)"
                         " — the lever for low-batch, weight-bandwidth-bound"
                         " decode")
    ap.add_argument("--family", default="gpt2",
                    choices=["gpt2", "llama", "moe"],
                    help="llama = GQA presets (fewer kv heads than q heads:"
                         " the cache — decode's bound — shrinks by the group"
                         " factor at the same parameter scale); moe = the"
                         " sparse-expert family (8x124m | tiny)")
    ap.add_argument("--moe_impl", default="auto",
                    choices=["auto", "dense", "sparse"],
                    help="MoE FFN form at decode: sparse streams only the"
                         " selected experts' weights (the small-batch win)")
    ap.add_argument("--model_name", default="124m",
                    help="llama preset (124m | 1b | tiny); gpt2 is fixed")
    ap.add_argument("--params_dtype", default="keep",
                    choices=["keep", "bf16"],
                    help="bf16 = cast the f32-initialised params once before"
                         " serving (halves resident weight HBM — required to"
                         " fit llama-1b + a big KV cache on one 16G chip)")
    args = ap.parse_args()

    if args.family == "llama":
        m = build_model(dict(
            implementation="llama", model_name=args.model_name,
            pretrained=False,
            seq_len=1024, compute_dtype="bfloat16"), key=jax.random.key(0))
    elif args.family == "moe":
        m = build_model(dict(
            implementation="moe",
            model_name=args.model_name if args.model_name != "124m"
            else "8x124m",
            seq_len=1024, compute_dtype="bfloat16",
            moe_impl=args.moe_impl), key=jax.random.key(0))
    else:
        m = build_model(dict(
            implementation="transformer", vocab_size=50257, emb_type="dict",
            emb_dim=768, n_heads=12, n_layers=12, seq_len=1024, causal=True,
            pre_norm=True, weight_tying=True,
            output_type="sequence_to_sequence",
            attn_bias=True, ffn_bias=True, norm_bias=True,
            compute_dtype="bfloat16"), key=jax.random.key(0))
    prompt = np.random.default_rng(0).integers(
        0, m.config.vocab_size, size=(args.batch, args.prompt))
    prompt = jax.numpy.asarray(prompt, jax.numpy.int32)

    params = m.params
    if args.params_dtype == "bf16":
        params = jax.tree.map(
            lambda x: x.astype(jax.numpy.bfloat16)
            if x.dtype == jax.numpy.float32 else x, params)
        jax.block_until_ready(params)
    if args.weights == "int8":
        params = jax.jit(m.quantize_int8)(params)
        jax.block_until_ready(params)

    modes = list(MODES) if args.mode == "all" else [args.mode]
    for name in modes:
        kw = MODES[name]
        out = m.generate(params, prompt, args.new, rng=jax.random.key(1), **kw)
        np.asarray(out)  # warm + sync
        if args.trace:
            jax.profiler.start_trace(args.trace)
        t0 = time.perf_counter()
        out = m.generate(params, prompt, args.new, rng=jax.random.key(2), **kw)
        np.asarray(out)
        dt = time.perf_counter() - t0
        if args.trace:
            jax.profiler.stop_trace()
        ms = dt * 1000 / args.new
        print(f"{name:8s} {dt*1000:8.1f} ms total  {ms:6.2f} ms/token-step  "
              f"{args.batch / ms * 1000:9.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
