"""GPT-2 text generation CLI — the serving entry point.

The reference has no generation app at all (its GPT2 exists only as a
trainable architecture, SURVEY §5.7); this CLI exposes vitef_tpu's serving
stack end-to-end: KV-cache generate() with greedy/temperature/top-k/top-p
sampling, EOS stop, optional int8 KV cache, and optional speculative
decoding with a smaller GPT-2 as the draft.

    python -m apps.gpt2.sample run --prompt "The meaning of life" --max_new_tokens 40
    python -m apps.gpt2.sample run --token_ids "[464, 3280, 318]" --top_k 40 --temperature 0.8
    python -m apps.gpt2.sample run --prompt "..." --draft_model_name base --model_name medium

Zero-egress note: text prompts need the GPT-2 tokenizer files (HF cache) and
real continuations need cached pretrained weights (`checkpoints/gpt2/*.npz`);
absent those, pass --token_ids and expect random-weight output (the pipeline
itself — tokenize → prefill → decode → detokenize — is exercised either way).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from vitef_tpu.models import build_model
from vitef_tpu.utils.cli import make_cli

logger = logging.getLogger(__name__)


def run(prompt: str | None = None, token_ids: list | None = None,
        model_name: str = "base", max_new_tokens: int = 32,
        temperature: float = 0.8, top_k: int | None = None,
        top_p: float | None = None, eos: bool = True,
        kv_cache_dtype: str | None = None, draft_model_name: str | None = None,
        gamma: int = 4, pretrained: bool = True, seed: int = 0,
        compute_dtype: str = "bfloat16"):
    """Generate a continuation; prints token ids (and text when decodable).

    ``top_k`` defaults to 40 in plain mode (``--top_k 0`` disables top-k);
    the default is resolved AFTER the speculative/plain branch so that any
    explicitly passed sampling flag the speculative path would silently
    ignore is refused instead."""
    if (prompt is None) == (token_ids is None):
        raise SystemExit("pass exactly one of --prompt or --token_ids")

    model = build_model(dict(
        implementation="gpt2", model_name=model_name, pretrained=pretrained,
        compute_dtype=compute_dtype), key=jax.random.key(seed))

    tokenizer = None
    if prompt is not None:
        from vitef_tpu.models.gpt2 import get_tokenizer

        try:
            tokenizer = get_tokenizer()
        except Exception as e:  # zero-egress: no cached tokenizer files
            raise SystemExit(
                f"tokenizer unavailable ({e}); pass --token_ids instead")
        token_ids = tokenizer.encode(prompt)
    ids = jnp.asarray([list(map(int, token_ids))], jnp.int32)
    eos_id = 50256 if eos else None

    if draft_model_name is not None:
        # the speculative path supports temperature only — refuse flags it
        # would silently ignore rather than sample differently than asked
        # (None = not passed; the plain-mode top_k default resolves below)
        ignored = [name for name, val in (
            ("top_k", top_k), ("top_p", top_p),
            ("kv_cache_dtype", kv_cache_dtype)) if val is not None]
        if ignored:
            raise SystemExit(
                f"--draft_model_name (speculative) does not support "
                f"{', '.join(ignored)}; it samples with temperature only")
        logger.info("speculative mode: temperature-only sampling "
                    "(the default top_k does not apply)")
        draft = build_model(dict(
            implementation="gpt2", model_name=draft_model_name,
            pretrained=pretrained, compute_dtype=compute_dtype),
            key=jax.random.key(seed + 1))
        out, stats = model.generate_speculative(
            model.params, ids, max_new_tokens, draft=draft, gamma=gamma,
            temperature=temperature, rng=jax.random.key(seed),
            return_stats=True)
        logger.info("speculative: %d rounds, accepted %d/%d drafted",
                    int(stats["rounds"]), int(stats["accepted"]),
                    int(stats["drafted"]))
    else:
        top_k = 40 if top_k is None else (top_k if top_k > 0 else None)
        out = model.generate(
            model.params, ids, max_new_tokens, temperature=temperature,
            top_k=top_k, top_p=top_p, eos_token_id=eos_id,
            kv_cache_dtype=kv_cache_dtype, rng=jax.random.key(seed))

    new_ids = [int(t) for t in out[0]]
    if eos_id is not None and eos_id in new_ids:
        new_ids = new_ids[:new_ids.index(eos_id)]
    print({"prompt_ids": [int(t) for t in ids[0]], "new_ids": new_ids})
    if tokenizer is not None:
        print(tokenizer.decode([int(t) for t in ids[0]] + new_ids))
    return new_ids


def main() -> None:
    """``python -m apps.gpt2.sample run --prompt '...' [--flags]``."""
    make_cli({"run": run})


if __name__ == "__main__":
    main()
