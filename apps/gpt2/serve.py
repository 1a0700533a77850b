"""GPT-2 continuous-batching server CLI.

Batch-offline serving over a request file: a fixed pool of KV-cache slots,
requests admitted the moment a slot frees (vitef_tpu.models.serving) — the
production decode pattern for mixed prompt/output lengths, where
batch-synchronous ``generate()`` would stall every sequence on the wave's
longest request. (The reference has no serving stack at all; see
apps/gpt2/sample.py for the single-request CLI.)

    python -m apps.gpt2.serve run --requests requests.jsonl --n_slots 8
    python -m apps.gpt2.serve run --demo 16 --n_slots 4   # synthetic stream

``requests.jsonl``: one request per line —
    {"token_ids": [464, 3280, ...], "max_new_tokens": 32}
(or {"prompt": "..."} when the GPT-2 tokenizer cache is available). Results
stream to stdout as jsonl: {"id": i, "tokens": [...], "text": "..."?}.

Zero-egress note: text prompts/decodes need the HF tokenizer cache and real
continuations need cached pretrained weights; --demo with token ids runs
fully offline (random weights).
"""

from __future__ import annotations

import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.models import build_model
from vitef_tpu.models.generation import generate
from vitef_tpu.models.serving import DecodeServer, Request
from vitef_tpu.utils.cli import make_cli

logger = logging.getLogger(__name__)

# Above this dispatch round-trip the per-window host syncs of continuous
# batching dominate its tick savings (a decode tick is ~1 ms of device time;
# PERF.md "Continuous batching": at ~25 ms RTT wave mode wins wall clock
# 5-28x despite doing ~33% MORE device work). Co-located hosts measure well
# under this.
RTT_WAVE_THRESHOLD_MS = 2.0


def measure_dispatch_rtt(reps: int = 10) -> float:
    """Median host->device->host round-trip of a trivial jitted op, in ms.

    The VALUE fetch is the synchronization point (jax.block_until_ready does
    not block over the axon tunnel — CLAUDE.md); a trivial op makes device
    time negligible, so this measures the dispatch+fetch link itself.
    """
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.int32)
    int(f(x))  # compile + warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = f(x)
        x = jnp.asarray(int(x))  # value fetch = real sync
        samples.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(samples))


def _serve_waves(model, reqs: list[Request], n_slots: int, temperature: float,
                 top_k, top_p, eos_id, seed: int) -> None:
    """Wave batching: FIFO groups of ``n_slots`` through ragged-batch
    ``generate()`` (left-padded prompts + key mask — per-request outputs are
    exactly the unpadded single-sample generation; tested in
    tests/test_generation.py). ONE host round-trip per wave instead of one
    per window: the high-RTT operating point."""
    for start in range(0, len(reqs), n_slots):
        wave = reqs[start:start + n_slots]
        plens = [len(w.prompt) for w in wave]
        p = max(plens)
        max_new = max(w.max_new_tokens for w in wave)
        prompt = np.zeros((len(wave), p), np.int32)
        mask = np.zeros((len(wave), p), bool)
        for i, w in enumerate(wave):
            prompt[i, p - plens[i]:] = w.prompt
            mask[i, p - plens[i]:] = True
        out = np.asarray(generate(
            model.params, model.config, jnp.asarray(prompt), max_new,
            temperature=temperature, top_k=top_k, top_p=top_p,
            prompt_mask=jnp.asarray(mask), eos_token_id=eos_id,
            rng=jax.random.key(seed + start)))
        for i, w in enumerate(wave):
            toks = [int(t) for t in out[i][:w.max_new_tokens]]
            if eos_id is not None and eos_id in toks:
                toks = toks[:toks.index(eos_id) + 1]
            w.tokens = toks
            w.done = True


def _load_requests(path: str | None, demo: int, tokenizer, vocab: int,
                   max_new_tokens: int):
    if path is not None:
        reqs = []
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if "token_ids" in rec:
                    ids = [int(t) for t in rec["token_ids"]]
                elif "prompt" in rec:
                    if tokenizer is None:
                        raise SystemExit(
                            "text prompts need the GPT-2 tokenizer cache; "
                            "use token_ids")
                    ids = tokenizer.encode(rec["prompt"])
                else:
                    raise SystemExit(f"bad request line: {line!r}")
                reqs.append(Request(
                    prompt=ids,
                    max_new_tokens=int(rec.get("max_new_tokens",
                                               max_new_tokens))))
        return reqs
    rng = np.random.default_rng(0)
    return [
        Request(prompt=rng.integers(0, vocab,
                                    size=(int(rng.integers(8, 64)),)).tolist(),
                max_new_tokens=int(rng.integers(8, max_new_tokens + 1)))
        for _ in range(demo)
    ]


def run(requests: str | None = None, demo: int = 0, model_name: str = "base",
        n_slots: int = 8, max_len: int = 512, max_new_tokens: int = 64,
        temperature: float = 0.0, top_k: int | None = None,
        top_p: float | None = None, eos: bool = True, bucket: int = 64,
        pretrained: bool = True, seed: int = 0,
        compute_dtype: str = "bfloat16", quantize: str | None = None,
        prefix: str | None = None, implementation: str = "gpt2",
        mode: str = "auto"):
    """Serve a request file (or --demo N synthetic requests) and print jsonl
    results in input order as requests complete.

    ``--mode``: ``continuous`` (slot server), ``wave`` (FIFO generate()
    batches), or ``auto`` (default) — measure the dispatch round-trip at
    startup and pick: continuous batching saves 25-29% of device ticks but
    pays ~2 host syncs per ``bucket``-tick window, so over a high-latency
    dispatch link (e.g. a remote TPU tunnel at ~25 ms RTT) wave mode wins
    wall clock 5-28x despite the extra device work (PERF.md "Continuous
    batching"). The decision and the measured RTT are logged. Greedy wave
    outputs are token-for-token the continuous server's.

    ``--quantize int8``: weight-only int8 params (models/quantize.py) — half
    the weight HBM traffic of the decode step. ``--prefix``: comma-separated
    token ids of a shared system prompt, prefilled once and prefix-cached
    into every admission (``DecodeServer.register_prefix``; forces
    continuous mode — wave generate() has no prefix store).
    ``--implementation llama --model_name 1b``: serve the llama GQA family
    (token-id mode; its 2-4x smaller KV cache is decode's bound).
    ``--implementation moe --model_name 8x124m``: serve the sparse-expert
    family (token-id mode; single-chip decode evaluates experts densely —
    exact routing semantics, models/moe.py)."""
    if (requests is None) == (demo == 0):
        raise SystemExit("pass exactly one of --requests or --demo N")
    build_args = dict(
        implementation=implementation, model_name=model_name,
        compute_dtype=compute_dtype)
    if implementation != "moe":  # moe ships no pretrained-checkpoint map
        build_args["pretrained"] = pretrained
    if implementation in ("llama", "moe"):
        build_args["seq_len"] = max_len  # cap the rope/cache length
    model = build_model(build_args, key=jax.random.key(seed))
    if quantize is not None:
        if quantize != "int8":
            raise SystemExit(f"--quantize must be int8, got {quantize!r}")
        model.params = jax.jit(model.quantize_int8)(model.params)

    tokenizer = None
    if implementation == "gpt2":
        try:
            from vitef_tpu.models.gpt2 import get_tokenizer

            tokenizer = get_tokenizer()
        except Exception:  # zero-egress: token-id mode only
            pass

    reqs = _load_requests(requests, demo, tokenizer, model.config.vocab_size,
                          max_new_tokens)
    # 50256 is GPT-2's <|endoftext|>; other families pass ids explicitly
    eos_id = (50256 if eos and implementation == "gpt2"
              and model.config.vocab_size > 50256 else None)

    if mode not in ("auto", "continuous", "wave"):
        raise SystemExit(f"--mode must be auto|continuous|wave, got {mode!r}")
    if mode == "auto":
        if prefix is not None:
            mode = "continuous"
            logger.info("serving mode: continuous (--prefix requires the "
                        "slot server's prefix store)")
        else:
            rtt = measure_dispatch_rtt()
            mode = "wave" if rtt > RTT_WAVE_THRESHOLD_MS else "continuous"
            logger.info(
                "serving mode: %s (measured dispatch RTT %.2f ms %s "
                "threshold %.1f ms — %s)", mode, rtt,
                ">" if rtt > RTT_WAVE_THRESHOLD_MS else "<=",
                RTT_WAVE_THRESHOLD_MS,
                "per-window host syncs would dominate continuous batching's "
                "tick savings" if mode == "wave" else
                "continuous batching's 25-29% device-tick savings win")
    if mode == "wave" and prefix is not None:
        raise SystemExit("--mode wave does not support --prefix "
                         "(use continuous)")

    t0 = time.perf_counter()
    if mode == "wave":
        _serve_waves(model, reqs, n_slots, temperature, top_k, top_p,
                     eos_id, seed)
        ticks_note = "wave"
    else:
        srv = DecodeServer(
            model.params, model.config, n_slots=n_slots, max_len=max_len,
            temperature=temperature, top_k=top_k, top_p=top_p,
            eos_token_id=eos_id, bucket=bucket, rng=jax.random.key(seed))
        if prefix is not None:
            # the CLI may hand us "3,1,4" (string) or a parsed sequence
            if isinstance(prefix, (tuple, list)):
                ids = [int(t) for t in prefix]
            else:
                ids = [int(t) for t in str(prefix).split(",") if t != ""]
            h = srv.register_prefix(ids)
            for req in reqs:
                req.prefix = h
        srv.serve(reqs)
        ticks_note = f"{srv.steps} ticks"
    dt = time.perf_counter() - t0
    total = 0
    for i, req in enumerate(reqs):
        rec = {"id": i, "tokens": req.tokens}
        if tokenizer is not None:
            rec["text"] = tokenizer.decode(req.tokens)
        total += len(req.tokens)
        print(json.dumps(rec))
    logger.info("served %d requests / %d tokens in %.1fs (%.0f tok/s, "
                "%s mode, %s x %d slots)", len(reqs), total, dt, total / dt,
                mode, ticks_note, n_slots)


def main() -> None:
    """``python -m apps.gpt2.serve run --requests file.jsonl [--flags]``."""
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    make_cli({"run": run})


if __name__ == "__main__":
    main()
