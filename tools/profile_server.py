"""Continuous batching vs static wave batching on the real TPU.

Workload: a seeded stream of requests with mixed prompt/output lengths —
the regime continuous batching exists for (static waves stall every slot on
the wave's longest request). Two comparators over the same requests:

  - **waves**: batch-synchronous ``generate()`` in groups of ``n_slots``
    (prompts left-padded to the wave max, every sequence decodes the wave's
    max max_new ticks, outputs truncated per request) — the reference serving
    pattern our batch-synchronous path supports.
  - **continuous**: ``DecodeServer`` with ``n_slots`` cache rows.

Reports wall-clock tok/s and the hardware-independent slot-tick utilisation
(useful tokens / (ticks * slots)). NB over the axon tunnel the continuous
server pays ~2 host round-trips per tick (step dispatch + token harvest for
EOS/eviction), a fixed ~5 ms/tick latency tax that a co-located host
amortises — utilisation is the portable number.

Run from the repo root: python tools/profile_server.py [n_slots] [n_requests]

``--prefix P``: every request additionally shares a P-token system prompt.
Adds a third comparator — the DecodeServer with the prefix REGISTERED
(``register_prefix``: prefill once, copy K/V per admission) vs the same
server re-prefilling [prefix ++ prompt] per admission — and checks the
outputs are token-for-token equal.

``--spec [gamma]``: speculative continuous batching — the same workload
through a DecodeServer with a 2-layer draft (``--trained`` loads the
distilled pair from tools/distill_spec_pair.py for real partial acceptance;
random weights otherwise = the degenerate ~100%-acceptance ceiling).
Asserts spec outputs == plain server outputs, reports tokens/round and the
dispatch counts that set the tunnel wall clock.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.models import build_model
from vitef_tpu.models.generation import generate
from vitef_tpu.models.serving import DecodeServer, Request

PREFIX = 0
if "--prefix" in sys.argv:
    i = sys.argv.index("--prefix")
    PREFIX = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]
SPEC = 0
if "--spec" in sys.argv:
    i = sys.argv.index("--spec")
    if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit():
        SPEC = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    else:
        SPEC = 4
        del sys.argv[i]
TRAINED = "--trained" in sys.argv
if TRAINED:
    sys.argv.remove("--trained")
N_SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_REQ = int(sys.argv[2]) if len(sys.argv) > 2 else 32
WINDOW = int(sys.argv[3]) if len(sys.argv) > 3 else 8
MAX_LEN = 256 + PREFIX

PREFIX_TOKENS = np.random.default_rng(99).integers(
    0, 50257, size=(PREFIX,)).tolist()
# --trained pairs were distilled on a 2048-token Markov support; prompts
# outside it give meaningless acceptance (profile_speculative.py does the same)
DRAW = 2048 if TRAINED else 50257


def make_requests(seed=0, shared_prefix=None, concat=False):
    """``shared_prefix``: handle — own prompts only, admitted via the prefix
    cache. ``concat=True``: [prefix ++ prompt] baked into every prompt (the
    no-prefix-cache baseline of the same workload)."""
    rng = np.random.default_rng(seed)
    reqs = []
    for _ in range(N_REQ):
        plen = int(rng.integers(16, 121))
        mnew = int(rng.integers(16, 97))
        prompt = rng.integers(0, DRAW, size=(plen,)).tolist()
        reqs.append(Request(
            prompt=PREFIX_TOKENS + prompt if concat else prompt,
            prefix=shared_prefix, max_new_tokens=mnew))
    return reqs


_wave_cache = {}


def _wave_fn(cfg, mmax):
    """Jitted wave generate, cached per (bucketed) max_new (prompt shapes key
    the jit cache internally)."""
    if mmax not in _wave_cache:
        _wave_cache[mmax] = jax.jit(
            lambda pm, pr, mk: generate(pm, cfg, pr, mmax, temperature=0.0,
                                        prompt_mask=mk))
    return _wave_cache[mmax]


def run_waves(params, cfg, requests):
    """Static batching: pad each wave to its (bucketed) max prompt length,
    decode the wave's (bucketed) max max_new ticks, truncate per request.
    Buckets of 64/32 bound the jit cache exactly like the server's admission
    buckets."""
    t0 = time.perf_counter()
    ticks = 0
    outs = []
    for i in range(0, len(requests), N_SLOTS):
        wave = requests[i:i + N_SLOTS]
        pmax = -(-max(len(r.prompt) for r in wave) // 64) * 64
        mmax = -(-max(r.max_new_tokens for r in wave) // 32) * 32
        prompts = np.zeros((N_SLOTS, pmax), np.int32)
        mask = np.zeros((N_SLOTS, pmax), bool)
        for j, r in enumerate(wave):  # left-pad (serving convention)
            prompts[j, pmax - len(r.prompt):] = r.prompt
            mask[j, pmax - len(r.prompt):] = True
        mask[len(wave):, -1] = True  # ragged rows need >= 1 real token
        toks = _wave_fn(cfg, mmax)(params, jnp.asarray(prompts),
                                   jnp.asarray(mask))
        toks = np.asarray(toks)  # value fetch = tunnel-safe sync
        ticks += mmax
        for j, r in enumerate(wave):
            outs.append(toks[j, :r.max_new_tokens].tolist())
    return outs, time.perf_counter() - t0, ticks


_srv = None


def run_continuous(params, cfg, requests):
    global _srv
    if _srv is None:
        _srv = DecodeServer(params, cfg, n_slots=N_SLOTS, max_len=MAX_LEN,
                            bucket=64, harvest_every=WINDOW)
    _srv.reset()
    t0 = time.perf_counter()
    _srv.serve(requests)
    return [r.tokens for r in requests], time.perf_counter() - t0, _srv.steps


def gpt2ish(layers, seed):
    """GPT2-small-shaped decoder (the distill_spec_pair.py construction)."""
    return build_model(dict(
        implementation="transformer", vocab_size=50257, emb_type="dict",
        emb_dim=768, n_heads=12, n_layers=layers, seq_len=1024, causal=True,
        pre_norm=True, weight_tying=True, output_type="sequence_to_sequence",
        attn_bias=True, ffn_bias=True, norm_bias=True,
        compute_dtype="bfloat16"), key=jax.random.key(seed))


_spec_srv = None


def run_spec(params, cfg, dparams, dcfg, requests):
    global _spec_srv
    if _spec_srv is None:
        _spec_srv = DecodeServer(
            params, cfg, n_slots=N_SLOTS, max_len=MAX_LEN, bucket=64,
            harvest_every=WINDOW, draft_params=dparams, draft_cfg=dcfg,
            gamma=SPEC)
    _spec_srv.reset()
    t0 = time.perf_counter()
    _spec_srv.serve(requests)
    return [r.tokens for r in requests], time.perf_counter() - t0, _spec_srv


def spec_main():
    """Speculative continuous batching vs the plain slot server + waves."""
    target, draft = gpt2ish(12, 0), gpt2ish(2, 7)
    if TRAINED:
        from vitef_tpu.config import MODEL_DIR
        from vitef_tpu.monitor.checkpoint import _unflatten_like

        pair_dir = MODEL_DIR / "spec_pair"
        for model, name in ((target, "target"), (draft, "draft")):
            with np.load(pair_dir / f"{name}.npz") as z:
                flat = {k: z[k] for k in z.files}
            model.params = jax.device_put(_unflatten_like(model.params, flat))
        print("using distilled target/draft pair "
              "(tools/distill_spec_pair.py)", flush=True)
    params, cfg = target.params, target.config

    # warm every shape bucket (compiles over the tunnel), then time hot
    run_continuous(params, cfg, make_requests())
    run_spec(params, cfg, draft.params, draft.config, make_requests())
    run_waves(params, cfg, make_requests())

    reqs = make_requests()
    useful = sum(r.max_new_tokens for r in reqs)
    w_out, w_dt, w_ticks = run_waves(params, cfg, make_requests())
    c_out, c_dt, c_ticks = run_continuous(params, cfg, make_requests())
    s_out, s_dt, srv = run_spec(params, cfg, draft.params, draft.config,
                                reqs)
    match = all(a == b for a, b in zip(c_out, s_out))
    tpr = srv.spec_committed / max(srv.spec_rounds, 1)
    print(f"requests={N_REQ} slots={N_SLOTS} window={WINDOW} gamma={SPEC} "
          f"useful_tokens={useful} spec-outputs-equal={match}")
    print(f"waves:           {w_dt:6.1f}s  {useful / w_dt:8.0f} tok/s  "
          f"dispatches={-(-len(reqs) // N_SLOTS):4d}")
    print(f"continuous:      {c_dt:6.1f}s  {useful / c_dt:8.0f} tok/s  "
          f"ticks={c_ticks:4d}  dispatches={c_ticks // WINDOW:4d}")
    print(f"spec continuous: {s_dt:6.1f}s  {useful / s_dt:8.0f} tok/s  "
          f"rounds={srv.spec_rounds:4d}  committed={srv.spec_committed} "
          f"tokens/round={tpr:.2f}  "
          f"dispatches={srv.spec_rounds // WINDOW:4d}")


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    if SPEC:
        return spec_main()
    model = build_model(dict(implementation="gpt2", model_name="base",
                             pretrained=False, compute_dtype="bfloat16"),
                        key=jax.random.key(0))
    params, cfg = model.params, model.config

    if PREFIX:
        global _srv
        _srv = DecodeServer(params, cfg, n_slots=N_SLOTS, max_len=MAX_LEN,
                            bucket=64, harvest_every=WINDOW)
        h = _srv.register_prefix(PREFIX_TOKENS)
        # warm both admission paths' shape buckets, then time hot
        run_continuous(params, cfg, make_requests(concat=True))
        run_continuous(params, cfg, make_requests(shared_prefix=h))
        base = make_requests(concat=True)
        useful = sum(r.max_new_tokens for r in base)
        b_out, b_dt, b_ticks = run_continuous(params, cfg, base)
        pre = make_requests(shared_prefix=h)
        p_out, p_dt, p_ticks = run_continuous(params, cfg, pre)
        match = all(a == b for a, b in zip(b_out, p_out))
        print(f"requests={N_REQ} slots={N_SLOTS} window={WINDOW} "
              f"prefix={PREFIX} useful_tokens={useful} outputs-equal={match}")
        print(f"re-prefill:   {b_dt:6.1f}s  {useful / b_dt:8.0f} tok/s  "
              f"ticks={b_ticks:4d}")
        print(f"prefix-cache: {p_dt:6.1f}s  {useful / p_dt:8.0f} tok/s  "
              f"ticks={p_ticks:4d}  "
              f"prefill_tokens_saved={_srv.prefill_tokens_saved}")
        return

    # Warm every shape bucket both paths will hit: run the full workload
    # once untimed (first compile over the tunnel is 20-40s per shape), then
    # time a second identical run against the hot jit caches.
    run_waves(params, cfg, make_requests())
    run_continuous(params, cfg, make_requests())

    reqs = make_requests()
    useful = sum(r.max_new_tokens for r in reqs)
    w_out, w_dt, w_ticks = run_waves(params, cfg, make_requests())
    c_out, c_dt, c_ticks = run_continuous(params, cfg, reqs)
    match = all(a == b[:len(a)] and len(a) == len(b)
                for a, b in zip(c_out, w_out))
    print(f"requests={N_REQ} slots={N_SLOTS} window={WINDOW} "
          f"useful_tokens={useful} outputs-equal={match}")
    print(f"waves:      {w_dt:6.1f}s  {useful / w_dt:8.0f} tok/s  "
          f"ticks={w_ticks:4d}  util={useful / (w_ticks * N_SLOTS):.2f}")
    print(f"continuous: {c_dt:6.1f}s  {useful / c_dt:8.0f} tok/s  "
          f"ticks={c_ticks:4d}  util={useful / (c_ticks * N_SLOTS):.2f}")


if __name__ == "__main__":
    main()
