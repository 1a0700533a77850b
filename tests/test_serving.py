"""Continuous-batching decode server tests (CPU, fp32 XLA paths).

The load-bearing invariant: every request served through the slot server —
admitted at arbitrary ticks, sharing steps with arbitrary co-tenants,
through recycled slots — produces token-for-token the output of a standalone
``generate()`` on its own prompt (greedy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitef_tpu.models import TransformerConfig, init_transformer
from vitef_tpu.models.generation import generate
from vitef_tpu.models.serving import DecodeServer, Request


def decoder_cfg(**kw):
    args = dict(
        vocab_size=48, emb_type="dict", emb_dim=16, n_heads=2, n_layers=2,
        seq_len=48, causal=True, pre_norm=True, weight_tying=True,
        output_type="sequence_to_sequence", attn_bias=True, ffn_bias=True,
        norm_bias=True, cls_token=False, pos_emb=True,
        attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


@pytest.fixture(scope="module")
def model():
    cfg = decoder_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    return params, cfg


def ref_greedy(params, cfg, prompt, max_new):
    out = generate(params, cfg, jnp.asarray(prompt, jnp.int32)[None],
                   max_new, temperature=0.0)
    return [int(t) for t in np.asarray(out[0])]


def test_single_request_matches_generate(model):
    params, cfg = model
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=(7,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=4, bucket=8)
    (req,) = srv.serve([Request(prompt=prompt, max_new_tokens=6)])
    assert req.done
    assert req.tokens == ref_greedy(params, cfg, prompt, 6)


def test_more_requests_than_slots_recycle(model):
    """8 requests through 3 slots: waves + slot reuse, all exact."""
    params, cfg = model
    rng = np.random.default_rng(1)
    reqs = []
    for i in range(8):
        plen = int(rng.integers(3, 14))
        prompt = rng.integers(0, cfg.vocab_size, size=(plen,)).tolist()
        reqs.append(Request(prompt=prompt,
                            max_new_tokens=int(rng.integers(2, 9))))
    srv = DecodeServer(params, cfg, n_slots=3, bucket=8)
    srv.serve(reqs)
    for req in reqs:
        assert req.done
        assert req.tokens == ref_greedy(params, cfg, req.prompt,
                                        req.max_new_tokens), req.prompt


def test_continuous_batching_shares_steps(model):
    """The whole point: total decode ticks is far below the sum of
    sequential per-request ticks (requests overlap in the slot pool)."""
    params, cfg = model
    rng = np.random.default_rng(2)
    reqs = [Request(prompt=rng.integers(0, cfg.vocab_size, size=(5,)).tolist(),
                    max_new_tokens=10) for _ in range(6)]
    srv = DecodeServer(params, cfg, n_slots=6, bucket=8)
    srv.serve(reqs)
    sequential = sum(r.max_new_tokens - 1 for r in reqs)  # first via admit
    assert srv.steps <= sequential / 3, (srv.steps, sequential)
    for req in reqs:
        assert req.tokens == ref_greedy(params, cfg, req.prompt, 10)


def test_eos_frees_slot_early(model):
    """A request that hits EOS stops consuming its slot; outputs truncate at
    EOS; the freed slot is reused by the queue."""
    params, cfg = model
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=(6,)).tolist()
               for _ in range(4)]
    # pick an eos id that the greedy continuation of prompt 0 actually emits
    ref0 = ref_greedy(params, cfg, prompts[0], 8)
    eos = ref0[3]
    reqs = [Request(prompt=p, max_new_tokens=8) for p in prompts]
    srv = DecodeServer(params, cfg, n_slots=1, bucket=8, eos_token_id=eos)
    srv.serve(reqs)
    # request 0 must have stopped AT the first eos occurrence
    assert reqs[0].tokens == ref0[:ref0.index(eos) + 1]
    for req, p in zip(reqs, prompts):
        assert req.done
        full = ref_greedy(params, cfg, p, 8)
        expect = full[:full.index(eos) + 1] if eos in full else full
        assert req.tokens == expect


def test_prefix_cache_matches_generate_on_concat(model):
    """Prefix caching: a request admitted with a registered shared prefix
    produces token-for-token the output of a standalone generate() on
    [prefix ++ prompt] — the prefix K/V is copied, never recomputed."""
    params, cfg = model
    rng = np.random.default_rng(5)
    prefix = rng.integers(0, cfg.vocab_size, size=(9,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=2, bucket=8)
    h = srv.register_prefix(prefix)
    reqs = []
    for _ in range(5):
        plen = int(rng.integers(2, 11))
        prompt = rng.integers(0, cfg.vocab_size, size=(plen,)).tolist()
        reqs.append(Request(prompt=prompt, prefix=h,
                            max_new_tokens=int(rng.integers(3, 8))))
    srv.serve(reqs)
    for req in reqs:
        assert req.done
        assert req.tokens == ref_greedy(params, cfg, prefix + req.prompt,
                                        req.max_new_tokens), req.prompt
    assert srv.prefill_tokens_saved == len(prefix) * len(reqs)


def test_prefix_and_plain_requests_cotenant(model):
    """Prefix-cached and plain requests share the slot pool and steps;
    two distinct prefixes coexist; recycled slots lose no state."""
    params, cfg = model
    rng = np.random.default_rng(6)
    pre_a = rng.integers(0, cfg.vocab_size, size=(6,)).tolist()
    pre_b = rng.integers(0, cfg.vocab_size, size=(12,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=2, bucket=8)
    ha, hb = srv.register_prefix(pre_a), srv.register_prefix(pre_b)
    reqs, expect = [], []
    for i in range(6):
        prompt = rng.integers(0, cfg.vocab_size,
                              size=(int(rng.integers(2, 9)),)).tolist()
        pick = (None, ha, hb)[i % 3]
        full = prompt if pick is None else \
            (pre_a if pick == ha else pre_b) + prompt
        reqs.append(Request(prompt=prompt, prefix=pick, max_new_tokens=5))
        expect.append(ref_greedy(params, cfg, full, 5))
    srv.serve(reqs)
    for req, want in zip(reqs, expect):
        assert req.done and req.tokens == want


def test_prefix_cache_postnorm(model):
    """The context-attention admission handles post-norm blocks too."""
    cfg = decoder_cfg(pre_norm=False)
    params = init_transformer(jax.random.key(2), cfg)
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, cfg.vocab_size, size=(5,)).tolist()
    prompt = rng.integers(0, cfg.vocab_size, size=(4,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=1, bucket=4)
    h = srv.register_prefix(prefix)
    (req,) = srv.serve([Request(prompt=prompt, prefix=h, max_new_tokens=6)])
    assert req.tokens == ref_greedy(params, cfg, prefix + prompt, 6)


@pytest.mark.parametrize("dp,tp,n_slots", [(8, 1, 8), (4, 2, 4)])
def test_mesh_sharded_server_matches_single_device(model, dp, tp, n_slots):
    """Multi-chip serving: the server on a dp x tp mesh (params sharded by
    the TP rules, cache pool sharded slots-over-dp / heads-over-tp) produces
    token-for-token the single-device server's output — pjit propagates the
    shardings through admission, the window scan, and slot recycling."""
    from vitef_tpu.parallel import build_mesh

    params, cfg = model
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, cfg.vocab_size,
                            size=(int(rng.integers(3, 12)),)).tolist()
               for _ in range(6)]
    news = [int(rng.integers(2, 8)) for _ in prompts]

    plain = DecodeServer(params, cfg, n_slots=n_slots, bucket=8)
    want = plain.serve([Request(prompt=p, max_new_tokens=n)
                        for p, n in zip(prompts, news)])

    mesh = build_mesh(dp=dp, tp=tp)
    srv = DecodeServer(params, cfg, n_slots=n_slots, bucket=8, mesh=mesh)
    got = srv.serve([Request(prompt=p, max_new_tokens=n)
                     for p, n in zip(prompts, news)])
    for w, g in zip(want, got):
        assert g.done and g.tokens == w.tokens


def test_mesh_sharded_server_with_prefix(model):
    """Prefix caching composes with the mesh-sharded server."""
    from vitef_tpu.parallel import build_mesh

    params, cfg = model
    rng = np.random.default_rng(9)
    prefix = rng.integers(0, cfg.vocab_size, size=(7,)).tolist()
    prompt = rng.integers(0, cfg.vocab_size, size=(5,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=4, bucket=8,
                       mesh=build_mesh(dp=4, tp=2))
    h = srv.register_prefix(prefix)
    (req,) = srv.serve([Request(prompt=prompt, prefix=h, max_new_tokens=6)])
    assert req.tokens == ref_greedy(params, cfg, prefix + prompt, 6)


def test_sampled_mode_runs_and_respects_vocab(model):
    params, cfg = model
    rng = np.random.default_rng(4)
    reqs = [Request(prompt=rng.integers(0, cfg.vocab_size, size=(5,)).tolist(),
                    max_new_tokens=6) for _ in range(4)]
    srv = DecodeServer(params, cfg, n_slots=2, bucket=8, temperature=0.8,
                       top_k=8, rng=jax.random.key(7))
    srv.serve(reqs)
    for req in reqs:
        assert req.done and len(req.tokens) == 6
        assert all(0 <= t < cfg.vocab_size for t in req.tokens)
