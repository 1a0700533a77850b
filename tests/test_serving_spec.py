"""Speculative continuous batching: the draft-and-verify window over the
slot pool (models/serving.py _make_spec_window_fn).

The load-bearing invariant composes the two existing ones: every request
served through the SPECULATIVE slot server — admitted at arbitrary rounds,
sharing verify windows with arbitrary co-tenants, through recycled slots —
produces token-for-token the output of a standalone greedy ``generate()``
on its own prompt (the draft model only changes how fast tokens commit,
never which tokens).
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
        seq_len=64, causal=True, pre_norm=True, weight_tying=True,
        output_type="sequence_to_sequence", attn_bias=True, ffn_bias=True,
        norm_bias=True, cls_token=False, pos_emb=True,
        attn_impl="xla", norm_impl="xla",
    )
    args.update(kw)
    return TransformerConfig(**args)


@pytest.fixture(scope="module")
def pair():
    cfg = decoder_cfg()
    params = init_transformer(jax.random.key(0), cfg)
    draft_cfg = decoder_cfg(n_layers=1, emb_dim=8, n_heads=1)
    draft_params = init_transformer(jax.random.key(7), draft_cfg)
    return params, cfg, draft_params, draft_cfg


def ref_greedy(params, cfg, prompt, max_new):
    out = generate(params, cfg, jnp.asarray(prompt, jnp.int32)[None],
                   max_new, temperature=0.0)
    return [int(t) for t in np.asarray(out[0])]


def spec_server(pair, **kw):
    params, cfg, draft_params, draft_cfg = pair
    args = dict(n_slots=3, bucket=8, draft_params=draft_params,
                draft_cfg=draft_cfg, gamma=3, max_len=48)
    args.update(kw)
    return DecodeServer(params, cfg, **args)


def test_single_request_matches_generate(pair):
    params, cfg = pair[:2]
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=(7,)).tolist()
    srv = spec_server(pair, n_slots=2)
    (req,) = srv.serve([Request(prompt=prompt, max_new_tokens=9)])
    assert req.done
    assert req.tokens == ref_greedy(params, cfg, prompt, 9)
    assert srv.spec_rounds > 0 and srv.spec_committed == 9 - 1


def test_cotenants_and_recycled_slots(pair):
    """9 mixed-length requests through 3 slots: co-tenant verify windows,
    slot recycling across admissions — every stream exact."""
    params, cfg = pair[:2]
    rng = np.random.default_rng(1)
    reqs = []
    for _ in range(9):
        plen = int(rng.integers(3, 14))
        prompt = rng.integers(0, cfg.vocab_size, size=(plen,)).tolist()
        reqs.append(Request(prompt=prompt,
                            max_new_tokens=int(rng.integers(2, 11))))
    srv = spec_server(pair)
    srv.serve(reqs)
    for req in reqs:
        assert req.done
        assert req.tokens == ref_greedy(params, cfg, req.prompt,
                                        req.max_new_tokens), req.prompt


def test_self_draft_accepts_everything(pair):
    """Draft == target: every proposal must be accepted (the mechanical
    ceiling), so rounds ~= ceil((max_new-1)/(gamma+1)) per request."""
    params, cfg = pair[:2]
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, size=(6,)).tolist()
    srv = DecodeServer(params, cfg, n_slots=1, bucket=8, max_len=48,
                       draft_params=params, draft_cfg=cfg, gamma=3,
                       harvest_every=2)
    (req,) = srv.serve([Request(prompt=prompt, max_new_tokens=13)])
    assert req.tokens == ref_greedy(params, cfg, prompt, 13)
    # 12 step-committed tokens at 4/round = 3 useful rounds; windows run in
    # blocks of harvest_every=2 so at most 4 rounds dispatch
    assert srv.spec_rounds <= 4, srv.spec_rounds


def test_eos_cuts_mid_window(pair):
    """EOS inside an accepted run must cut the commit ON DEVICE: the output
    truncates at the first EOS and the freed slot serves the queue."""
    params, cfg = pair[:2]
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=(6,)).tolist()
               for _ in range(3)]
    ref0 = ref_greedy(params, cfg, prompts[0], 10)
    eos = ref0[4]
    reqs = [Request(prompt=p, max_new_tokens=10) for p in prompts]
    srv = spec_server(pair, n_slots=1, eos_token_id=eos)
    srv.serve(reqs)
    assert reqs[0].tokens == ref0[:ref0.index(eos) + 1]
    for req, p in zip(reqs, prompts):
        assert req.done
        full = ref_greedy(params, cfg, p, 10)
        expect = full[:full.index(eos) + 1] if eos in full else full
        assert req.tokens == expect


def test_matches_plain_server_stream(pair):
    """The speculative server and the plain server serve the same workload
    identically (speculation changes cost, never content)."""
    params, cfg, draft_params, draft_cfg = pair
    rng = np.random.default_rng(4)
    mk = lambda: [Request(
        prompt=rng.integers(0, cfg.vocab_size,
                            size=(int(rng.integers(3, 12)),)).tolist(),
        max_new_tokens=int(rng.integers(2, 9))) for _ in range(6)]
    rng = np.random.default_rng(4)
    a = mk()
    rng = np.random.default_rng(4)
    b = mk()
    plain = DecodeServer(params, cfg, n_slots=2, bucket=8, max_len=48)
    plain.serve(a)
    spec = spec_server(pair, n_slots=2)
    spec.serve(b)
    for ra, rb in zip(a, b):
        assert ra.tokens == rb.tokens


def test_prefix_rejected_with_spec(pair):
    srv = spec_server(pair)
    h_req = Request(prompt=[1, 2, 3], max_new_tokens=2, prefix=0)
    with pytest.raises(AssertionError):
        srv.admit(h_req, 0)
