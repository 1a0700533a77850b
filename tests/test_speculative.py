"""Speculative decoding (models/speculative.py).

Golden invariant: greedy speculative output token-for-token EQUALS the target
model's plain greedy decode — the draft changes throughput, never content.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitef_tpu.models import build_model, generate, generate_speculative


def decoder(seed, layers=2, seq_len=64, compute_dtype="float32"):
    return build_model({
        "implementation": "transformer", "vocab_size": 50, "emb_type": "dict",
        "emb_dim": 32, "n_heads": 4, "n_layers": layers, "seq_len": seq_len,
        "causal": True, "pre_norm": True, "weight_tying": True,
        "output_type": "sequence_to_sequence", "attn_bias": True,
        "ffn_bias": True, "norm_bias": True, "cls_token": False,
        "pos_emb": True, "compute_dtype": compute_dtype,
    }, key=jax.random.key(seed))


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_exact_greedy_equivalence(gamma):
    target, draft = decoder(0, 3), decoder(7, 1)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, size=(1, 6)), jnp.int32)
    want = generate(target.params, target.config, prompt, 13, temperature=0.0)
    got = generate_speculative(
        target.params, target.config, prompt, 13,
        draft_params=draft.params, draft_cfg=draft.config, gamma=gamma)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_self_draft_perfect_acceptance():
    """draft == target accepts every proposal: ceil(max_new/(gamma+1)) rounds
    — the mechanical upper bound on the speedup."""
    target = decoder(1, 2)
    prompt = jnp.asarray([[4, 9, 2]], jnp.int32)
    want = generate(target.params, target.config, prompt, 12, temperature=0.0)
    got, stats = generate_speculative(
        target.params, target.config, prompt, 12,
        draft_params=target.params, draft_cfg=target.config, gamma=3,
        return_stats=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["rounds"]) == 3  # ceil(12 / 4)
    assert int(stats["accepted"]) == int(stats["drafted"]) == 9


def test_stats_exclude_proposals_past_the_cap():
    """The final round always drafts gamma proposals mechanically, but ones
    that would land past max_new_tokens must not count — otherwise short
    generations understate the acceptance rate (drafted inflated)."""
    target = decoder(1, 2)
    prompt = jnp.asarray([[4, 9, 2]], jnp.int32)
    # max_new=11, gamma=3: rounds commit 1+4+4+4; the last round only needs
    # 2 more tokens, so useful proposals are 3 + 3 + 2 = 8, not 3*3 = 9.
    _, stats = generate_speculative(
        target.params, target.config, prompt, 11,
        draft_params=target.params, draft_cfg=target.config, gamma=3,
        return_stats=True)
    assert int(stats["rounds"]) == 3
    assert int(stats["drafted"]) == 8
    assert int(stats["accepted"]) == 8  # self-draft: all useful ones accepted


def test_bf16_greedy_equivalence():
    """The greedy-equivalence invariant in the production compute dtype:
    the verify window forward and generate()'s one-token decode forward must
    agree on argmax bitwise in bf16 too, not only in the fp32 CPU tests."""
    target, draft = decoder(0, 3, compute_dtype="bfloat16"), \
        decoder(7, 1, compute_dtype="bfloat16")
    prompt = jnp.asarray(
        np.random.default_rng(4).integers(0, 50, size=(1, 6)), jnp.int32)
    want = generate(target.params, target.config, prompt, 13, temperature=0.0)
    for gamma in (1, 4):
        got = generate_speculative(
            target.params, target.config, prompt, 13,
            draft_params=draft.params, draft_cfg=draft.config, gamma=gamma)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_jit_and_model_method():
    target, draft = decoder(2, 2), decoder(5, 1)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    want = generate(target.params, target.config, prompt, 7, temperature=0.0)
    got = target.generate_speculative(target.params, prompt, 7, draft=draft,
                                      gamma=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # jit cache reused (key carries the draft identity)
    key = ("spec", 7, 2, 0.0, False, id(draft))
    fn = target.__dict__["_generate_cache"][key][0]
    target.generate_speculative(target.params, prompt, 7, draft=draft, gamma=2)
    assert target.__dict__["_generate_cache"][key][0] is fn
    # a DIFFERENT draft gets its own compiled fn (config is baked via partial)
    draft2 = decoder(8, 1)
    target.generate_speculative(target.params, prompt, 7, draft=draft2, gamma=2)
    assert ("spec", 7, 2, 0.0, False, id(draft2)) in target.__dict__["_generate_cache"]


def test_batch_and_length_guards():
    target, draft = decoder(3, 1), decoder(4, 1)
    with pytest.raises(ValueError, match="batch-1"):
        generate_speculative(target.params, target.config,
                             jnp.zeros((2, 4), jnp.int32), 4,
                             draft_params=draft.params, draft_cfg=draft.config)
    with pytest.raises(ValueError, match="exceeds"):
        generate_speculative(target.params, target.config,
                             jnp.zeros((1, 60), jnp.int32), 4,
                             draft_params=draft.params, draft_cfg=draft.config)


def test_sampling_distribution_matches_target():
    """Leviathan acceptance yields the TARGET sampling distribution exactly,
    independent of the draft: empirical marginal of the 2nd generated token
    (after a spec round with a mismatched draft) matches plain sampled
    generate() within sampling noise (total variation over ~600 draws)."""
    import functools

    target, draft = decoder(0, 2), decoder(9, 1)
    prompt = jnp.asarray([[3, 8, 1, 4]], jnp.int32)
    spec = jax.jit(functools.partial(
        generate_speculative, cfg=target.config, max_new_tokens=2,
        draft_cfg=draft.config, gamma=2, temperature=1.0))
    plain = jax.jit(functools.partial(
        generate, cfg=target.config, max_new_tokens=2, temperature=1.0))

    n, v = 600, 50
    cs = np.zeros(v), np.zeros(v)
    for i in range(n):
        s = spec(target.params, prompt=prompt, draft_params=draft.params,
                 rng=jax.random.key(2 * i))
        p = plain(target.params, prompt=prompt, rng=jax.random.key(2 * i + 1))
        cs[0][int(s[0, 1])] += 1
        cs[1][int(p[0, 1])] += 1
    tv = 0.5 * np.abs(cs[0] / n - cs[1] / n).sum()
    # two empirical draws of the same 50-way distribution: TV ~ 0.10-0.14
    assert tv < 0.2, f"total variation {tv:.3f} too large — distributions differ"


def test_sampling_deterministic_given_key_and_valid():
    target, draft = decoder(0, 2), decoder(9, 1)
    prompt = jnp.asarray([[5, 5, 2, 7]], jnp.int32)
    a = generate_speculative(target.params, target.config, prompt, 6,
                             draft_params=draft.params, draft_cfg=draft.config,
                             gamma=3, temperature=0.8, rng=jax.random.key(3))
    b = generate_speculative(target.params, target.config, prompt, 6,
                             draft_params=draft.params, draft_cfg=draft.config,
                             gamma=3, temperature=0.8, rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    arr = np.asarray(a)
    assert arr.shape == (1, 6) and ((arr >= 0) & (arr < 50)).all()


def test_self_draft_sampling_acceptance_perfect():
    """Regression (draft-cache hole): the draft scan must write K/V for ALL
    gamma proposals — a fully-accepted round advances the commit pointer past
    slot c+gamma, and a zero slot there corrupts every later draft
    distribution. With draft == target the Leviathan ratio p/q is exactly 1
    at every position, so acceptance must be perfect across many rounds."""
    target = decoder(0, 2)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, 50, size=(1, 5)), jnp.int32)
    acc = drafted = 0
    for s in range(10):
        _, st = generate_speculative(
            target.params, target.config, prompt, 12,
            draft_params=target.params, draft_cfg=target.config, gamma=3,
            temperature=1.0, rng=jax.random.key(s), return_stats=True)
        acc += int(st["accepted"])
        drafted += int(st["drafted"])
    assert acc == drafted, f"self-draft rejections: {acc}/{drafted}"
