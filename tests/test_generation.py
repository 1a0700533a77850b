"""KV-cache autoregressive decoding (models/generation.py).

Golden invariant: greedy KV-cache decode must reproduce the naive
"re-run the full causal forward per token, argmax the last logit" loop
exactly (fp32, HIGHEST-precision matmuls — same numerics as training).
The reference has no generation path (SURVEY §5.7); these tests anchor the
added serving capability against the already-parity-tested training forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitef_tpu.models import build_model
from vitef_tpu.models.generation import generate, prefill, sample_token
from vitef_tpu.models.transformer import apply_transformer


def tiny_decoder(pre_norm=True, weight_tying=True, seed=0):
    return build_model(
        {
            "implementation": "transformer",
            "vocab_size": 50,
            "emb_type": "dict",
            "emb_dim": 32,
            "n_heads": 4,
            "n_layers": 2,
            "seq_len": 24,
            "causal": True,
            "pre_norm": pre_norm,
            "weight_tying": weight_tying,
            "output_type": "sequence_to_sequence",
            "attn_bias": True,
            "ffn_bias": True,
            "norm_bias": True,
            "cls_token": False,
            "pos_emb": True,
        },
        key=jax.random.key(seed),
    )


def naive_greedy(model, prompt, max_new):
    """Reference decode: full forward over the growing sequence each step."""
    seq = prompt
    out = []
    for _ in range(max_new):
        logits = apply_transformer(model.params, model.config, seq)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        out.append(nxt)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    return jnp.stack(out, axis=1)


@pytest.mark.parametrize("pre_norm", [True, False])
def test_greedy_matches_full_forward(pre_norm):
    model = tiny_decoder(pre_norm=pre_norm)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, size=(2, 5)), jnp.int32
    )
    want = naive_greedy(model, prompt, 7)
    got = generate(model.params, model.config, prompt, 7, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prefill_logits_match_forward():
    model = tiny_decoder()
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, 50, size=(3, 6)), jnp.int32
    )
    logits, cache = prefill(model.params, model.config, prompt, max_len=10)
    full = apply_transformer(model.params, model.config, prompt)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, -1, :]), atol=1e-5
    )
    assert len(cache) == model.config.n_layers
    assert cache[0]["k"].shape == (3, 4, 10, 8)  # (N, h, Lmax, d)
    # positions >= prompt length are zero (unwritten slots)
    assert float(jnp.abs(cache[0]["k"][:, :, 6:]).max()) == 0.0


def test_untied_head_decode():
    model = tiny_decoder(weight_tying=False)
    prompt = jnp.asarray(
        np.random.default_rng(2).integers(0, 50, size=(2, 4)), jnp.int32
    )
    want = naive_greedy(model, prompt, 5)
    got = generate(model.params, model.config, prompt, 5, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_single_token_generation():
    model = tiny_decoder()
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    got = generate(model.params, model.config, prompt, 1, temperature=0.0)
    assert got.shape == (1, 1)
    want = naive_greedy(model, prompt, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sampling_semantics():
    model = tiny_decoder()
    prompt = jnp.asarray([[4, 7], [9, 3]], jnp.int32)
    greedy = generate(model.params, model.config, prompt, 6, temperature=0.0)
    topk1 = generate(model.params, model.config, prompt, 6,
                     temperature=1.0, top_k=1, rng=jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))

    a = generate(model.params, model.config, prompt, 6,
                 temperature=1.0, rng=jax.random.key(7))
    b = generate(model.params, model.config, prompt, 6,
                 temperature=1.0, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < 50)).all()

    # top-k restricts every sampled token to that step's k best logits
    k = 3
    toks = generate(model.params, model.config, prompt, 5,
                    temperature=1.0, top_k=k, rng=jax.random.key(11))
    seq = prompt
    for t in range(toks.shape[1]):
        logits = apply_transformer(model.params, model.config, seq)[:, -1, :]
        top = jax.lax.top_k(logits, k)[1]
        for i in range(seq.shape[0]):
            assert int(toks[i, t]) in np.asarray(top[i])
        seq = jnp.concatenate([seq, toks[:, t:t + 1]], axis=1)


def test_sample_token_topk_filter():
    logits = jnp.asarray([[0.0, 3.0, 1.0, 2.0, -1.0]])
    for key in range(8):
        tok = sample_token(logits, jax.random.key(key), temperature=1.0, top_k=2)
        assert int(tok[0]) in (1, 3)


def test_model_generate_convenience_and_jit_cache():
    model = tiny_decoder()
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    got = model.generate(model.params, prompt, 4, temperature=0.0)
    want = naive_greedy(model, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    fn1 = model.__dict__["_generate_cache"][(4, 0.0, None, True, False, None, None, None)]
    model.generate(model.params, prompt, 4, temperature=0.0)
    assert model.__dict__["_generate_cache"][(4, 0.0, None, True, False, None, None, None)] is fn1


def test_left_padded_ragged_batch_matches_unpadded():
    """Left-padded ragged batching must reproduce each sample's unpadded
    generation exactly: padded keys are masked to exp(-inf)=0 softmax weight
    and positional embeddings follow logical positions."""
    model = tiny_decoder()
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 50, size=4)
    p2 = rng.integers(0, 50, size=7)
    w1 = generate(model.params, model.config,
                  jnp.asarray(p1[None], jnp.int32), 6, temperature=0.0)
    w2 = generate(model.params, model.config,
                  jnp.asarray(p2[None], jnp.int32), 6, temperature=0.0)

    pad_to = 7
    prompt = np.zeros((2, pad_to), np.int64)
    mask = np.zeros((2, pad_to), bool)
    prompt[0, pad_to - 4:] = p1
    mask[0, pad_to - 4:] = True
    prompt[1] = p2
    mask[1] = True
    got = generate(model.params, model.config,
                   jnp.asarray(prompt, jnp.int32), 6, temperature=0.0,
                   prompt_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(w1[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(w2[0]))


def test_ragged_prefill_logits_match_unpadded():
    model = tiny_decoder()
    rng = np.random.default_rng(4)
    toks = rng.integers(0, 50, size=5)
    full, _ = prefill(model.params, model.config,
                      jnp.asarray(toks[None], jnp.int32), max_len=12)
    padded = np.zeros((1, 8), np.int64)
    mask = np.zeros((1, 8), bool)
    padded[0, 3:] = toks
    mask[0, 3:] = True
    ragged, _ = prefill(model.params, model.config,
                        jnp.asarray(padded, jnp.int32), max_len=15,
                        prompt_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(full), atol=1e-5)


def test_model_generate_with_mask():
    model = tiny_decoder()
    prompt = jnp.asarray([[0, 0, 1, 2], [5, 6, 7, 8]], jnp.int32)
    mask = jnp.asarray([[False, False, True, True], [True, True, True, True]])
    got = model.generate(model.params, prompt, 3, temperature=0.0,
                         prompt_mask=mask)
    want0 = generate(model.params, model.config,
                     jnp.asarray([[1, 2]], jnp.int32), 3, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want0[0]))


def test_generate_validates_config():
    non_causal = build_model(
        {
            "implementation": "transformer",
            "vocab_size": 50, "emb_type": "dict", "emb_dim": 32,
            "n_heads": 4, "n_layers": 1, "seq_len": 16,
            "causal": False, "output_type": "sequence_to_sequence",
        },
        key=jax.random.key(0),
    )
    with pytest.raises(ValueError, match="causal"):
        generate(non_causal.params, non_causal.config,
                 jnp.asarray([[1]], jnp.int32), 2)
    model = tiny_decoder()
    with pytest.raises(ValueError, match="seq_len"):
        generate(model.params, model.config,
                 jnp.asarray([[1] * 20], jnp.int32), 10)


def test_generate_batch_sharded_over_dp_mesh():
    """Serving scales over the dp mesh axis: generate() is pure and
    batch-parallel, so jitting it with the prompt sharded over 'dp'
    (params replicated) must reproduce the single-device output exactly —
    XLA partitions the prefill, the decode scan, and the per-sample
    sampling without any cross-sample collective."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitef_tpu.parallel import build_mesh

    model = tiny_decoder()
    prompt = jnp.asarray(
        np.random.default_rng(9).integers(0, 50, size=(8, 5)), jnp.int32
    )
    want = generate(model.params, model.config, prompt, 6,
                    temperature=1.0, top_k=3, rng=jax.random.key(4))

    mesh = build_mesh(dp=8, tp=1)
    sharded = jax.device_put(prompt, NamedSharding(mesh, P("dp", None)))
    params = jax.device_put(
        model.params, NamedSharding(mesh, P()))  # replicated
    fn = jax.jit(lambda pr, pm: generate(
        pm, model.config, pr, 6, temperature=1.0, top_k=3,
        rng=jax.random.key(4)))
    got = fn(sharded, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_tensor_parallel_sharded_params():
    """Serving a TP-sharded model: params sharded by the training TP rules
    (qkv/fc1 column-parallel, output/fc2 row-parallel) on a dp=2 x tp=4 mesh,
    prompt sharded over dp. pjit propagates the head sharding through the
    prefill and the decode scan's KV cache and inserts the row-parallel
    psums — output must equal the unsharded generation exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitef_tpu.parallel import build_mesh, shard_params

    model = tiny_decoder()
    prompt = jnp.asarray(
        np.random.default_rng(10).integers(0, 50, size=(4, 5)), jnp.int32
    )
    want = generate(model.params, model.config, prompt, 6, temperature=0.0)

    mesh = build_mesh(dp=2, tp=4)
    params = shard_params(model.params, mesh)
    sp = jax.device_put(prompt, NamedSharding(mesh, P("dp", None)))
    fn = jax.jit(lambda pr, pm: generate(pm, model.config, pr, 6,
                                         temperature=0.0))
    got = fn(sp, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_kv_cache_quantization():
    """quantize_kv roundtrip error is bounded by scale/2 per element, and the
    int8-cache attention tracks the full-precision one closely."""
    from vitef_tpu.models.generation import _attend_cached, quantize_kv

    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.standard_normal((3, 4, 16, 8)), jnp.float32)
    q8, scale = quantize_kv(t)
    assert q8.dtype == jnp.int8 and scale.shape == (3, 4, 16)
    deq = q8.astype(jnp.float32) * scale[..., None]
    err = np.abs(np.asarray(deq - t))
    assert (err <= np.asarray(scale)[..., None] / 2 + 1e-7).all()

    qv = jnp.asarray(rng.standard_normal((3, 4 * 8)), jnp.float32)
    want = _attend_cached(qv, t, t, 4, jnp.int32(15))
    k8, ks = quantize_kv(t)
    got = _attend_cached(qv, k8, k8, 4, jnp.int32(15), None, ks, ks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_int8_kv_cache_generate():
    """generate(kv_cache_dtype='int8'): valid tokens, deterministic, and
    greedy decode agrees with the full-precision cache on a large majority of
    steps (quantization may flip near-ties, never the distribution shape)."""
    model = tiny_decoder()
    prompt = jnp.asarray(
        np.random.default_rng(11).integers(0, 50, size=(4, 5)), jnp.int32
    )
    full = generate(model.params, model.config, prompt, 8, temperature=0.0)
    q = generate(model.params, model.config, prompt, 8, temperature=0.0,
                 kv_cache_dtype="int8")
    a = generate(model.params, model.config, prompt, 8, temperature=0.0,
                 kv_cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(q), np.asarray(a))  # deterministic
    arr = np.asarray(q)
    assert ((arr >= 0) & (arr < 50)).all()
    agree = float(np.mean(arr == np.asarray(full)))
    assert agree >= 0.5, f"int8 greedy agreement suspiciously low: {agree}"

    # ragged-prompt int8 path exercises the masked prefill quantization
    mask = jnp.asarray([[False, True, True, True, True]] * 4)
    r = generate(model.params, model.config, prompt, 4, temperature=0.0,
                 prompt_mask=mask, kv_cache_dtype="int8")
    assert r.shape == (4, 4)


def test_init_kv_cache_int8_layout():
    from vitef_tpu.models.generation import init_kv_cache

    model = tiny_decoder()
    cache = init_kv_cache(model.config, 2, 12, kv_cache_dtype="int8")
    assert cache[0]["k"].dtype == jnp.int8
    assert cache[0]["k_scale"].shape == (2, 4, 12)
    with pytest.raises(ValueError, match="int8"):
        init_kv_cache(model.config, 2, 12, kv_cache_dtype="fp8")


def test_top_p_nucleus_semantics():
    """HF nucleus semantics on sample_token: token i survives iff the
    cumulative probability of strictly-better tokens is <= top_p; at least
    the argmax always survives."""
    # probs ≈ [0.643, 0.236, 0.087, 0.032, 0.002]
    logits = jnp.log(jnp.asarray([[0.643, 0.236, 0.087, 0.032, 0.002]]))
    # top_p=0.5: only token 0 has cum-before (0) <= 0.5... token 1 has 0.643
    for key in range(8):
        tok = sample_token(logits, jax.random.key(key), temperature=1.0,
                           top_p=0.5)
        assert int(tok[0]) == 0
    # top_p=0.9: tokens 0,1,2 survive (cum-before 0, .643, .879); 3 has .966
    seen = {int(sample_token(logits, jax.random.key(k), 1.0, top_p=0.9)[0])
            for k in range(64)}
    assert seen <= {0, 1, 2} and 0 in seen and len(seen) >= 2


def test_top_p_generate_and_topk_combination():
    model = tiny_decoder()
    prompt = jnp.asarray([[3, 1, 4], [1, 5, 9]], jnp.int32)
    a = generate(model.params, model.config, prompt, 5, temperature=0.9,
                 top_p=0.9, rng=jax.random.key(2))
    b = generate(model.params, model.config, prompt, 5, temperature=0.9,
                 top_p=0.9, rng=jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < 50)).all()
    # top_k + top_p compose: candidates limited to top_k before the nucleus
    c = generate(model.params, model.config, prompt, 5, temperature=0.9,
                 top_k=5, top_p=0.9, rng=jax.random.key(3))
    seq = prompt
    for t in range(c.shape[1]):
        logits = apply_transformer(model.params, model.config, seq)[:, -1, :]
        top = jax.lax.top_k(logits, 5)[1]
        for i in range(seq.shape[0]):
            assert int(c[i, t]) in np.asarray(top[i])
        seq = jnp.concatenate([seq, c[:, t:t + 1]], axis=1)


def test_eos_termination_pads_remainder():
    """Once a sample emits eos_token_id every later slot is EOS (HF padding
    semantics); other samples keep generating."""
    model = tiny_decoder()
    prompt = jnp.asarray([[7, 2, 8], [4, 4, 4]], jnp.int32)
    free = generate(model.params, model.config, prompt, 8, temperature=0.0)
    arr = np.asarray(free)
    # pick sample 0's second token as the "eos" so termination happens mid-run
    eos = int(arr[0, 1])
    got = np.asarray(generate(model.params, model.config, prompt, 8,
                              temperature=0.0, eos_token_id=eos))
    for row in got:
        hits = np.where(row == eos)[0]
        if hits.size:
            assert (row[hits[0]:] == eos).all()
    # greedy prefix before EOS is unchanged vs the unconstrained run
    h0 = np.where(arr[0] == eos)[0][0]
    np.testing.assert_array_equal(got[0, :h0 + 1], arr[0, :h0 + 1])


def test_top_p_uses_full_vocab_probabilities():
    """The nucleus cutoff must be measured in TRUE probability mass (full
    vocab partition function), not mass renormalised over the candidate set:
    with a flat 1000-token tail holding ~39% of the mass, top_p=0.7 must keep
    more than the two head tokens a candidate-renormalised cutoff would."""
    head = jnp.asarray([3.0, 2.6])                 # p ~ [0.37, 0.25]
    tail = jnp.full((1000,), -1.0)                 # p ~ 0.00038 each, 0.39 total
    logits = jnp.concatenate([head, tail])[None]
    seen = {int(sample_token(logits, jax.random.key(k), 1.0, top_p=0.7,
                             top_p_candidates=64)[0])
            for k in range(200)}
    # candidate-renormalised probs would be ~[0.58, 0.39, ...] -> cutoff after
    # token 1; true-mass cumulative reaches 0.7 only inside the tail.
    assert any(t >= 2 for t in seen), "nucleus truncated by candidate renorm"
    assert {0, 1} <= seen


def test_generate_cache_is_lru_bounded():
    """Model's per-instance compiled-sampling-program cache must not grow
    without bound (a long-lived server sweeping sampling settings would pin
    every compiled executable and draft params forever). LRU, max 16."""
    from vitef_tpu.models.registry import _GENERATE_CACHE_MAX, Model

    model = build_model({
        "implementation": "transformer", "vocab_size": 50, "emb_type": "dict",
        "emb_dim": 16, "n_heads": 2, "n_layers": 1, "seq_len": 32,
        "causal": True, "pre_norm": True, "weight_tying": True,
        "output_type": "sequence_to_sequence", "cls_token": False,
    }, key=jax.random.key(0))
    assert isinstance(model, Model)
    for i in range(_GENERATE_CACHE_MAX + 5):
        model._generate_cache_lookup(("k", i), lambda i=i: f"prog{i}")
    cache = model.__dict__["_generate_cache"]
    assert len(cache) == _GENERATE_CACHE_MAX
    assert ("k", 0) not in cache and ("k", _GENERATE_CACHE_MAX + 4) in cache
    # a hit refreshes recency: ("k", 5) survives the next insertion
    model._generate_cache_lookup(("k", 5), lambda: "hit")
    model._generate_cache_lookup(("k", 99), lambda: "new")
    cache = model.__dict__["_generate_cache"]
    assert ("k", 5) in cache and cache[("k", 5)] == "prog5"
