"""Weight-only int8 quantization for the decode path (models/quantize.py).

Two classes of guarantee:

1. EXACT: power-of-two scales commute bit-exactly with the matmul sums, so a
   model whose weights are exactly int8 x 2^k representable generates
   token-for-token identically through the quantized path (fp32 numerics).
   The serving invariants (server ≡ generate, speculative greedy ≡ target
   greedy) hold WITHIN the quantized world regardless of quantization error.
2. BOUNDED: for arbitrary weights the per-element error is <= scale/2 and the
   end-to-end logits stay close.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.models.generation import generate, prefill
from vitef_tpu.models.quantize import (
    dequantize_weight,
    quantize_decode_params,
    quantize_weight_int8,
    quantized_nbytes,
)

from test_generation import tiny_decoder


def snap_params(params):
    """Round every quantizable weight to its int8 x 2^k representable value,
    so quantization of the snapped model is lossless."""
    q = quantize_decode_params(params)
    out = jax.tree.map(lambda x: x, params)
    out["blocks"] = [dict(bp) for bp in params["blocks"]]
    for bp, qbp in zip(out["blocks"], q["blocks"]):
        for grp, keys in (("attn", ("qkv_mat", "output")),
                          ("ffn", ("fc1", "fc2"))):
            bp[grp] = dict(bp[grp])
            for k in keys:
                bp[grp][k] = {**bp[grp][k],
                              "weight": dequantize_weight(qbp[grp][k])}
    out["embedding"] = dict(params["embedding"])
    out["embedding"]["token_emb"] = {
        "weight": dequantize_weight(q["embedding"]["token_emb"],
                                    channel_axis=0)}
    return out


def test_quantize_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32)) * 0.07
    q = quantize_weight_int8(w, channel_axis=1)
    assert q["weight"].dtype == jnp.int8
    assert q["scale"].shape == (48,)
    # power-of-two scales exactly
    log2s = np.log2(np.asarray(q["scale"]))
    np.testing.assert_array_equal(log2s, np.round(log2s))
    err = np.abs(np.asarray(dequantize_weight(q) - w))
    assert (err <= np.asarray(q["scale"])[None, :] / 2 + 1e-9).all()
    # snap costs at most one extra bit: scale < 2 * amax / 127 * 2
    amax = np.abs(np.asarray(w)).max(axis=0)
    assert (np.asarray(q["scale"]) <= 2 * amax / 127 + 1e-12).all()


def test_quantized_generate_exact_on_representable_weights():
    """Greedy decode through int8 weights == full-precision decode,
    token-for-token AND logit-for-logit, when the weights are exactly
    int8 x 2^k (power-of-two scaling is an exponent shift: it commutes
    with the contraction sums bit-exactly)."""
    model = tiny_decoder()
    snapped = snap_params(model.params)
    qparams = quantize_decode_params(snapped)
    # lossless snap: quantize o dequantize is the identity here
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight(qparams["blocks"][0]["ffn"]["fc1"])),
        np.asarray(snapped["blocks"][0]["ffn"]["fc1"]["weight"]))

    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, 50, size=(2, 6)), jnp.int32)
    want_logits, _ = prefill(snapped, model.config, prompt, max_len=12)
    got_logits, _ = prefill(qparams, model.config, prompt, max_len=12)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=1e-6)

    want = generate(snapped, model.config, prompt, 8, temperature=0.0)
    got = generate(qparams, model.config, prompt, 8, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_generate_close_on_real_weights():
    """Arbitrary weights: quantized logits stay directionally faithful."""
    model = tiny_decoder(seed=5)
    qparams = quantize_decode_params(model.params)
    prompt = jnp.asarray(
        np.random.default_rng(4).integers(0, 50, size=(2, 6)), jnp.int32)
    full, _ = prefill(model.params, model.config, prompt, max_len=12)
    quant, _ = prefill(qparams, model.config, prompt, max_len=12)
    a, b = np.asarray(full), np.asarray(quant)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    assert (cos > 0.999).all(), cos


def test_quantized_memory_halves():
    model = tiny_decoder()
    qparams = quantize_decode_params(model.params)
    full = quantized_nbytes(model.params)
    quant = quantized_nbytes(qparams)
    # fp32 weights -> int8 + f32 scales: roughly 4x smaller for the big
    # matrices; whole tree clearly below half (norms/biases/pos stay f32)
    assert quant < 0.5 * full, (quant, full)


def test_quantized_ragged_and_int8_kv_compose():
    """int8 weights compose with ragged prompts and the int8 KV cache."""
    model = tiny_decoder()
    snapped = snap_params(model.params)
    qparams = quantize_decode_params(snapped)
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(rng.integers(0, 50, size=(3, 6)), jnp.int32)
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1],
                        [1, 1, 1, 1, 1, 1],
                        [0, 1, 1, 1, 1, 1]], bool)
    got = generate(qparams, model.config, prompt, 6, temperature=0.0,
                   prompt_mask=mask)
    # row 1 is unpadded: must match its own unpadded generation exactly
    solo = generate(qparams, model.config, prompt[1:2], 6, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got[1:2]), np.asarray(solo))
    # int8 KV on top runs and keeps shape/dtype contracts
    both = generate(qparams, model.config, prompt, 6, temperature=0.0,
                    prompt_mask=mask, kv_cache_dtype="int8")
    assert both.shape == (3, 6) and both.dtype == jnp.int32


def test_server_generate_parity_with_int8_weights():
    """The continuous-batching server invariant (server output ==
    standalone generate) holds through quantized weights — both paths run
    the same quantized program, so the equality is exact regardless of
    quantization error."""
    from vitef_tpu.models.serving import DecodeServer, Request

    model = tiny_decoder()
    qparams = quantize_decode_params(model.params)
    rng = np.random.default_rng(11)
    prompts = [jnp.asarray(rng.integers(0, 50, size=(l,)), jnp.int32)
               for l in (4, 6, 3, 5)]
    server = DecodeServer(qparams, model.config, n_slots=2, max_len=16,
                          temperature=0.0, harvest_every=2, bucket=4)
    reqs = [Request(prompt=p, max_new_tokens=5) for p in prompts]
    results = server.serve(reqs)
    for p, r in zip(prompts, results):
        want = generate(qparams, model.config, p[None], 5, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(r.tokens),
                                      np.asarray(want[0, :len(r.tokens)]))


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """Deployment story: a quantized tree persists through the checkpoint
    flatten/npz/unflatten helpers with dtypes (int8 weights, f32 scales)
    intact, loading into a fresh quantized template (as a serving process
    would: build model -> quantize -> fill from disk)."""
    from vitef_tpu.monitor.checkpoint import (_flatten_with_paths,
                                              _unflatten_like)

    model = tiny_decoder()
    qparams = quantize_decode_params(model.params)
    np.savez(tmp_path / "quant.npz", **_flatten_with_paths(qparams))

    template = quantize_decode_params(tiny_decoder(seed=99).params)
    with np.load(tmp_path / "quant.npz") as z:
        loaded = _unflatten_like(template, {k: z[k] for k in z.files})
    q0 = qparams["blocks"][0]["ffn"]["fc1"]
    l0 = loaded["blocks"][0]["ffn"]["fc1"]
    assert np.asarray(l0["weight"]).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(l0["weight"]),
                                  np.asarray(q0["weight"]))
    prompt = jnp.asarray(
        np.random.default_rng(21).integers(0, 50, size=(2, 5)), jnp.int32)
    want = generate(qparams, model.config, prompt, 6, temperature=0.0)
    got = generate(jax.device_put(loaded), model.config, prompt, 6,
                   temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_greedy_parity_with_int8_weights():
    """Speculative greedy with a quantized TARGET equals the quantized
    target's own greedy decode (draft can stay full precision — it only
    proposes)."""
    from vitef_tpu.models.speculative import generate_speculative

    target = tiny_decoder(seed=0)
    draft = tiny_decoder(seed=9)
    qparams = quantize_decode_params(target.params)
    prompt = jnp.asarray(
        np.random.default_rng(13).integers(0, 50, size=(1, 5)), jnp.int32)
    want = generate(qparams, target.config, prompt, 6, temperature=0.0)
    got = generate_speculative(qparams, target.config, prompt, 6,
                               draft_params=draft.params,
                               draft_cfg=draft.config, gamma=3,
                               temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
