"""Llama-family tests: RoPE, GQA, SwiGLU, preset build, HF import golden,
generation/serving/speculative/quantize integration.

Beyond-parity family (the reference supports ViT/GPT2/PatchTST only). The
load-bearing oracle is the HF ``transformers`` LlamaForCausalLM built OFFLINE
from a config (random init, no network): our ``hf_llama_to_vitef`` map +
functional forward must reproduce its fp32 logits — this pins the q/k/v and
gate/up concat orders, the rotate_half RoPE convention, GQA grouping, and the
RMSNorm/SwiGLU algebra all at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitef_tpu.models import build_model
from vitef_tpu.models.generation import generate, prefill
from vitef_tpu.models.rope import apply_rope, rope_angles
from vitef_tpu.models.transformer import (
    TransformerConfig,
    _attention_modern,
    apply_transformer,
    init_transformer,
)


def llama_tiny(seed=0, **kw):
    return build_model(dict(implementation="llama", model_name="tiny",
                            pretrained=False, attn_impl="xla",
                            norm_impl="xla", **kw), key=jax.random.key(seed))


# ---------------------------------------------------------------------------
# units
# ---------------------------------------------------------------------------


def test_rope_matches_hand_rotation():
    d = 8
    pos = jnp.asarray([0, 3, 17])
    cos, sin = rope_angles(pos, d, theta=10000.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, d)),
                    jnp.float32)
    got = apply_rope(x, cos, sin)
    inv = 10000.0 ** (-np.arange(0, d, 2) / d)
    for r in range(3):
        ang = float(pos[r]) * inv
        x1, x2 = np.asarray(x[r, : d // 2]), np.asarray(x[r, d // 2:])
        want = np.concatenate([x1 * np.cos(ang) - x2 * np.sin(ang),
                               x2 * np.cos(ang) + x1 * np.sin(ang)])
        np.testing.assert_allclose(np.asarray(got[r]), want, atol=1e-6)


def test_rope_inner_product_depends_on_offset_only():
    """The rotary property: <rope(q, i), rope(k, j)> is a function of i - j."""
    d = 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(d,)), jnp.float32)

    def score(i, j):
        cq, sq = rope_angles(jnp.asarray(i), d)
        ck, sk = rope_angles(jnp.asarray(j), d)
        return float(jnp.dot(apply_rope(q, cq, sq), apply_rope(k, ck, sk)))

    assert abs(score(5, 2) - score(103, 100)) < 1e-3
    assert abs(score(7, 7) - score(40, 40)) < 1e-3
    assert abs(score(5, 2) - score(5, 3)) > 1e-4  # and it DOES move with offset


def test_gqa_equals_repeated_kv_oracle():
    """Grouped attention == standard MHA with each kv head repeated g times."""
    cfg = TransformerConfig(
        vocab_size=64, emb_type="dict", emb_dim=32, n_heads=4, n_kv_heads=2,
        seq_len=16, n_layers=1, causal=True, pre_norm=True,
        output_type="sequence_to_sequence", attn_impl="xla", norm_impl="xla",
        cls_token=False)
    params = init_transformer(jax.random.key(0), cfg)
    ap = params["blocks"][0]["attn"]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)), jnp.float32)
    got = _attention_modern(ap, cfg, x)

    # oracle: repeat each kv head over its g query heads, standard attention
    e, d, h, kv = 32, 8, 4, 2
    qkv = x @ ap["qkv_mat"]["weight"]
    q, k, v = qkv[..., :e], qkv[..., e:e + kv * d], qkv[..., e + kv * d:]
    qh = np.asarray(q).reshape(2, 10, h, d).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(2, 10, kv, d).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(2, 10, kv, d).transpose(0, 2, 1, 3)
    kh = np.repeat(kh, h // kv, axis=1)  # consecutive-group convention
    vh = np.repeat(vh, h // kv, axis=1)
    s = np.einsum("nhqd,nhkd->nhqk", qh, kh) / np.sqrt(d)
    mask = np.tril(np.ones((10, 10), bool))
    s = np.where(mask, s, -1e30)
    w = np.exp(s - s.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    z = np.einsum("nhqk,nhkd->nhqd", w, vh).transpose(0, 2, 1, 3).reshape(
        2, 10, e)
    want = z @ np.asarray(ap["output"]["weight"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_modern_path_matches_standard_when_mha():
    """kv == h, no rope: the grouped einsum reduces to standard MHA."""
    from vitef_tpu.models.transformer import apply_attention

    cfg = TransformerConfig(
        vocab_size=64, emb_type="dict", emb_dim=32, n_heads=4, seq_len=16,
        n_layers=1, causal=True, pre_norm=True,
        output_type="sequence_to_sequence", attn_impl="xla", norm_impl="xla",
        cls_token=False)
    params = init_transformer(jax.random.key(1), cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 9, 32)),
                    jnp.float32)
    want = apply_attention(params["blocks"][0]["attn"], cfg, x)
    got = _attention_modern(params["blocks"][0]["attn"], cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_swiglu_oracle():
    from vitef_tpu.models.transformer import apply_ffn

    cfg = TransformerConfig(
        vocab_size=8, emb_type="dict", emb_dim=16, n_heads=2, seq_len=8,
        n_layers=1, ffn_dim=24, ffn_type="swiglu", causal=True,
        output_type="sequence_to_sequence", cls_token=False)
    params = init_transformer(jax.random.key(2), cfg)
    fp = params["blocks"][0]["ffn"]
    assert fp["fc1"]["weight"].shape == (16, 48)
    assert fp["fc2"]["weight"].shape == (24, 16)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(3, 5, 16)),
                    jnp.float32)
    got = apply_ffn(fp, cfg, x)
    u = np.asarray(x @ fp["fc1"]["weight"])
    gate, up = u[..., :24], u[..., 24:]
    silu = gate / (1 + np.exp(-gate))
    want = (silu * up) @ np.asarray(fp["fc2"]["weight"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# preset + generation stack
# ---------------------------------------------------------------------------


def test_llama_builds_and_forwards():
    m = llama_tiny()
    cfg = m.config
    assert cfg.uses_rope and cfg.uses_gqa and cfg.ffn_type == "swiglu"
    assert cfg.norm == "rms" and not cfg.pos_emb and not cfg.weight_tying
    toks = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, size=(2, 12)), jnp.int32)
    logits = jax.jit(m.apply)(m.params, toks)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gqa_flash_fallback_matches_einsum(monkeypatch):
    """Geometries past the packed kernel's VMEM gate (llama-1b: E=2048 at
    L=1024 overflowed Mosaic's scoped stack on device) must keep a TILED
    kernel: with the gate forced shut, the bf16 pallas path routes through
    flash_attention (rope rotated, kv heads repeated) and matches the
    grouped-einsum reference."""
    from jax.experimental.pallas import tpu as pltpu

    import vitef_tpu.ops.attention as A

    def build(attn_impl):
        return build_model(dict(implementation="llama", model_name="tiny",
                                pretrained=False, compute_dtype="bfloat16",
                                attn_impl=attn_impl, norm_impl="xla"),
                           key=jax.random.key(0))

    m_ref = build("xla")
    m = build("pallas")
    toks = jnp.asarray(np.random.default_rng(11).integers(
        0, m.config.vocab_size, size=(2, 16)), jnp.int32)

    ref = apply_transformer(m_ref.params, m_ref.config, toks)  # einsum path

    monkeypatch.setattr(A, "packed_mha_supported", lambda *a, **k: False)
    with pltpu.force_tpu_interpret_mode():
        got = apply_transformer(m.params, m.config, toks)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.05)
    # per-position argmax agreement is the serving-relevant bar
    agree = (np.argmax(np.asarray(got, np.float32), -1)
             == np.argmax(np.asarray(ref, np.float32), -1)).mean()
    assert agree > 0.9


def test_llama_prefill_matches_full_forward():
    """The generation prefill's last-position logits equal the training
    forward's — rope/GQA decode numerics match the apply path."""
    m = llama_tiny()
    toks = jnp.asarray(np.random.default_rng(6).integers(
        0, m.config.vocab_size, size=(3, 9)), jnp.int32)
    full = apply_transformer(m.params, m.config, toks)
    last, _ = prefill(m.params, m.config, toks, max_len=16)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(full[:, -1, :]), atol=1e-4)


def test_llama_greedy_decode_matches_full_forward_rescoring():
    """Each decoded token equals the argmax of a FULL forward over the
    growing sequence — the KV-cache path (rope rotations at the right
    positions, GQA cache) is exactly the training forward."""
    m = llama_tiny()
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(rng.integers(0, m.config.vocab_size, size=(2, 5)),
                         jnp.int32)
    out = generate(m.params, m.config, prompt, 6, temperature=0.0)
    seq = np.asarray(jnp.concatenate([prompt, out], axis=1))
    for t in range(6):
        ctx = jnp.asarray(seq[:, : 5 + t], jnp.int32)
        logits = apply_transformer(m.params, m.config, ctx)
        want = np.argmax(np.asarray(logits[:, -1, :]), axis=-1)
        np.testing.assert_array_equal(seq[:, 5 + t], want)


def test_llama_ragged_prompts():
    m = llama_tiny()
    rng = np.random.default_rng(8)
    prompt = jnp.asarray(rng.integers(0, 256, size=(2, 6)), jnp.int32)
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]], bool)
    got = generate(m.params, m.config, prompt, 5, temperature=0.0,
                   prompt_mask=mask)
    solo = generate(m.params, m.config, prompt[0:1, 2:], 5, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got[0:1]), np.asarray(solo))


def test_llama_server_and_prefix_parity():
    from vitef_tpu.models.serving import DecodeServer, Request

    m = llama_tiny()
    rng = np.random.default_rng(9)
    prefix = rng.integers(0, 256, size=(6,)).tolist()
    prompts = [rng.integers(0, 256, size=(l,)).tolist() for l in (4, 7, 3)]
    srv = DecodeServer(m.params, m.config, n_slots=2, max_len=32, bucket=4)
    h = srv.register_prefix(prefix)
    reqs = [Request(prompt=p, max_new_tokens=4,
                    prefix=h if i % 2 else None)
            for i, p in enumerate(prompts)]
    srv.serve(reqs)
    for i, (req, p) in enumerate(zip(reqs, prompts)):
        full = (prefix + p) if i % 2 else p
        want = generate(m.params, m.config,
                        jnp.asarray([full], jnp.int32), 4, temperature=0.0)
        assert req.tokens == [int(t) for t in np.asarray(want[0])]


def test_llama_speculative_greedy_parity():
    from vitef_tpu.models.speculative import generate_speculative

    target = llama_tiny(seed=0)
    draft = llama_tiny(seed=5)
    prompt = jnp.asarray(np.random.default_rng(10).integers(
        0, 256, size=(1, 5)), jnp.int32)
    want = generate(target.params, target.config, prompt, 6, temperature=0.0)
    got = generate_speculative(target.params, target.config, prompt, 6,
                               draft_params=draft.params,
                               draft_cfg=draft.config, gamma=3,
                               temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_llama_int8_quantize_and_kv_cache():
    m = llama_tiny()
    qparams = m.quantize_int8()
    assert qparams["blocks"][0]["ffn"]["fc1"]["weight"].dtype == jnp.int8
    assert qparams["output"]["output_layer"]["head"]["weight"].dtype == jnp.int8
    prompt = jnp.asarray(np.random.default_rng(11).integers(
        0, 256, size=(2, 6)), jnp.int32)
    full, _ = prefill(m.params, m.config, prompt, max_len=12)
    quant, _ = prefill(qparams, m.config, prompt, max_len=12)
    a, b = np.asarray(full), np.asarray(quant)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    assert (cos > 0.99).all(), cos
    out = generate(qparams, m.config, prompt, 4, temperature=0.0,
                   kv_cache_dtype="int8")
    assert out.shape == (2, 4)


def test_llama_gqa_cache_is_smaller():
    from vitef_tpu.models.generation import init_kv_cache

    m = llama_tiny()  # 4 heads, 2 kv heads
    cache = init_kv_cache(m.config, batch=2, max_len=16)
    assert cache[0]["k"].shape == (2, 2, 16, 16)  # kv heads, not q heads


def test_llama_train_step_learns():
    """Causal-LM grads flow through rope/GQA/swiglu/rms: a few SGD steps
    reduce the next-token loss."""
    import optax

    m = llama_tiny()
    cfg = m.config
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 16)), jnp.int32)
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1), jnp.int32)

    def loss_fn(p):
        logits = apply_transformer(p, cfg, x).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
        return jnp.mean(lse - gold)

    tx = optax.sgd(0.5)
    params = m.params
    state = tx.init(params)
    first = float(loss_fn(params))
    step = jax.jit(lambda p, s: (lambda g: tx.update(g, s, p))(
        jax.grad(loss_fn)(p)))
    for _ in range(5):
        updates, state = step(params, state)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < first - 0.05


def test_llama_generate_tp_sharded():
    """TP-sharded llama generate == single device (GQA kv heads shard too)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitef_tpu.parallel import build_mesh, shard_params

    m = llama_tiny()
    prompt = jnp.asarray(np.random.default_rng(13).integers(
        0, 256, size=(4, 5)), jnp.int32)
    want = generate(m.params, m.config, prompt, 5, temperature=0.0)
    mesh = build_mesh(dp=4, tp=2)
    params = shard_params(m.params, mesh)
    sp = jax.device_put(prompt, NamedSharding(mesh, P("dp", None)))
    got = jax.jit(lambda pr, pm: generate(pm, m.config, pr, 5,
                                          temperature=0.0))(sp, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# HF golden import
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_hf_llama_import_golden():
    """hf_llama_to_vitef + our forward reproduce the HF torch model's fp32
    logits — pins q/k/v + gate/up concat order, rotate_half rope, GQA
    grouping, RMSNorm and untied-head conventions in one shot."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from vitef_tpu.models.torch_import import (
        from_vitef_state_dict,
        hf_llama_to_vitef,
        torch_state_dict_to_numpy,
    )

    hf_cfg = HFLlamaConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-5,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    sd = hf_llama_to_vitef(torch_state_dict_to_numpy(hf_model.state_dict()),
                           n_layers=2)
    params = from_vitef_state_dict(dict(sd), n_layers=2)
    m = llama_tiny()

    toks = np.random.default_rng(14).integers(0, 256, size=(2, 10))
    with torch.no_grad():
        want = hf_model(torch.tensor(toks)).logits.numpy()
    got = np.asarray(apply_transformer(params, m.config,
                                       jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-3)
