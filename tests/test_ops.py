"""Op-level tests: XLA reference paths vs numpy, Pallas kernels (interpret mode
on CPU) vs XLA paths, and custom-VJP gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vitef_tpu.ops.attention import attention_reference, flash_attention
from vitef_tpu.ops.layernorm import layer_norm, layer_norm_xla


def numpy_attention(q, k, v, causal=False):
    d = q.shape[-1]
    scores = np.einsum("nhqd,nhkd->nhqk", q, k).astype(np.float64) / np.sqrt(d)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        mask = np.tril(np.ones((lq, lk), bool))
        scores = np.where(mask, scores, -1e30)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum("nhqk,nhkd->nhqd", w, v)


class TestLayerNorm:
    def test_xla_vs_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 7, 96)).astype(np.float32)
        w = rng.normal(size=(96,)).astype(np.float32)
        b = rng.normal(size=(96,)).astype(np.float32)
        out = layer_norm_xla(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-12)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        ref = (x - mu) / np.sqrt(var + 1e-12) * w + b
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_pallas_interpret_matches_xla(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 5, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        ref = layer_norm(x, w, b, eps=1e-6, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            out = layer_norm(x, w, b, eps=1e-6, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_grad_matches_xla(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 3, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

        def loss(impl):
            def f(x, w, b):
                out = layer_norm(x, w, b, eps=1e-6, impl=impl)
                return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent
            return f

        gx_ref, gw_ref, gb_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, b)
        with pltpu.force_tpu_interpret_mode():
            gx, gw, gb = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, w, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-3)

    def test_no_bias(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
        out = layer_norm(x, w, None, eps=1e-5, impl="xla")
        assert out.shape == (4, 64)


class TestAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_xla_vs_numpy(self, causal):
        rng = np.random.default_rng(4)
        q, k, v = (rng.normal(size=(2, 3, 17, 16)).astype(np.float32) for _ in range(3))
        out = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  causal=causal)
        ref = numpy_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("seq_len", [64, 197])
    def test_pallas_interpret_matches_xla(self, causal, seq_len):
        rng = np.random.default_rng(5)
        q, k, v = (rng.normal(size=(1, 2, seq_len, 32)).astype(np.float32)
                   for _ in range(3))
        ref = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              causal=causal, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  causal=causal, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_flash_grad_matches_xla(self):
        rng = np.random.default_rng(6)
        q, k, v = (jnp.asarray(rng.normal(size=(1, 2, 64, 32)).astype(np.float32))
                   for _ in range(3))

        def loss(impl):
            def f(q, k, v):
                return jnp.sum(jnp.square(
                    flash_attention(q, k, v, causal=False, impl=impl)))
            return f

        ref_grads = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            grads = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
        for g, gr in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)

    def test_verbose_weights_rows_sum_to_one(self):
        rng = np.random.default_rng(7)
        q, k, v = (jnp.asarray(rng.normal(size=(2, 2, 9, 8)).astype(np.float32))
                   for _ in range(3))
        _, w = attention_reference(q, k, v, return_weights=True)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)


class TestFlashBackwardKernel:
    """Fused small-L backward (interpret mode) vs XLA autodiff."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_reference(self, causal):
        from vitef_tpu.ops.attention import attention_reference, flash_attention

        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(2, 4, 37, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 4, 37, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 4, 37, 16)).astype(np.float32))

        def f_ref(q, k, v):
            return jnp.sum(jnp.sin(attention_reference(q, k, v, causal=causal)))

        def f_pl(q, k, v):
            return jnp.sum(jnp.sin(
                flash_attention(q, k, v, causal=causal, impl="pallas")))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(f_pl, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

    def test_long_l_uses_remat_fallback(self):
        """Above the VMEM budget the bwd path is the XLA remat (still correct)."""
        from vitef_tpu.ops.attention import _BWD_VMEM_BUDGET

        h, l = 12, 1024
        assert 2 * h * l * l * 4 > _BWD_VMEM_BUDGET  # GPT2 scale → fallback


class TestPackedMHA:
    """Packed-qkv fused MHA kernel (interpret mode) vs the XLA reference."""

    def _setup(self, n=2, h=3, l=13, d=8, dtype=jnp.float32):
        e = h * d
        rng = np.random.default_rng(7)
        qkv = jnp.asarray(rng.normal(size=(n, l, 3 * e)) * 0.5, dtype)
        def unpack(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return tuple(
                t.reshape(n, l, h, d).transpose(0, 2, 1, 3) for t in (q, k, v)
            )
        return qkv, unpack, (n, h, l, d, e)

    @pytest.mark.parametrize("causal", [False, True])
    def test_fwd_matches_reference(self, causal):
        from vitef_tpu.ops.attention import attention_reference, fused_mha_packed

        qkv, unpack, (n, h, l, d, e) = self._setup()
        with pltpu.force_tpu_interpret_mode():
            out = fused_mha_packed(qkv, h, causal)
        q, k, v = unpack(qkv)
        ref = attention_reference(q, k, v, causal=causal)
        ref = ref.transpose(0, 2, 1, 3).reshape(n, l, e)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_bwd_matches_reference(self, causal):
        from vitef_tpu.ops.attention import attention_reference, fused_mha_packed

        qkv, unpack, (n, h, l, d, e) = self._setup()
        g = jnp.asarray(np.random.default_rng(8).normal(size=(n, l, e)),
                        jnp.float32)

        def loss_packed(qkv):
            return (fused_mha_packed(qkv, h, causal) * g).sum()

        def loss_ref(qkv):
            q, k, v = unpack(qkv)
            o = attention_reference(q, k, v, causal=causal)
            return (o.transpose(0, 2, 1, 3).reshape(n, l, e) * g).sum()

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_packed)(qkv)
        gr = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3)

    def test_model_pallas_path_dtype_gate(self):
        """multi_head_attention(impl='pallas'): bf16 takes the packed kernel,
        fp32 keeps the (round-1-validated) blocked flash path — both match the
        xla path (interpret mode)."""
        from vitef_tpu.ops.attention import multi_head_attention

        rng = np.random.default_rng(9)
        n, l, e, heads = 2, 13, 24, 3
        arrs = [rng.normal(size=(n, l, e)),
                rng.normal(size=(e, 3 * e)) * 0.1,
                rng.normal(size=(3 * e,)) * 0.1,
                rng.normal(size=(e, e)) * 0.1,
                rng.normal(size=(e,)) * 0.1]
        for dtype, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
            x, qkv_w, qkv_b, out_w, out_b = (jnp.asarray(a, dtype) for a in arrs)
            ref = multi_head_attention(x, qkv_w, qkv_b, out_w, out_b,
                                       n_heads=heads, impl="xla")
            with pltpu.force_tpu_interpret_mode():
                out = multi_head_attention(x, qkv_w, qkv_b, out_w, out_b,
                                           n_heads=heads, impl="pallas")
            np.testing.assert_allclose(
                np.asarray(out.astype(jnp.float32)),
                np.asarray(ref.astype(jnp.float32)), atol=atol, rtol=1e-2)


class TestPackedMHABias:
    """In-kernel qkv bias + accumulated bias gradient vs the XLA reference."""

    def test_bias_fwd_and_grads(self):
        from vitef_tpu.ops.attention import attention_reference, fused_mha_packed

        n, h, l, d = 3, 2, 9, 8
        e = h * d
        rng = np.random.default_rng(11)
        qkv = jnp.asarray(rng.normal(size=(n, l, 3 * e)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(3 * e,)) * 0.3, jnp.float32)
        g = jnp.asarray(rng.normal(size=(n, l, e)), jnp.float32)

        def ref_fn(qkv, bias):
            qb = qkv + bias
            q, k, v = jnp.split(qb, 3, axis=-1)
            q, k, v = (t.reshape(n, l, h, d).transpose(0, 2, 1, 3)
                       for t in (q, k, v))
            o = attention_reference(q, k, v)
            return o.transpose(0, 2, 1, 3).reshape(n, l, e)

        with pltpu.force_tpu_interpret_mode():
            out = fused_mha_packed(qkv, h, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_fn(qkv, bias)),
                                   atol=2e-5, rtol=1e-4)

        def loss_packed(qkv, bias):
            return (fused_mha_packed(qkv, h, bias=bias) * g).sum()

        def loss_ref(qkv, bias):
            return (ref_fn(qkv, bias) * g).sum()

        with pltpu.force_tpu_interpret_mode():
            dq_p, db_p = jax.grad(loss_packed, argnums=(0, 1))(qkv, bias)
        dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_r),
                                   atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r),
                                   atol=5e-5, rtol=1e-3)


class TestFastTopK:
    """ops.topk.top_k: exact two-stage selection ≡ lax.top_k bit-for-bit."""

    def test_exact_match_large_vocab(self):
        from vitef_tpu.ops.topk import top_k

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((7, 50257), dtype=np.float32))
        for k in (1, 5, 40, 200):
            vals, idx = top_k(x, k)
            rv, ri = jax.lax.top_k(x, k)
            np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))

    def test_tie_order_matches_lax(self):
        from vitef_tpu.ops.topk import top_k

        # Duplicated values straddling group boundaries: lax.top_k breaks ties
        # by ascending index; two-stage must reproduce that exactly.
        rng = np.random.default_rng(1)
        base = rng.integers(0, 50, size=(3, 4096)).astype(np.float32)
        x = jnp.asarray(base)
        vals, idx = top_k(x, 17, group=512)
        rv, ri = jax.lax.top_k(x, 17)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))

    def test_neg_inf_rows_exact(self):
        """Caller-masked logits: rows containing -inf (incl. all--inf and
        fewer-than-k-finite rows) must still match lax.top_k bit-for-bit —
        the -inf pad slots must never leak out-of-range indices, at both
        divisible and ragged (v % group != 0, last group shorter than k)
        vocab sizes."""
        from vitef_tpu.ops.topk import top_k

        rng = np.random.default_rng(2)
        for v in (520, 1000, 50257):  # 520: last group has only 8 real slots
            rows = [np.full(v, -np.inf, np.float32)]
            r = np.full(v, -np.inf, np.float32)
            r[rng.choice(v, 5, replace=False)] = rng.standard_normal(5)
            rows.append(r)  # fewer than k finite entries
            r = np.full(v, -np.inf, np.float32)
            r[: v // 2] = 5.0
            rows.append(r)  # massive ties + -inf tail
            r = rng.standard_normal(v).astype(np.float32)
            r[rng.choice(v, v // 2, replace=False)] = -np.inf
            rows.append(r)
            x = jnp.asarray(np.stack(rows))
            vals, idx = top_k(x, 40, group=512)
            rv, ri = jax.lax.top_k(x, 40)
            np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
            assert int(np.asarray(idx).max()) < v

    def test_small_axis_and_int_fallback(self):
        from vitef_tpu.ops.topk import top_k

        x = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
        vals, idx = top_k(x, 2)
        np.testing.assert_array_equal(np.asarray(idx), [[0, 2]])
        xi = jnp.asarray([[5, 9, 1, 7]], jnp.int32)
        vals, idx = top_k(xi, 2)
        np.testing.assert_array_equal(np.asarray(idx), [[1, 3]])

    def test_nondivisible_padding_never_selected(self):
        from vitef_tpu.ops.topk import top_k

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 1025), dtype=np.float32)) - 100.0
        vals, idx = top_k(x, 8, group=256)
        rv, ri = jax.lax.top_k(x, 8)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
        assert (np.asarray(idx) < 1025).all()

    def test_jit_and_batch_dims(self):
        from vitef_tpu.ops.topk import top_k

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 3, 2048), dtype=np.float32))
        vals, idx = jax.jit(lambda t: top_k(t, 6, group=256))(x)
        rv, ri = jax.lax.top_k(x, 6)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


class TestPackedMHAMasked:
    """Ragged-serving key_mask inside the packed kernel: left-padded batches
    must match the XLA einsum reference on every valid query row, through
    BOTH the full-L and the block-triangular causal paths."""

    @pytest.mark.parametrize("l", [128, 512])  # full-L / blocked (L>=512)
    def test_masked_matches_reference(self, l):
        from vitef_tpu.ops.attention import (
            attention_reference, fused_mha_packed)

        n, h, d = 3, 2, 16
        e = h * d
        rng = np.random.default_rng(5)
        qkv = jnp.asarray(rng.normal(size=(n, l, 3 * e)) * 0.5, jnp.float32)
        starts = [0, l // 3, l - 2]  # unpadded, ragged, nearly-all-pad
        mask = np.zeros((n, l), bool)
        for i, s in enumerate(starts):
            mask[i, s:] = True

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(n, l, h, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        scores_mask = jnp.asarray(mask)[:, None, None, :]
        # reference with key mask: reuse attention_reference's kv_len-free
        # form by masking scores manually
        import math as _math

        s = jnp.einsum("nhqd,nhkd->nhqk", q, k) / _math.sqrt(d)
        causal = jnp.arange(l)[None, :] <= jnp.arange(l)[:, None]
        s = jnp.where(causal[None, None] & scores_mask, s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("nhqk,nhkd->nhqd", w, v)
        ref = ref.transpose(0, 2, 1, 3).reshape(n, l, e)

        with pltpu.force_tpu_interpret_mode():
            out = fused_mha_packed(qkv, h, causal=True,
                                   key_mask=jnp.asarray(mask))
        for i, st in enumerate(starts):
            np.testing.assert_allclose(
                np.asarray(out)[i, st:], np.asarray(ref)[i, st:],
                atol=2e-5, rtol=1e-4, err_msg=f"row {i} start {st}")


class TestNextTokenCrossEntropy:
    """logsumexp-gather CE (ops/losses.py) vs the textbook log_softmax+gather
    form: identical loss AND identical gradients (the perf rewrite must not
    change training numerics)."""

    @staticmethod
    def _textbook(logits, tokens):
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, tokens[:, 1:][..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_textbook(self, dtype):
        from vitef_tpu.ops import next_token_cross_entropy

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(4, 9, 64)) * 3, dtype)
        toks = jnp.asarray(rng.integers(0, 64, size=(4, 9)), jnp.int32)
        a, ga = jax.value_and_grad(next_token_cross_entropy)(logits, toks)
        b, gb = jax.value_and_grad(self._textbook)(logits, toks)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ga, np.float32),
                                   np.asarray(gb, np.float32),
                                   atol=1e-6, rtol=1e-5)

    def test_ignore_index(self):
        from vitef_tpu.ops import next_token_cross_entropy

        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.float32)
        toks = np.asarray(rng.integers(1, 32, size=(2, 8)), np.int32)
        toks[0, 5:] = 0  # padding
        masked = next_token_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(toks), ignore_index=0)
        # manual mean over valid targets only
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -np.take_along_axis(np.asarray(lp), toks[:, 1:, None],
                                  axis=-1)[..., 0]
        valid = toks[:, 1:] != 0
        np.testing.assert_allclose(float(masked), nll[valid].mean(), rtol=1e-6)


class TestPackedCausalBlocked:
    """Block-triangular causal packed kernel (L >= 512, L % 256 == 0) vs the
    XLA reference — forward and the blocked backward."""

    def test_fwd_and_grads_match_reference(self):
        from vitef_tpu.ops.attention import (
            _causal_q_block, attention_reference, fused_mha_packed)

        n, h, l, d = 1, 2, 512, 16
        assert _causal_q_block(l, True) == 256  # blocked path engaged
        e = h * d
        rng = np.random.default_rng(21)
        qkv = jnp.asarray(rng.normal(size=(n, l, 3 * e)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(3 * e,)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.normal(size=(n, l, e)), jnp.float32)

        def ref_fn(qkv, bias):
            q, k, v = jnp.split(qkv + bias, 3, axis=-1)
            q, k, v = (t.reshape(n, l, h, d).transpose(0, 2, 1, 3)
                       for t in (q, k, v))
            o = attention_reference(q, k, v, causal=True)
            return o.transpose(0, 2, 1, 3).reshape(n, l, e)

        with pltpu.force_tpu_interpret_mode():
            out = fused_mha_packed(qkv, h, causal=True, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_fn(qkv, bias)),
                                   atol=2e-5, rtol=1e-4)

        def loss_packed(qkv, bias):
            return (fused_mha_packed(qkv, h, causal=True, bias=bias) * g).sum()

        def loss_ref(qkv, bias):
            return (ref_fn(qkv, bias) * g).sum()

        with pltpu.force_tpu_interpret_mode():
            dq_p, db_p = jax.grad(loss_packed, argnums=(0, 1))(qkv, bias)
        dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_r),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r),
                                   atol=1e-3, rtol=1e-3)

    def test_gate(self):
        from vitef_tpu.ops.attention import _causal_q_block

        assert _causal_q_block(197, True) is None     # ViT length
        assert _causal_q_block(512, False) is None    # non-causal
        assert _causal_q_block(1024, True) == 256     # GPT2
        assert _causal_q_block(300, True) is None     # not block-aligned
