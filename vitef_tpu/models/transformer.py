"""Generic encoder/decoder transformer — functional JAX core.

Reference: src/vitef/models/transformer/architecture.py (TransformerConfig :48-123,
SelfAttention :131-239, FeedForward :247-299, TransformerBlock :307-502,
Embedding :510-678, Output :686-775, Transformer :783-911).

TPU-first redesign:
  - Pure functional: ``params = init_transformer(key, cfg)`` builds a pytree of
    named parameter dicts; ``apply_transformer(params, cfg, x)`` is a pure jittable
    function. No module objects, no mutation.
  - Parameter tree names mirror the reference state-dict vocabulary
    (``embedding.{patching,token_emb,cls_token,pos_emb}``,
    ``blocks[i].{attn_norm, attn.qkv_mat, attn.output, ffn_norm, ffn.fc1, ffn.fc2}``,
    ``output.output_layer.*``) so the freeze-component map
    (reference apps/vit/utils.py:67-74) and the HF weight correspondence
    (reference vit.py:263-303) port directly.
  - Linear weights are stored (in, out) for ``x @ w`` — torch/HF (out, in) weights
    are transposed at import time (see vit.py/gpt2.py presets).
  - Mixed precision: params live in float32; activations run in
    ``cfg.compute_dtype`` (bfloat16 on TPU), with fp32 matmul accumulation and
    fp32 layernorm/softmax statistics.
  - ``get_decomposition`` / ``get_probes`` are jittable instrumented applies that
    return per-component activations **on device** (the reference moves each to
    CPU immediately — architecture.py:402-416); host transfer is the caller's
    choice. Their quirks are reproduced exactly: decomposition applies every
    component of every block to the same embedding-layer output (architecture.py
    :877-881 never advances the hidden state) and fc2 receives the zero-padded
    input ``cat(x, 0, 0, 0)`` (architecture.py:414-416).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.common import best_precision, dropout as _dropout
from .norms import apply_norm, init_norm
from .patching import (
    extract_patches_chw,
    image_patch_dims,
    patch_images_raw,
    patch_timeseries,
    timeseries_patch_dims,
)

# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass
class TransformerConfig:
    """Superset of the reference TransformerConfig (architecture.py:48-123) plus
    TPU execution knobs (compute_dtype / impl / remat)."""

    # Data parameters
    image_dim: tuple = (3, 224, 224)
    length: int = 512

    # Patching parameters
    patch_type: str | None = None  # None | computer_vision | time_series
    image_patch: str = "hybrid"  # raw | hybrid
    patch_size: int = 16
    stride: int = 8

    # Embedding parameters
    vocab_size: int = -1
    emb_type: str = "dict"  # dict | linear
    emb_dim: int = -1
    pos_emb: bool = True
    freeze_pos: bool = False
    seq_len: int = -1
    emb_dropout: float | None = None

    # Attention parameters
    n_heads: int = -1
    attn_bias: bool = False
    attn_dropout: float | None = None
    flash: bool = True  # use the fused kernel path (verbose falls back to einsum)
    causal: bool = False
    # Grouped-query attention (llama/mistral-family, beyond-parity): K/V use
    # n_kv_heads < n_heads heads, each shared by n_heads/n_kv_heads query
    # groups — the KV cache (decode's bandwidth bound) shrinks by the same
    # factor. -1 = n_heads (standard MHA, the reference's only mode).
    n_kv_heads: int = -1
    # 'learned' = absolute position table (the reference's only mode);
    # 'rope' = rotary embeddings on q/k (models/rope.py) — no table, no
    # seq_len cap on the encoding itself.
    pos_emb_type: str = "learned"
    rope_theta: float = 10000.0

    # Feed-forward parameters
    activation: str = "gelu"
    ffn_dim: int | None = None
    ffn_bias: bool = False
    ffn_dropout: float | None = None
    # 'mlp' = fc1 -> activation -> fc2 (the reference's FeedForward);
    # 'swiglu' = fc1 packs [gate ++ up] (E, 2F), out = silu(gate) * up -> fc2.
    ffn_type: str = "mlp"
    # n_experts > 0 replaces every block's dense FFN with a mixture of
    # n_experts expert FFNs of the configured ffn_type behind a softmax
    # top-k router (Switch/GShard semantics — parallel/moe.py holds the
    # math and its expert-parallel 'ep' form). 0 = dense (the reference).
    n_experts: int = 0
    moe_top_k: int = 2
    # Router auxiliary-loss coefficients (parallel/moe.router_aux): Switch
    # load-balance (Mixtral ships 0.02) and ST-MoE z-loss (1e-3 typical).
    # Consumed by parallel/train_step.make_train_step via
    # apply(..., return_moe_aux=True); 0.0 = off.
    moe_lb_coef: float = 0.0
    moe_z_coef: float = 0.0

    # Transformer block parameters
    norm: str = "layer"  # batch | layer | rms
    norm_bias: bool = False
    norm_eps: float = 1e-5
    pre_norm: bool = True

    # Transformer parameters
    n_layers: int = -1
    dropout: float = 0.0

    # Task-specific parameters
    cls_token: bool = False
    output_type: str = "sequence_to_sequence"
    weight_tying: bool = True
    output_dropout: float | None = None
    n_classes: int = -1
    forecasting_horizon: int = -1

    # --- TPU execution knobs (not in the reference) ---
    compute_dtype: str = "float32"  # activation dtype: float32 | bfloat16
    attn_impl: str = "auto"  # auto | pallas | xla
    norm_impl: str = "auto"
    # MoE FFN form: sparse = sorted dropless dispatch + grouped matmul
    # (activated FLOPs/weight-traffic only), dense = all-experts gate-masked
    # oracle. auto = sparse on a single-device TPU (parallel/moe.py).
    # ep_sparse = expert-parallel sparse dispatch (row-bucket all_to_all to
    # the expert owners over an 'ep' mesh axis) — ONLY valid inside a
    # shard_map with an 'ep' axis (parallel/moe.make_moe_ep_train_step
    # builds the step; it sets this on its inner config).
    moe_impl: str = "auto"  # auto | dense | sparse | ep_sparse
    # Switch capacity-factor for the ep_sparse send buckets:
    # capacity = ceil(T_loc·top_k/ep · factor). None = provably dropless
    # (T_loc·top_k rows per bucket — the oracle setting, ep× over-allocated).
    moe_capacity_factor: float | None = None
    remat: bool = False  # jax.checkpoint each block (HBM↔FLOPs trade)

    # Derived (filled in __post_init__)
    n_patches: int = field(default=-1)
    patch_dim: int = field(default=-1)

    def __post_init__(self):
        if self.ffn_dim is None:
            self.ffn_dim = 4 * self.emb_dim
        for name in ("emb_dropout", "attn_dropout", "ffn_dropout", "output_dropout"):
            if getattr(self, name) is None:
                setattr(self, name, self.dropout)
        if isinstance(self.image_dim, list):
            self.image_dim = tuple(self.image_dim)
        # Patching-derived dims (reference Embedding.__init__ mutates config:
        # architecture.py:570-595 sets seq_len=n_patches, vocab_size=patch_dim).
        if self.patch_type:
            pt = self.patch_type.lower()
            if pt == "computer_vision":
                self.n_patches, self.patch_dim = image_patch_dims(
                    self.image_dim, self.patch_size
                )
            elif pt == "time_series":
                self.n_patches, self.patch_dim = timeseries_patch_dims(
                    self.length, self.patch_size, self.stride
                )
            else:
                raise ValueError(f"Unknown patch_type {self.patch_type!r}")
            self.seq_len = self.n_patches
            self.vocab_size = self.patch_dim
        if self.cls_token:
            self.seq_len = self.seq_len + 1
        if self.emb_dim > 0 and self.n_heads > 0:
            assert self.emb_dim % self.n_heads == 0, (
                "Embedding dimension must be divisible by number of heads."
            )
        if self.n_kv_heads < 0:
            self.n_kv_heads = self.n_heads
        if self.n_heads > 0:
            assert self.n_heads % self.n_kv_heads == 0, (
                "n_heads must be a multiple of n_kv_heads (GQA groups)")
        pe = self.pos_emb_type.lower()
        if pe not in ("learned", "rope"):
            raise ValueError(f"Unknown pos_emb_type {self.pos_emb_type!r}")
        if pe == "rope":
            # rotary replaces the learned table entirely
            self.pos_emb = False
        if self.ffn_type.lower() not in ("mlp", "swiglu"):
            raise ValueError(f"Unknown ffn_type {self.ffn_type!r}")
        if self.n_experts:
            if self.n_experts < 0:
                raise ValueError("n_experts must be >= 0")
            if not 0 < self.moe_top_k <= self.n_experts:
                raise ValueError("moe_top_k must be in [1, n_experts]")

    # -- helpers --------------------------------------------------------
    @property
    def uses_rope(self) -> bool:
        return self.pos_emb_type.lower() == "rope"

    @property
    def uses_gqa(self) -> bool:
        return self.n_kv_heads not in (-1, self.n_heads)

    @property
    def head_dim(self) -> int:
        return self.emb_dim // self.n_heads

    @property
    def kv_dim(self) -> int:
        """Total K (== V) projection width: n_kv_heads * head_dim."""
        return self.n_kv_heads * self.head_dim

    @property
    def hybrid_identity_emb(self) -> bool:
        """Hybrid CV patching replaces token_emb by identity (architecture.py:622-629)."""
        return bool(
            self.patch_type
            and self.patch_type.lower() == "computer_vision"
            and self.image_patch.lower() == "hybrid"
        )

    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def config_to_dict(cfg: TransformerConfig) -> dict:
    return dataclasses.asdict(cfg)


# ---------------------------------------------------------------------------
# Initialization (matches torch layer defaults: Linear/Conv U(±1/√fan_in),
# Embedding N(0,1), norms ones/zeros, cls/pos tokens N(0,1))
# ---------------------------------------------------------------------------


def _init_linear(key, fan_in: int, fan_out: int, bias: bool) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    p = {"weight": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return p


def init_embedding(key, cfg: TransformerConfig) -> dict:
    keys = jax.random.split(key, 4)
    p: dict[str, Any] = {}
    if cfg.patch_type and cfg.patch_type.lower() == "computer_vision" \
            and cfg.image_patch.lower() == "hybrid":
        # Conv2d(C→E, k=P, s=P) as a (C·P·P, E) matmul over extracted patches.
        c = cfg.image_dim[0]
        fan_in = c * cfg.patch_size**2
        p["patching"] = {"conv": _init_linear(keys[0], fan_in, cfg.emb_dim, bias=True)}
    if not cfg.hybrid_identity_emb:
        if cfg.emb_type.lower() == "dict":
            p["token_emb"] = {
                "weight": jax.random.normal(keys[1], (cfg.vocab_size, cfg.emb_dim))
            }
        elif cfg.emb_type.lower() == "linear":
            p["token_emb"] = _init_linear(keys[1], cfg.vocab_size, cfg.emb_dim, bias=True)
        else:
            raise ValueError(f"Unknown embedding layer {cfg.emb_type!r}")
    if cfg.cls_token:
        p["cls_token"] = jax.random.normal(keys[2], (1, 1, cfg.emb_dim))
    if cfg.pos_emb:
        p["pos_emb"] = jax.random.normal(keys[3], (1, cfg.seq_len, cfg.emb_dim))
    return p


def init_block(key, cfg: TransformerConfig) -> dict:
    keys = jax.random.split(key, 4)
    e, f = cfg.emb_dim, cfg.ffn_dim
    # GQA: qkv packs [q (E) ++ k (kv_dim) ++ v (kv_dim)]; MHA is 3E.
    qkv_out = e + 2 * cfg.kv_dim
    # swiglu: fc1 packs [gate ++ up] (E, 2F)
    fc1_out = 2 * f if cfg.ffn_type.lower() == "swiglu" else f
    return {
        "attn_norm": init_norm(e, cfg.norm_bias, cfg.norm),
        "attn": {
            "qkv_mat": _init_linear(keys[0], e, qkv_out, cfg.attn_bias),
            "output": _init_linear(keys[1], e, e, cfg.attn_bias),
        },
        "ffn_norm": init_norm(e, cfg.norm_bias, cfg.norm),
        "ffn": _init_block_ffn(keys[2], keys[3], cfg, fc1_out),
    }


def _init_block_ffn(k1, k2, cfg: TransformerConfig, fc1_out: int) -> dict:
    if cfg.n_experts:
        # Mixture-of-experts FFN (router + stacked expert fc1/fc2). Lazy
        # import: parallel/moe.py imports this module at its top level.
        from ..parallel.moe import init_moe_ffn

        return init_moe_ffn(k1, cfg, cfg.n_experts)
    # dense: identical key usage to the pre-MoE init (bit-exact init parity)
    return {
        "fc1": _init_linear(k1, cfg.emb_dim, fc1_out, cfg.ffn_bias),
        "fc2": _init_linear(k2, cfg.ffn_dim, cfg.emb_dim, cfg.ffn_bias),
    }


def init_output(key, cfg: TransformerConfig) -> dict:
    ot = cfg.output_type.lower()
    if ot == "classification":
        return {
            "output_layer": {
                "norm": init_norm(cfg.emb_dim, cfg.norm_bias, cfg.norm),
                "head": _init_linear(key, cfg.emb_dim, cfg.n_classes, bias=True),
            }
        }
    if ot == "forecasting":
        return {
            "output_layer": {
                "head": _init_linear(
                    key, cfg.seq_len * cfg.emb_dim, cfg.forecasting_horizon, bias=True
                )
            }
        }
    if ot == "sequence_to_sequence":
        p: dict[str, Any] = {"norm": init_norm(cfg.emb_dim, cfg.norm_bias, cfg.norm)}
        if not cfg.weight_tying:
            p["head"] = _init_linear(key, cfg.emb_dim, cfg.vocab_size, bias=False)
        return {"output_layer": p}
    raise ValueError(f"Unknown output {cfg.output_type!r}")


def init_transformer(key, cfg: TransformerConfig) -> dict:
    k_emb, k_blocks, k_out = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, cfg.n_layers)
    return {
        "embedding": init_embedding(k_emb, cfg),
        "blocks": [init_block(block_keys[i], cfg) for i in range(cfg.n_layers)],
        "output": init_output(k_out, cfg),
    }


def n_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _gelu_dtype_aware(x):
    """'gelu': exact erf in fp32 (torch F.gelu parity — golden/analysis paths),
    tanh approximation in bf16. Measured on v5e: the erf is ~1.5 ms/layer of
    serialized VPU work inside the fc1 fusion (fwd 5.05 -> 3.53 ms at bench
    shapes); the tanh-erf delta (max ~3e-3 absolute) is below bf16's own
    rounding, so the bf16 TRAINING path loses nothing. Force either with
    activation='gelu_exact' / 'gelu_tanh'."""
    return jax.nn.gelu(x, approximate=jnp.dtype(x.dtype) == jnp.bfloat16)


_ACTIVATIONS = {
    "gelu": _gelu_dtype_aware,
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
}


def get_activation(name: str):
    fn = _ACTIVATIONS.get(name.lower())
    if fn is None:
        raise ValueError(f"Unknown activation function {name!r}")
    return fn


def _linear(p: dict, x, compute_dtype):
    """Linear layer in the compute dtype.

    bf16 path: matmul emits bf16 directly (the MXU still accumulates fp32
    internally) — emitting fp32 and casting would (a) double the intermediate's
    HBM traffic and (b) push fp32 cotangents through every backward matmul,
    which the v5e trace showed as the dominant convert+reduce cost. fp32 path
    (parity/analysis): true-fp32 matmul via best_precision.

    int8 weights (models/quantize.py, inference-only): the weight streams
    from HBM as int8 — half the bytes of the weight-bandwidth-bound decode
    step — with the per-out-channel f32 scale applied to the (small) output
    AFTER the contraction; dequantized weights never materialise. The
    int8→compute-dtype convert fuses into the einsum (values ≤ 127 are
    bf16-exact), accumulation is f32, and power-of-two scales make the scale
    multiply commute bit-exactly with the matmul sums.
    """
    xc = x.astype(compute_dtype)
    if p["weight"].dtype == jnp.int8:
        w = p["weight"].astype(compute_dtype)
        out = jnp.einsum("...i,ij->...j", xc, w,
                         precision=best_precision(xc),
                         preferred_element_type=jnp.float32)
        out = (out * p["scale"]).astype(compute_dtype)
    else:
        w = p["weight"].astype(compute_dtype)
        out = jnp.einsum(
            "...i,ij->...j", xc, w,
            precision=best_precision(xc, w),
            preferred_element_type=compute_dtype,
        )
    if "bias" in p:
        out = out + p["bias"].astype(compute_dtype)
    return out


def apply_embedding(params: dict, cfg: TransformerConfig, x, *,
                    deterministic: bool = True, rng=None):
    """Patch → token_emb → cls prepend → +pos_emb → dropout (architecture.py:644-678)."""
    cd = cfg.cdtype()
    if cfg.patch_type:
        pt = cfg.patch_type.lower()
        if pt == "computer_vision":
            if cfg.image_patch.lower() == "hybrid":
                patches = extract_patches_chw(x.astype(cd), cfg.patch_size)
                out = _linear(params["patching"]["conv"], patches, cd)
            else:
                out = patch_images_raw(x.astype(cd), cfg.patch_size)
        else:
            out = patch_timeseries(x.astype(cd), cfg.patch_size, cfg.stride)
    else:
        out = x
    if "token_emb" in params:
        te = params["token_emb"]
        if cfg.emb_type.lower() == "dict":
            out = te["weight"].astype(cd)[out]
        else:
            out = _linear(te, out, cd)
    n = out.shape[0]
    if cfg.cls_token:
        cls = jnp.broadcast_to(
            params["cls_token"].astype(cd), (n, 1, cfg.emb_dim)
        )
        out = jnp.concatenate([cls, out], axis=1)
    if cfg.pos_emb:
        l = out.shape[1]
        out = out + params["pos_emb"][:, :l].astype(cd)
    if not deterministic and cfg.emb_dropout > 0:
        out = _dropout(out, cfg.emb_dropout, rng, deterministic=False)
    return out


def split_qkv(cfg: TransformerConfig, qkv):
    """Split the packed projection (..., E + 2*kv_dim) into (q, k, v)."""
    e, kvd = cfg.emb_dim, cfg.kv_dim
    return qkv[..., :e], qkv[..., e:e + kvd], qkv[..., e + kvd:]


def _attention_modern(params: dict, cfg: TransformerConfig, x,
                      verbose: bool = False):
    """GQA / RoPE attention (llama-family; beyond-parity — the reference has
    only learned-absolute-position MHA, architecture.py:131-239).

    qkv packs [q (E) ++ k (kv_dim) ++ v (kv_dim)]; each K/V head serves
    n_heads/n_kv_heads query groups via a grouped einsum (no K/V repeat ever
    materialises). RoPE rotates q/k per head BEFORE attention
    (models/rope.py). bf16 MHA-shaped models (n_kv_heads == n_heads) keep
    the packed fused kernel: the rotation is an elementwise pass on the
    (N, L, 3E) projection output, so the kernel path survives RoPE.
    """
    from ..ops.attention import fused_mha_packed, packed_mha_supported
    from ..ops.common import resolve_impl
    from .rope import apply_rope, rope_angles

    cd = cfg.cdtype()
    n, l, e = x.shape
    h, kv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qkv = _linear(params["qkv_mat"], x, cd)
    q, k, v = split_qkv(cfg, qkv)
    cos = sin = None
    if cfg.uses_rope:
        cos, sin = rope_angles(jnp.arange(l), d, cfg.rope_theta)

    if (not verbose and cd == jnp.bfloat16
            and packed_mha_supported(l, e, 2)
            and resolve_impl(cfg.attn_impl if cfg.flash else "xla",
                             seq_len=l, dtype=cd) == "pallas"):
        if cfg.uses_rope:  # rotate in the packed head-major layout
            cs = (cos[:, None], sin[:, None])  # (L, 1, d/2) over (N,L,*,d)
            q = apply_rope(q.reshape(n, l, h, d), *cs).reshape(n, l, e)
            k = apply_rope(k.reshape(n, l, kv, d), *cs).reshape(n, l, -1)
        if kv < h:
            # GQA through the packed kernel: REPEAT each kv head over its g
            # query heads (a differentiable broadcast — its AD transpose
            # sums the group's dk/dv back onto the shared head). Attention
            # FLOPs are identical to MHA either way; this trades 2(g-1)/3g
            # of extra qkv-slab bytes for the fused kernel's schedule
            # (A/B on llama-124m L=1024: 85.7k -> 154.9k tok/s train, the
            # XLA grouped path materialises the L^2 f32 scores).
            rep = (lambda t: jnp.broadcast_to(
                t.reshape(n, l, kv, 1, d), (n, l, kv, h // kv, d)
            ).reshape(n, l, e))
            k, v = rep(k), rep(v)
        if cfg.uses_rope or kv < h:
            qkv = jnp.concatenate([q, k, v], axis=-1)
        z = fused_mha_packed(qkv, h, causal=cfg.causal)
        return _linear(params["output"], z, cd)

    if (not verbose and cd == jnp.bfloat16
            and resolve_impl(cfg.attn_impl if cfg.flash else "xla",
                             seq_len=l, dtype=cd) == "pallas"):
        # Geometries past the packed kernel's VMEM gate (llama-1b: E=2048 at
        # L=1024 overflows Mosaic's scoped stack — ops/attention.py budget
        # comment) keep a TILED kernel instead of falling to the grouped
        # einsum, which materialises the (N, h, L, L) f32 scores in HBM.
        from ..ops.attention import flash_attention

        qh = q.reshape(n, l, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(n, l, kv, d).transpose(0, 2, 1, 3)
        vh = v.reshape(n, l, kv, d).transpose(0, 2, 1, 3)
        if cfg.uses_rope:
            qh, kh = apply_rope(qh, cos, sin), apply_rope(kh, cos, sin)
        if kv < h:
            rep = (lambda t: jnp.broadcast_to(
                t[:, :, None], (n, kv, h // kv, l, d)).reshape(n, h, l, d))
            kh, vh = rep(kh), rep(vh)
        z = flash_attention(qh, kh, vh, causal=cfg.causal, impl="pallas")
        z = z.transpose(0, 2, 1, 3).reshape(n, l, e)
        return _linear(params["output"], z, cd)

    g = h // kv
    qh = q.reshape(n, l, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(n, l, kv, d).transpose(0, 2, 1, 3)
    vh = v.reshape(n, l, kv, d).transpose(0, 2, 1, 3)
    if cfg.uses_rope:
        qh, kh = apply_rope(qh, cos, sin), apply_rope(kh, cos, sin)
    qg = qh.reshape(n, kv, g, l, d)
    scores = jnp.einsum("nkgqd,nkKd->nkgqK", qg, kh,
                        precision=best_precision(qg, kh),
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(d))
    if cfg.causal:
        mask = jnp.arange(l)[None, :] <= jnp.arange(l)[:, None]
        scores = jnp.where(mask, scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    z = jnp.einsum("nkgqK,nkKd->nkgqd", weights.astype(vh.dtype), vh,
                   precision=best_precision(vh),
                   preferred_element_type=jnp.float32).astype(cd)
    z = z.reshape(n, h, l, d).transpose(0, 2, 1, 3).reshape(n, l, e)
    out = _linear(params["output"], z, cd)
    if verbose:
        return out, weights.reshape(n, h, l, l)
    return out


def apply_attention(params: dict, cfg: TransformerConfig, x, *,
                    deterministic: bool = True, rng=None, verbose: bool = False):
    """Fused-qkv MHA + output proj + dropout (architecture.py:205-239)."""
    if cfg.uses_gqa or cfg.uses_rope:
        res = _attention_modern(params, cfg, x, verbose=verbose)
    else:
        qkv, outp = params["qkv_mat"], params["output"]
        impl = cfg.attn_impl if cfg.flash else "xla"
        res = multi_head_attention(
            x,
            qkv["weight"], qkv.get("bias"),
            outp["weight"], outp.get("bias"),
            n_heads=cfg.n_heads,
            causal=cfg.causal,
            impl=impl,
            verbose=verbose,
            compute_dtype=cfg.cdtype(),
        )
    if verbose:
        z, weights = res
    else:
        z = res
    if not deterministic and cfg.attn_dropout > 0:
        z = _dropout(z, cfg.attn_dropout, rng, deterministic=False)
    if verbose:
        return z, weights
    return z


def apply_ffn(params: dict, cfg: TransformerConfig, x, *,
              deterministic: bool = True, rng=None,
              aux_out: dict | None = None):
    """fc1 → activation → fc2 → dropout (architecture.py:281-299).

    Kept as 3-D einsums: flattening to (N·L, ·) 2-D matmuls was A/B-measured
    7% slower end-to-end on v5e (reshapes add layout copies; the in-graph 3-D
    fusions already run at ~66 TF/s per the compiled HLO cycle estimates).

    NOTE (measured dead end, v5e): wrapping the core in jax.checkpoint with
    the dots-saveable policy (recompute gelu in backward instead of saving
    both the pre-activation and the activation) is 16% SLOWER end-to-end
    (898 vs 1065 img/s) — the fc1 fusion's cost is the serialized erf VPU
    work, not the extra residual write, and the policy recomputes the erf.
    """
    cd = cfg.cdtype()
    if cfg.n_experts:
        # MoE block FFN. 'sparse' = sorted dropless dispatch through the
        # megablox grouped matmul (activated FLOPs only — the single-chip
        # TPU operating point); 'dense' = gate-masked all-experts oracle
        # (also the GSPMD/int8/bias form; parallel/moe.py's
        # apply_moe_ffn_ep is the same math sharded over an 'ep' axis).
        from ..parallel.moe import (apply_moe_ffn, apply_moe_ffn_ep_sparse,
                                    apply_moe_ffn_sparse, resolve_moe_impl)

        n_tokens = x.size // x.shape[-1]
        # The aux losses are filled from the dispatch path's OWN router
        # forward (parallel/moe._route) — shared by construction, not by
        # XLA CSE (which remat or precision drift could break).
        moe_aux: dict | None = {} if aux_out is not None else None
        impl = resolve_moe_impl(cfg, params, n_tokens)
        if impl == "ep_sparse":
            # Expert-parallel sparse dispatch: x is this shard's LOCAL
            # tokens (the step shards the batch over the mesh); the expert
            # stacks are P('ep')-sharded slices of the global stacks.
            out = apply_moe_ffn_ep_sparse(
                params, cfg, x.reshape(-1, x.shape[-1]),
                top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                aux=moe_aux).reshape(x.shape)
        elif impl == "sparse":
            out = apply_moe_ffn_sparse(params, cfg, x, top_k=cfg.moe_top_k,
                                       aux=moe_aux)
        else:
            out = apply_moe_ffn(params, cfg, x, top_k=cfg.moe_top_k,
                                aux=moe_aux)
        if aux_out is not None:
            aux_out["moe_aux"] = moe_aux
    else:
        out = _linear(params["fc1"], x, cd)
        if cfg.ffn_type.lower() == "swiglu":
            # fc1 packs [gate ++ up]: silu(gate) * up (llama-family GLU FFN)
            gate, up = jnp.split(out, 2, axis=-1)
            out = jax.nn.silu(gate) * up
        else:
            out = get_activation(cfg.activation)(out)
        out = _linear(params["fc2"], out, cd)
    if not deterministic and cfg.ffn_dropout > 0:
        out = _dropout(out, cfg.ffn_dropout, rng, deterministic=False)
    return out


def _norm(params, cfg: TransformerConfig, x, deterministic: bool = True,
          stats_out: dict | None = None, stats_key: str = ""):
    """Apply the configured norm; train-mode batch-norm batch statistics are
    collected into ``stats_out[stats_key]`` when a collector dict is passed."""
    if stats_out is None:
        return apply_norm(params, x, kind=cfg.norm, eps=cfg.norm_eps,
                          impl=cfg.norm_impl, deterministic=deterministic)
    out, stats = apply_norm(params, x, kind=cfg.norm, eps=cfg.norm_eps,
                            impl=cfg.norm_impl, deterministic=deterministic,
                            return_stats=True)
    if stats is not None:
        stats_out[stats_key] = stats
    return out


def apply_block(params: dict, cfg: TransformerConfig, x, *,
                deterministic: bool = True, rng=None, verbose: bool = False,
                collect_stats: bool = False, collect_moe_aux: bool = False):
    """Pre-/post-norm transformer block (architecture.py:369-380).

    ``collect_stats=True`` additionally returns the block's train-mode
    batch-norm batch statistics ``{"attn_norm": ..., "ffn_norm": ...}`` as an
    explicit output (explicit so the block stays a pure function under
    ``jax.checkpoint``). ``collect_moe_aux=True`` adds the differentiable
    router auxiliary losses (``{"moe_aux": {"lb", "z"}}`` — see
    parallel/moe.router_aux) to the same explicit collector output.
    """
    stats: dict | None = {} if (collect_stats or collect_moe_aux) else None
    aux_out = stats if collect_moe_aux else None
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    att = None
    if cfg.pre_norm:
        out = apply_attention(params["attn"], cfg,
                              _norm(params["attn_norm"], cfg, x, deterministic,
                                    stats if collect_stats else None, "attn_norm"),
                              deterministic=deterministic, rng=r1, verbose=verbose)
        if verbose:
            out, att = out
        out = x + out
        out = out + apply_ffn(params["ffn"], cfg,
                              _norm(params["ffn_norm"], cfg, out, deterministic,
                                    stats if collect_stats else None, "ffn_norm"),
                              deterministic=deterministic, rng=r2,
                              aux_out=aux_out)
    else:
        out = apply_attention(params["attn"], cfg, x,
                              deterministic=deterministic, rng=r1, verbose=verbose)
        if verbose:
            out, att = out
        out = _norm(params["attn_norm"], cfg, x + out, deterministic,
                    stats if collect_stats else None, "attn_norm")
        out = _norm(params["ffn_norm"], cfg,
                    out + apply_ffn(params["ffn"], cfg, out,
                                    deterministic=deterministic, rng=r2,
                                    aux_out=aux_out),
                    deterministic, stats if collect_stats else None, "ffn_norm")
    if stats is not None:
        return (out, att, stats) if verbose else (out, stats)
    if verbose:
        return out, att
    return out


def apply_output(params: dict, cfg: TransformerConfig, x, *, emb_params=None,
                 deterministic: bool = True, rng=None,
                 stats_out: dict | None = None, pre_head: bool = False):
    """Task head (architecture.py:355-563): classification (CLS-token pool),
    forecasting (flatten), or seq2seq (optionally weight-tied).

    ``pre_head=True`` (seq2seq only): stop after the final norm + dropout
    and return the (N, L, E) hidden rows instead of logits — the input the
    fused head+CE loss (ops/losses.fused_next_token_ce) consumes, which
    never materialises the (N, L, V) logits."""
    cd = cfg.cdtype()
    p = params["output_layer"]
    ot = cfg.output_type.lower()
    if ot == "classification":
        out = _norm(p["norm"], cfg, x, deterministic, stats_out,
                    "output.output_layer.norm")
        if not deterministic and cfg.output_dropout > 0:
            out = _dropout(out, cfg.output_dropout, rng, deterministic=False)
        out = out[:, 0, :]  # CLS token (transformer/utils.py:420)
        return _linear(p["head"], out, cd).astype(jnp.float32)
    if ot == "forecasting":
        n = x.shape[0]
        out = x.reshape(n, -1)
        if not deterministic and cfg.output_dropout > 0:
            out = _dropout(out, cfg.output_dropout, rng, deterministic=False)
        return _linear(p["head"], out, cd).astype(jnp.float32)
    if ot == "sequence_to_sequence":
        out = _norm(p["norm"], cfg, x, deterministic, stats_out,
                    "output.output_layer.norm")
        if not deterministic and cfg.output_dropout > 0:
            out = _dropout(out, cfg.output_dropout, rng, deterministic=False)
        if pre_head:
            return out
        if cfg.weight_tying:
            w = emb_params["token_emb"]["weight"].astype(cd)  # (V, E)
            logits = jnp.einsum("nle,ve->nlv", out.astype(cd), w,
                                precision=best_precision(w),
                                preferred_element_type=jnp.float32)
            return logits.astype(jnp.float32)
        return _linear(p["head"], out, cd).astype(jnp.float32)
    raise ValueError(f"Unknown output {cfg.output_type!r}")


def apply_transformer(params: dict, cfg: TransformerConfig, x, *,
                      deterministic: bool = True, rng=None, verbose: bool = False,
                      return_stats: bool = False, return_moe_aux: bool = False,
                      return_hidden: bool = False):
    """Full forward (architecture.py:824-854). ``verbose=True`` additionally returns
    the stacked (n_layers, N, h, L, L) attention matrices.

    ``return_stats=True`` (train mode, batch norm) additionally returns a flat
    ``{dotted_param_path: {"running_mean", "running_var"}}`` dict of the batch
    statistics of every batch-norm site (nn.BatchNorm1d running-stat semantics;
    see models/norms.py) for the train step to EMA into the params. Empty for
    layer/rms norms. Mutually exclusive with ``verbose``.

    ``return_hidden=True`` (seq2seq only): return the post-final-norm
    (N, L, E) hidden instead of logits — the vocab head is expected to run
    fused into the loss (ops/losses.fused_next_token_ce).
    """
    collect = return_stats and not deterministic and cfg.norm.lower() == "batch"
    collect_aux = bool(return_moe_aux and cfg.n_experts)
    if (return_stats or return_moe_aux) and verbose:
        raise ValueError("return_stats/return_moe_aux and verbose are "
                         "mutually exclusive")
    if return_hidden and cfg.output_type.lower() != "sequence_to_sequence":
        raise ValueError("return_hidden requires a seq2seq output head")
    n_rngs = cfg.n_layers + 2
    rngs = [None] * n_rngs
    if rng is not None and not deterministic:
        rngs = list(jax.random.split(rng, n_rngs))
    out = apply_embedding(params["embedding"], cfg, x,
                          deterministic=deterministic, rng=rngs[0])
    if cfg.remat and not verbose:
        # Close over the static config/flags: jax.checkpoint only accepts
        # array-pytree positional args (rng=None is a valid empty pytree).
        # Batch stats are an explicit checkpointed output (purity).
        @jax.checkpoint
        def block_fn(bp, out, rng):
            return apply_block(bp, cfg, out, deterministic=deterministic,
                               rng=rng, verbose=False, collect_stats=collect,
                               collect_moe_aux=collect_aux)
    else:
        def block_fn(bp, out, rng):
            return apply_block(bp, cfg, out, deterministic=deterministic,
                               rng=rng, verbose=verbose, collect_stats=collect,
                               collect_moe_aux=collect_aux)
    attentions = []
    all_stats: dict = {}
    block_aux: list = []
    for i, bp in enumerate(params["blocks"]):
        out = block_fn(bp, out, rngs[1 + i])
        if collect or collect_aux:
            if verbose:
                out, att, bstats = out
                attentions.append(att)
            else:
                out, bstats = out
            if collect_aux:
                block_aux.append(bstats.pop("moe_aux"))
            for key, val in bstats.items():
                all_stats[f"blocks.{i}.{key}"] = val
        elif verbose:
            out, att = out
            attentions.append(att)
    out = apply_output(params["output"], cfg, out, emb_params=params["embedding"],
                       deterministic=deterministic, rng=rngs[-1],
                       stats_out=all_stats if collect else None,
                       pre_head=return_hidden)
    if verbose:
        out = (out, jnp.stack(attentions))
    if return_moe_aux:
        # per-block mean — the Switch/ST-MoE convention for stacking blocks
        moe_aux = {
            k: (jnp.mean(jnp.stack([a[k] for a in block_aux]))
                if block_aux else jnp.zeros((), jnp.float32))
            for k in ("lb", "z")}
        if return_stats:
            return out, all_stats, moe_aux
        return out, moe_aux
    if return_stats:
        return out, all_stats
    return out


# ---------------------------------------------------------------------------
# Introspection: decomposition & probes (jittable, on-device)
# ---------------------------------------------------------------------------


def block_decompose(params: dict, cfg: TransformerConfig, x) -> dict:
    """Each component applied to the SAME input x (architecture.py:385-418).

    fc2 receives ``cat(x, 0, 0, 0)`` zero-padded to ffn_dim (architecture.py:414-416)
    — a load-bearing quirk of the paper's plasticity statistic; reproduced, not fixed.
    """
    cd = cfg.cdtype()
    out = {
        "attn_norm": _norm(params["attn_norm"], cfg, x),
        "attn": apply_attention(params["attn"], cfg, x, deterministic=True),
        "ffn_norm": _norm(params["ffn_norm"], cfg, x),
        "ffn_fc1": _linear(params["ffn"]["fc1"], x, cd),
    }
    pad = cfg.ffn_dim - cfg.emb_dim
    expanded = jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )
    out["ffn_fc2"] = _linear(params["ffn"]["fc2"], expanded, cd)
    return out


def block_probes(params: dict, cfg: TransformerConfig, x):
    """Hidden state after each of 8 stages (architecture.py:420-502)."""
    cd = cfg.cdtype()
    act = get_activation(cfg.activation)
    probes = {}
    if cfg.pre_norm:
        out = _norm(params["attn_norm"], cfg, x)
        probes["attn_norm"] = out
        out = apply_attention(params["attn"], cfg, out, deterministic=True)
        probes["attn"] = out
        out_res = x + out
        probes["attn_res"] = out_res
        out = _norm(params["ffn_norm"], cfg, out_res)
        probes["ffn_norm"] = out
        out = _linear(params["ffn"]["fc1"], out, cd)
        probes["ffn_fc1"] = out
        out = act(out)
        probes["ffn_activation"] = out
        out = _linear(params["ffn"]["fc2"], out, cd)
        probes["ffn_fc2"] = out
        out = out_res + out
        probes["ffn_res"] = out
    else:
        out = apply_attention(params["attn"], cfg, x, deterministic=True)
        probes["attn"] = out
        out = x + out
        probes["attn_res"] = out
        out_res = _norm(params["attn_norm"], cfg, out)
        probes["attn_norm"] = out_res
        out = _linear(params["ffn"]["fc1"], out_res, cd)
        probes["ffn_fc1"] = out
        out = act(out)
        probes["ffn_activation"] = out
        out = _linear(params["ffn"]["fc2"], out, cd)
        probes["ffn_fc2"] = out
        out = out_res + out
        probes["ffn_res"] = out
        out = _norm(params["ffn_norm"], cfg, out)
        probes["ffn_norm"] = out
    return out, probes


def get_decomposition(params: dict, cfg: TransformerConfig, x) -> dict:
    """Per-block component outputs, all on the embedding-layer output.

    Key vocabulary and no-advance semantics match architecture.py:856-883 exactly:
    keys are ``embedding`` and ``block{i}_{attn_norm,attn,ffn_norm,ffn_fc1,ffn_fc2}``,
    and every block decomposes the SAME embedding output.
    """
    out = apply_embedding(params["embedding"], cfg, x, deterministic=True)
    outputs = {"embedding": out}
    for i, bp in enumerate(params["blocks"]):
        for key, val in block_decompose(bp, cfg, out).items():
            outputs[f"block{i}_{key}"] = val
    return outputs


def get_probes(params: dict, cfg: TransformerConfig, x) -> dict:
    """Per-block stage-wise hidden states; the state DOES advance through blocks
    (architecture.py:885-911). Keys: ``block{i}_{stage}`` for 8 stages."""
    out = apply_embedding(params["embedding"], cfg, x, deterministic=True)
    probes = {}
    for i, bp in enumerate(params["blocks"]):
        out, block_p = block_probes(bp, cfg, out)
        for key, val in block_p.items():
            probes[f"block{i}_{key}"] = val
    return probes
