"""Mixture-of-experts model family: llama backbone + sparse MoE FFN.

Beyond-parity family (the reference supports ViT/GPT2/PatchTST only —
src/vitef/models/utils.py:25-85): the Mixtral/Switch decoder recipe — every
block's dense FFN replaced by ``n_experts`` swiglu experts behind a softmax
top-k router. Rides the same functional transformer core as the llama family
(RMSNorm + RoPE + GQA), so the ENTIRE serving surface (KV-cache generate,
DecodeServer continuous batching, int8 KV, speculative, TP-sharded decode)
carries over unchanged; only the FFN params/pytree differ.

Semantics (parallel/moe.py holds the math):

  - single device / data-parallel: dense all-experts evaluation with the
    gate mask zeroing unselected experts — exact Switch/GShard numerics,
    the right form for expert counts that fit one chip.
  - expert-parallel scale-out: ``apply_moe_ffn_ep`` shards the expert
    stacks over an 'ep' mesh axis with all_to_all dispatch/combine
    (equivalence-tested against the dense form in tests/test_moe.py and
    dry-run in __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from dataclasses import dataclass

from .transformer import TransformerConfig, init_transformer

MOE_SIZES = {
    # test/debug size (llama-tiny backbone, 4 experts)
    "tiny": dict(emb_dim=64, n_heads=4, n_kv_heads=2, n_layers=2,
                 ffn_dim=128, vocab_size=256, seq_len=512,
                 rope_theta=10000.0, n_experts=4, moe_top_k=2),
    # llama-124m backbone, 8 experts (Mixtral-style 8x top-2) — the
    # single-chip bench geometry: ~4x FFN params at ~1x activated FLOPs.
    "8x124m": dict(emb_dim=768, n_heads=12, n_kv_heads=4, n_layers=12,
                   ffn_dim=2048, vocab_size=32000, seq_len=2048,
                   rope_theta=10000.0, n_experts=8, moe_top_k=2),
}


@dataclass
class MoeConfig:
    model_name: str = "8x124m"
    seq_len: int | None = None  # cap the cache/pos length below the preset
    n_experts: int | None = None  # override the preset's expert count
    moe_top_k: int | None = None
    # router aux-loss coefficients (0 = off): Switch load-balance + z-loss
    moe_lb_coef: float = 0.0
    moe_z_coef: float = 0.0

    # TPU knobs
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"
    moe_impl: str = "auto"  # auto | dense | sparse (parallel/moe.py)
    remat: bool = False


def moe_transformer_config(cfg: MoeConfig) -> TransformerConfig:
    args = dict(MOE_SIZES[cfg.model_name])
    if cfg.seq_len is not None:
        args["seq_len"] = cfg.seq_len
    if cfg.n_experts is not None:
        args["n_experts"] = cfg.n_experts
    if cfg.moe_top_k is not None:
        args["moe_top_k"] = cfg.moe_top_k
    # identical backbone flags to the llama family (models/llama.py)
    args.update(
        patch_type=None,
        emb_type="dict",
        pos_emb_type="rope",
        emb_dropout=0.0,
        attn_bias=False,
        attn_dropout=0.0,
        flash=True,
        causal=True,
        ffn_type="swiglu",
        ffn_bias=False,
        ffn_dropout=0.0,
        norm="rms",
        norm_bias=False,
        norm_eps=1e-5,
        pre_norm=True,
        cls_token=False,
        output_type="sequence_to_sequence",
        weight_tying=False,
        output_dropout=0.0,
        compute_dtype=cfg.compute_dtype,
        attn_impl=cfg.attn_impl,
        norm_impl=cfg.norm_impl,
        moe_impl=cfg.moe_impl,
        moe_lb_coef=cfg.moe_lb_coef,
        moe_z_coef=cfg.moe_z_coef,
        remat=cfg.remat,
    )
    return TransformerConfig(**args)


def build_moe(cfg: MoeConfig, key):
    tcfg = moe_transformer_config(cfg)
    params = init_transformer(key, tcfg)
    return params, tcfg, f"moe-{cfg.model_name}"
