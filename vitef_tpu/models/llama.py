"""Llama-family preset: RMSNorm + RoPE + GQA + SwiGLU decoder.

Beyond-parity model family (the reference supports ViT/GPT2/PatchTST only —
src/vitef/models/utils.py:25-85): the modern decoder recipe every current
serving deployment runs. Maps onto the same functional transformer core:

  - ``norm="rms"``, no norm/attn/ffn biases
  - ``pos_emb_type="rope"`` — rotary q/k, no learned table (models/rope.py)
  - ``n_kv_heads < n_heads`` — grouped-query attention; the KV cache (and
    decode's HBM traffic) shrinks by n_heads/n_kv_heads
  - ``ffn_type="swiglu"`` — fc1 packs [gate ++ up], silu(gate) * up
  - untied LM head

Weight import: ``torch_import.hf_llama_to_vitef`` (q/k/v + gate/up concat).
Zero-egress note: pretrained loads need a cached
``checkpoints/llama/<model>.npz``; models build with random init otherwise.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import MODEL_DIR
from .torch_import import from_vitef_state_dict, hf_llama_to_vitef
from .transformer import TransformerConfig, init_transformer

logger = logging.getLogger(__name__)

LLAMA_SIZES = {
    # test/debug size
    "tiny": dict(emb_dim=64, n_heads=4, n_kv_heads=2, n_layers=2,
                 ffn_dim=128, vocab_size=256, seq_len=512,
                 rope_theta=10000.0),
    # GPT2-small-comparable debug size (bench sweeps)
    "124m": dict(emb_dim=768, n_heads=12, n_kv_heads=4, n_layers=12,
                 ffn_dim=2048, vocab_size=32000, seq_len=2048,
                 rope_theta=10000.0),
    # Llama-3.2-1B geometry
    "1b": dict(emb_dim=2048, n_heads=32, n_kv_heads=8, n_layers=16,
               ffn_dim=8192, vocab_size=128256, seq_len=8192,
               rope_theta=500000.0),
    # Llama-3.1-8B geometry
    "8b": dict(emb_dim=4096, n_heads=32, n_kv_heads=8, n_layers=32,
               ffn_dim=14336, vocab_size=128256, seq_len=8192,
               rope_theta=500000.0),
}


@dataclass
class LlamaConfig:
    model_name: str = "1b"
    pretrained: bool = False
    save_dir: str | None = None
    seq_len: int | None = None  # cap the cache/pos length below the preset

    # TPU knobs
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"
    remat: bool = False

    def __post_init__(self):
        if self.save_dir is None:
            self.save_dir = str(MODEL_DIR / "llama")


def llama_transformer_config(cfg: LlamaConfig) -> TransformerConfig:
    args = dict(LLAMA_SIZES[cfg.model_name])
    if cfg.seq_len is not None:
        args["seq_len"] = cfg.seq_len
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
        remat=cfg.remat,
    )
    return TransformerConfig(**args)


def build_llama(cfg: LlamaConfig, key):
    tcfg = llama_transformer_config(cfg)
    params = init_transformer(key, tcfg)
    model_name = f"llama-{cfg.model_name}"

    if cfg.pretrained:
        sd = _load_pretrained_state_dict(model_name, cfg.save_dir,
                                         tcfg.n_layers)
        if sd is not None:
            params = from_vitef_state_dict(dict(sd), tcfg.n_layers)
            logger.info("Pretrained weights successfully loaded for %s.",
                        model_name)
    return params, tcfg, model_name


def _load_pretrained_state_dict(model_name: str, save_dir: str,
                                n_layers: int):
    save_dir = Path(save_dir)
    npz_path = save_dir / f"{model_name}.npz"
    if npz_path.exists():
        with np.load(npz_path) as z:
            return {k: z[k] for k in z.files}
    try:
        from transformers import LlamaForCausalLM

        hf_model = LlamaForCausalLM.from_pretrained(model_name)
        hf = {k: np.asarray(v.detach().numpy())
              for k, v in hf_model.state_dict().items()}
        sd = hf_llama_to_vitef(hf, n_layers)
        save_dir.mkdir(parents=True, exist_ok=True)
        np.savez(npz_path, **sd)
        return sd
    except Exception as e:  # zero egress: random-init fallback
        logger.warning("Could not load pretrained weights for %s: %s",
                       model_name, e)
        return None
