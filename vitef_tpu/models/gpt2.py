"""GPT2 preset: config, builder, HF weight import.

Reference: src/vitef/models/gpt2.py (GPT2Config :38, sizes :98-101, fixed args
:104-127, HF map :194-231 with Conv1D transpose). Tokenizer: the reference uses
tiktoken (gpt2.py:142-143), which is not in this image — a GPT-2 BPE tokenizer is
loaded from HF ``transformers`` when available; models build without it.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import MODEL_DIR
from .transformer import TransformerConfig, init_transformer
from .torch_import import from_vitef_state_dict, hf_gpt2_to_vitef

logger = logging.getLogger(__name__)

GPT2_SIZES = {
    "base": dict(emb_dim=768, n_heads=12, n_layers=12),  # 124M params
    "medium": dict(emb_dim=1024, n_heads=16, n_layers=24),  # 350M params
    "large": dict(emb_dim=1280, n_heads=20, n_layers=36),  # 774M params
    "xl": dict(emb_dim=1600, n_heads=25, n_layers=48),  # 1558M params
}


@dataclass
class GPT2Config:
    model_name: str = "base"
    pretrained: bool = False
    save_dir: str | None = None

    # TPU knobs
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"
    remat: bool = False

    def __post_init__(self):
        if self.save_dir is None:
            self.save_dir = str(MODEL_DIR / "gpt2")


def gpt2_model_name(cfg: GPT2Config) -> str:
    return "gpt2" if cfg.model_name == "base" else f"gpt2-{cfg.model_name}"


def gpt2_transformer_config(cfg: GPT2Config) -> TransformerConfig:
    args = dict(GPT2_SIZES[cfg.model_name])
    args.update(
        patch_type=None,
        vocab_size=50_257,
        emb_type="dict",
        pos_emb=True,
        freeze_pos=False,
        seq_len=1024,
        emb_dropout=0.0,
        attn_bias=True,
        attn_dropout=0.0,
        flash=True,
        causal=True,
        activation="gelu",
        ffn_bias=True,
        ffn_dropout=0.0,
        norm="layer",
        norm_bias=True,
        norm_eps=1e-5,
        pre_norm=True,
        cls_token=False,
        output_type="sequence_to_sequence",
        weight_tying=True,
        output_dropout=0.0,
        compute_dtype=cfg.compute_dtype,
        attn_impl=cfg.attn_impl,
        norm_impl=cfg.norm_impl,
        remat=cfg.remat,
    )
    return TransformerConfig(**args)


def get_tokenizer():
    """GPT-2 BPE tokenizer (reference uses tiktoken; here HF transformers)."""
    from transformers import GPT2TokenizerFast

    return GPT2TokenizerFast.from_pretrained("gpt2")


def build_gpt2(cfg: GPT2Config, key):
    tcfg = gpt2_transformer_config(cfg)
    params = init_transformer(key, tcfg)
    model_name = gpt2_model_name(cfg)

    if cfg.pretrained:
        sd = _load_pretrained_state_dict(model_name, cfg.save_dir, tcfg.n_layers)
        if sd is not None:
            params = from_vitef_state_dict(dict(sd), tcfg.n_layers)
            # Weight tying: apply() reads token_emb directly; drop the tied copy.
            params["output"]["output_layer"].pop("head", None)
            logger.info("Pretrained weights successfully loaded for %s.", model_name)
    return params, tcfg, model_name


def _load_pretrained_state_dict(model_name: str, save_dir: str, n_layers: int):
    save_dir = Path(save_dir)
    npz_path = save_dir / f"{model_name}.npz"
    if npz_path.exists():
        with np.load(npz_path) as z:
            return {k: z[k] for k in z.files}
    pt_path = save_dir / f"{model_name}.pt"
    if pt_path.exists():
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.numpy()) for k, v in sd.items()}
    try:
        from transformers import GPT2LMHeadModel

        hf_model = GPT2LMHeadModel.from_pretrained(model_name)
        hf = {k: np.asarray(v.detach().numpy()) for k, v in hf_model.state_dict().items()}
        sd = hf_gpt2_to_vitef(hf, n_layers)
        save_dir.mkdir(parents=True, exist_ok=True)
        np.savez(npz_path, **sd)
        return sd
    except Exception as e:
        logger.warning("Could not load pretrained weights for %s: %s", model_name, e)
        return None
