"""PatchTST preset: time-series patching, BatchNorm, post-norm, forecasting head.

Reference: src/vitef/models/patchtst.py (sizes :122-124, fixed args :126-151,
local-only pretrained load :165-180).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import MODEL_DIR
from .transformer import TransformerConfig, init_transformer
from .torch_import import from_vitef_state_dict

logger = logging.getLogger(__name__)

PATCHTST_SIZES = {
    "base": dict(emb_dim=128, n_heads=16, n_layers=3, ffn_dim=256),  # 1M params
}


@dataclass
class PatchTSTConfig:
    model_name: str = "base"
    pretrained: bool = False
    save_dir: str | None = None
    length: int = 512
    patch_size: int = 16
    stride: int = 8
    forecasting_horizon: int = 96

    # TPU knobs
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"

    def __post_init__(self):
        if self.save_dir is None:
            self.save_dir = str(MODEL_DIR / "patchtst")


def patchtst_model_name(cfg: PatchTSTConfig) -> str:
    return f"patchtst-{cfg.model_name.lower()}-patch{cfg.patch_size}-{cfg.length}"


def patchtst_transformer_config(cfg: PatchTSTConfig) -> TransformerConfig:
    args = dict(PATCHTST_SIZES[cfg.model_name])
    args.update(
        length=cfg.length,
        patch_type="time_series",
        patch_size=cfg.patch_size,
        stride=cfg.stride,
        emb_type="linear",
        pos_emb=True,
        freeze_pos=False,
        emb_dropout=0.0,
        attn_bias=True,
        attn_dropout=0.0,
        flash=True,
        causal=False,
        activation="gelu",
        ffn_bias=True,
        ffn_dropout=0.0,
        norm="batch",
        norm_bias=True,
        norm_eps=1e-5,
        pre_norm=False,
        cls_token=False,
        output_type="forecasting",
        weight_tying=False,
        output_dropout=0.0,
        forecasting_horizon=cfg.forecasting_horizon,
        compute_dtype=cfg.compute_dtype,
        attn_impl=cfg.attn_impl,
        norm_impl=cfg.norm_impl,
    )
    return TransformerConfig(**args)


def build_patchtst(cfg: PatchTSTConfig, key):
    tcfg = patchtst_transformer_config(cfg)
    params = init_transformer(key, tcfg)
    model_name = patchtst_model_name(cfg)
    if cfg.pretrained:
        # Local-only pretrained load (reference patchtst.py:165-180).
        save_dir = Path(cfg.save_dir)
        npz_path = save_dir / f"{model_name}.npz"
        pt_path = save_dir / f"{model_name}.pt"
        if npz_path.exists():
            with np.load(npz_path) as z:
                sd = {k: z[k] for k in z.files}
            params = from_vitef_state_dict(sd, tcfg.n_layers)
        elif pt_path.exists():
            import torch

            tsd = torch.load(pt_path, map_location="cpu", weights_only=True)
            sd = {k: np.asarray(v.numpy()) for k, v in tsd.items()}
            params = from_vitef_state_dict(sd, tcfg.n_layers)
        else:
            logger.info("No local pretrained weights for %s; random init.", model_name)
    return params, tcfg, model_name
