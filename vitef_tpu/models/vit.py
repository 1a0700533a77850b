"""ViT preset: config, builder, pretrained-weight loading, finetuning head.

Reference: src/vitef/models/vit.py (ViTConfig :39-80, sizes :131-133, fixed
Transformer args :136-162, model_name :125-127, pretrained loading :214-312,
finetuning head swap :235-237).

TPU differences: ``flash`` defaults to True (the Pallas fused kernel is the hot
path; the verbose einsum path still returns attention matrices — reference keeps
flash=False solely for that, vit.py:147); activations run in ``compute_dtype``.
Weight cache: native ``.npz`` beside the reference's ``.pt`` format — both load.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import MODEL_DIR
from .transformer import TransformerConfig, init_transformer, _init_linear
from .torch_import import from_vitef_state_dict, hf_vit_to_vitef

logger = logging.getLogger(__name__)

VIT_SIZES = {
    # 'tiny' is not a reference size (vit.py:131-133 has base/large/huge); it
    # exists for fast smoke tests and CPU-runnable examples.
    "tiny": dict(emb_dim=32, n_heads=2, n_layers=2, ffn_dim=64),
    "base": dict(emb_dim=768, n_heads=12, n_layers=12, ffn_dim=3072),  # 86M params
    "large": dict(emb_dim=1024, n_heads=16, n_layers=24, ffn_dim=4096),  # 307M params
    "huge": dict(emb_dim=1280, n_heads=16, n_layers=32, ffn_dim=5120),  # 632M params
}

AVAILABLE_PRETRAINED = [
    "vit-base-patch16-224",
    "vit-base-patch16-384",
    "vit-base-patch32-384",
    "vit-base-patch16-224-in21k",
    "vit-base-patch32-224-in21k",
    "vit-large-patch16-224",
    "vit-large-patch16-384",
    "vit-large-patch32-384",
    "vit-large-patch16-224-in21k",
    "vit-large-patch32-224-in21k",
    "vit-huge-patch14-224-in21k",
]


@dataclass
class ViTConfig:
    """Reference ViTConfig fields (vit.py:39-80) + TPU execution knobs."""

    model_name: str = "base"
    pretrained: bool = False
    in21k: bool = False
    save_dir: str | None = None
    patch_size: int = 16
    image_dim: tuple = (3, 224, 224)
    finetuning: bool = False
    n_classes: int = 1000

    # TPU knobs
    compute_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_impl: str = "auto"
    remat: bool = False

    def __post_init__(self):
        if self.save_dir is None:
            self.save_dir = str(MODEL_DIR / "vit")
        if isinstance(self.image_dim, list):
            self.image_dim = tuple(self.image_dim)


def vit_model_name(cfg: ViTConfig) -> str:
    name = f"vit-{cfg.model_name.lower()}-patch{cfg.patch_size}-{cfg.image_dim[-1]}"
    if cfg.in21k:
        name += "-in21k"
    return name


def vit_transformer_config(cfg: ViTConfig) -> TransformerConfig:
    """The fixed Transformer arguments of the reference ViT (vit.py:136-162)."""
    args = dict(VIT_SIZES[cfg.model_name])
    args.update(
        image_dim=cfg.image_dim,
        patch_type="computer_vision",
        image_patch="hybrid",
        patch_size=cfg.patch_size,
        emb_type="linear",
        pos_emb=True,
        freeze_pos=False,
        emb_dropout=0.0,
        attn_bias=True,
        attn_dropout=0.0,
        flash=True,  # Pallas fused path; verbose falls back to einsum
        causal=False,
        activation="gelu",
        ffn_bias=True,
        ffn_dropout=0.0,
        norm="layer",
        norm_bias=True,
        norm_eps=1e-12,
        pre_norm=True,
        cls_token=True,
        output_type="classification",
        weight_tying=False,
        output_dropout=0.0,
        n_classes=1000 if not cfg.in21k else 2,
        compute_dtype=cfg.compute_dtype,
        attn_impl=cfg.attn_impl,
        norm_impl=cfg.norm_impl,
        remat=cfg.remat,
    )
    return TransformerConfig(**args)


def _load_pretrained_state_dict(model_name: str, save_dir: str) -> dict[str, np.ndarray] | None:
    """Load a vitef-named torch-layout state dict: .npz cache, .pt cache, or HF."""
    save_dir = Path(save_dir)
    npz_path = save_dir / f"{model_name}.npz"
    if npz_path.exists():
        logger.info("Loading %s from %s", model_name, npz_path)
        with np.load(npz_path) as z:
            return {k: z[k] for k in z.files}
    pt_path = save_dir / f"{model_name}.pt"
    if pt_path.exists():
        logger.info("Loading %s from %s", model_name, pt_path)
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.numpy()) for k, v in sd.items()}
    # HuggingFace (requires network or local HF cache)
    try:
        from transformers import ViTForImageClassification

        logger.info("Loading %s from HuggingFace (google/%s)", model_name, model_name)
        hf_model = ViTForImageClassification.from_pretrained(f"google/{model_name}")
        hf = {k: np.asarray(v.detach().numpy()) for k, v in hf_model.state_dict().items()}
        n_layers = sum(1 for k in hf if k.endswith("layernorm_before.weight"))
        sd = hf_vit_to_vitef(hf, n_layers)
        save_dir.mkdir(parents=True, exist_ok=True)
        np.savez(npz_path, **sd)
        logger.info("Cached %s to %s", model_name, npz_path)
        return sd
    except Exception as e:  # no network / no cache — random init (reference behavior)
        logger.warning("Could not load pretrained weights for %s: %s", model_name, e)
        return None


def set_finetuning_mode(params: dict, tcfg: TransformerConfig, n_classes: int, key) -> dict:
    """Fresh classification head with n_classes outputs (reference vit.py:235-237)."""
    tcfg.n_classes = n_classes
    params["output"]["output_layer"]["head"] = _init_linear(
        key, tcfg.emb_dim, n_classes, bias=True
    )
    return params


def build_vit(cfg: ViTConfig, key):
    """Build (params, transformer_config, model_name).

    Mirrors reference ViT.__init__ (vit.py:121-237): random init → optional
    pretrained load → optional finetuning head swap.
    """
    import jax

    tcfg = vit_transformer_config(cfg)
    k_init, k_head = jax.random.split(key)
    params = init_transformer(k_init, tcfg)
    model_name = vit_model_name(cfg)

    if cfg.pretrained:
        if model_name in AVAILABLE_PRETRAINED:
            sd = _load_pretrained_state_dict(model_name, cfg.save_dir)
            if sd is not None:
                params = from_vitef_state_dict(dict(sd), tcfg.n_layers)
                logger.info("Pretrained weights successfully loaded for %s.", model_name)
        else:
            logger.info(
                "Pretrained weights for %s not found. Using random initialization.",
                model_name,
            )

    if cfg.finetuning:
        params = set_finetuning_mode(params, tcfg, cfg.n_classes, k_head)
        logger.info(
            "Initialize new classification head with %d classes for finetuning.",
            cfg.n_classes,
        )
    return params, tcfg, model_name
