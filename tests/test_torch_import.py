"""Golden tests for the HF weight-import maps (hf_vit_to_vitef / hf_gpt2_to_vitef).

These maps encode the exact HF-name correspondence of reference vit.py:263-303
(q/k/v concat into the fused qkv matrix) and gpt2.py:194-231 (Conv1D transpose +
wpe unsqueeze). The oracle here is the REFERENCE'S OWN loader: we construct an
HF model offline (random init from config — no network), patch
``from_pretrained`` to return it, and let the reference ViT/GPT2 class run ITS
correspondence loop. Our map must reproduce the reference-loaded state dict
bit-for-bit. Because the two maps are independent code paths, a q/k/v-concat
order or Conv1D-transpose bug on our side cannot cancel out.

A full fp32 forward comparison (hf map → from_vitef_state_dict →
apply_transformer vs the reference torch model) then closes the whole
pretrained-load chain, including the .pt cache-file branch the reference writes.
"""

import importlib.machinery
import sys
import types
from pathlib import PosixPath

import numpy as np
import pytest

import jax.numpy as jnp

from vitef_tpu.models.torch_import import (
    from_vitef_state_dict,
    hf_gpt2_to_vitef,
    hf_vit_to_vitef,
    torch_state_dict_to_numpy,
)
from vitef_tpu.models.transformer import apply_transformer

pytestmark = pytest.mark.slow


def _stub_tiktoken():
    """Reference gpt2.py imports tiktoken (absent here). The stub needs a real
    ModuleSpec: transformers probes find_spec("tiktoken") at import time and a
    spec-less sys.modules entry makes that raise."""
    mod = sys.modules.get("tiktoken")
    if mod is None:
        mod = types.ModuleType("tiktoken")
        sys.modules["tiktoken"] = mod
    if getattr(mod, "__spec__", None) is None:
        mod.__spec__ = importlib.machinery.ModuleSpec("tiktoken", None)
    mod.get_encoding = lambda name: None


def _load_reference_models():
    _stub_tiktoken()
    ref_src = "/root/reference/src"
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    import vitef.models.gpt2 as ref_gpt2
    import vitef.models.vit as ref_vit

    return ref_vit, ref_gpt2


def _bitwise_map_check(ours: dict, ref_model) -> None:
    """Every parameter of the reference-loaded model must appear in our mapped
    dict with bit-identical values; leftovers may only be non-parameter buffers
    (e.g. causal-mask buffers load_state_dict never touched)."""
    ref_sd = torch_state_dict_to_numpy(ref_model.state_dict())
    param_names = {n for n, _ in ref_model.named_parameters()}
    missing = param_names - set(ours)
    assert not missing, f"map misses parameters: {sorted(missing)[:5]}"
    for k, v in ours.items():
        assert k in ref_sd, f"map emits unknown key {k}"
        assert np.array_equal(np.asarray(v), ref_sd[k]), f"value mismatch at {k}"
    leftovers = set(ref_sd) - set(ours)
    assert leftovers <= (set(ref_sd) - param_names), (
        f"unmapped parameters: {sorted(leftovers & param_names)[:5]}"
    )


class TestHFViTImport:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        import torch
        from transformers import ViTConfig as HFViTConfig
        from transformers import ViTForImageClassification

        ref_vit, _ = _load_reference_models()
        tmp = tmp_path_factory.mktemp("vit_cache")

        torch.manual_seed(0)
        # Default HFViTConfig IS google/vit-base-patch16-224's architecture
        # (hidden 768, 12 layers/heads, intermediate 3072, image 224/patch 16);
        # only num_labels differs from the hub checkpoint's 1000.
        hf_model = ViTForImageClassification(HFViTConfig(num_labels=1000))
        hf_model.eval()
        hf_sd = torch_state_dict_to_numpy(hf_model.state_dict())

        # Reference loader path: its _load_from_huggingface correspondence loop
        # (reference vit.py:263-303) consumes the patched from_pretrained.
        orig = ViTForImageClassification.from_pretrained
        ViTForImageClassification.from_pretrained = classmethod(
            lambda cls, name, **kw: hf_model
        )
        try:
            ref_model = ref_vit.ViT(
                ref_vit.ViTConfig(
                    model_name="base", pretrained=True, save_dir=str(tmp)
                )
            )
        finally:
            ViTForImageClassification.from_pretrained = orig
        ref_model.eval()
        return hf_sd, ref_model, tmp

    def test_map_is_bitwise_identical_to_reference_loader(self, setup):
        hf_sd, ref_model, _ = setup
        ours = hf_vit_to_vitef(hf_sd, n_layers=12)
        _bitwise_map_check(ours, ref_model.model)

    def test_full_chain_forward_matches_torch_oracle(self, setup):
        import torch

        from vitef_tpu.models.vit import ViTConfig, vit_transformer_config

        hf_sd, ref_model, _ = setup
        params = from_vitef_state_dict(hf_vit_to_vitef(hf_sd, 12), 12)
        cfg = vit_transformer_config(
            ViTConfig(model_name="base", attn_impl="xla", norm_impl="xla")
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
        with torch.inference_mode():
            ref_logits = ref_model.model(torch.from_numpy(x)).numpy()
        logits = np.asarray(apply_transformer(params, cfg, jnp.asarray(x)))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-3, rtol=1e-4)

    def test_pt_cache_branch_loads_reference_saved_file(self, setup):
        """The reference saved <tmp>/vit-base-patch16-224.pt after its HF load;
        our build_vit must read that cache (torch.load branch) and produce the
        same forward as the reference model."""
        import jax
        import torch

        from vitef_tpu.models.vit import ViTConfig, build_vit

        _, ref_model, tmp = setup
        assert (tmp / "vit-base-patch16-224.pt").exists()
        params, cfg, name = build_vit(
            ViTConfig(
                model_name="base",
                pretrained=True,
                save_dir=str(tmp),
                attn_impl="xla",
                norm_impl="xla",
            ),
            jax.random.PRNGKey(0),
        )
        assert name == "vit-base-patch16-224"
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
        with torch.inference_mode():
            ref_logits = ref_model.model(torch.from_numpy(x)).numpy()
        logits = np.asarray(apply_transformer(params, cfg, jnp.asarray(x)))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-3, rtol=1e-4)


class TestHFGPT2Import:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        import torch
        from transformers import GPT2Config as HFGPT2Config
        from transformers import GPT2LMHeadModel

        _, ref_gpt2 = _load_reference_models()
        tmp = tmp_path_factory.mktemp("gpt2_cache")

        torch.manual_seed(0)
        # Default HFGPT2Config IS the hub "gpt2" architecture (n_embd 768,
        # n_layer/n_head 12, n_positions 1024, vocab 50257).
        hf_model = GPT2LMHeadModel(HFGPT2Config())
        hf_model.eval()
        hf_sd = torch_state_dict_to_numpy(hf_model.state_dict())

        orig = GPT2LMHeadModel.from_pretrained
        GPT2LMHeadModel.from_pretrained = classmethod(lambda cls, name, **kw: hf_model)
        try:
            ref_model = ref_gpt2.GPT2(
                ref_gpt2.GPT2Config(
                    model_name="base", pretrained=True, save_dir=PosixPath(tmp)
                )
            )
        finally:
            GPT2LMHeadModel.from_pretrained = orig
        ref_model.eval()
        return hf_sd, ref_model, tmp

    def test_map_is_bitwise_identical_to_reference_loader(self, setup):
        hf_sd, ref_model, _ = setup
        ours = hf_gpt2_to_vitef(hf_sd, n_layers=12)
        _bitwise_map_check(ours, ref_model.model)

    def test_full_chain_forward_matches_torch_oracle(self, setup):
        import torch

        from vitef_tpu.models.gpt2 import GPT2Config, gpt2_transformer_config

        hf_sd, ref_model, _ = setup
        params = from_vitef_state_dict(hf_gpt2_to_vitef(hf_sd, 12), 12)
        # Weight tying: apply() reads token_emb directly (as build_gpt2 does).
        params["output"]["output_layer"].pop("head", None)
        cfg = gpt2_transformer_config(
            GPT2Config(model_name="base", attn_impl="xla", norm_impl="xla")
        )
        rng = np.random.default_rng(2)
        # The reference embedding adds pos_emb[:L] where pos_emb is (1, 1024, E)
        # — the slice hits the singleton batch dim, so its forward only
        # broadcasts at L == seq_len. Feed full-length sequences.
        tokens = rng.integers(0, 50257, size=(2, 1024))
        with torch.inference_mode():
            ref_logits = ref_model.model(torch.from_numpy(tokens)).numpy()
        logits = np.asarray(apply_transformer(params, cfg, jnp.asarray(tokens)))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-3, rtol=1e-4)
