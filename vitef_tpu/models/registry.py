"""Model factory — dispatch on ``config['implementation']``.

Reference: src/vitef/models/utils.py:25-85 (build_model on
{gpt2, patchtst, transformer, vit}). Returns a functional :class:`Model` bundle:
params pytree + TransformerConfig + pure apply functions (no device move — JAX
placement is driven by shardings at the call site).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any

import jax

from ..utils.typed import asdict_filtered, build_with_type_check
from . import transformer as T
from .transformer import TransformerConfig


# Bound on cached compiled generate()/generate_speculative() programs per
# Model instance: a long-lived server sweeping sampling settings would
# otherwise pin every compiled executable (and each draft's params) forever.
# LRU eviction; serving should reuse a stable sampling configuration anyway.
_GENERATE_CACHE_MAX = 16


@dataclass
class Model:
    """Functional model bundle: immutable config + factory-made param pytree."""

    params: dict
    config: TransformerConfig
    name: str

    def _generate_cache_lookup(self, key, make):
        """LRU-bounded per-instance cache of compiled sampling programs."""
        from collections import OrderedDict

        cache = self.__dict__.setdefault("_generate_cache", OrderedDict())
        entry = cache.get(key)
        if entry is None:
            entry = cache[key] = make()
            while len(cache) > _GENERATE_CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return entry

    def apply(self, params, x, **kw):
        return T.apply_transformer(params, self.config, x, **kw)

    @functools.cached_property
    def eval_step(self):
        """Jitted ``(params, (x, y)) -> (batch_acc, batch_loss)`` eval step.

        cached_property so periodic eval reuses ONE compiled step per model
        (``model.apply`` is a fresh bound-method object on every attribute
        access — jitting it anew each eval period would recompile the full
        forward). Dies with the model instance; no module-level retention.
        """
        from ..parallel.train_step import make_eval_step

        return make_eval_step(self.apply)

    def generate(self, params, prompt, max_new_tokens: int, *,
                 temperature: float = 1.0, top_k: int | None = None, rng=None,
                 prompt_mask=None, approx_top_k: bool = False,
                 kv_cache_dtype: str | None = None, top_p: float | None = None,
                 eos_token_id: int | None = None):
        """KV-cache autoregressive decoding (see models/generation.py).

        The jitted program is cached per sampling configuration on this Model
        instance (jax's own jit cache then handles prompt-shape variations),
        so repeated serving calls don't retrace."""
        from .generation import generate as _generate

        key = (max_new_tokens, temperature, top_k, prompt_mask is None,
               approx_top_k, kv_cache_dtype, top_p, eos_token_id)
        fn = self._generate_cache_lookup(key, lambda: jax.jit(functools.partial(
            _generate, cfg=self.config, max_new_tokens=max_new_tokens,
            temperature=temperature, top_k=top_k,
            approx_top_k=approx_top_k, kv_cache_dtype=kv_cache_dtype,
            top_p=top_p, eos_token_id=eos_token_id)))
        if rng is None:
            rng = jax.random.key(0)
        if prompt_mask is None:
            return fn(params, prompt=prompt, rng=rng)
        return fn(params, prompt=prompt, rng=rng, prompt_mask=prompt_mask)

    def generate_speculative(self, params, prompt, max_new_tokens: int, *,
                             draft: "Model", draft_params=None, gamma: int = 4,
                             temperature: float = 0.0, rng=None,
                             return_stats: bool = False):
        """Speculative decoding with ``draft`` as the proposal model (batch-1
        latency path; see models/speculative.py). temperature=0 is exactly
        this model's greedy decode; temperature>0 uses the Leviathan
        acceptance rule (exact target sampling distribution)."""
        from .speculative import generate_speculative as _spec

        # the draft's CONFIG is baked into the compiled fn via partial, so the
        # cache key must carry the draft identity (two drafts with identical
        # param SHAPES would otherwise silently reuse the first one's config);
        # keeping the draft in the cache value pins id() for the entry's life.
        key = ("spec", max_new_tokens, gamma, temperature, return_stats,
               id(draft))
        entry = self._generate_cache_lookup(key, lambda: (jax.jit(
            functools.partial(
                _spec, cfg=self.config, max_new_tokens=max_new_tokens,
                draft_cfg=draft.config, gamma=gamma, temperature=temperature,
                return_stats=return_stats)), draft))
        fn = entry[0]
        if rng is None:
            rng = jax.random.key(0)
        return fn(params, prompt=prompt, rng=rng,
                  draft_params=draft.params if draft_params is None
                  else draft_params)

    def quantize_int8(self, params=None):
        """Weight-only int8 params for the decode/serving path.

        Returns a params tree consumed transparently by :meth:`generate`,
        :meth:`generate_speculative` and ``DecodeServer`` — int8 weights
        stream from HBM at half the bytes of bf16 (the batch-1 decode
        bound), with per-out-channel power-of-two f32 scales applied outside
        the contractions (models/quantize.py). Inference-only."""
        from .quantize import quantize_decode_params

        return quantize_decode_params(self.params if params is None
                                      else params)

    def get_decomposition(self, params, x):
        return T.get_decomposition(params, self.config, x)

    def get_probes(self, params, x):
        return T.get_probes(params, self.config, x)

    def n_params(self) -> int:
        return T.n_params(self.params)


def build_model(config: dict[str, Any], key=None, return_config: bool = False):
    """Build a model from a flat dict config (consumed via pop, like the reference)."""
    config = dict(config)
    implementation = config.pop("implementation", "vit")
    if key is None:
        key = jax.random.key(config.pop("seed", 0))

    impl = implementation.lower()
    if impl == "vit":
        from .vit import ViTConfig, build_vit

        cfg = build_with_type_check(ViTConfig, config)
        params, tcfg, name = build_vit(cfg, key)
    elif impl == "gpt2":
        from .gpt2 import GPT2Config, build_gpt2

        cfg = build_with_type_check(GPT2Config, config)
        params, tcfg, name = build_gpt2(cfg, key)
    elif impl == "patchtst":
        from .patchtst import PatchTSTConfig, build_patchtst

        cfg = build_with_type_check(PatchTSTConfig, config)
        params, tcfg, name = build_patchtst(cfg, key)
    elif impl == "llama":
        from .llama import LlamaConfig, build_llama

        cfg = build_with_type_check(LlamaConfig, config)
        params, tcfg, name = build_llama(cfg, key)
    elif impl == "moe":
        from .moe import MoeConfig, build_moe

        cfg = build_with_type_check(MoeConfig, config)
        params, tcfg, name = build_moe(cfg, key)
    elif impl == "transformer":
        cfg = build_with_type_check(TransformerConfig, config)
        params = T.init_transformer(key, cfg)
        tcfg, name = cfg, "transformer"
    else:
        raise ValueError(f"Implementation {implementation} not found.")

    model = Model(params=params, config=tcfg, name=name)
    if return_config:
        return model, asdict_filtered(cfg)
    return model
