"""Optimizers, LR schedules, and component freeze masks — optax, TPU-first.

Reference: src/vitef/optim.py (OptimizerConfig :27-50, build_optimizer :53-92,
lr_constant/linear/cosine/wsd :119-266, SchedulerConfig :100-116, build_scheduler
:269-325) and apps/vit/utils.py:54-91 (freeze_model component map).

TPU-first redesign:
  - Schedules are pure ``step -> factor`` functions written with ``jnp.where`` so
    they trace cleanly inside the jitted train step (no Python control flow on
    traced values); they accept Python ints too and then match the reference's
    float math exactly.
  - Optimizers are optax transforms with torch-matching update rules:
    AdamW = decoupled weight decay (optax.adamw ≡ torch.optim.AdamW), SGD =
    L2-in-gradient weight decay *before* the momentum buffer (torch SGD order).
  - Selective finetuning: the reference mutates ``requires_grad``
    (apps/vit/utils.py:81-91). Here the freeze-component map becomes a *static*
    optax mask (``optax.masked``) fixed at setup, so the 7 freeze configs share
    one jitted step without retracing (SURVEY §7.3 hard part 5). Frozen grads
    are zeroed before the global-norm clip so the clip norm matches the
    reference's trainable-params-only ``clip_grad_norm_`` (train.py:278).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .utils.tree import keystr_dotted as _path_str
from .utils.typed import build_with_type_check

# ------------------------------------------------------------------------------
# Configs
# ------------------------------------------------------------------------------


@dataclass
class OptimizerConfig:
    """Reference optim.py:27-50."""

    lr: float = 1e-3
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.999)
    momentum: float = 0.0


@dataclass
class SchedulerConfig:
    """Reference optim.py:100-116."""

    warmup: int = 2000
    min_factor: float = 0
    cycle_length: float = 1.0
    decay_fraction: float = 0.1


# ------------------------------------------------------------------------------
# LR schedules (pure step -> factor, jit-safe)
# ------------------------------------------------------------------------------


def lr_constant(step) -> jax.Array:
    """Reference optim.py:119-128."""
    return jnp.ones_like(jnp.asarray(step, jnp.float32))


def lr_linear(step, warmup: int, min_factor: float, n_steps: int) -> jax.Array:
    """Warmup then linear decay to min_factor (reference optim.py:131-162)."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / warmup
    s = (step - warmup) / (n_steps - warmup)
    decay = s * min_factor + (1.0 - s)
    return jnp.where(step < warmup, warm, jnp.where(step <= n_steps, decay, min_factor))


def lr_cosine(step, warmup: int, min_factor: float, n_steps: int) -> jax.Array:
    """Warmup then cosine to min_factor (reference optim.py:165-197)."""
    assert warmup != n_steps, "Warmup and steps should not be equal"
    step = jnp.asarray(step, jnp.float32)
    warm = step / warmup
    s = (step - warmup) / (n_steps - warmup)
    cos = min_factor + 0.5 * (1.0 - min_factor) * (jnp.cos(jnp.pi * s) + 1.0)
    return jnp.where(step < warmup, warm, jnp.where(step <= n_steps, cos, min_factor))


def lr_wsd(step, warmup: int, min_factor: float, decay_fraction: float,
           cycle_length: float, n_steps: int) -> jax.Array:
    """Warmup-stable-decay with cycles and 1/x decay (reference optim.py:200-266)."""
    stepf = jnp.asarray(step, jnp.float32)
    stepi = jnp.asarray(step, jnp.int32)
    cycle_steps = int(n_steps * cycle_length)
    cycle_num = stepi // cycle_steps + 1
    curr_n_steps = cycle_steps * cycle_num
    # Edge case step == n_steps (reference optim.py:240-243)
    curr_n_steps = jnp.where(stepi == n_steps, n_steps, curr_n_steps)
    decay_length = jnp.floor(curr_n_steps.astype(jnp.float32) * decay_fraction)

    decay_start = curr_n_steps.astype(jnp.float32) - decay_length
    step_in_decay = stepf - decay_start
    progress = step_in_decay / jnp.maximum(decay_length, 1.0)
    inv_decay = 1.0 / (progress * (1.0 / min_factor) + (1.0 - progress))

    lr = jnp.where(
        stepf <= decay_start,
        1.0,
        jnp.where(stepf <= curr_n_steps.astype(jnp.float32), inv_decay, min_factor),
    )
    return jnp.where(stepf < warmup, stepf / warmup, lr)


def build_scheduler(config: dict[str, Any], n_steps: int) -> Callable:
    """Build a pure ``step -> factor`` schedule (reference optim.py:269-325).

    The reference wraps the factor in torch LambdaLR; here the jitted train step
    multiplies ``base_lr * schedule(step)`` directly (scheduler *state* is just
    the step counter, which TrainingState already tracks).
    """
    config = dict(config)
    name = config.pop("scheduler", "constant")
    config.pop("lr", None)  # shared config dicts may carry optimizer keys
    cfg = build_with_type_check(SchedulerConfig, config)
    match name.lower():
        case "constant":
            return lr_constant
        case "linear":
            return partial(lr_linear, warmup=cfg.warmup, min_factor=cfg.min_factor,
                           n_steps=n_steps)
        case "cosine":
            return partial(lr_cosine, warmup=cfg.warmup, min_factor=cfg.min_factor,
                           n_steps=n_steps)
        case "wsd":
            return partial(lr_wsd, warmup=cfg.warmup, min_factor=cfg.min_factor,
                           decay_fraction=cfg.decay_fraction,
                           cycle_length=cfg.cycle_length, n_steps=n_steps)
        case _:
            raise ValueError(
                f"Unknown scheduler '{name}'. Choose between 'constant', 'linear', "
                "'cosine' and 'wsd'."
            )


# ------------------------------------------------------------------------------
# Freeze masks (reference apps/vit/utils.py:54-91)
# ------------------------------------------------------------------------------

# Component -> parameter-path substrings, the same vocabulary as the reference
# map_weight (apps/vit/utils.py:67-74), plus 'pos_emb' which realizes the
# reference's freeze_pos config capability (architecture.py:632-639) in the
# same mask mechanism.
FREEZE_MAP = {
    "emb": ["embedding"],
    "pos_emb": ["embedding.pos_emb"],
    "attn_norm": ["attn_norm"],
    "mha": ["attn.qkv_mat", "attn.output"],
    "ffn_norm": ["ffn_norm"],
    "ffn_fc1": ["ffn.fc1"],
    "ffn_fc2": ["ffn.fc2"],
}


def trainable_mask(params, components: list[str]) -> Any:
    """Pytree of bools: True = trainable, False = frozen.

    Semantics match reference freeze_model (apps/vit/utils.py:54-91): 'emb'
    freezes the whole embedding layer; other components freeze matching
    substrings *within blocks* (the output head always trains).
    """
    targets: list[str] = []
    for comp in components:
        if comp not in FREEZE_MAP:
            raise ValueError(f"Unknown component {comp!r}; choose {list(FREEZE_MAP)}")
        targets.extend(FREEZE_MAP[comp])
    freeze_embedding = "embedding" in targets
    emb_targets = [t for t in targets if t.startswith("embedding.")]
    block_targets = [t for t in targets if t != "embedding"
                     and not t.startswith("embedding.")]

    def leaf_mask(path, _leaf):
        name = _path_str(path)
        if name.rpartition(".")[2].startswith("running_"):
            return False  # batch-norm statistics are state, not params
        if freeze_embedding and name.startswith("embedding."):
            return False
        if any(name == t or name.startswith(t + ".") for t in emb_targets):
            return False
        if name.startswith("blocks."):
            # Path-segment matching within the block: 'blocks.<i>.<rest>'
            # (per-block list layout) or 'blocks.<rest>' (stage-stacked
            # pipeline layout, parallel/pipeline.py — leaves carry the layer
            # axis instead of a path index). <rest> must START WITH the
            # target as whole dotted segments — substring matching would
            # silently freeze the wrong leaves one rename away (e.g. a
            # future 'cross_attn_norm' would match 'attn_norm').
            parts = name.split(".")
            skip = 2 if len(parts) > 1 and parts[1].isdigit() else 1
            rest = ".".join(parts[skip:])
            if any(rest == t or rest.startswith(t + ".") for t in block_targets):
                return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


# ------------------------------------------------------------------------------
# Optimizers
# ------------------------------------------------------------------------------


def _no_state_leaves_mask(params):
    """Weight-decay mask excluding batch-norm running statistics — they carry
    zero gradients (never read in train mode) but decoupled/L2 weight decay
    would still corrupt them. Callable form so it also protects the
    ``build_optimizer(params=None)`` call pattern (optax evaluates it at init)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "running_" not in _path_str(path), params
    )


def _sgd_torch(lr: Callable | float, weight_decay: float, momentum: float):
    """torch.optim.SGD semantics: L2 weight decay added to the gradient *before*
    the momentum buffer (torch order), no dampening, no Nesterov."""
    parts = []
    if weight_decay:
        parts.append(optax.masked(optax.add_decayed_weights(weight_decay),
                                  _no_state_leaves_mask))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def build_optimizer(config: dict[str, Any], schedule: Callable | None = None,
                    params=None, components: list[str] | None = None,
                    grad_clip: float | None = None):
    """Build the full optax gradient transformation.

    Mirrors reference build_optimizer (optim.py:53-92) plus, fused into one
    transform (they are separate steps in the reference hot loop,
    train.py:270-283): frozen-grad zeroing, global-norm clipping, and the LR
    schedule. Returns ``(tx, schedule)``.
    """
    config = dict(config)
    name = config.pop("optimizer", "adamw")
    config.pop("scheduler", None)
    cfg = build_with_type_check(OptimizerConfig, config)
    if schedule is None:
        schedule = lr_constant

    def lr_fn(count):
        return cfg.lr * schedule(count)

    match name.lower():
        case "adamw":
            inner = optax.adamw(
                learning_rate=lr_fn,
                b1=cfg.betas[0], b2=cfg.betas[1],
                eps=1e-8,
                weight_decay=cfg.weight_decay,
                mask=_no_state_leaves_mask,  # never decay batch-norm stats
            )
        case "sgd":
            inner = _sgd_torch(lr_fn, cfg.weight_decay, cfg.momentum)
        case _:
            raise ValueError(
                f"Unknown optimizer '{name}'. Choose between 'adamw' and 'sgd'."
            )

    parts = []
    if params is not None:
        # Always mask (even with no frozen components): batch-norm running
        # statistics must never receive optimizer updates/weight decay.
        mask = trainable_mask(params, components or [])
        inv_mask = jax.tree.map(lambda m: not m, mask)
        # Zero frozen grads first so the global-norm clip sees only trainable
        # grads (parity with clip_grad_norm_ over requires_grad params).
        parts.append(optax.masked(optax.set_to_zero(), inv_mask))
        if grad_clip:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts.append(optax.masked(inner, mask))
    else:
        if grad_clip:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts.append(inner)
    return optax.chain(*parts), schedule


def global_grad_norm(grads, mask=None) -> jax.Array:
    """Global L2 norm over (optionally masked) grads — the logged grad_norm
    (reference train.py:278 returns it from clip_grad_norm_)."""
    leaves = jax.tree.leaves(
        grads if mask is None
        else jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
    )
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
