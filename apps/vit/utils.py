"""Shared ViT-app state + freeze helpers.

Reference: apps/vit/utils.py (TrainingState :23-46, freeze_model :54-91,
EvalState :99-118). The torch-Stateful TrainingState maps onto the jitted
TrainState's ``training`` checkpoint entry; ``freeze_model``'s requires_grad
mutation becomes the static optax mask built by
:func:`vitef_tpu.optim.trainable_mask` (same component vocabulary: emb /
attn_norm / mha / ffn_norm / ffn_fc1 / ffn_fc2).
"""

from __future__ import annotations

from dataclasses import dataclass

from vitef_tpu.optim import FREEZE_MAP, trainable_mask  # noqa: F401 (re-export)


@dataclass
class EvalState:
    """Reference EvalState (apps/vit/utils.py:99-118): batch-mean accumulators."""

    accuracy: float = 0.0
    loss: float = 0.0
    step: int = 0

    def state_dict(self) -> dict:
        return {"eval_acc": self.accuracy, "eval_loss": self.loss, "step": self.step}

    def load_state_dict(self, state_dict: dict) -> None:
        self.accuracy = state_dict["eval_acc"]
        self.loss = state_dict["eval_loss"]
        self.step = state_dict["step"]


def freeze_components(params, components: list[str] | None):
    """Bool mask pytree (True = trainable) for the reference's component names
    (apps/vit/utils.py:54-91). ``None``/empty → everything trainable."""
    if not components:
        import jax

        return jax.tree.map(lambda _: True, params)
    return trainable_mask(params, components)
