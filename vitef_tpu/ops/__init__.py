from .layernorm import layer_norm  # noqa: F401
from .attention import multi_head_attention, attention_reference  # noqa: F401
from .common import resolve_impl, dropout  # noqa: F401
from .losses import (next_token_cross_entropy, fused_next_token_ce,  # noqa: F401
                     make_fused_head_loss)
