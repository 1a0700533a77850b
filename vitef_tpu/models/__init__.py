from .transformer import (  # noqa: F401
    TransformerConfig,
    apply_transformer,
    get_decomposition,
    get_probes,
    init_transformer,
    n_params,
)
from .registry import Model, build_model  # noqa: F401
from .generation import generate, prefill, init_kv_cache, sample_token  # noqa: F401
from .serving import DecodeServer, Request  # noqa: F401
from .speculative import generate_speculative  # noqa: F401
from .vit import ViTConfig, build_vit  # noqa: F401
from .gpt2 import GPT2Config, build_gpt2  # noqa: F401
from .patchtst import PatchTSTConfig, build_patchtst  # noqa: F401
