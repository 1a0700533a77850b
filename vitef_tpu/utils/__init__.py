from .typed import build_with_type_check  # noqa: F401
from .jsonl import get_jsonl_keys, load_jsonl_to_numpy, read_jsonl, write_jsonl  # noqa: F401
from .tree import (  # noqa: F401
    deterministic_split,
    get_numpy,
    get_valid_tensor,
    json_serializable,
    update_dict,
)
from .cli import from_cli, load_config_from_cli, make_cli  # noqa: F401
