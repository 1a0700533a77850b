"""Config CLI harnesses.

The reference uses OmegaConf for train/eval/linear_probing (defaults ← yaml
``config=`` file ← dotted CLI overrides, reference apps/vit/train.py:374-384 and
README) and python-fire for analysis/plots (reference apps/vit/analysis.py:293).
Neither package is assumed here; this module implements the same two contracts:

  - ``load_config_from_cli(ConfigCls, argv)``: parse ``config=path.yaml`` plus
    ``a.b.c=value`` dotted overrides, merge onto dataclass defaults, and build a
    typed config via :func:`vitef_tpu.utils.typed.build_with_type_check`.
  - ``make_cli({'run': fn, ...})``: a fire-like dispatcher —
    ``python -m mod run --arg value`` calls ``fn(arg=value)``.
"""

from __future__ import annotations

import ast
import sys
from typing import Any, Callable

import yaml


import re

_LEADING_ZERO_INT = re.compile(r"^0\d+$")


def _parse_value(raw: str) -> Any:
    """Parse a CLI string value: yaml-style scalars, lists, null.

    Leading-zero digit strings stay strings: yaml 1.1 would read
    ``checkpoint_step=0000001000`` as OCTAL 512, silently corrupting the
    {:010d}-formatted checkpoint step names.
    """
    if _LEADING_ZERO_INT.match(raw):
        return raw
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def _set_dotted(d: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    cur = d
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
        if not isinstance(cur, dict):
            raise TypeError(f"cannot override {dotted}: {k} is not a mapping")
    cur[keys[-1]] = value


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def from_cli(argv: list[str] | None = None) -> dict:
    """Parse ``key=value`` args (OmegaConf.from_cli equivalent) into a nested dict."""
    if argv is None:
        argv = sys.argv[1:]
    out: dict = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"expected key=value argument, got {arg!r}")
        key, _, raw = arg.partition("=")
        _set_dotted(out, key, _parse_value(raw))
    return out


def load_config_from_cli(config_cls: type, argv: list[str] | None = None):
    """Defaults ← yaml ``config=`` file ← dotted CLI overrides → typed dataclass.

    Mirrors the reference's three-step OmegaConf merge (README.md:105-108,
    apps/vit/train.py:374-384).
    """
    cli = from_cli(argv)
    file_cfg: dict = {}
    cfg_path = cli.pop("config", None)
    if cfg_path:
        with open(cfg_path) as f:
            file_cfg = yaml.safe_load(f) or {}
    merged = _deep_merge(file_cfg, cli)
    from .typed import build_with_type_check

    return build_with_type_check(config_cls, merged)


def _coerce_flag_value(raw: str) -> Any:
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return yaml.safe_load(raw)


def make_cli(commands: dict[str, Callable], argv: list[str] | None = None) -> Any:
    """Minimal python-fire equivalent: ``prog <command> --key value ...``."""
    if argv is None:
        argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("commands:", ", ".join(commands))
        return None
    name, rest = argv[0], argv[1:]
    if name not in commands:
        raise SystemExit(f"unknown command {name!r}; available: {list(commands)}")
    kwargs: dict[str, Any] = {}
    i = 0
    while i < len(rest):
        arg = rest[i]
        if not arg.startswith("--"):
            raise SystemExit(f"expected --key [value], got {arg!r}")
        key = arg[2:]
        if "=" in key:
            key, _, raw = key.partition("=")
            kwargs[key] = _coerce_flag_value(raw)
            i += 1
        elif i + 1 < len(rest) and not rest[i + 1].startswith("--"):
            kwargs[key] = _coerce_flag_value(rest[i + 1])
            i += 2
        else:
            kwargs[key] = True
            i += 1
    return commands[name](**kwargs)
