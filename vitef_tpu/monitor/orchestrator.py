"""Orchestrator — run-directory contract + fan-out of monitor configs.

Reference: src/vitef/monitor/orchestrator.py (OrchestratorConfig :44-113,
build_orchestrator :117-160, EvalOrchestratorConfig :168-209,
build_eval_orchestrator :212-258). The on-disk run layout is a public contract
(SURVEY §1): ``savings/runs/<log_dir>/{config.json, checkpoints/, logs/,
metrics/}``.

Difference vs reference: the interactive delete-confirmation on overwrite
(:101-113) only prompts when stdin is a TTY; headless runs (the normal TPU-pod
case) log and proceed.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from ..config import SAVING_DIR
from ..utils.tree import json_serializable
from ..utils.typed import build_with_type_check
from .checkpoint import CheckpointerConfig
from .logger import LoggerConfig
from .utility import UtilityConfig

logger = logging.getLogger("vitef")

RUN_DIR = SAVING_DIR / "runs"


@dataclass
class OrchestratorConfig:
    """Reference orchestrator.py:44-113."""

    log_dir: str = ""
    overwrite: bool = False
    config_file: dict[str, Any] | None = None

    checkpoint_period: int = 0
    checkpoint_n_kept: int = 0

    logging_period: int = 0
    logging_level: str = "INFO"

    seed: int = 42
    utility_period: int = 1000

    def __post_init__(self) -> None:
        assert self.log_dir, "log_dir should be specified."
        self.log_dir = Path(os.path.expandvars(str(RUN_DIR / self.log_dir)))
        if self.log_dir.exists() and self.overwrite:
            if sys.stdin.isatty():
                confirm = input(
                    f"Do you want to permanently delete the directory "
                    f"'{self.log_dir}' (Yes/No)? "
                )
                if not confirm.upper().startswith("Y"):
                    logger.info("Operation cancelled.")
                    sys.exit(0)
            shutil.rmtree(self.log_dir)
            logger.info(f"Directory '{self.log_dir}' has been deleted.")
        self.log_dir.mkdir(parents=True, exist_ok=True)


def build_orchestrator(config: dict[str, Any]) -> dict[str, Any]:
    """Create the run dir, write config.json, fan out monitor configs
    (reference orchestrator.py:117-160)."""
    config_obj = build_with_type_check(OrchestratorConfig, config)

    with open(config_obj.log_dir / "config.json", "w") as f:
        json.dump(json_serializable(config_obj.config_file or {}), f, indent=4)

    # The reference's monitor config classes silently filter unknown kwargs
    # (kwargs-filtering __init__ idiom, orchestrator.py:88-90); subset here so
    # the typed builder doesn't warn on the flat shared dict.
    checkpointer_config = build_with_type_check(CheckpointerConfig, {
        "period": config_obj.checkpoint_period,
        "n_kept": config_obj.checkpoint_n_kept,
        "path": str(config_obj.log_dir / "checkpoints"),
    })
    logger_config = build_with_type_check(LoggerConfig, {
        "period": config_obj.logging_period,
        "level": config_obj.logging_level,
        "stdout_path": str(config_obj.log_dir / "logs"),
        "metric_path": str(config_obj.log_dir / "metrics"),
    })
    utility_config = build_with_type_check(UtilityConfig, {
        "seed": config_obj.seed,
        "period": config_obj.utility_period,
    })

    return {
        "checkpointer": checkpointer_config,
        "logger": logger_config,
        "utility": utility_config,
    }


@dataclass
class EvalOrchestratorConfig:
    """Reference orchestrator.py:168-209."""

    log_dir: str = ""
    checkpoint_step: str | None = ""
    logging_level: str = "INFO"
    seed: int = 42

    def __post_init__(self) -> None:
        assert self.log_dir, "log_dir should be specified."
        self.log_dir = Path(os.path.expandvars(str(RUN_DIR / self.log_dir)))
        if not self.log_dir.exists():
            logger.info(
                f"Directory {self.log_dir} does not exist yet. Creating it from scratch."
            )
        self.log_dir.mkdir(parents=True, exist_ok=True)


def build_eval_orchestrator(config: dict[str, Any]) -> dict[str, Any]:
    """Reload run config.json + resolve the checkpoint dir (last one if step
    unspecified — reference orchestrator.py:233-238)."""
    config_obj = build_with_type_check(EvalOrchestratorConfig, config)

    with open(config_obj.log_dir / "config.json") as f:
        exp_config = json.load(f)

    checkpoint_dir = Path(config_obj.log_dir / "checkpoints")
    step = config_obj.checkpoint_step
    if not step:
        from .checkpoint import Checkpointer

        # Newest COMPLETE checkpoint: a dir still being written (or crash
        # junk) must not be picked up by eval (checkpoint.py is_complete).
        last = Checkpointer.get_last_checkpoint_path(checkpoint_dir)
        assert last, f"no complete checkpoints in {checkpoint_dir}"
        step = Path(last).name
    elif str(step).isdigit():
        # Normalize to the Checkpointer's {:010d} dir names so both
        # checkpoint_step=512 and checkpoint_step=0000000512 resolve.
        step = f"{int(step):010d}"
    checkpoint_dir = checkpoint_dir / step

    logger_config = build_with_type_check(LoggerConfig, {
        "level": config_obj.logging_level,
        "stdout_path": str(config_obj.log_dir / "logs"),
        "metric_path": str(config_obj.log_dir / "metrics"),
    })
    utility_config = build_with_type_check(UtilityConfig, {"seed": config_obj.seed})

    return {
        "exp_config": exp_config,
        "checkpoint_dir": checkpoint_dir,
        "logger": logger_config,
        "utility": utility_config,
    }
