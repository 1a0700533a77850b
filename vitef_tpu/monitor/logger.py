"""Logging manager — per-rank jsonl metric streams + stdout logs.

Reference: src/vitef/monitor/logger.py (LoggerConfig :32, Logger :74-160).
The file names and record fields are a public contract consumed by the plots
layer (SURVEY §5.5): ``metrics/raw_<rank>.jsonl`` (train), ``metrics/eval.jsonl``
(truncated on start), ``logs/device_<rank>.log``, ``metrics/info_model.jsonl``,
wall-clock ``ts`` appended to every record.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass
from pathlib import Path
from traceback import format_exception
from typing import Any, Literal

from ..parallel.mesh import get_hostname, get_rank, is_master_process

logger = logging.getLogger("vitef")


@dataclass
class LoggerConfig:
    """Reference logger.py:32-66."""

    period: int = 0
    level: Literal["DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"] = "INFO"
    stdout_path: str = ""
    metric_path: str = ""

    def __post_init__(self):
        if self.period > 0:
            assert self.stdout_path, "stdout_path was not set."
            assert self.metric_path, "metric_path was not set."
            self.level = self.level.upper()


class Logger:
    """Reference Logger (logger.py:74-160)."""

    def __init__(self, config: LoggerConfig, eval: bool = False) -> None:
        rank = get_rank()
        self.path = Path(config.metric_path)
        self.path.mkdir(parents=True, exist_ok=True)
        if eval:
            # Clean eval metric file if not empty (logger.py:99-103)
            self.metric = str(self.path / "eval.jsonl")
            with open(self.metric, "w"):
                pass
        else:
            self.metric = str(self.path / f"raw_{rank}.jsonl")

        stdout_dir = Path(config.stdout_path)
        stdout_dir.mkdir(parents=True, exist_ok=True)
        stdout_file = stdout_dir / f"device_{rank}.log"

        logger.handlers.clear()
        log_format = logging.Formatter(
            "%(asctime)s [%(levelname)s] %(filename)s:%(lineno)d - %(message)s"
        )
        log_level = getattr(logging, (config.level or "INFO").upper())
        logger.setLevel(log_level)
        handler = logging.FileHandler(stdout_file, "a")
        handler.setFormatter(log_format)
        logger.addHandler(handler)

        if is_master_process():
            handler = logging.StreamHandler()
            handler.setFormatter(log_format)
            logger.addHandler(handler)
            logger.info(f"Logging to {stdout_dir}")

        logger.info(f"Running on machine {get_hostname()}")
        self.start_time = time.time()

    def __enter__(self) -> "Logger":
        self.metric = open(self.metric, "a")
        return self

    def __call__(self, metrics: dict[str, Any]) -> None:
        """Report metrics to file, stamping wall-clock ``ts`` (logger.py:141-145)."""
        metrics = {**metrics, "ts": time.time() - self.start_time}
        print(json.dumps(metrics), file=self.metric, flush=True)
        logger.info({k: round(v, 5) if isinstance(v, float) else v
                     for k, v in metrics.items()})

    def report_model_size(self, params, trainable=None) -> None:
        """Trainable-parameter count to info_model.jsonl (logger.py:147-153).

        ``trainable``: optional bool mask pytree (requires_grad equivalent).
        """
        if is_master_process():
            import jax

            leaves = jax.tree.leaves(params)
            if trainable is not None:
                masks = jax.tree.leaves(trainable)
                n_params = sum(p.size for p, m in zip(leaves, masks) if m)
            else:
                n_params = sum(p.size for p in leaves)
            with open(self.path / "info_model.jsonl", "a") as f:
                print(json.dumps({"model_params": int(n_params)}), file=f, flush=True)
            logger.info(f"The model has {n_params} trainable parameters.")

    def __exit__(self, exc, value, tb):
        self.metric.close()
        if exc is not None:
            logger.error(f"Exception: {value}")
            logger.info("".join(format_exception(exc, value, tb)))
