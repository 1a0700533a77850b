"""Checkpoint manager — async saves with the reference's on-disk contract.

Reference: src/vitef/monitor/checkpoint.py (CheckpointerConfig :43, Checkpointer
:75-265). Semantics replicated exactly (SURVEY §5.4):

  - step-named dirs ``{:010d}`` under ``<run>/checkpoints/`` (:98),
  - ``params.json`` model-config sidecar written by the master process (:226-230),
  - optional ``eval_<flag>`` marker files protecting a checkpoint from GC
    (:171-172, :254),
  - async save with an explicit future join before the next save and on exit
    (:218-224, :146-148),
  - keep-last-``n_kept`` GC skipping eval-flagged dirs (:247-256),
  - context-manager auto-resume from the last checkpoint (:132-137),
  - ``sync_step`` best-model rewind so the exit-time save is a no-op when the
    best checkpoint is already on disk (:128, train.py:343).

TPU-native design: the reference's torch-DCP async save first *stages* device
tensors to host, then writes in a background thread. Here the stage is a
synchronous ``jax.device_get`` (REQUIRED before returning to the train loop:
the jitted step donates its input buffers, so device arrays must be copied out
before the next step runs), and the write is a flat ``.npz`` of dotted-path
keys handled by a single-worker executor — saves are serialized, the step dir
appears atomically (tmp dir + rename). State entries mirror DCP's:
``model`` (params pytree), ``optim`` (optax state leaves), ``training``
(step counters). Eval/probing reload only the ``model`` entry via
:func:`load_checkpoint_params` (reference eval.py:189-191).
"""

from __future__ import annotations

import json
import logging
import re
import shutil
import tempfile
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..parallel.mesh import get_rank, is_master_process
from ..utils.tree import json_serializable, keystr_dotted

logger = logging.getLogger("vitef")


@dataclass
class CheckpointerConfig:
    """Reference checkpoint.py:43-72."""

    period: int = 0
    n_kept: int = 0
    path: str = ""

    def __post_init__(self):
        if self.period > 0:
            assert self.path, "Path was not set."


# ------------------------------------------------------------------------------
# Pytree <-> flat ndarray dict
# ------------------------------------------------------------------------------


def _flatten_with_paths(tree) -> dict[str, np.ndarray]:
    return {
        keystr_dotted(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def _unflatten_like(tree, flat: dict[str, np.ndarray]):
    """Fill ``tree``'s leaves from the dotted-path dict (structure from tree)."""
    paths_leaves = jax.tree_util.tree_leaves_with_path(tree)
    treedef = jax.tree_util.tree_structure(tree)
    new_leaves = []
    for path, leaf in paths_leaves:
        key = keystr_dotted(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing entry {key!r}")
        val = flat[key]
        new_leaves.append(np.asarray(val).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _write_state(path: Path, state: dict[str, Any]) -> None:
    """Write staged (host) state into ``path`` atomically (tmp dir + rename)."""
    tmp = Path(tempfile.mkdtemp(prefix=f".tmp_{path.name}_", dir=path.parent))
    try:
        np.savez(tmp / "model.npz", **state["model"])
        if state.get("optim") is not None:
            np.savez(tmp / "optim.npz", **state["optim"])
        with open(tmp / "training.json", "w") as f:
            json.dump(state.get("training", {}), f)
        if path.exists():  # re-save at same step (e.g. eval flag added later)
            shutil.rmtree(path)
        tmp.rename(path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


# ------------------------------------------------------------------------------
# Sharded (multi-host capable) staging: gather-free per-process shard files
# ------------------------------------------------------------------------------


def _stage_shard_pieces(tree) -> tuple[dict[str, np.ndarray], dict]:
    """Stage THIS process's addressable shards of a (possibly sharded) pytree.

    Works for per-host-sharded (multi-host FSDP) state where ``device_get``
    would fail: each process copies out only the shards it owns (first replica
    only, so replicated leaves are written exactly once across the fleet).
    Returns ``(pieces, meta)`` where pieces are keyed ``<path>@<start,...>``
    and meta records each leaf's global shape/dtype. Reference capability:
    torch DCP's collective save (checkpoint.py:224, :26-28).
    """
    pieces: dict[str, np.ndarray] = {}
    meta: dict[str, dict] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = keystr_dotted(path)
        meta[key] = {"shape": list(np.shape(leaf)),
                     "dtype": str(np.asarray(leaf).dtype
                                  if not isinstance(leaf, jax.Array)
                                  else leaf.dtype)}
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            seen = set()
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue
                starts = tuple(
                    0 if sl.start is None else int(sl.start) for sl in shard.index
                )
                if starts in seen:  # same piece on several local devices
                    continue
                seen.add(starts)
                pieces[f"{key}@{','.join(map(str, starts))}"] = np.asarray(
                    shard.data
                )
        elif is_master_process():
            arr = np.asarray(leaf)
            pieces[f"{key}@{','.join(['0'] * arr.ndim)}"] = arr
    return pieces, meta


def _assemble_from_shards(path: Path, prefix: str) -> dict[str, np.ndarray]:
    """Reassemble full host arrays from ``<prefix>.shard<rank>.npz`` files
    using ``index.json`` (written by the master at save time)."""
    with open(path / "index.json") as f:
        index = json.load(f)
    n_files = int(index["n_processes"])
    meta = index[prefix]
    out = {
        key: np.empty(m["shape"], dtype=np.dtype(m["dtype"]))
        for key, m in meta.items()
    }
    filled = {key: 0 for key in meta}
    for rank in range(n_files):
        shard_file = path / f"{prefix}.shard{rank}.npz"
        if not shard_file.exists():
            raise FileNotFoundError(
                f"incomplete checkpoint: missing {shard_file.name}"
            )
        with np.load(shard_file) as z:
            for piece_key in z.files:
                key, _, starts_s = piece_key.rpartition("@")
                piece = z[piece_key]
                starts = ([int(s) for s in starts_s.split(",")]
                          if starts_s else [])
                sl = tuple(
                    slice(st, st + sz) for st, sz in zip(starts, piece.shape)
                )
                out[key][sl] = piece
                filled[key] += piece.size
    for key, m in meta.items():
        expected = int(np.prod(m["shape"])) if m["shape"] else 1
        if filled[key] < expected:
            raise ValueError(f"checkpoint entry {key!r} has missing shards")
    return out


def _load_flat(path: Path, prefix: str) -> dict[str, np.ndarray] | None:
    """Load a state entry: single-file ``<prefix>.npz`` or sharded files."""
    if (path / f"{prefix}.npz").exists():
        with np.load(path / f"{prefix}.npz") as z:
            return {k: z[k] for k in z.files}
    if (path / f"{prefix}.shard0.npz").exists():
        return _assemble_from_shards(path, prefix)
    return None


def load_checkpoint_params(path, params_like):
    """Load only the ``model`` entry of a checkpoint dir into the structure of
    ``params_like`` (reference eval.py:189-191, linear_probing.py:265-267)."""
    flat = _load_flat(Path(path), "model")
    if flat is None:
        raise FileNotFoundError(f"no model entry in checkpoint {path}")
    return _unflatten_like(params_like, flat)


class Checkpointer:
    """Reference Checkpointer lifecycle (checkpoint.py:75-265) over jax pytrees.

    ``get_state``/``set_state`` callables bridge to the caller's TrainState:
    ``get_state() -> {'model': pytree, 'optim': pytree|None, 'training': dict}``,
    ``set_state(model, optim_flat, training)`` applies a loaded checkpoint.
    """

    folder_name = "{:010d}"
    re_folder = r"\d{10}"
    re_digits = re.compile(r"\d+")

    def __init__(self, config: CheckpointerConfig, get_state, set_state=None,
                 model_config: dict | None = None, sharded: bool | None = None):
        self.period = config.period
        self.n_kept = config.n_kept
        self.path = Path(config.path)
        self.path.mkdir(parents=True, exist_ok=True)
        # sharded=None: auto — per-process shard files whenever >1 process
        # (per-host FSDP state is not fully addressable; a master gather would
        # fail). Single process keeps the compact model.npz layout.
        self.sharded = sharded

        self.get_state = get_state
        self.set_state = set_state
        self.model_config = model_config

        self.device_rank = get_rank()
        self.saved_step = 0
        self.step = 0
        self.process: Future | None = None
        self._executor = ThreadPoolExecutor(max_workers=1)

    def sync_step(self, step: int) -> None:
        """Synchronize the step with the given value (checkpoint.py:128)."""
        self.saved_step = self.step = step

    def __enter__(self) -> "Checkpointer":
        path = self.get_last_checkpoint_path(self.path)
        if path:
            self.load(path)
        return self

    def __exit__(self, exc, value, tb):
        if self.saved_step != self.step:
            self.update()
        if self.process is not None:
            logger.info("Waiting for final checkpoint to complete.")
            self.process.result()
        self._executor.shutdown(wait=True)

    def __call__(self) -> None:
        """Periodic tick (checkpoint.py:150-156)."""
        self.step += 1
        if self.period <= 0:
            return
        if self.step % self.period == 0:
            self.update()

    def update(self, eval_flag: str = "") -> None:
        """Save at the current step (checkpoint.py:158-181)."""
        path = self.path / self.folder_name.format(self.step)

        if self.saved_step == self.step:
            # Do not checkpoint twice; but still add the eval flag if asked
            if eval_flag:
                self._wait()
                if path.exists():
                    (path / f"eval_{eval_flag}").touch()
            return

        self.save(path, eval_flag)
        self._cleaning()
        self.saved_step = self.step

    def load(self, path) -> None:
        """Load a checkpoint (checkpoint.py:183-206): single-file or sharded."""
        logger.info(f"Loading checkpoint from {str(path)}.")
        path = Path(path)
        model_flat = _load_flat(path, "model")
        if model_flat is None:
            raise FileNotFoundError(f"no model entry in checkpoint {path}")
        optim_flat = _load_flat(path, "optim")
        with open(path / "training.json") as f:
            training = json.load(f)
        if self.set_state is None:
            raise RuntimeError("Checkpointer has no set_state; cannot resume.")
        self.set_state(model_flat, optim_flat, training)
        self.sync_step(int(training.get("step", 0)))

    def save(self, path, eval_flag: str = "") -> None:
        """Async save (checkpoint.py:208-230): join previous, stage to host
        synchronously, write in the background.

        Two write layouts behind the same dir contract:

        - single process (``sharded`` False/auto-off): master-only writer,
          compact ``model.npz``/``optim.npz`` staged via ``device_get``;
        - multi-process (``sharded`` True/auto-on): collective, gather-free —
          EVERY process stages its addressable shards (first replica only) and
          writes ``model.shard<rank>.npz``; the master adds ``index.json``
          (global shapes/dtypes/process count), ``training.json``,
          ``params.json`` and the eval flag. This is the DCP-equivalent save
          that works for per-host-sharded FSDP state
          (reference checkpoint.py:224 ``dcp.async_save``).
        """
        self._wait()
        sharded = (self.sharded if self.sharded is not None
                   else jax.process_count() > 1)
        if sharded:
            self._save_sharded(path, eval_flag)
            return
        if not is_master_process():
            return
        logger.info(f"Saving checkpoint at step {self.step} to {str(path)}.")
        state = self.get_state()
        # Synchronous host staging: the jitted step donates buffers, so device
        # arrays must be copied out before the train loop continues.
        staged = {
            "model": _flatten_with_paths(jax.device_get(state["model"])),
            "optim": (
                _flatten_with_paths(jax.device_get(state["optim"]))
                if state.get("optim") is not None else None
            ),
            "training": state.get("training", {}),
        }
        model_config = self.model_config

        def write():
            _write_state(Path(path), staged)
            if eval_flag:
                (Path(path) / f"eval_{eval_flag}").touch()
            if model_config is not None:
                with open(Path(path) / "params.json", "w") as f:
                    json.dump(json_serializable(model_config), f)

        self.process = self._executor.submit(write)

    def _save_sharded(self, path, eval_flag: str = "") -> None:
        """Per-process shard write (synchronous staging, background IO)."""
        logger.info(
            f"Saving sharded checkpoint at step {self.step} to {str(path)} "
            f"(rank {self.device_rank})."
        )
        state = self.get_state()
        model_pieces, model_meta = _stage_shard_pieces(state["model"])
        optim_pieces = optim_meta = None
        if state.get("optim") is not None:
            optim_pieces, optim_meta = _stage_shard_pieces(state["optim"])
        training = state.get("training", {})
        model_config = self.model_config
        rank, master = self.device_rank, is_master_process()
        n_proc = jax.process_count()

        def write():
            p = Path(path)
            p.mkdir(parents=True, exist_ok=True)

            def write_json(name: str, obj) -> None:
                tmp = p / f".tmp.{name}"
                with open(tmp, "w") as f:
                    json.dump(obj, f)
                tmp.replace(p / name)

            for prefix, pieces in (("model", model_pieces),
                                   ("optim", optim_pieces)):
                if pieces is None:
                    continue
                tmp = p / f".tmp.{prefix}.shard{rank}.npz"
                np.savez(tmp, **pieces)
                tmp.replace(p / f"{prefix}.shard{rank}.npz")
            if master:
                # index.json is written LAST (each file atomically via
                # tmp+replace): its presence is the completeness marker —
                # a crash mid-save leaves a dir that _is_complete() rejects
                # and a later _cleaning removes, never a dir that shadows the
                # last good checkpoint (the single-process writer gets the
                # same guarantee from its whole-dir tmp+rename).
                write_json("training.json", training)
                if model_config is not None:
                    write_json("params.json", json_serializable(model_config))
                if eval_flag:
                    (p / f"eval_{eval_flag}").touch()
                index: dict[str, Any] = {"n_processes": n_proc,
                                         "model": model_meta}
                if optim_meta is not None:
                    index["optim"] = optim_meta
                write_json("index.json", index)

        self.process = self._executor.submit(write)

    @classmethod
    def is_complete(cls, path) -> bool:
        """A checkpoint dir is complete iff its completeness marker exists:
        ``model.npz`` (single-process whole-dir rename) or ``index.json``
        (sharded path, written last) with every shard file present."""
        path = Path(path)
        if (path / "model.npz").exists():
            return (path / "training.json").exists()
        index_file = path / "index.json"
        if not index_file.exists() or not (path / "training.json").exists():
            return False
        try:
            with open(index_file) as f:
                n = int(json.load(f)["n_processes"])
        except (ValueError, KeyError, json.JSONDecodeError):
            return False
        return all((path / f"model.shard{r}.npz").exists() for r in range(n))

    @classmethod
    def get_last_checkpoint_path(cls, path) -> str:
        """Newest COMPLETE checkpoint — mid-write or crash-junk dirs (no
        completeness marker yet) never shadow the last good one."""
        folders = [p for p in cls._list_checkpoints(Path(path))
                   if cls.is_complete(p)]
        if folders:
            return max(folders, key=lambda p: cls._get_key_step(p.name))
        return ""

    def _wait(self) -> None:
        if self.process is not None:
            self.process.result()
            self.process = None

    def _cleaning(self) -> None:
        """Keep-last-n GC skipping eval-flagged dirs (checkpoint.py:247-256).

        Only COMPLETE checkpoints count toward (and are protected by) the
        keep window; incomplete dirs strictly older than the newest complete
        one are crash junk or shards resurrected by a straggler process's
        in-flight write after a previous GC — removed too (a straggler that
        recreates one afterwards is re-collected at the next tick). Never
        touches the newest dirs, which may legitimately still be mid-write
        on other processes.
        """
        if self.n_kept <= 0 or not is_master_process():
            return
        self._wait()
        all_checkpoints = self._list_checkpoints(self.path)
        all_checkpoints.sort(key=lambda p: self._get_key_step(p.name))
        complete = [p for p in all_checkpoints if self.is_complete(p)]
        removable = set(complete[: -self.n_kept])
        if complete:
            newest_complete = self._get_key_step(complete[-1].name)
            removable |= {p for p in all_checkpoints
                          if not self.is_complete(p)
                          and self._get_key_step(p.name) < newest_complete}
        for prefix in sorted(removable, key=lambda p: self._get_key_step(p.name)):
            if not any(prefix.glob("eval_*")):
                logger.info(f"Removing: {str(prefix)}")
                shutil.rmtree(prefix)

    @classmethod
    def _list_checkpoints(cls, path: Path) -> list[Path]:
        return [p for p in path.iterdir() if p.is_dir() and re.match(cls.re_folder, p.name)]

    @classmethod
    def _get_key_step(cls, name: str) -> int:
        return int(re.findall(cls.re_digits, name)[-1])
