"""Device mesh, sharding rules, and multi-host setup — the communication backend.

Reference: src/vitef/distributed.py (rank helpers :48-89, OsEnvironment :97-132,
ComputingManagerConfig/ComputingManager :140-250, build_manager :253-270,
get_raw_model :278-283). The reference's torch.distributed process groups +
DeviceMesh + DDP/FSDP/TP wrappers become, TPU-natively:

  - ``jax.distributed.initialize`` for multi-host rendezvous (ICI/DCN handled by
    the runtime — no NCCL/gloo backend choice exists or is needed),
  - one 2-D ``jax.sharding.Mesh`` over axes ``('dp', 'tp')`` (same axis names and
    ``dp = world // tp`` default as distributed.py:158-159, 208-210),
  - DDP → batch sharded over 'dp' with parameters replicated; XLA inserts the
    gradient all-reduce over ICI,
  - FSDP → parameters additionally sharded over 'dp' on their largest
    divisible axis (zero-3 style; XLA inserts all-gather/reduce-scatter),
  - TP → attention heads and ffn_dim sharded over 'tp' (the tp_plan the
    reference imports machinery for but never defines, distributed.py:230-232).

There is no model *wrapper* (no DDP/FSDP module, hence no get_raw_model
unwrapping): shardings are data, attached to the param pytree via
``jax.device_put``; the jitted step is parallelism-agnostic.
"""

from __future__ import annotations

import logging
import os
import socket
from dataclasses import dataclass
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.tree import keystr_dotted as _path_str

logger = logging.getLogger(__name__)


# ------------------------------------------------------------------------------
# Rank helpers (reference distributed.py:48-89 — torchrun env vars → JAX API)
# ------------------------------------------------------------------------------


@lru_cache
def is_distributed_job() -> bool:
    return int(os.environ.get("VITEF_NUM_PROCESSES", "1")) > 1


@lru_cache
def get_rank() -> int:
    return jax.process_index()


@lru_cache
def get_local_rank() -> int:
    return int(os.environ.get("VITEF_LOCAL_RANK", "0"))


@lru_cache
def get_world_size() -> int:
    return jax.process_count()


def is_master_process() -> bool:
    return get_rank() == 0


@lru_cache
def get_hostname() -> str:
    return socket.gethostname()


# ------------------------------------------------------------------------------
# Computing manager (reference distributed.py:140-270)
# ------------------------------------------------------------------------------


@dataclass
class ComputingConfig:
    """Reference ComputingManagerConfig (distributed.py:140-176).

    ``dp=-1`` means world_size // tp (distributed.py:158-159). ``fsdp`` shards
    parameters over the dp axis (the reference's hybrid dp>1 ∧ tp>1 FSDP case,
    distributed.py:236-237, generalized to a first-class switch).
    """

    dp: int = -1
    tp: int = 1
    fsdp: bool = False
    # multi-host rendezvous (jax.distributed.initialize args); None = single host
    coordinator_address: str | None = None
    num_processes: int = 1
    process_id: int = 0


def build_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """2-D device mesh with axes ('dp', 'tp') — reference distributed.py:208-210."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // tp
    assert dp * tp == n, (
        f"dp * tp = {dp}*{tp} must equal the number of devices ({n})"
    )
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names=("dp", "tp"))


def build_computing_manager(config: dict | ComputingConfig | None = None) -> Mesh:
    """Initialize multi-host JAX if configured, then build the mesh.

    Reference build_manager + ComputingManager.__enter__ (distributed.py:192-270).
    """
    from ..utils.typed import build_with_type_check

    if config is None:
        config = ComputingConfig()
    elif isinstance(config, dict):
        config = build_with_type_check(ComputingConfig, config)
    if config.coordinator_address and config.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )
        logger.info(
            "Initialized multi-host JAX: process %d/%d on %s",
            config.process_id, config.num_processes, get_hostname(),
        )
    mesh = build_mesh(config.dp, config.tp)
    logger.info("Device mesh: dp=%d tp=%d (%d devices)",
                mesh.shape["dp"], mesh.shape["tp"], mesh.size)
    return mesh


# ------------------------------------------------------------------------------
# Sharding rules
# ------------------------------------------------------------------------------


def _largest_divisible_axis(shape: tuple, n: int) -> int | None:
    """Pick the largest axis divisible by n (for FSDP param sharding)."""
    best = None
    for i, s in enumerate(shape):
        if s % n == 0 and s >= n and (best is None or s > shape[best]):
            best = i
    return best


# TP rules keyed by parameter-path substring → (axis sharded over 'tp').
# qkv (E, 3E) and fc1 (E, F) are column-parallel (shard out features = heads /
# ffn_dim); attn.output (E, E) and fc2 (F, E) are row-parallel (shard in
# features) so each pair needs a single psum, inserted by XLA.
_TP_RULES = [
    ("attn.qkv_mat.weight", 1),
    ("attn.qkv_mat.bias", 0),
    ("attn.output.weight", 0),
    ("ffn.fc1.weight", 1),
    ("ffn.fc1.bias", 0),
    ("ffn.fc2.weight", 0),
]


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree for the parameters.

    DP: replicated. TP (mesh tp>1): heads/ffn_dim sharded per ``_TP_RULES``.
    FSDP: remaining (and replicated-axis) dims sharded over 'dp' on the largest
    divisible axis.
    """
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]

    def rule(path, leaf):
        name = _path_str(path)
        spec = [None] * leaf.ndim
        if tp > 1:
            if leaf.ndim == 3 and ".ffn.fc" in name:
                # stacked MoE expert weights (n_experts, in, out): shard the
                # EXPERT axis — GSPMD turns the dense all-experts einsums
                # (parallel/moe.apply_moe_ffn) into per-device expert
                # partials + one psum at the gate-combine.
                if leaf.shape[0] % tp == 0:
                    spec[0] = "tp"
            else:
                for pat, axis in _TP_RULES:
                    if name.endswith(pat) and leaf.shape[axis] % tp == 0:
                        spec[axis] = "tp"
                        break
        if fsdp and dp > 1:
            free = tuple(s if spec[i] is None else 0 for i, s in enumerate(leaf.shape))
            ax = _largest_divisible_axis(free, dp)
            if ax is not None:
                spec[ax] = "dp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Place the param pytree on the mesh per :func:`param_shardings`."""
    return jax.device_put(params, param_shardings(params, mesh, fsdp))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch axis sharded over 'dp', everything else replicated."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with the leading axis sharded over 'dp'.

    Single-controller: plain ``device_put``. Multi-host: each process holds a
    DIFFERENT local shard (the loader strides the epoch across processes), so
    the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put`` would treat
    each host's local batch as the same global value and silently drop the
    non-addressable rows.
    """
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding(mesh, x.ndim), np.asarray(x)
            ),
            batch,
        )
    return jax.device_put(
        batch, jax.tree.map(lambda x: batch_sharding(mesh, x.ndim), batch)
    )
