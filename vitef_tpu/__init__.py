"""vitef_tpu — a TPU-native JAX framework with the capabilities of
ambroiseodt/vit-plasticity.

Layer map (mirrors reference `src/vitef`, redesigned TPU-first):
  - ``vitef_tpu.config``   : path constants + seeding          (ref: src/vitef/config.py)
  - ``vitef_tpu.utils``    : typed config builder, jsonl IO,
                             CLI harnesses, tree helpers        (ref: src/vitef/utils.py)
  - ``vitef_tpu.ops``      : Pallas TPU kernels + XLA reference
                             paths (layernorm, flash attention,
                             on-device augment)                 (ref: torch C++/CUDA core)
  - ``vitef_tpu.models``   : functional transformer + ViT/GPT2/
                             PatchTST presets, HF weight import (ref: src/vitef/models)
  - ``vitef_tpu.optim``    : optax optimizers/schedules +
                             component freeze masks             (ref: src/vitef/optim.py)
  - ``vitef_tpu.parallel`` : Mesh/NamedSharding dp/fsdp/tp,
                             jitted train step                  (ref: src/vitef/distributed.py)
  - ``vitef_tpu.data``     : image dataset catalog + host→device
                             pipeline with on-device augment    (ref: src/vitef/data/images)
  - ``vitef_tpu.monitor``  : jsonl logger, orbax checkpointing,
                             orchestrator, utility              (ref: src/vitef/monitor)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VITEF_PLATFORM"):
    # Backend pin for SUBPROCESS tooling (tools/parity_gate.py, CI harnesses):
    # the axon TPU plugin in this image ignores the standard JAX_PLATFORMS
    # env var, and jax.config.update("jax_platforms", ...) only works before
    # backend init — this package is imported by every app entry before any
    # device touch, so the pin lands in time. No effect when the var is unset
    # (the normal TPU path).
    import jax as _jax

    _want = _os.environ["VITEF_PLATFORM"]
    try:  # detect a backend initialized BEFORE this import (pin = no-op then)
        from jax._src import xla_bridge as _xb

        _already_initialized = bool(getattr(_xb, "_backends", None))
    except Exception:  # pragma: no cover — jax internals moved
        _already_initialized = False
    if _already_initialized:
        _got = _jax.default_backend()
        if _got != _want:
            raise RuntimeError(
                f"VITEF_PLATFORM={_want!r} requested, but the jax backend "
                f"was already initialized to {_got!r} before vitef_tpu was "
                "imported — the platform pin cannot take effect (a 'cpu' "
                "gate would silently run over the TPU tunnel). Import "
                "vitef_tpu before any jax device use in this process."
            )
    else:
        _jax.config.update("jax_platforms", _want)
