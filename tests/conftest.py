"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding tests
run on a host mesh — SURVEY.md §4c)."""

import os

# Must be set before jax backend initialization. NOTE: the axon TPU plugin in
# this image ignores the JAX_PLATFORMS env var — jax.config.update is the only
# reliable way to pin the CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Zero-egress image: make HF hub lookups fail FAST instead of 5 retries x
# exponential backoff per file (~45 s each place a tokenizer/weights load
# falls back to random init).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _ensure_stub(name: str) -> None:
    """Stub an absent third-party module so reference code can be imported.

    Dunder lookups raise AttributeError (inspect/torch machinery probes
    __file__/__path__ on every sys.modules entry — returning objects there
    breaks them); ordinary names return a placeholder class.
    """
    import types

    if name in sys.modules:
        return
    stub = types.ModuleType(name)

    def _getattr(attr, _name=name):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return type(attr, (), {})

    stub.__getattr__ = _getattr
    # A real (loader-less) spec: importlib.util.find_spec consults
    # sys.modules first and RAISES on a module whose __spec__ is None —
    # transformers probes find_spec("torchvision") at import time, so a
    # spec-less stub poisons any later `import transformers` in the same
    # process (test-order-dependent suite errors). With a spec, the probe
    # succeeds and the missing dist metadata marks the package unavailable.
    import importlib.machinery

    stub.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = stub
    if "." in name:
        parent, _, child = name.rpartition(".")
        if parent in sys.modules:
            setattr(sys.modules[parent], child, stub)


def load_reference_module(relpath: str, modname: str):
    """Load a module from /root/reference by file path under a unique name
    (avoids colliding with our same-named apps/ packages), stubbing the
    reference's absent deps (fire, torchvision, tqdm, tiktoken)."""
    import importlib.util

    for dep in ("fire", "tqdm", "tiktoken", "torchvision", "torchvision.datasets",
                "torchvision.transforms", "torchvision.transforms.functional"):
        _ensure_stub(dep)
    ref_src = "/root/reference/src"
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    spec = importlib.util.spec_from_file_location(
        modname, f"/root/reference/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference_vitef():
    """Import the read-only PyTorch reference as a golden oracle (never copied).

    Stubs tiktoken (absent in this image) which the reference's gpt2 module
    imports at package-import time.
    """
    import importlib.machinery
    import types

    if "tiktoken" not in sys.modules:
        stub = types.ModuleType("tiktoken")
        stub.get_encoding = lambda name: None
        # see _ensure_stub: a None __spec__ poisons later find_spec probes
        stub.__spec__ = importlib.machinery.ModuleSpec("tiktoken", None)
        sys.modules["tiktoken"] = stub
    ref_src = "/root/reference/src"
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    import vitef.models.transformer.architecture as ref_arch

    return ref_arch
