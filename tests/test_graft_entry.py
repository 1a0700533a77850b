"""Exercise the shipped driver entry points (__graft_entry__.py) as-is.

Round-1 shipped a dryrun_multichip that asserted on the driver's 1-device
process because no test invoked the real entry-point functions (VERDICT.md
"what's weak" #2). These tests call the exact shipped functions:

- ``entry()`` — jit-compile and run the returned forward fn on its example args;
- ``dryrun_multichip(8)`` — inline under the conftest-provisioned 8-device CPU
  mesh (covers the >= n_devices branch);
- ``dryrun_multichip`` subprocess self-provisioning — covers the driver-like
  situation where the calling process sees fewer devices than requested.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_forward_compiles_and_runs():
    fn, (params, x) = graft.entry()
    out = jax.jit(fn)(params, x)
    out.block_until_ready()
    assert out.shape == (x.shape[0], 10)
    assert not bool(jax.numpy.isnan(out.astype(jax.numpy.float32)).any())


def test_dryrun_multichip_inline_8_devices():
    # conftest provisions 8 virtual CPU devices -> the inline branch runs.
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_self_provisions():
    # More devices than this process has: must re-exec with a forced host
    # platform device count (the driver's situation, where one axon device
    # is visible). 16 > 8 conftest devices triggers the subprocess branch.
    graft.dryrun_multichip(16)
