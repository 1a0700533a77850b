"""CI gate for PARITY.md's accuracy-parity recipe (tools/parity_gate.py).

Runs the five-stage synthetic dry run — data → train sweep (real CLI
subprocesses, 7 freeze configs) → eval → zero-shot linear probing → plots
csv/table — so the only untested link on artifact-mount day is the
artifacts themselves (VERDICT r3 next #8). Quick operating point: 4 steps,
one seed, one lr; the standalone tool defaults to 200 steps.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_parity_gate_quick(tmp_path):
    proc = subprocess.run(
        [sys.executable, "tools/parity_gate.py", "--steps", "4",
         "--seeds", "0", "--lrs", "1e-3", "--batch", "16", "--devices", "1",
         "--workdir", str(tmp_path / "gate"), "--keep"],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    assert "[parity_gate] PASS" in proc.stdout
    # spot-check the artifacts the gate asserted are really on disk
    gate = tmp_path / "gate"
    assert (gate / "results" / "finetuning" / "cifar10.csv").exists()
    assert (gate / "savings" / "runs" / "vit_cifar10_seed_0_lr_1e-3_comp_3"
            / "metrics" / "eval.jsonl").exists()
