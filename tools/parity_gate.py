"""One-command offline dry run of PARITY.md's accuracy-parity recipe.

The real recipe (PARITY.md "Accuracy-parity recipe") is blocked on artifacts
(zero egress: no HF weights, no datasets). This gate executes every OTHER
link of the chain end-to-end against a synthetic dataset, so on
artifact-mount day the only untested thing is the artifacts themselves:

  1. data   — synthetic class-separable CIFAR-10 in the torchvision pickle
              layout (what `vitef_tpu/data/images/datasets.py` reads).
  2. sweep  — the REAL CLI, one subprocess per run:
              ``python -m apps.vit.train config=apps/vit/configs/cifar10.yaml
              ... log_dir=vit_cifar10_seed_<s>_lr_<lr>_comp_<i>`` for the same
              7 freeze configs as `apps/vit/scripts/sweep_lib.sh`
              (reference finetuning.sh sweep, run-name contract consumed by
              apps/plots — reference apps/plots/finetuning.py:116-212).
  3. eval   — ``python -m apps.vit.eval`` per run (writes metrics/eval.jsonl,
              the reference eval.sh stage).
  4. probe  — ``python -m apps.vit.linear_probing finetuned=False`` → the
              zero-shot LP artifact `vit_cifar10_seed_0_pretrained/
              linear_probing.json` (reference linear_probing.py:295-311).
  5. csv+table — `apps.plots.finetuning.get_evals_csv/get_linear_probing_csv/
              table_results` consuming the run dirs stages 2-4 produced
              (reference finetuning.py:181-212, 313-325, 420-536).

Every artifact contract is asserted in between (config.json, raw_0.jsonl
metric fields, eval.jsonl test_acc, checkpoints/params.json, csv row counts,
finite table aggregates). Scaled down but structurally identical: tiny ViT,
random init (the zero-egress fallback), reduced seed x lr grid.

Usage (from the repo root; CI runs the quick form via tests/test_parity_gate.py):

    python tools/parity_gate.py                     # 200 steps, 2 lrs
    python tools/parity_gate.py --steps 4 --lrs 1e-3  # quick smoke
    python tools/parity_gate.py --workdir /tmp/gate --keep
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import shutil
import subprocess
import sys
import tempfile
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]

# The 7 freeze configs, indexed 0..6 — MUST mirror apps/vit/scripts/
# sweep_lib.sh FREEZE_CONFIGS (the comp_<i> suffix is the plots-layer
# contract; reference finetuning.sh:11-18).
FREEZE_CONFIGS = [
    'components=[]',
    'components=["attn_norm","mha","ffn_norm","ffn_fc1","ffn_fc2"]',
    'components=["emb","mha","ffn_norm","ffn_fc1","ffn_fc2"]',
    'components=["emb","attn_norm","ffn_norm","ffn_fc1","ffn_fc2"]',
    'components=["emb","attn_norm","mha","ffn_fc1","ffn_fc2"]',
    'components=["emb","attn_norm","mha","ffn_norm","ffn_fc2"]',
    'components=["emb","attn_norm","mha","ffn_norm","ffn_fc1"]',
]
# comp index -> trainable_components value the csv must contain
COMP_NAMES = ["all", "emb", "attn_norm", "mha", "ffn_norm", "ffn_fc1",
              "ffn_fc2"]


def make_synthetic_cifar10(data_dir: Path, n_per_batch: int = 96) -> None:
    """Class-separable synthetic CIFAR-10 in the torchvision pickle layout
    (channel-0 intensity encodes the label, so a few steps of finetuning
    show real learning signal and the table is non-degenerate)."""
    base = data_dir / "cifar-10-batches-py"
    base.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
    for fname in names:
        labels = rng.integers(0, 10, size=n_per_batch)
        data = rng.integers(0, 64, size=(n_per_batch, 3072), dtype=np.uint8)
        data[:, :1024] += (labels[:, None] * 19).astype(np.uint8)
        with open(base / fname, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)


def gate_env(workdir: Path, tpu: bool, devices: int = 8) -> dict:
    """Subprocess environment: redirect every vitef path constant into the
    workdir (config.py env overrides) and pin the CPU mesh unless --tpu.

    ``devices``: virtual CPU device count for the subprocesses. The default
    8 exercises the dp-sharded train path; ``--devices 1`` (the CI quick
    form, tests/test_parity_gate.py) takes the single-device path — the
    artifact contract under test is identical, and each subprocess's XLA
    compile drops from ~2 min to ~20 s (the dp=8 CPU mesh compile is pure
    overhead for a contract check; multi-device training semantics have
    their own tests)."""
    env = dict(os.environ)
    env["VITEF_SAVING_DIR"] = str(workdir / "savings")
    env["VITEF_RESULT_DIR"] = str(workdir / "results")
    env["VITEF_FIGURE_DIR"] = str(workdir / "figures")
    env["VITEF_DATASET_DIR"] = str(workdir / "datasets")
    if not tpu:
        # VITEF_PLATFORM (vitef_tpu/__init__.py hook), NOT JAX_PLATFORMS:
        # this image's axon TPU plugin ignores the standard env var, and a
        # "CPU" gate that silently runs 16 subprocesses over the TPU tunnel
        # is both slow and chip-contending (observed before the hook).
        env["VITEF_PLATFORM"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={devices}"
            ).strip()
    # Shared persistent XLA compile cache across the gate's ~16 subprocesses:
    # the eval program is identical for all 7 comps (and for the in-train
    # eval), so all but the first compile are cache hits. Measured: a train
    # subprocess drops ~2.3 min → ~66 s wall on this 1-core image.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(workdir / "xla_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    return env


STAGE_TIMEOUT = 900.0  # per-subprocess wall bound; --stage-timeout overrides


def run(argv: list[str], env: dict, tag: str,
        timeout: float | None = None) -> None:
    timeout = STAGE_TIMEOUT if timeout is None else timeout
    print(f"[parity_gate] {tag}: {' '.join(argv[:4])} ...", flush=True)
    try:
        proc = subprocess.run(argv, env=env, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")[-4000:]
        sys.stderr.write(out.decode("utf-8", "replace")
                         if isinstance(out, bytes) else out)
        raise RuntimeError(
            f"stage {tag!r} timed out after {timeout:.0f}s "
            "(wedged subprocess — TPU-tunnel contention?)") from e
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"stage {tag!r} failed (exit {proc.returncode})")


def check(cond: bool, msg: str) -> None:
    if not cond:
        raise AssertionError(f"[parity_gate] contract violation: {msg}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--workdir", default=None,
                    help="artifact root (default: fresh temp dir)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seeds", default="0",
                    help="comma list; seed 0 must be present (LP contract)")
    ap.add_argument("--lrs", default="1e-3,3e-3",
                    help="comma list of lr strings (run-name contract keys)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real backend instead of the 8-dev CPU mesh")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count per subprocess (1 = "
                         "single-device path, much faster compiles)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: delete temp dirs)")
    ap.add_argument("--stage-timeout", type=float, default=900.0,
                    help="per-subprocess wall bound in seconds")
    args = ap.parse_args()
    global STAGE_TIMEOUT
    STAGE_TIMEOUT = args.stage_timeout

    seeds = [int(s) for s in args.seeds.split(",")]
    lrs = args.lrs.split(",")
    check(0 in seeds, "seed 0 required (zero-shot LP artifact is seed_0)")

    owns_tmp = args.workdir is None
    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="parity_gate_"))
    workdir.mkdir(parents=True, exist_ok=True)
    env = gate_env(workdir, args.tpu, args.devices)
    runs_dir = workdir / "savings" / "runs"

    try:
        # -- stage 1: data ----------------------------------------------
        data_dir = workdir / "datasets" / "cifar10"
        make_synthetic_cifar10(data_dir)
        print("[parity_gate] stage 1 (synthetic data) ok", flush=True)

        # -- stage 2: sweep (real train CLI per run) ---------------------
        base_over = [
            "model_name=tiny", "patch_size=16", "image_dim=[3,32,32]",
            "pretrained=False", "in21k=False",
            f"dataset_name=cifar10", f"data_dir={data_dir}",
            f"batch_size={args.batch}", f"val_batch_size={args.batch}",
            "num_workers=0", f"n_steps={args.steps}",
            f"eval_period={max(1, args.steps // 2)}",
            f"logging_period={max(1, args.steps // 10)}",
            "warmup=1", "utility_period=1000",
        ]
        for seed in seeds:
            for lr in lrs:
                for i, freeze in enumerate(FREEZE_CONFIGS):
                    name = f"vit_cifar10_seed_{seed}_lr_{lr}_comp_{i}"
                    run([sys.executable, "-m", "apps.vit.train",
                         "config=apps/vit/configs/cifar10.yaml",
                         *base_over, f"seed={seed}", f"lr={lr}",
                         freeze, f"log_dir={name}"],
                        env, f"train {name}")
                    rd = runs_dir / name
                    check((rd / "config.json").exists(), f"{name}/config.json")
                    raw = rd / "metrics" / "raw_0.jsonl"
                    check(raw.exists(), f"{name}/metrics/raw_0.jsonl")
                    rec = json.loads(raw.read_text().strip().split("\n")[0])
                    for key in ("loss", "step", "lr", "grad_norm", "ts"):
                        check(key in rec, f"{name} metric field {key}")
                    ckpts = list((rd / "checkpoints").iterdir())
                    check(ckpts, f"{name} checkpoints")
                    check((sorted(ckpts)[-1] / "params.json").exists(),
                          f"{name} params.json")
        print("[parity_gate] stage 2 (sweep) ok", flush=True)

        # -- stage 3: eval per run ---------------------------------------
        for seed in seeds:
            for lr in lrs:
                for i in range(len(FREEZE_CONFIGS)):
                    name = f"vit_cifar10_seed_{seed}_lr_{lr}_comp_{i}"
                    run([sys.executable, "-m", "apps.vit.eval",
                         "config=apps/vit/configs/eval.yaml",
                         f"log_dir={name}", "dataset_name=cifar10",
                         f"data_dir={data_dir}",
                         f"batch_size={args.batch}", "num_workers=0"],
                        env, f"eval {name}")
                    ev = runs_dir / name / "metrics" / "eval.jsonl"
                    check(ev.exists(), f"{name}/metrics/eval.jsonl")
                    test_acc = json.loads(ev.read_text().strip())["test_acc"]
                    check(0.0 <= test_acc <= 1.0, f"{name} test_acc bounds")
        print("[parity_gate] stage 3 (eval) ok", flush=True)

        # -- stage 4: zero-shot linear probing ---------------------------
        probe_src = f"vit_cifar10_seed_0_lr_{lrs[0]}_comp_0"
        run([sys.executable, "-m", "apps.vit.linear_probing",
             f"log_dir={probe_src}", "finetuned=False",
             "dataset_name=cifar10", f"data_dir={data_dir}",
             f"batch_size={args.batch}", f"val_batch_size={args.batch}",
             f"test_batch_size={args.batch}", "num_workers=0",
             "probe_impl=sklearn"], env, "linear_probing")
        lp_json = (workdir / "savings" / "probes"
                   / "vit_cifar10_seed_0_pretrained" / "linear_probing.json")
        check(lp_json.exists(), "zero-shot LP artifact")
        lp = json.loads(lp_json.read_text())
        check("block1_ffn_res" in lp, "LP block1_ffn_res key (tiny=2 blocks)")
        print("[parity_gate] stage 4 (probe) ok", flush=True)

        # -- stage 5: csv + table (plots layer on the real run dirs) -----
        snippet = textwrap.dedent(f"""
            import json
            import numpy as np
            import pandas as pd
            import apps.plots.finetuning as F
            # reduced lr grid (the gate trains a subset of the published grid;
            # the artifact contract under test is run-dir consumption)
            F.LR_VALUES = dict(F.LR_VALUES, cifar10={lrs!r})
            seeds = {seeds!r}
            F.get_evals_csv("cifar10", seeds, {lrs!r})
            F.get_linear_probing_csv("cifar10")
            agg = F.table_results(["cifar10"], seeds, lp_block=1)
            out = {{k: {{d: {{c: float(v) for c, v in comps.items()}}
                       for d, comps in vals.items()}}
                   if isinstance(next(iter(vals.values())), dict)
                   else {{d: float(v) for d, v in vals.items()}}
                   for k, vals in agg.items()}}
            print("PARITY_GATE_AGG " + json.dumps(out))
        """)
        proc = subprocess.run([sys.executable, "-c", snippet], env=env,
                              cwd=REPO, capture_output=True, text=True,
                              timeout=STAGE_TIMEOUT)
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
            raise RuntimeError("stage csv+table failed")
        import pandas as pd  # noqa: PLC0415 — only the gate needs it here

        csv_path = workdir / "results" / "finetuning" / "cifar10.csv"
        check(csv_path.exists(), "results/finetuning/cifar10.csv")
        df = pd.read_csv(csv_path)
        want_rows = len(seeds) * len(lrs) * len(FREEZE_CONFIGS)
        check(len(df) == want_rows, f"csv rows {len(df)} != {want_rows}")
        check(set(df["trainable_components"]) == set(COMP_NAMES),
              "csv trainable_components coverage")
        check(df["test_acc"].between(0, 1).all(), "csv test_acc bounds")
        lp_csv = workdir / "results" / "linear_probing" / "cifar10.csv"
        check(lp_csv.exists(), "results/linear_probing/cifar10.csv")

        agg_line = [l for l in proc.stdout.splitlines()
                    if l.startswith("PARITY_GATE_AGG ")][-1]
        agg = json.loads(agg_line.split(" ", 1)[1])
        for comp, v in agg["avg_acc"].items():
            check(np.isfinite(v) and 0 <= v <= 1, f"table avg_acc[{comp}]")
        check(all(np.isfinite(v) for v in agg["avg_gain"].values()),
              "table avg_gain finite")
        print("[parity_gate] stage 5 (csv+table) ok", flush=True)
        print("[parity_gate] PASS — table avg_acc:",
              json.dumps(agg["avg_acc"]), flush=True)
    finally:
        if owns_tmp and not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
