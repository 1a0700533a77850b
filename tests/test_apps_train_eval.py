"""End-to-end smoke: train a tiny ViT on synthetic CIFAR-10, then eval it.

Exercises the full stack: config CLI merge → orchestrator run-dir → loaders
(on-device augment) → jitted train step on the mesh → freeze masks → best-model
checkpointing → eval reload (the reference's train.py/eval.py flow, SURVEY §7.2).
"""

import json
import pickle

import numpy as np
import pytest


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Redirect SAVING_DIR/RUN_DIR and create a synthetic CIFAR-10."""
    import vitef_tpu.config as cfg
    import vitef_tpu.monitor.orchestrator as orch

    monkeypatch.setattr(cfg, "SAVING_DIR", tmp_path / "savings")
    monkeypatch.setattr(orch, "RUN_DIR", tmp_path / "savings" / "runs")

    rng = np.random.default_rng(0)
    base = tmp_path / "cifar10" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    # class-separable synthetic data so a couple of steps show learning signal
    for fname, n in [(f"data_batch_{i}", 60) for i in range(1, 6)] + [("test_batch", 60)]:
        labels = rng.integers(0, 10, size=n)
        data = rng.integers(0, 64, size=(n, 3072), dtype=np.uint8)
        data[:, :1024] += (labels[:, None] * 19).astype(np.uint8)  # channel-0 cue
        with open(base / fname, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)
    return tmp_path


def _train_config(env, **overrides):
    from apps.vit.train import TrainingConfig

    args = dict(
        model_name="tiny",
        patch_size=16,
        image_dim=(3, 32, 32),
        components=["mha"],
        pretrained=False,
        in21k=False,
        dataset_name="cifar10",
        data_dir=str(env / "cifar10"),
        batch_size=16,
        val_batch_size=16,
        num_workers=0,
        n_steps=6,
        grad_clip=1.0,
        eval_period=3,
        optimizer="sgd",
        lr=0.01,
        momentum=0.9,
        scheduler="cosine",
        warmup=1,
        log_dir="smoke",
        logging_period=2,
        seed=42,
        utility_period=100,
        dp=8,
        tp=1,
    )
    args.update(overrides)
    return TrainingConfig(**args)


def test_train_eval_end_to_end(env):
    from apps.vit.eval import EvaluationConfig, eval as eval_app
    from apps.vit.train import train

    train(_train_config(env))

    run = env / "savings" / "runs" / "smoke"
    assert (run / "config.json").exists()
    with open(run / "config.json") as f:
        saved_cfg = json.load(f)
    assert saved_cfg["dataset_name"] == "cifar10"

    # metric stream contract: loss/step/lr/grad_norm/elapsed_steps/ts
    lines = (run / "metrics" / "raw_0.jsonl").read_text().strip().split("\n")
    recs = [json.loads(l) for l in lines]
    train_recs = [r for r in recs if "loss" in r]
    assert train_recs, "no train metrics logged"
    for key in ("loss", "step", "lr", "grad_norm", "elapsed_steps", "ts"):
        assert key in train_recs[0], f"missing {key}"
    eval_recs = [r for r in recs if "eval_acc" in r]
    assert len(eval_recs) == 2  # eval at steps 3 and 6

    # best-model checkpoint with params.json
    ckpts = sorted((run / "checkpoints").iterdir())
    assert len(ckpts) >= 1
    assert (ckpts[-1] / "params.json").exists()
    with open(ckpts[-1] / "params.json") as f:
        params_json = json.load(f)
    assert params_json["model_name"] == "tiny"

    # eval app reloads the checkpoint and writes eval.jsonl test_acc
    metrics = eval_app(EvaluationConfig(
        log_dir="smoke", batch_size=16, data_dir=str(env / "cifar10"),
        num_workers=0,
    ))
    assert 0.0 <= metrics["eval_acc"] <= 1.0
    eval_line = json.loads((run / "metrics" / "eval.jsonl").read_text().strip())
    assert "test_acc" in eval_line


def test_train_resume(env):
    """Auto-resume: a second train() run continues from the saved best step."""
    from apps.vit.train import train

    cfg = _train_config(env, log_dir="resume", n_steps=3, eval_period=3)
    train(cfg)
    run = env / "savings" / "runs" / "resume"
    ckpts = sorted(p.name for p in (run / "checkpoints").iterdir())
    assert ckpts == ["0000000003"]

    # second run with more steps resumes from step 3 (no overwrite)
    cfg2 = _train_config(env, log_dir="resume", n_steps=5, eval_period=5,
                         overwrite=False)
    train(cfg2)
    with open(run / "checkpoints" / sorted(
            p.name for p in (run / "checkpoints").iterdir())[-1] / "training.json") as f:
        training = json.load(f)
    assert training["step"] == 5


def test_train_bitwise_reproducible(env):
    """Two identical runs (same seeds) produce bit-identical metric streams
    and final checkpoints — the offline accuracy-parity dry run (VERDICT.md #9;
    full-scale recipe in PARITY.md 'Accuracy-parity recipe')."""
    import json as _json

    from apps.vit.train import train

    def metrics_of(name):
        cfg = _train_config(env, log_dir=name, n_steps=20, eval_period=10,
                            logging_period=1)
        train(cfg)
        run = env / "savings" / "runs" / name
        recs = [_json.loads(l) for l in
                (run / "metrics" / "raw_0.jsonl").read_text().strip().split("\n")]
        ckpt = sorted((run / "checkpoints").iterdir())[-1] / "model.npz"
        with np.load(ckpt) as z:
            leaves = {k: z[k].copy() for k in z.files}
        return recs, leaves

    recs_a, model_a = metrics_of("repro_a")
    recs_b, model_b = metrics_of("repro_b")

    assert len(recs_a) == len(recs_b)
    for ra, rb in zip(recs_a, recs_b):
        for key in ("loss", "lr", "grad_norm", "step", "eval_acc", "eval_loss"):
            if key in ra or key in rb:
                assert ra.get(key) == rb.get(key), (key, ra, rb)
    assert set(model_a) == set(model_b)
    for k in model_a:
        np.testing.assert_array_equal(model_a[k], model_b[k], err_msg=k)


def test_auto_grad_acc_selection():
    """Auto microbatch split (PERF.md 'Batch-512 inversion'): smallest divisor
    bringing per-device rows under the cap; 1 when under, prime, or disabled."""
    from apps.vit.train import _auto_grad_acc

    assert _auto_grad_acc(512, 256) == 2
    assert _auto_grad_acc(256, 256) == 1
    assert _auto_grad_acc(384, 256) == 2
    assert _auto_grad_acc(1024, 256) == 4
    assert _auto_grad_acc(500, 256) == 2
    assert _auto_grad_acc(509, 256) == 1   # prime: not evenly splittable
    assert _auto_grad_acc(512, 0) == 1     # disabled


def test_auto_microbatch_split_matches_plain(env):
    """Training with the auto split engaged (cap=1 -> 2 microbatches/step)
    matches the plain full-batch run: same data order, same number of
    optimizer steps, near-identical weights (reduction-order fp noise only)."""
    from apps.vit.train import train

    def leaves_of(name, **overrides):
        cfg = _train_config(env, log_dir=name, n_steps=8, eval_period=8,
                            **overrides)
        train(cfg)
        run = env / "savings" / "runs" / name
        ckpt = sorted((run / "checkpoints").iterdir())[-1] / "model.npz"
        with np.load(ckpt) as z:
            return {k: z[k].copy() for k in z.files}

    plain = leaves_of("mb_plain", auto_microbatch=0)
    split = leaves_of("mb_split", auto_microbatch=1)  # per_dev=2 -> acc x2
    assert set(plain) == set(split)
    for k in plain:
        np.testing.assert_allclose(split[k], plain[k], atol=1e-5, rtol=1e-5,
                                   err_msg=k)


def test_run_evaluation_partial_final_batch(env):
    """drop_last=False remainder batch: accuracy is the mean of BATCH means
    with the partial batch weighted like a full one — the reference's
    mean-of-batch-means semantics (eval.py:79-87), exercised end-to-end."""
    import jax
    import jax.numpy as jnp

    from apps.vit.eval import run_evaluation
    from vitef_tpu.data.images.datasets import SyntheticDataset, SyntheticDatasetConfig
    from vitef_tpu.data.images.loader import Loader
    from vitef_tpu.models import build_model

    model = build_model(
        {"implementation": "vit", "model_name": "tiny", "patch_size": 16,
         "image_dim": (3, 32, 32), "pretrained": False, "finetuning": True,
         "n_classes": 10, "attn_impl": "xla", "norm_impl": "xla"},
        key=jax.random.key(0),
    )
    ds = SyntheticDataset(SyntheticDatasetConfig(mode="test", n_samples=10))
    loader = Loader(ds, batch_size=4, size=32, mode="test", shuffle=False,
                    drop_last=False, num_workers=0, prefetch=0)
    metrics = run_evaluation(model, model.params, loader)

    # expected: mean over the 3 batch means (4, 4, and 2 samples)
    batch_accs = []
    for xb, yb in loader:
        logits = model.apply(model.params, xb)
        batch_accs.append(float(jnp.mean(
            (jnp.argmax(logits, -1) == yb).astype(jnp.float32))))
    assert len(batch_accs) == 3
    expected = sum(batch_accs) / 3
    assert abs(metrics["eval_acc"] - expected) < 1e-6


def test_block_grad_norm_logging(env):
    """log_block_grad_norms=True emits per-block grad-norm metrics computed
    inside the jitted step (BASELINE.json north-star capability)."""
    import json as _json

    from apps.vit.train import train

    cfg = _train_config(env, log_dir="blocknorms", n_steps=2, eval_period=2,
                        logging_period=1, log_block_grad_norms=True)
    train(cfg)
    run = env / "savings" / "runs" / "blocknorms"
    recs = [_json.loads(l) for l in
            (run / "metrics" / "raw_0.jsonl").read_text().strip().split("\n")]
    train_recs = [r for r in recs if "loss" in r]
    assert train_recs
    # tiny ViT preset has a known layer count; at least block 0 is present
    assert "grad_norm_block_0" in train_recs[0]
    assert train_recs[0]["grad_norm_block_0"] > 0


def test_preemption_guard_real_signal():
    """SIGTERM sets the flag (handler installed/restored), KeyboardInterrupt
    semantics untouched."""
    import os
    import signal
    import threading
    import time

    from vitef_tpu.monitor.preemption import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        threading.Timer(0.05, os.kill, (os.getpid(), signal.SIGTERM)).start()
        deadline = time.time() + 5
        while not guard.requested and time.time() < deadline:
            time.sleep(0.01)
        assert guard.requested
    assert signal.getsignal(signal.SIGTERM) is before


def test_train_preemption_checkpoint_and_resume(env):
    """Preempted training saves the CURRENT step (no best-step rewind) and a
    relaunch auto-resumes from it to completion (SURVEY §5.3 gap closed)."""
    from _pytest.monkeypatch import MonkeyPatch

    import vitef_tpu.monitor.preemption as pre
    from apps.vit.train import train

    class FakeGuard(pre.PreemptionGuard):
        polls = 0

        @property
        def requested(self):
            FakeGuard.polls += 1
            return FakeGuard.polls > 3  # preempt right after step 3

    # local patcher: the shared `monkeypatch` fixture also carries env's
    # SAVING_DIR redirection — undo() on it would unredirect the run dir
    mp = MonkeyPatch()
    mp.setattr(pre, "PreemptionGuard", FakeGuard)
    cfg = _train_config(env, log_dir="preempt", n_steps=30, eval_period=2)
    try:
        train(cfg)
    finally:
        mp.undo()

    run = env / "savings" / "runs" / "preempt"
    ckpts = sorted(p.name for p in (run / "checkpoints").iterdir())
    last = int(ckpts[-1])
    assert 0 < last < 30  # saved mid-run, not rewound to a best-eval step
    with open(run / "checkpoints" / ckpts[-1] / "training.json") as f:
        assert json.load(f)["step"] == last

    # relaunch (real guard, no signal) resumes from `last` and completes
    cfg2 = _train_config(env, log_dir="preempt", n_steps=6, eval_period=6,
                         overwrite=False)
    train(cfg2)
    final = sorted(p.name for p in (run / "checkpoints").iterdir())[-1]
    with open(run / "checkpoints" / final / "training.json") as f:
        assert json.load(f)["step"] == 6
