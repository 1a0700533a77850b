"""linear_probing and analysis app tests on tiny models + synthetic data."""

import json
import pickle

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Redirect save dirs; synthetic CIFAR-10 + tiny synthetic 'imagenet'."""
    import vitef_tpu.config as cfg
    import vitef_tpu.monitor.orchestrator as orch
    import apps.vit.analysis as ana
    import apps.vit.linear_probing as lp

    monkeypatch.setattr(cfg, "SAVING_DIR", tmp_path / "savings")
    monkeypatch.setattr(orch, "RUN_DIR", tmp_path / "savings" / "runs")
    monkeypatch.setattr(ana, "SAVE_DIR", tmp_path / "savings" / "analysis")
    monkeypatch.setattr(lp, "PROBE_DIR", tmp_path / "savings" / "probes")

    rng = np.random.default_rng(0)
    base = tmp_path / "cifar10" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    for fname, n in [(f"data_batch_{i}", 50) for i in range(1, 6)] + [("test_batch", 40)]:
        labels = rng.integers(0, 10, size=n)
        data = rng.integers(0, 64, size=(n, 3072), dtype=np.uint8)
        data[:, :1024] += (labels[:, None] * 19).astype(np.uint8)
        with open(base / fname, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)

    # synthetic imagenet val ImageFolder (2 classes x 20 images, 32x32)
    for ci in range(2):
        d = tmp_path / "imagenet" / "val" / f"class_{ci}"
        d.mkdir(parents=True)
        for i in range(20):
            arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"im_{i:03d}.png")
    return tmp_path


def _trained_run(env, log_dir="probe_run"):
    from apps.vit.train import TrainingConfig, train

    train(TrainingConfig(
        model_name="tiny", patch_size=16, image_dim=(3, 32, 32),
        components=[], pretrained=False, in21k=False,
        dataset_name="cifar10", data_dir=str(env / "cifar10"),
        batch_size=16, val_batch_size=16, num_workers=0,
        n_steps=2, eval_period=2, optimizer="sgd", lr=0.01,
        log_dir=log_dir, logging_period=1, seed=42, dp=8,
    ))
    return log_dir


def test_linear_probing_finetuned(env):
    from apps.vit.linear_probing import LinearProbingConfig, linear_probing

    log_dir = _trained_run(env)
    metrics = linear_probing(LinearProbingConfig(
        log_dir=log_dir, finetuned=True, cls_pooling=False,
        dataset_name="cifar10", data_dir=str(env / "cifar10"),
        batch_size=32, val_batch_size=32, test_batch_size=32,
        num_workers=0, seed=42,
    ))
    # 8 probe stages x 2 layers
    assert len(metrics) == 16
    stages = {k.split("_", 1)[1] for k in metrics}
    assert stages == {"attn_norm", "attn", "attn_res", "ffn_norm", "ffn_fc1",
                      "ffn_activation", "ffn_fc2", "ffn_res"}
    assert all(0.0 <= v <= 1.0 for v in metrics.values())
    out = env / "savings" / "probes" / log_dir
    assert (out / "config.json").exists()
    with open(out / "linear_probing.json") as f:
        assert json.load(f).keys() == metrics.keys()


def test_linear_probing_pretrained_naming(env):
    from apps.vit.linear_probing import LinearProbingConfig, linear_probing

    log_dir = _trained_run(env, "probe_run2")
    linear_probing(LinearProbingConfig(
        log_dir=log_dir, finetuned=False, cls_pooling=True,
        dataset_name="cifar10", data_dir=str(env / "cifar10"),
        batch_size=64, val_batch_size=64, test_batch_size=64,
        num_workers=0, seed=42,
    ))
    # pretrained + cls_pooling naming (reference linear_probing.py:295-302)
    out = env / "savings" / "probes" / "vit_cifar10_seed_42_pretrained_cls_pooling"
    assert (out / "linear_probing.json").exists()


def test_analysis_contract_and_accumulation(env):
    from apps.vit.analysis import AnalysisConfig, analysis

    dists = analysis(AnalysisConfig(
        model_name="tiny", pretrained=False, patch_size=16,
        image_dim=(3, 32, 32), dataset_name="cifar10",
        data_dir=str(env / "cifar10"), imagenet_dir=str(env / "imagenet"),
        batch_size=8, n_steps=3, seed=42, num_workers=0,
    ))
    # keys: embedding + 5 components x 2 blocks
    assert set(dists) == {"embedding"} | {
        f"block{i}_{c}" for i in range(2)
        for c in ("attn_norm", "attn", "ffn_norm", "ffn_fc1", "ffn_fc2")
    }
    # accumulated over 3 steps of batch 8
    assert all(v.shape == (24,) for v in dists.values())
    assert all(np.isfinite(v).all() and (v >= 0).all() for v in dists.values())

    # analysis builds with in21k=True (reference analysis.py:140) → -in21k name
    out = (env / "savings" / "analysis"
           / "analysis_vit-tiny-patch16-32-in21k_pretrained_False_cifar10")
    assert (out / "config.json").exists()
    with open(out / "distances.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == set(dists)


def test_distance_matches_reference():
    """Our jnp distance ≡ reference torch distance (analysis.py:40-81)."""
    import importlib

    import torch

    from conftest import load_reference_module

    ours = importlib.import_module("apps.vit.analysis")
    ref = load_reference_module("apps/vit/analysis.py", "ref_analysis")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 6, 5)).astype(np.float32)
    y = rng.normal(size=(4, 6, 5)).astype(np.float32)
    for reduction in ("none", "mean", "sum"):
        r = ref.distance(torch.from_numpy(x), torch.from_numpy(y), reduction)
        o = ours.distance(x, y, reduction)
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=1e-5, rtol=1e-5)
