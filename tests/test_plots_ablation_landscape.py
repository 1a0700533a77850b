"""Ablation-plots and loss-landscape tests (tiny model, synthetic artifacts)."""

import json

import numpy as np
import pytest


@pytest.fixture()
def ab_env(tmp_path, monkeypatch):
    import vitef_tpu.config as cfg
    import apps.plots.common as common
    import apps.plots.ablation as ab

    saving = tmp_path / "savings"
    monkeypatch.setattr(cfg, "SAVING_DIR", saving)
    monkeypatch.setattr(common, "RUNS_DIR", saving / "runs")
    monkeypatch.setattr(ab, "RUNS_DIR", saving / "runs")

    def results_dir(folder):
        p = tmp_path / "results" / folder
        p.mkdir(parents=True, exist_ok=True)
        return p

    monkeypatch.setattr(common, "results_dir", results_dir)
    monkeypatch.setattr(ab, "results_dir", results_dir)

    from apps.plots.ablation import ADAM_LR_VALUES

    rng = np.random.default_rng(0)
    ds = "cifar100"
    comps_by_idx = ["all", "emb", "attn_norm", "mha", "ffn_norm", "ffn_fc1", "ffn_fc2"]
    for lr in ADAM_LR_VALUES[ds]:
        for comp in [0, 2, 3, 4, 5, 6]:
            run = saving / "runs" / f"vit_{ds}_adamw_seed_0_lr_{lr}_comp_{comp}"
            (run / "metrics").mkdir(parents=True)
            (run / "checkpoints" / "0000000050").mkdir(parents=True)
            frozen = ([] if comp == 0
                      else [c for c in comps_by_idx[1:] if c != comps_by_idx[comp]])
            with open(run / "config.json", "w") as f:
                json.dump({"components": frozen, "n_steps": 50}, f)
            with open(run / "metrics" / "info_model.jsonl", "w") as f:
                f.write(json.dumps({"model_params": 86_000_000}) + "\n")
            with open(run / "metrics" / "eval.jsonl", "w") as f:
                f.write(json.dumps({"test_acc": 0.8 + rng.normal(0, 0.01)}) + "\n")
            with open(run / "metrics" / "raw_0.jsonl", "w") as f:
                f.write(json.dumps({"loss": 0.5, "step": 10, "grad_norm": 1.0,
                                    "ts": 0.1}) + "\n")
                f.write(json.dumps({"eval_acc": 0.79, "eval_loss": 0.3,
                                    "step": 10, "ts": 0.1}) + "\n")
    return tmp_path


def test_adam_lr_rescale():
    from apps.plots.ablation import ADAM_LR_VALUES

    # SGD lr / 100 (reference ablation.py:59, adam.sh:48)
    assert ADAM_LR_VALUES["cifar10"] == ["1.00e-05", "3.00e-05", "1.00e-04", "3.00e-04"]


def test_ablation_csv_and_table(ab_env, capsys):
    import apps.plots.ablation as ab

    ab.get_evals_csv("cifar100", [0], ab.ADAM_LR_VALUES["cifar100"])
    csv = ab_env / "results" / "ablation" / "finetuning" / "cifar100.csv"
    assert csv.exists()
    import pandas as pd

    df = pd.read_csv(csv)
    assert len(df) == 4 * 6  # 4 lrs x 6 configs (no emb)
    assert "emb" not in set(df["trainable_components"])

    out = ab.table_results(["cifar100"], [0])
    assert set(out["acc_mean"]["cifar100"]) == {
        "all", "attn_norm", "mha", "ffn_norm", "ffn_fc1", "ffn_fc2"}


def test_loss_landscape_tiny(tmp_path, monkeypatch):
    """End-to-end surfaces on a tiny ViT with a synthetic batch."""
    import jax
    import jax.numpy as jnp

    import apps.plots.loss_landscape as ll
    from vitef_tpu.models import build_model

    monkeypatch.setattr(ll, "SAVE_DIR", tmp_path / "landscape")
    monkeypatch.setattr(ll, "FIGURE_DIR", tmp_path / "figures")

    model = build_model(
        {"implementation": "vit", "model_name": "tiny", "patch_size": 16,
         "image_dim": (3, 32, 32), "pretrained": False, "finetuning": True,
         "n_classes": 10, "attn_impl": "xla", "norm_impl": "xla"},
        key=jax.random.key(0),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 3, 32, 32)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))

    for comp in ("mha", "fc1", "ln1", "fc2"):
        Z_loss, Z_func, u, v, traj = ll.get_rates_of_change(
            dataset_name="cifar10", batch_size=8, trainable_component=comp,
            block=0, n_steps=4, lr=0.05, resolution=5, grid_range=0.5,
            model=model, batch=(x, y),
        )
        assert Z_loss.shape == (5, 5) and Z_func.shape == (5, 5)
        assert np.isfinite(Z_loss).all() and np.isfinite(Z_func).all()
        assert (Z_func > 0).all()
        assert len(traj) == 4

    # analysis + rendering path
    ll.get_analysis(trainable_component="mha", block=0, n_steps=3, lr=0.05,
                    resolution=5, grid_range=0.5, model=model, batch=(x, y))
    out = tmp_path / "landscape" / "mha_block_0"
    assert (out / "loss.pkl").exists() and (out / "traj.pkl").exists()
    ll.get_results("mha", 0, save=True)
    assert (tmp_path / "figures" / "loss_landscape" / "mha_block_0.pdf").exists()
    paths = ll.get_frames("mha", 0, n_frames=2)
    assert all(p.exists() for p in paths)


def test_adamw_sgd_robustness_figure(ab_env, monkeypatch):
    """AdamW-vs-SGD 3-panel figure renders under the reference figname
    (reference ablation.py:395-674)."""
    import apps.plots.ablation as ab

    figures = {}

    def save_plot(figname, subdir=None, format="pdf", dpi=100):
        import matplotlib.pyplot as plt

        p = ab_env / "figures" / (subdir or "")
        p.mkdir(parents=True, exist_ok=True)
        out = p / f"{figname}.{format}"
        plt.savefig(out, format=format)
        figures[figname] = out
        return out

    monkeypatch.setattr(ab, "save_plot", save_plot)
    ab.get_evals_csv("cifar100", [0], ab.ADAM_LR_VALUES["cifar100"])
    # synthesize the SGD-side csv the boxplot compares against
    import pandas as pd

    from apps.plots.common import LR_VALUES

    rows = [{"seed": 0, "lr": float(lr), "trainable_components": comp,
             "test_acc": 0.8}
            for lr in LR_VALUES["cifar100"]
            for comp in ["all", "attn_norm", "mha", "ffn_norm", "ffn_fc1",
                         "ffn_fc2"]]
    out = ab_env / "results" / "finetuning"
    out.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out / "cifar100.csv")

    ab.get_adamw_robustness_training_domainnet_sketch(
        save=True, seed=0, dataset_name="cifar100")
    assert "adamw_sgd_robustness_cifar100" in figures


def test_loss_landscape_paper_figure(tmp_path, monkeypatch):
    """Combined LN1-vs-MHA loss_landscape.pdf renders from pickled surfaces
    (reference loss_landscape.py:290-490)."""
    import pickle

    import apps.plots.loss_landscape as ll

    save_dir = tmp_path / "landscape"
    monkeypatch.setattr(ll, "SAVE_DIR", save_dir)
    monkeypatch.setattr(ll, "FIGURE_DIR", tmp_path / "figures")
    rng = np.random.default_rng(0)
    for comp in ("ln1", "mha"):
        d = save_dir / f"{comp}_block_0"
        d.mkdir(parents=True)
        res = 8
        for name, obj in [("loss", rng.uniform(0, 1, (res, res))),
                          ("func", rng.uniform(0, 2, (res, res))),
                          ("u_coords", np.linspace(-1, 1, res)),
                          ("v_coords", np.linspace(-1, 1, res)),
                          ("traj", [(0.0, 0.0), (0.1, 0.05)])]:
            with open(d / f"{name}.pkl", "wb") as f:
                pickle.dump(obj, f)

    ll.plot_figures(save=True)
    assert (tmp_path / "figures" / "loss_landscape" / "loss_landscape.pdf").exists()
