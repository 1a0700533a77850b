"""Plots layer tests: aggregation from synthetic run dirs, tables, stats,
figures, theory bounds parity with a torch-computed oracle."""

import json
import pickle

import numpy as np
import pytest


@pytest.fixture()
def plot_env(tmp_path, monkeypatch):
    """Redirect all artifact dirs and synthesize run/probe/analysis artifacts
    for 2 datasets x 3 seeds x lr-sweep x 7 freeze configs."""
    import vitef_tpu.config as cfg
    import apps.plots.common as common
    import apps.plots.finetuning as ft
    import apps.plots.analysis as pa

    saving = tmp_path / "savings"
    monkeypatch.setattr(cfg, "SAVING_DIR", saving)
    monkeypatch.setattr(cfg, "RESULT_DIR", tmp_path / "results")
    monkeypatch.setattr(cfg, "FIGURE_DIR", tmp_path / "figures")
    for mod in (common, ft):
        monkeypatch.setattr(mod, "RUNS_DIR", saving / "runs", raising=False)
        monkeypatch.setattr(mod, "PROBES_DIR", saving / "probes", raising=False)
        monkeypatch.setattr(mod, "ANALYSIS_DIR", saving / "analysis", raising=False)
    monkeypatch.setattr(common, "RESULT_DIR", tmp_path / "results", raising=False)
    monkeypatch.setattr(common, "FIGURE_DIR", tmp_path / "figures", raising=False)
    monkeypatch.setattr(pa, "SAVE_DIR", saving / "analysis")

    # patch results_dir/save_plot to the tmp dirs
    def results_dir(folder):
        p = tmp_path / "results" / folder
        p.mkdir(parents=True, exist_ok=True)
        return p

    def save_plot(figname, subdir, format="pdf", dpi=100):
        import matplotlib.pyplot as plt

        p = tmp_path / "figures" / subdir
        p.mkdir(parents=True, exist_ok=True)
        out = p / f"{figname}.{format}"
        plt.savefig(out, format=format)
        return out

    monkeypatch.setattr(common, "results_dir", results_dir)
    monkeypatch.setattr(common, "save_plot", save_plot)
    monkeypatch.setattr(ft, "results_dir", results_dir)
    monkeypatch.setattr(ft, "save_plot", save_plot)
    monkeypatch.setattr(pa, "save_plot", save_plot)

    rng = np.random.default_rng(0)
    datasets = ["cifar10", "cifar100"]
    seeds = [0, 42, 3407]
    comps_by_idx = ["all", "emb", "attn_norm", "mha", "ffn_norm", "ffn_fc1", "ffn_fc2"]

    from apps.plots.finetuning import LR_VALUES

    for ds in datasets:
        for seed in seeds:
            for lr in LR_VALUES[ds]:
                for comp in range(7):
                    run = saving / "runs" / f"vit_{ds}_seed_{seed}_lr_{lr}_comp_{comp}"
                    (run / "metrics").mkdir(parents=True)
                    (run / "checkpoints" / "0000000100").mkdir(parents=True)
                    frozen = ([] if comp == 0
                              else [c for c in comps_by_idx[1:] if c != comps_by_idx[comp]])
                    with open(run / "config.json", "w") as f:
                        json.dump({"components": frozen, "n_steps": 100,
                                   "dataset_name": ds}, f)
                    with open(run / "metrics" / "info_model.jsonl", "w") as f:
                        f.write(json.dumps({"model_params": 86_000_000}) + "\n")
                    # mha runs score best (comp idx 3 trains mha only when
                    # others frozen... here trainable = comps_by_idx[comp])
                    base_acc = 0.90 + 0.02 * (comps_by_idx[comp] == "mha") \
                        + 0.01 * (comps_by_idx[comp] == "all")
                    acc = base_acc + rng.normal(0, 0.002)
                    with open(run / "metrics" / "eval.jsonl", "w") as f:
                        f.write(json.dumps({"test_acc": acc, "ts": 1.0}) + "\n")
                    with open(run / "metrics" / "raw_0.jsonl", "w") as f:
                        for step in range(10, 101, 10):
                            f.write(json.dumps({
                                "loss": 1.0 / step, "step": step, "lr": float(lr),
                                "grad_norm": 0.5, "elapsed_steps": 10, "ts": 0.1,
                            }) + "\n")
                            f.write(json.dumps({
                                "eval_acc": acc - 0.01, "eval_loss": 0.2,
                                "step": step, "ts": 0.1}) + "\n")

        # pretrained probes (block 0..11 x 8 stages)
        probe = saving / "probes" / f"vit_{ds}_seed_0_pretrained"
        probe.mkdir(parents=True)
        stages = ["attn_norm", "attn", "attn_res", "ffn_norm", "ffn_fc1",
                  "ffn_activation", "ffn_fc2", "ffn_res"]
        lp = {f"block{b}_{s}": 0.80 + 0.001 * b for b in range(12) for s in stages}
        with open(probe / "linear_probing.json", "w") as f:
            json.dump(lp, f)

        # analysis distances for base + huge
        for model, nl in [("base", 12), ("huge", 32)]:
            patch = 14 if model == "huge" else 16
            adir = (saving / "analysis"
                    / f"analysis_vit-{model}-patch{patch}-224-in21k_pretrained_True_{ds}")
            adir.mkdir(parents=True)
            dists = {"embedding": rng.uniform(1, 2, size=100)}
            for b in range(nl):
                for c, scale in [("attn_norm", 1.0), ("attn", 8.0),
                                 ("ffn_norm", 2.0), ("ffn_fc1", 6.0), ("ffn_fc2", 4.0)]:
                    dists[f"block{b}_{c}"] = rng.uniform(1, 2, size=100) * scale
            with open(adir / "distances.pkl", "wb") as f:
                pickle.dump(dists, f)

    return tmp_path


def test_csv_table_and_best(plot_env, capsys):
    import apps.plots.finetuning as ft

    for ds in ["cifar10", "cifar100"]:
        ft.get_evals_csv(ds, [0, 42, 3407], ft.LR_VALUES[ds])
        ft.get_linear_probing_csv(ds)
        csv = plot_env / "results" / "finetuning" / f"{ds}.csv"
        assert csv.exists()
        import pandas as pd

        df = pd.read_csv(csv)
        assert len(df) == 3 * 4 * 7
        assert set(df["trainable_components"]) == {
            "all", "emb", "attn_norm", "mha", "ffn_norm", "ffn_fc1", "ffn_fc2"}

    out = ft.table_results(["cifar10", "cifar100"], [0, 42, 3407])
    # mha was constructed to be best single component
    assert out["avg_acc"]["mha"] > out["avg_acc"]["ffn_fc1"]
    assert out["avg_gain"]["mha"] > 0


def test_stat_results_published_table(capsys):
    import apps.plots.finetuning as ft

    out = ft.stat_results(ft.PUBLISHED_RESULTS)
    assert set(out) == {"MHA_vs_FC1", "MHA_vs_FC2", "MHA_vs_LN2", "MHA_vs_LN1"}
    # MHA beats LN1 significantly in the published table
    assert out["MHA_vs_LN1"]["mean_diff"] > 0
    assert out["MHA_vs_LN1"]["w_p"] < 0.05


def test_sensitivity_and_runs(plot_env):
    import apps.plots.finetuning as ft

    cfgname = ft.get_config_sensitivity("cifar10", "base", pretrained=True)
    assert cfgname == "analysis_vit-base-patch16-224-in21k_pretrained_True_cifar10"
    sens = ft.get_sensitivity(ft.ANALYSIS_DIR / cfgname)
    assert set(sens) == {"attn_norm", "attn", "ffn_norm", "ffn_fc1", "ffn_fc2"}
    assert len(sens["attn"]) == 12  # per-block
    # attn constructed with largest ratios
    assert np.mean(sens["attn"]) > np.mean(sens["attn_norm"])

    runs = ft.get_runs("cifar10", [0], ["1e-3"])
    r = runs["1e-3"]["mha"][0]
    assert len(r["train_steps"]) == 10 and len(r["val_steps"]) == 10


def test_figures_render(plot_env):
    import apps.plots.finetuning as ft
    import apps.plots.analysis as pa

    datasets = ["cifar10", "cifar100"]
    seeds = [0, 42, 3407]
    for ds in datasets:
        ft.get_evals_csv(ds, seeds, ft.LR_VALUES[ds])
        ft.get_linear_probing_csv(ds)
    ft.get_intro(datasets, seeds, save=True)
    ft.get_best_performance(datasets, seeds, save=True)
    ft.get_robustness_all(datasets, seeds, save=True)
    ft.get_training_evolution("cifar10", 0, save=True)
    figs = plot_env / "figures" / "finetuning"
    for name in ("intro", "finetuning_all", "robustness_all",
                 "training_evolution_cifar10_seed_0"):
        assert (figs / f"{name}.pdf").exists(), name

    pa.get_all_plasticity("cifar10", pretrained=True, save=True)
    assert (plot_env / "figures" / "analysis" / "plasticity_cifar10.pdf").exists()


def test_theory_bounds_match_torch_oracle():
    """Our JAX SVD bounds ≡ the same math done in torch on the same weights."""
    import jax
    import torch

    from apps.plots import theory
    from vitef_tpu.models import build_model

    model = build_model(
        {"implementation": "vit", "model_name": "tiny", "patch_size": 16,
         "image_dim": (3, 32, 32), "pretrained": False},
        key=jax.random.key(0),
    )
    # monkey-free: call the internals with an explicit model
    ln1, ln2 = theory.norm_ub("tiny", 16, model=model)
    fc1, fc2 = theory.linear_ub("tiny", 16, model=model)

    for b, block in enumerate(model.params["blocks"]):
        w1 = torch.tensor(np.asarray(block["ffn"]["fc1"]["weight"]))
        assert np.allclose(fc1[b], torch.linalg.svdvals(w1).max().item(), atol=1e-4)
        assert np.allclose(ln1[b], float(np.max(block["attn_norm"]["weight"])))

    # attention bound vs torch recomputation with the reference's slicing
    theory.N_HEADS["tiny"] = 2
    theory.EMB_DIM["tiny"] = 32
    r = 2.0
    seq_len = theory.SEQ_LEN[16]
    mha = theory.attention_ub("tiny", 16, r=r, model=model)
    import math

    for b, block in enumerate(model.params["blocks"]):
        w_qkv = torch.tensor(np.asarray(block["attn"]["qkv_mat"]["weight"]))  # (E,3E)
        w_out = torch.tensor(np.asarray(block["attn"]["output"]["weight"]))  # (E,E)
        A_qkv = w_qkv.T  # torch layout (3E, E)
        A_out = w_out.T
        q, k, v = A_qkv.chunk(3, dim=0)
        d = 16
        comp = 0.0
        for i in range(2):
            sl = slice(i * d, (i + 1) * d)
            o_h = torch.linalg.svdvals(A_out[:, sl]).max().item()
            v_h = torch.linalg.svdvals(v[:, sl]).max().item()
            qk_h = q[:, sl] @ k[:, sl].T / math.sqrt(d)
            s_qk = torch.linalg.svdvals(qk_h).max().item()
            comp += o_h * v_h * math.sqrt(
                3 * seq_len + (12 * seq_len + 3) * r**4 * s_qk**2)
        assert np.allclose(mha[b], comp, rtol=1e-4), f"block {b}"


def test_robustness_training_figure(plot_env):
    """The paper's 3-panel highlight figure renders and saves under its
    reference figname (reference finetuning.py:1224-1452)."""
    import apps.plots.finetuning as ft

    ft.get_evals_csv("cifar10", [0, 42, 3407], ft.LR_VALUES["cifar10"])
    ft.get_robustness_training_domainnet_sketch(
        save=True, seed=42, lr="1e-2", dataset_name="cifar10")
    assert (plot_env / "figures" / "finetuning"
            / "robustness_training_cifar10.pdf").exists()
