"""CLI harness dispatch tests: the OmegaConf-style and fire-style entry points."""

import numpy as np

from vitef_tpu.utils.cli import from_cli, load_config_from_cli, make_cli


def test_make_cli_dispatch_and_flag_parsing():
    calls = {}

    def run(dataset_name="cifar10", n_steps=10, pretrained=True, lr=1e-3):
        calls.update(dataset_name=dataset_name, n_steps=n_steps,
                     pretrained=pretrained, lr=lr)
        return "done"

    out = make_cli({"run": run}, argv=[
        "run", "--dataset_name", "pet", "--n_steps", "5",
        "--pretrained", "False", "--lr=3e-2",
    ])
    assert out == "done"
    assert calls == {"dataset_name": "pet", "n_steps": 5,
                     "pretrained": False, "lr": 3e-2}


def test_make_cli_bool_flag_without_value():
    received = {}
    make_cli({"go": lambda save=False: received.update(save=save)},
             argv=["go", "--save"])
    assert received["save"] is True


def test_load_config_from_cli_merge_order(tmp_path):
    """defaults ← yaml ← dotted CLI overrides (reference train.py:374-384)."""
    from dataclasses import dataclass, field

    @dataclass
    class Cfg:
        lr: float = 1e-3
        n_steps: int = 100
        dataset_name: str = "cifar10"
        components: list = field(default_factory=list)

    yaml_file = tmp_path / "c.yaml"
    yaml_file.write_text("lr: 1e-2\nn_steps: 500\n")
    cfg = load_config_from_cli(Cfg, argv=[
        f"config={yaml_file}", "n_steps=42", 'components=["mha","emb"]',
    ])
    assert cfg.lr == 1e-2          # from yaml
    assert cfg.n_steps == 42       # CLI beats yaml
    assert cfg.dataset_name == "cifar10"  # default survives
    assert cfg.components == ["mha", "emb"]


def test_from_cli_nested_dots():
    out = from_cli(["a.b.c=1", "a.b.d=x", "top=true"])
    assert out == {"a": {"b": {"c": 1, "d": "x"}}, "top": True}


def test_plots_clis_have_expected_commands():
    """The fire-style plot entry points expose the reference's command sets."""
    import apps.plots.finetuning as ft
    import apps.plots.analysis as pa
    import apps.plots.ablation as ab
    import apps.plots.theory as th
    import apps.plots.loss_landscape as ll

    # reference CLIs: finetuning {csv,table,stat,plot} (finetuning.py:1593),
    # analysis {plot} (:334), ablation {csv,table,plot} (:714),
    # theory {radius,plot} (:339), loss_landscape {results,analysis,latex,frames,gif}
    for mod, fns in [
        (ft, ["get_csv_results", "get_table_results", "get_statistical_test",
              "plot_figures"]),
        (pa, ["plot_figures"]),
        (ab, ["get_csv_results", "get_table_results", "plot_figures"]),
        (th, ["print_radius", "plot_figures"]),
        (ll, ["get_results", "get_analysis", "get_latex_frames", "get_frames",
              "plot_gif"]),
    ]:
        for fn in fns:
            assert callable(getattr(mod, fn)), f"{mod.__name__}.{fn}"
        assert callable(mod.main)


def test_gpt2_sample_cli(monkeypatch, capsys):
    """apps.gpt2.sample: token-id mode end-to-end on a random-weight model
    (zero-egress path: no tokenizer, no pretrained weights needed)."""
    import sys

    monkeypatch.setattr(sys, "argv", [
        "sample", "run", "--token_ids", "[3, 1, 4, 1, 5]",
        "--max_new_tokens", "5", "--temperature", "0.0",
        "--pretrained", "False", "--eos", "False"])
    from apps.gpt2.sample import main

    main()
    out = capsys.readouterr().out
    assert "'new_ids':" in out and "'prompt_ids': [3, 1, 4, 1, 5]" in out


def test_gpt2_sample_cli_speculative(monkeypatch, capsys):
    import sys

    monkeypatch.setattr(sys, "argv", [
        "sample", "run", "--token_ids", "[7, 2]", "--max_new_tokens", "4",
        "--temperature", "0.0", "--pretrained", "False", "--eos", "False",
        "--draft_model_name", "base", "--gamma", "2"])
    from apps.gpt2.sample import main

    main()
    assert "'new_ids':" in capsys.readouterr().out


def test_gpt2_sample_cli_speculative_refuses_explicit_topk(monkeypatch):
    """An EXPLICIT --top_k (even equal to the plain-mode default of 40) must
    be refused in speculative mode — it samples with temperature only, and
    silently ignoring a passed flag is worse than erroring."""
    import sys

    import pytest

    monkeypatch.setattr(sys, "argv", [
        "sample", "run", "--token_ids", "[7, 2]", "--max_new_tokens", "4",
        "--temperature", "0.0", "--pretrained", "False", "--eos", "False",
        "--draft_model_name", "base", "--gamma", "2", "--top_k", "40"])
    from apps.gpt2.sample import main

    with pytest.raises(SystemExit, match="top_k"):
        main()
