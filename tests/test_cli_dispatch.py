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


def test_gpt2_serve_cli(monkeypatch, capsys, tmp_path):
    """apps.gpt2.serve: continuous-batching server CLI over a jsonl request
    file (zero-egress token-id mode, random weights, 2 slots < 3 requests
    forces slot recycling)."""
    import json
    import sys

    reqs = tmp_path / "requests.jsonl"
    reqs.write_text("\n".join(json.dumps(r) for r in [
        {"token_ids": [3, 1, 4, 1, 5], "max_new_tokens": 4},
        {"token_ids": [9, 2, 6], "max_new_tokens": 3},
        {"token_ids": [5, 3], "max_new_tokens": 5},
    ]))
    monkeypatch.setattr(sys, "argv", [
        "serve", "run", "--requests", str(reqs), "--n_slots", "2",
        "--max_len", "64", "--bucket", "8", "--temperature", "0.0",
        "--pretrained", "False", "--eos", "False",
        "--compute_dtype", "float32"])
    from apps.gpt2.serve import main

    main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    assert [r["id"] for r in lines] == [0, 1, 2]
    assert [len(r["tokens"]) for r in lines] == [4, 3, 5]

    # greedy parity with standalone generate() for request 0
    import jax
    import jax.numpy as jnp

    from vitef_tpu.models import build_model
    from vitef_tpu.models.generation import generate

    model = build_model(dict(implementation="gpt2", model_name="base",
                             pretrained=False, compute_dtype="float32"),
                        key=jax.random.key(0))
    ref = generate(model.params, model.config,
                   jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32), 4,
                   temperature=0.0)
    assert lines[0]["tokens"] == [int(t) for t in np.asarray(ref[0])]


def test_gpt2_serve_cli_quantized_with_prefix(monkeypatch, capsys, tmp_path):
    """--quantize int8 + --prefix: the served output equals a standalone
    generate() through the SAME quantized params on [prefix ++ prompt]."""
    import json
    import sys

    reqs = tmp_path / "requests.jsonl"
    reqs.write_text(json.dumps(
        {"token_ids": [9, 2, 6, 4], "max_new_tokens": 3}))
    monkeypatch.setattr(sys, "argv", [
        "serve", "run", "--requests", str(reqs), "--n_slots", "1",
        "--max_len", "32", "--bucket", "4", "--temperature", "0.0",
        "--pretrained", "False", "--eos", "False",
        "--compute_dtype", "float32", "--quantize", "int8",
        "--prefix", "3,1,4"])
    from apps.gpt2.serve import main

    main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    assert len(lines) == 1 and len(lines[0]["tokens"]) == 3

    import jax
    import jax.numpy as jnp

    from vitef_tpu.models import build_model
    from vitef_tpu.models.generation import generate

    model = build_model(dict(implementation="gpt2", model_name="base",
                             pretrained=False, compute_dtype="float32"),
                        key=jax.random.key(0))
    qparams = model.quantize_int8()
    ref = generate(qparams, model.config,
                   jnp.asarray([[3, 1, 4, 9, 2, 6, 4]], jnp.int32), 3,
                   temperature=0.0)
    assert lines[0]["tokens"] == [int(t) for t in np.asarray(ref[0])]


def test_llama_serve_cli(monkeypatch, capsys, tmp_path):
    """--implementation llama: the serve CLI drives the GQA family through
    the same DecodeServer (token-id mode — llama ships no offline tokenizer;
    eos stays disabled because 50256 is GPT-2's id, not llama's)."""
    import json
    import sys

    reqs = tmp_path / "requests.jsonl"
    reqs.write_text("\n".join(json.dumps(r) for r in [
        {"token_ids": [3, 1, 4, 1, 5], "max_new_tokens": 4},
        {"token_ids": [9, 2, 6], "max_new_tokens": 3},
    ]))
    monkeypatch.setattr(sys, "argv", [
        "serve", "run", "--requests", str(reqs), "--n_slots", "2",
        "--max_len", "32", "--bucket", "8", "--temperature", "0.0",
        "--pretrained", "False", "--implementation", "llama",
        "--model_name", "tiny", "--compute_dtype", "float32"])
    from apps.gpt2.serve import main

    main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    assert [r["id"] for r in lines] == [0, 1]
    assert [len(r["tokens"]) for r in lines] == [4, 3]

    # greedy parity with standalone generate() (seq_len capped to max_len
    # by the CLI — rope tables only need to cover the cache)
    import jax
    import jax.numpy as jnp

    from vitef_tpu.models import build_model
    from vitef_tpu.models.generation import generate

    model = build_model(dict(implementation="llama", model_name="tiny",
                             pretrained=False, compute_dtype="float32",
                             seq_len=32),
                        key=jax.random.key(0))
    ref = generate(model.params, model.config,
                   jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32), 4,
                   temperature=0.0)
    assert lines[0]["tokens"] == [int(t) for t in np.asarray(ref[0])]


def test_moe_serve_cli(monkeypatch, capsys, tmp_path):
    """--implementation moe: the serve CLI drives the sparse-expert family
    through the same DecodeServer (token-id mode; the CLI drops the
    pretrained flag — MoE ships no checkpoint map — and caps seq_len to
    max_len like llama)."""
    import json
    import sys

    reqs = tmp_path / "requests.jsonl"
    reqs.write_text("\n".join(json.dumps(r) for r in [
        {"token_ids": [3, 1, 4, 1, 5], "max_new_tokens": 4},
        {"token_ids": [9, 2, 6], "max_new_tokens": 3},
    ]))
    monkeypatch.setattr(sys, "argv", [
        "serve", "run", "--requests", str(reqs), "--n_slots", "2",
        "--max_len", "32", "--bucket", "8", "--temperature", "0.0",
        "--implementation", "moe", "--model_name", "tiny",
        "--compute_dtype", "float32"])
    from apps.gpt2.serve import main

    main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    assert [r["id"] for r in lines] == [0, 1]
    assert [len(r["tokens"]) for r in lines] == [4, 3]

    # greedy parity with standalone generate() on the identically-built model
    import jax
    import jax.numpy as jnp

    from vitef_tpu.models import build_model
    from vitef_tpu.models.generation import generate

    model = build_model(dict(implementation="moe", model_name="tiny",
                             compute_dtype="float32", seq_len=32),
                        key=jax.random.key(0))
    ref = generate(model.params, model.config,
                   jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32), 4,
                   temperature=0.0)
    assert lines[0]["tokens"] == [int(t) for t in np.asarray(ref[0])]


def test_gpt2_serve_cli_wave_matches_continuous(monkeypatch, capsys,
                                                tmp_path, caplog):
    """--mode wave (RTT-aware default's high-latency pick) serves greedy
    outputs token-for-token identical to --mode continuous; --mode auto
    measures the dispatch RTT and logs its decision."""
    import json
    import logging
    import sys

    reqs = tmp_path / "requests.jsonl"
    payload = "\n".join(json.dumps(r) for r in [
        {"token_ids": [3, 1, 4, 1, 5], "max_new_tokens": 4},
        {"token_ids": [9, 2, 6], "max_new_tokens": 3},
        {"token_ids": [5, 3], "max_new_tokens": 5},
    ])
    reqs.write_text(payload)
    from apps.gpt2.serve import main

    outs = {}
    for mode in ("wave", "continuous"):
        monkeypatch.setattr(sys, "argv", [
            "serve", "run", "--requests", str(reqs), "--n_slots", "2",
            "--max_len", "64", "--bucket", "8", "--temperature", "0.0",
            "--pretrained", "False", "--eos", "False",
            "--compute_dtype", "float32", "--mode", mode])
        main()
        outs[mode] = [json.loads(l) for l in
                      capsys.readouterr().out.splitlines()
                      if l.strip().startswith("{")]
    assert outs["wave"] == outs["continuous"]
    assert [len(r["tokens"]) for r in outs["wave"]] == [4, 3, 5]

    # auto mode: decision + measured RTT are logged
    monkeypatch.setattr(sys, "argv", [
        "serve", "run", "--requests", str(reqs), "--n_slots", "2",
        "--max_len", "64", "--bucket", "8", "--temperature", "0.0",
        "--pretrained", "False", "--eos", "False",
        "--compute_dtype", "float32"])
    with caplog.at_level(logging.INFO):
        main()
    capsys.readouterr()
    decision = [r.message for r in caplog.records
                if "serving mode:" in r.message]
    assert decision and "RTT" in decision[0], decision
