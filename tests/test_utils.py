"""Utils tests: typed config builder, CLI merge, jsonl IO, deterministic split."""

import dataclasses
import json
from dataclasses import dataclass
from typing import Literal, Optional

import numpy as np
import pytest

from vitef_tpu.utils.cli import from_cli, load_config_from_cli, make_cli
from vitef_tpu.utils.jsonl import get_jsonl_keys, load_jsonl_to_numpy, write_jsonl
from vitef_tpu.utils.tree import deterministic_split, update_dict
from vitef_tpu.utils.typed import build_with_type_check


@dataclass
class Inner:
    lr: float = 0.1
    name: Literal["sgd", "adamw"] = "sgd"


@dataclass
class Outer:
    steps: int = 100
    inner: Inner = dataclasses.field(default_factory=Inner)
    tags: list = dataclasses.field(default_factory=list)
    maybe: Optional[int] = None


class TestTypedBuilder:
    def test_nested(self):
        cfg = build_with_type_check(Outer, {"steps": "50", "inner": {"lr": 1, "name": "adamw"}})
        assert cfg.steps == 50 and cfg.inner.lr == 1.0 and cfg.inner.name == "adamw"

    def test_literal_violation(self):
        with pytest.raises((TypeError, ValueError)):
            build_with_type_check(Outer, {"inner": {"name": "rmsprop"}}, strict=True)

    def test_unknown_field_warns(self, caplog):
        build_with_type_check(Outer, {"bogus": 1})
        assert any("unknown field" in r.message for r in caplog.records)

    def test_optional(self):
        assert build_with_type_check(Outer, {"maybe": None}).maybe is None
        assert build_with_type_check(Outer, {"maybe": 3}).maybe == 3


class TestCli:
    def test_dotted_overrides(self):
        d = from_cli(["a.b=1", "a.c=true", "d=[1,2]", "e=hello"])
        assert d == {"a": {"b": 1, "c": True}, "d": [1, 2], "e": "hello"}

    def test_yaml_merge(self, tmp_path):
        yml = tmp_path / "c.yaml"
        yml.write_text("steps: 7\ninner:\n  lr: 0.5\n")
        cfg = load_config_from_cli(Outer, [f"config={yml}", "inner.name=adamw"])
        assert cfg.steps == 7 and cfg.inner.lr == 0.5 and cfg.inner.name == "adamw"

    def test_make_cli(self):
        result = make_cli({"run": lambda x=0, flag=False: (x, flag)},
                          ["run", "--x", "3", "--flag"])
        assert result == (3, True)


class TestJsonl:
    def test_roundtrip_missing_values(self, tmp_path):
        path = tmp_path / "m.jsonl"
        write_jsonl(path, [{"a": 1, "b": 2.0}, {"a": 3}])
        assert get_jsonl_keys(path) == ["a", "b"]
        arrs = load_jsonl_to_numpy(path)
        np.testing.assert_array_equal(arrs["a"], [1, 3])
        assert np.isnan(arrs["b"][1])


class TestDeterministicSplit:
    def test_bit_exact_with_reference_semantics(self):
        # Reference (src/vitef/utils.py:221-230): save state, seed 42, permute.
        st0 = np.random.get_state()
        np.random.seed(42)
        ref_perm = np.random.permutation(range(100))
        np.random.set_state(st0)
        train, test = deterministic_split(100, 0.8)
        np.testing.assert_array_equal(np.concatenate([train, test]), ref_perm)
        assert len(train) == 80 and len(test) == 20

    def test_preserves_global_rng(self):
        np.random.seed(7)
        expected = np.random.rand()
        np.random.seed(7)
        deterministic_split(10)
        assert np.random.rand() == expected


class TestUpdateDict:
    def test_accumulate(self):
        acc = {}
        update_dict(acc, {"x": np.ones((2, 3))})
        update_dict(acc, {"x": np.zeros((1, 3)), "y": np.ones(2)})
        assert acc["x"].shape == (3, 3) and acc["y"].shape == (2,)


def test_cli_preserves_leading_zero_checkpoint_steps():
    """yaml 1.1 would read 0000001000 as octal 512 — must stay a string."""
    from vitef_tpu.utils.cli import from_cli

    out = from_cli(["checkpoint_step=0000001000", "n=12", "f=1.5"])
    assert out["checkpoint_step"] == "0000001000"
    assert out["n"] == 12 and out["f"] == 1.5
    # yaml 1.1 keeps '1e-3' a string (no dot); the typed builder coerces it
    assert out["n"] != "12"


def test_typed_int_to_str_coercion():
    from dataclasses import dataclass

    from vitef_tpu.utils.typed import build_with_type_check

    @dataclass
    class C:
        step: str | None = None

    assert build_with_type_check(C, {"step": 512}).step == "512"
