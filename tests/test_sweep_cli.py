"""Sweep generator helpers + CLI surface."""

import os
import subprocess
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bin.sweep import set_nested, parse_value, expand_grid  # noqa: E402


def test_set_nested():
    cfg = {}
    set_nested(cfg, "a.b.c", 5)
    set_nested(cfg, "a.d", "x")
    assert cfg == {"a": {"b": {"c": 5}, "d": "x"}}


def test_parse_value_types():
    assert parse_value("5") == 5
    assert parse_value("1e-3") == 1e-3
    assert parse_value("True") is True
    assert parse_value("adam") == "adam"


def test_expand_grid():
    combos = expand_grid(["a=1,2", "b.c=x,y"])
    assert len(combos) == 4
    assert {"a": 1, "b.c": "x"} in combos
    assert {"a": 2, "b.c": "y"} in combos


def test_sweep_cli_end_to_end(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("epochs: 1\nmodel:\n  dropout: 0.0\n")
    out = tmp_path / "sweep"
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bin", "sweep.py"),
         "--base", str(base), "--grid", "model.dropout=0.1,0.3",
         "--out", str(out), "--sbatch"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    yamls = sorted(p for p in os.listdir(out) if p.endswith(".yaml"))
    shs = sorted(p for p in os.listdir(out) if p.endswith(".sh"))
    assert len(yamls) == 2 and len(shs) == 2
    cfg = yaml.safe_load(open(os.path.join(out, yamls[1])))
    assert cfg["model"]["dropout"] == 0.3
    sb = open(os.path.join(out, shs[0])).read()
    assert "--signal=TERM@120" in sb and "--cont" in sb
