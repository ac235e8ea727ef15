"""YAML config loading with the reference's conventions.

Same public surface as the reference entry points: ``load_config(path,
tag=...)`` reads a YAML tree and sets ``cfg["name"] = <basename>_<tag>``
(cf. ``bin/train_dr_spaam.py:27-29``). Config keys deliberately match the
reference YAMLs (``config/*.yaml``, SURVEY §2.12) so existing configs carry
over.
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str, tag: str = "") -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    base = os.path.basename(path)
    base = base[: base.rfind(".")] if "." in base else base
    explicit = cfg.get("tag") or tag
    cfg["name"] = f"{base}_{explicit}" if explicit else base
    return cfg
