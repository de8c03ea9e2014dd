"""YAML experiment configuration -> namespace, with CLI overrides.

Capability parity with /root/reference/src/utils/config.py (type-preserving
``CONF:KEY:VALUE`` overrides) and src/utils/checkings.py (config validation).
Config schema follows the reference exactly (configs/{ASR,VSR,AVSR,LM}/*.yaml,
e.g. configs/AVSR/tailored_transformer+ctc_spanish.yaml).
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import yaml


def load_config(path: str, overrides: Optional[List[str]] = None) -> argparse.Namespace:
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if overrides:
        cfg = override_yaml(cfg, overrides)
    return argparse.Namespace(**cfg)


def override_yaml(cfg: dict, overrides: List[str]) -> dict:
    """Apply 'SECTION:KEY:VALUE' (nested) or 'KEY:VALUE' (top-level) overrides,
    preserving the type of the value being replaced (ref config.py:1-20)."""
    for spec in overrides or []:
        parts = spec.split(":")
        if len(parts) == 2:
            key, value = parts
            cfg[key] = _coerce(cfg.get(key), value)
        elif len(parts) == 3:
            section, key, value = parts
            if section not in cfg or cfg[section] is None:
                cfg[section] = {}
            cfg[section][key] = _coerce(cfg[section].get(key), value)
        else:
            raise ValueError(f"bad override (want CONF:KEY:VALUE): {spec}")
    return cfg


def _coerce(old, value: str):
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(value)
    if isinstance(old, float):
        return float(value)
    if isinstance(old, list):
        return yaml.safe_load(value)
    # unknown/absent previous value: let yaml guess the type
    return yaml.safe_load(value)


def security_checks(config: argparse.Namespace) -> None:
    """Validate invariants (ref checkings.py:1-5)."""
    ts = getattr(config, "training_settings", {}) or {}
    avg = ts.get("average_epochs", 1)
    epochs = ts.get("epochs", 1)
    assert 1 <= avg <= epochs, (
        f"average_epochs ({avg}) must be within [1, epochs ({epochs})]"
    )
