"""YAML config loading + seeding (reference scripts/train.py:37-54).

Same YAML section names and keys as the reference configs
(project/data/augmentation/model/loss/training/checkpoint/logging/
evaluation) so existing config files drop in unchanged. Precedence:
CLI arg > YAML > coded default (reference train.py:152-158).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any, Dict

import numpy as np
import yaml

__all__ = ["load_config", "set_seed", "validate_config"]

_KNOWN_SECTIONS = {
    "project", "data", "augmentation", "model", "loss", "training",
    "checkpoint", "logging", "evaluation",
}


def validate_config(config: Dict[str, Any], path: str = "<config>") -> list[str]:
    """Light sanity checks the reference lacks (SURVEY §5: 'no schema
    validation'). Warn-only: returns the warning list, never raises."""
    warnings = []
    for key in config:
        if key not in _KNOWN_SECTIONS:
            warnings.append(f"unknown top-level section {key!r}")
    mtype = config.get("model", {}).get("type")
    if mtype is not None and mtype not in ("custom", "transfer", "esrgan"):
        warnings.append(f"unknown model.type {mtype!r}")
    sched = config.get("training", {}).get("scheduler", {}).get("type")
    if sched is not None and sched not in ("cosine", "step", "plateau", "none"):
        warnings.append(f"unknown scheduler type {sched!r}")
    gan_type = config.get("loss", {}).get("gan", {}).get("type")
    if gan_type is not None and gan_type not in ("vanilla", "lsgan", "wgan"):
        warnings.append(f"unknown gan type {gan_type!r}")
    scale = config.get("data", {}).get("scale_factor")
    if scale is not None:
        # warn-only contract: a float/str scale must not TypeError out of
        # the bit trick and crash load_config from inside the validator
        if not isinstance(scale, int) or isinstance(scale, bool):
            warnings.append(f"scale_factor {scale!r} should be an integer")
        elif (scale & (scale - 1)) != 0:
            warnings.append(f"scale_factor {scale} is not a power of 2")
    for w in warnings:
        print(f"Config warning ({path}): {w}")
    return warnings


def load_config(config_path: str) -> Dict[str, Any]:
    with open(config_path, "r") as f:
        cfg = yaml.safe_load(f) or {}
    validate_config(cfg, config_path)
    return cfg


def set_seed(seed: int) -> None:
    """Host RNG seeding; device-side randomness in JAX is explicitly keyed
    (jax.random.PRNGKey), so there is no global device seed to set — the
    cudnn-deterministic dance of the reference (train.py:44-54) is
    unnecessary on TPU/XLA, which is deterministic by default."""
    random.seed(seed)
    np.random.seed(seed)
    print(f"Random seed set to {seed}")
