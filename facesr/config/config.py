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

__all__ = ["load_config", "set_seed"]


def load_config(config_path: str) -> Dict[str, Any]:
    with open(config_path, "r") as f:
        return yaml.safe_load(f) or {}


def set_seed(seed: int) -> None:
    """Host RNG seeding; device-side randomness in JAX is explicitly keyed
    (jax.random.PRNGKey), so there is no global device seed to set — the
    cudnn-deterministic dance of the reference (train.py:44-54) is
    unnecessary on TPU/XLA, which is deterministic by default."""
    random.seed(seed)
    np.random.seed(seed)
    print(f"Random seed set to {seed}")
