"""Shared resolver for optional converted-weights files.

Every weights-gated backend (LPIPS AlexNet, FID InceptionV3, VGG19
perceptual) resolves its checkpoint the same way: an explicit env var
wins and MUST exist (a typo'd path silently degrading a metric to
"unavailable" is the failure mode this guards), else the bundled
weights/ directory is probed, else None (graceful absence — the same
degradation the reference has without lpips/pytorch-fid installed).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["resolve_weights_path"]

_WEIGHTS_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "weights"))


def resolve_weights_path(env_var: str, default_name: str) -> Optional[str]:
    """Path to a converted-weights file, or None when absent.

    An explicitly-set env var pointing at a missing file RAISES instead of
    silently falling back — the user asked for specific weights."""
    p = os.environ.get(env_var)
    if p:
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"${env_var}={p!r} does not exist — convert the weights "
                f"with facesr.ckpt.convert or unset the variable")
        return p
    here = os.path.join(_WEIGHTS_DIR, default_name)
    return here if os.path.exists(here) else None
