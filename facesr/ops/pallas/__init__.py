"""Pallas TPU kernels for the hot ops."""

from facesr.ops.pallas.rcab_group import (
    fused_residual_group,
    prepare_group_weights,
    supports,
)

__all__ = ["fused_residual_group", "prepare_group_weights", "supports"]
