"""TPU-native compute primitives (parity kernels for the reference stack)."""

from facesr.ops.resize import (
    resize_matrix,
    resize2d,
    bicubic_resize,
    bicubic_up,
    bicubic_down,
    nearest_up,
    avg_pool2,
)
from facesr.ops.conv import conv2d, prelu, leaky_relu, global_avg_pool, dense
from facesr.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from facesr.ops import init

__all__ = [
    "resize_matrix",
    "resize2d",
    "bicubic_resize",
    "bicubic_up",
    "bicubic_down",
    "nearest_up",
    "avg_pool2",
    "conv2d",
    "prelu",
    "leaky_relu",
    "global_avg_pool",
    "dense",
    "pixel_shuffle",
    "pixel_unshuffle",
    "init",
]
