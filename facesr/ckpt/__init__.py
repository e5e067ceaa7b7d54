"""Checkpointing: self-describing msgpack checkpoints + torch converters."""

from facesr.ckpt.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_model,
    load_model,
    infer_model_config_from_params,
    restack_scanned,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_model",
    "load_model",
    "infer_model_config_from_params",
    "restack_scanned",
]
