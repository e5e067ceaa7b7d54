"""Load any facesr checkpoint into the right model wrapper.

Single implementation of model-type dispatch (checkpoints are
self-describing via their `model_type` metadata — the reference instead
sniffs state-dict key prefixes, compare_two_models.py:131-147), shared by
the compare script, the demo, and the HTTP API.
"""

from __future__ import annotations

import numpy as np
import jax

from facesr.ckpt import load_checkpoint, load_model

__all__ = ["load_any_model"]


def load_any_model(path: str):
    """Returns a model wrapper (.config/.params/.apply_fn/__call__) for a
    custom / transfer / esrgan checkpoint."""
    loaded = load_checkpoint(str(path))
    mtype = loaded[1].get("model_type", "custom")
    # pass the parsed payload through: trainer checkpoints carry optimizer
    # state 3-4x the model size, and a second read + msgpack parse of that
    # on every demo/API/compare startup is pure waste
    cfg, params = load_model(str(path), model_type=mtype, preloaded=loaded)
    params = jax.tree.map(np.asarray, params)
    if mtype in ("custom", "lite"):
        from facesr.models.face_enhance_net import FaceEnhanceNet

        return FaceEnhanceNet(config=cfg, params=params)
    if mtype == "transfer":
        from facesr.models.transfer import TransferSRModel

        return TransferSRModel(cfg, params=params)
    if mtype == "esrgan":
        from facesr.models.esrgan import RRDBNet

        return RRDBNet(config=cfg, params=params)
    raise ValueError(f"Cannot load model type {mtype!r} from {path}")
