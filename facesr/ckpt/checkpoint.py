"""Self-describing checkpoints for facesr.

Format: a single msgpack file (flax.serialization) holding
  { "meta": <json string>, "tree": <pytree of numpy arrays> }
where meta carries epoch/step/config/training_history — mirroring the
reference's rich torch checkpoint dict (`src/training/trainer.py:701-723`)
— so every consumer can rebuild the architecture from the checkpoint alone
(the reference achieves this by state-dict shape sniffing,
`scripts/test_model.py:35-79`; we store the config explicitly and also
support shape inference as a fallback for converted checkpoints).

Structured state (optimizer NamedTuples) is restored with
`flax.serialization.from_bytes` against a freshly-built target tree, the
same build-then-load flow as the reference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_model",
    "load_model",
    "infer_model_config_from_params",
]


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a pytree + JSON-able metadata to a single file."""
    payload = {
        "meta": json.dumps(meta or {}),
        "tree": _to_numpy(tree),
    }
    data = serialization.msgpack_serialize(payload)
    # per-process temp name: concurrent writers (e.g. serving replicas both
    # converting the same pretrained .pth) must never interleave into one
    # temp file, or a partial checkpoint gets atomically renamed into place
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_checkpoint(path: str, target: Any = None) -> Tuple[Any, Dict[str, Any]]:
    """Load (tree, meta). With `target`, the tree is restored into the
    target's structure (NamedTuples etc.); without, raw nested containers."""
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    meta = json.loads(payload["meta"])
    tree = payload["tree"]
    if target is not None:
        tree = serialization.from_state_dict(target, tree)
    return tree, meta


# ---------------------------------------------------------------------------
# Model-only checkpoints (scripts / demo surface)
# ---------------------------------------------------------------------------

def save_model(path: str, params: Any, config: Any, model_type: str = "custom",
               extra_meta: Optional[Dict[str, Any]] = None) -> None:
    from dataclasses import asdict, is_dataclass

    cfg_dict = asdict(config) if is_dataclass(config) else dict(config)
    meta = {"model_type": model_type, "config": cfg_dict}
    meta.update(extra_meta or {})
    save_checkpoint(path, {"params": _to_numpy(params)}, meta)


def infer_model_config_from_params(params: Any):
    """Rebuild a FaceEnhanceNetConfig from parameter shapes (fallback for
    checkpoints without config metadata; reference does the equivalent from
    torch state-dict shapes at `scripts/test_model.py:35-79`)."""
    from facesr.models.face_enhance_net import FaceEnhanceNetConfig

    first_w = np.asarray(params["conv_first"]["w"])
    num_channels = int(first_w.shape[-1])
    kernel_size = int(first_w.shape[0])  # [kh, kw, I, O]
    rcab_w = np.asarray(params["groups"]["rcab"]["conv1_w"])
    num_groups, blocks_per_group = int(rcab_w.shape[0]), int(rcab_w.shape[1])
    fc1 = np.asarray(params["groups"]["rcab"]["ca"]["fc1_w"])
    reduced = int(fc1.shape[-1])
    if reduced < 8:
        # The SE bottleneck is max(C // r, 8) (blocks.reduced_channels), so
        # a width below 8 cannot come from this model family — refuse rather
        # than silently guessing a ratio.
        raise ValueError(
            f"Cannot infer reduction_ratio: SE bottleneck width {reduced} is "
            f"below the floor of 8; checkpoint is not a FaceEnhanceNet."
        )
    # When reduced == 8 the floor was (possibly) hit and several ratios map
    # to the same architecture; C // reduced picks the canonical one, which
    # reproduces the identical network (max(C // (C//8), 8) == 8).
    reduction_ratio = max(num_channels // reduced, 1)
    num_stages = len(params["upsample"])
    return FaceEnhanceNetConfig(
        num_channels=num_channels,
        num_groups=num_groups,
        blocks_per_group=blocks_per_group,
        reduction_ratio=reduction_ratio,
        scale_factor=2 ** num_stages,
        kernel_size=kernel_size,
    )


def restack_scanned(node: Any) -> Any:
    """Restack a scanned-blocks subtree restored from msgpack: a dict of
    per-block pytrees keyed '0','1',... becomes stacked leading-axis arrays
    (e.g. an RRDB body saved pre-stacked). No-op when already stacked."""
    import jax

    if isinstance(node, dict) and node and all(
        isinstance(k, str) and k.isdigit() for k in node
    ):
        blocks = [node[k] for k in sorted(node, key=int)]
        return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks)
    return node


def _restore_list_nodes(tree: Any) -> Any:
    """msgpack restores python lists as {'0': ..., '1': ...} dicts; convert
    any all-integer-keyed dict back to a list (e.g. upsample stages)."""
    if isinstance(tree, dict):
        if tree and all(isinstance(k, str) and k.isdigit() for k in tree):
            return [_restore_list_nodes(tree[k]) for k in sorted(tree, key=int)]
        return {k: _restore_list_nodes(v) for k, v in tree.items()}
    return tree


def load_model(path: str, model_type: str = "custom", prefer_ema: bool = True,
               preloaded: Optional[Tuple[Any, Dict[str, Any]]] = None):
    """Load (config, params) from a model or trainer checkpoint.

    `prefer_ema`: serve the EMA weights when the checkpoint carries them
    (trainer runs with ema_decay > 0) — the standard SR-GAN convention
    (RealESRGAN ships/serves `params_ema`); pass False for the raw
    optimized weights.
    `preloaded`: an already-read `load_checkpoint(path)` result — callers
    that need the meta first (load_any_model, export_pth) pass it to avoid
    reading + msgpack-parsing the file twice."""
    tree, meta = preloaded if preloaded is not None else load_checkpoint(path)
    if prefer_ema and tree.get("ema_params") is not None:
        params = tree["ema_params"]
    elif "params" in tree:
        params = tree["params"]
    elif "state" in tree and "params" in tree["state"]:
        params = tree["state"]["params"]
    else:
        raise ValueError(f"No model params found in checkpoint {path}")
    params = jax.tree.map(lambda x: np.asarray(x), params)

    # Trainer checkpoints carry the architecture under 'model_config'
    # ('config' is the TrainerConfig); model-only checkpoints use 'config'.
    cfg_dict = meta.get("model_config") or meta.get("config")
    mtype = meta.get("model_type", model_type)

    # scanned bodies saved per-block (legacy format) restore as digit-keyed
    # dicts; restack them BEFORE the list restore, or lax.scan receives a
    # python list it cannot consume (ESRGANBaseline and
    # load_pretrained_backbone already restack defensively — this loader
    # must accept the same checkpoints)
    if mtype == "esrgan" and isinstance(params, dict) and "body" in params:
        params["body"] = restack_scanned(params["body"])
    elif mtype == "transfer" and isinstance(params, dict):
        bb = params.get("backbone")
        if isinstance(bb, dict):
            for k in ("body_main", "body_tail"):
                if bb.get(k) is not None:
                    bb[k] = restack_scanned(bb[k])
    params = _restore_list_nodes(params)
    if mtype in ("custom", "lite"):
        from facesr.models.face_enhance_net import FaceEnhanceNetConfig

        known = {k: v for k, v in (cfg_dict or {}).items()
                 if k in FaceEnhanceNetConfig.__dataclass_fields__}
        if known:
            cfg = FaceEnhanceNetConfig(**known)
        else:
            cfg = infer_model_config_from_params(params)
        return cfg, params
    if mtype == "transfer":
        from facesr.models.transfer import TransferModelConfig

        known = {k: v for k, v in (cfg_dict or {}).items()
                 if k in TransferModelConfig.__dataclass_fields__}
        if known:
            return TransferModelConfig(**known), params
        # no stored config (e.g. a hand-converted checkpoint): infer from
        # shapes instead of silently assuming the default architecture
        from facesr.ckpt.convert import infer_transfer_config

        return infer_transfer_config(params), params
    if mtype == "esrgan":
        from facesr.models.esrgan import RRDBNetConfig, infer_rrdbnet_config

        known = {k: v for k, v in (cfg_dict or {}).items()
                 if k in RRDBNetConfig.__dataclass_fields__}
        if known:
            return RRDBNetConfig(**known), params
        return infer_rrdbnet_config(params), params
    raise ValueError(f"Unsupported model_type: {mtype}")
