"""facesr -> PyTorch weight exporters (the reverse of `facesr.ckpt.convert`).

Completes the migration story in both directions: a model trained in this
framework exports to a reference-format `.pth` that the reference project
loads directly —

  - FaceEnhanceNet -> the reference trainer checkpoint shape
    (`{'model_state_dict': ..., 'config': ...}`; reference
    src/training/trainer.py:700-720, consumed by scripts/test_model.py:90-123
    and `FaceEnhanceNet.from_pretrained`, src/models/custom.py:265-290)
  - TransferSRModel -> the same container with `backbone.*`/`face_head.*`
    keys (reference src/models/transfer.py:45-154)
  - RRDBNet -> the RealESRGAN `{'params': ...}` convention the reference's
    ESRGANBaseline unwraps (src/models/esrgan.py:180-189)

Layout rules are the exact inverses of convert.py: conv HWIO -> OIHW via
transpose(3, 2, 0, 1); dense [in, out] -> [out, in] via .T; scan-stacked
leading [G, B] / [N] axes unstacked into per-block keys. Every exporter is round-trip-gated in tests/test_export_torch.py
(export ∘ convert == identity, bit-exact) and oracle-gated (torch
functional forward on the exported dict == the JAX forward).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "export_face_enhance_net_state_dict",
    "export_rrdbnet_state_dict",
    "export_transfer_state_dict",
    "export_pth",
]


def _w(a: np.ndarray) -> np.ndarray:
    """Conv kernel HWIO -> torch OIHW (inverse of convert._conv)."""
    return np.asarray(a, np.float32).transpose(3, 2, 0, 1)


def _f32(a: np.ndarray) -> np.ndarray:
    return np.asarray(a, np.float32)


def _unconv(out: Dict[str, np.ndarray], name: str, p: Dict[str, Any]) -> None:
    out[f"{name}.weight"] = _w(p["w"])
    if "b" in p and p["b"] is not None:
        out[f"{name}.bias"] = _f32(p["b"])


def export_face_enhance_net_state_dict(
        params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """facesr FaceEnhanceNet params pytree -> reference state dict
    (src/models/custom.py module-attribute names; the exact key set
    convert.convert_face_enhance_net_state_dict consumes)."""
    sd: Dict[str, np.ndarray] = {}
    _unconv(sd, "conv_first", params["conv_first"])

    rcab = params["groups"]["rcab"]
    num_groups, blocks_per_group = np.asarray(rcab["conv1_w"]).shape[:2]
    for g in range(num_groups):
        for b in range(blocks_per_group):
            pre = f"residual_groups.{g}.blocks.{b}"
            leaf = lambda a: np.asarray(a)[g, b]
            sd[f"{pre}.conv1.weight"] = _w(leaf(rcab["conv1_w"]))
            sd[f"{pre}.conv1.bias"] = _f32(leaf(rcab["conv1_b"]))
            sd[f"{pre}.prelu.weight"] = _f32(leaf(rcab["prelu_a"]))
            sd[f"{pre}.conv2.weight"] = _w(leaf(rcab["conv2_w"]))
            sd[f"{pre}.conv2.bias"] = _f32(leaf(rcab["conv2_b"]))
            # reference CA Linears are bias=False (blocks.py:69-71)
            sd[f"{pre}.channel_attention.fc.0.weight"] = _f32(
                leaf(rcab["ca"]["fc1_w"])).T
            sd[f"{pre}.channel_attention.fc.2.weight"] = _f32(
                leaf(rcab["ca"]["fc2_w"])).T
        sd[f"residual_groups.{g}.conv.weight"] = _w(
            np.asarray(params["groups"]["conv_w"])[g])
        sd[f"residual_groups.{g}.conv.bias"] = _f32(
            np.asarray(params["groups"]["conv_b"])[g])

    _unconv(sd, "conv_after_body", params["conv_after_body"])
    for s, stage in enumerate(params["upsample"]):
        sd[f"upsample.stages.{s}.conv.weight"] = _w(stage["conv_w"])
        sd[f"upsample.stages.{s}.conv.bias"] = _f32(stage["conv_b"])
        sd[f"upsample.stages.{s}.prelu.weight"] = _f32(stage["prelu_a"])
    _unconv(sd, "conv_last", params["conv_last"])
    return sd


def _export_rdb(sd: Dict[str, np.ndarray], pre: str, rdb: Dict[str, Any],
                i: int) -> None:
    for c in range(1, 6):
        sd[f"{pre}.conv{c}.weight"] = _w(np.asarray(rdb[f"conv{c}_w"])[i])
        sd[f"{pre}.conv{c}.bias"] = _f32(np.asarray(rdb[f"conv{c}_b"])[i])


def export_rrdbnet_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """facesr RRDBNet params (stacked body) -> RealESRGAN-format state dict
    (basicsr `body.{i}.rdb{j}.conv{c}` naming, convert.py:219-244)."""
    sd: Dict[str, np.ndarray] = {}
    _unconv(sd, "conv_first", params["conv_first"])
    body = params["body"]
    num_blocks = np.asarray(body["rdb1"]["conv1_w"]).shape[0]
    for i in range(num_blocks):
        for j in (1, 2, 3):
            _export_rdb(sd, f"body.{i}.rdb{j}", body[f"rdb{j}"], i)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        _unconv(sd, name, params[name])
    return sd


def export_transfer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """facesr TransferSRModel params -> reference state dict
    (src/models/transfer.py:45-154 `backbone.*` + `face_head.*` keys).
    The body_main/body_tail split is a trainability partition only
    (convert.py:247-256): blocks re-interleave in order."""
    sd: Dict[str, np.ndarray] = {}
    bb = params["backbone"]
    _unconv(sd, "backbone.conv_first", bb["conv_first"])
    idx = 0
    for part in ("body_main", "body_tail"):
        stacked = bb.get(part)
        if stacked is None:
            continue
        n = np.asarray(stacked["rdb1"]["conv1_w"]).shape[0]
        for i in range(n):
            for j in (1, 2, 3):
                _export_rdb(sd, f"backbone.body.{idx}.rdb{j}",
                            stacked[f"rdb{j}"], i)
            idx += 1
    _unconv(sd, "backbone.conv_body", bb["conv_body"])

    hd = params["face_head"]
    rcabs = hd["rcabs"]
    for b in range(np.asarray(rcabs["conv1_w"]).shape[0]):
        pre = f"face_head.rcab_blocks.{b}"
        sd[f"{pre}.conv1.weight"] = _w(np.asarray(rcabs["conv1_w"])[b])
        sd[f"{pre}.conv1.bias"] = _f32(np.asarray(rcabs["conv1_b"])[b])
        sd[f"{pre}.prelu.weight"] = _f32(np.asarray(rcabs["prelu_a"])[b])
        sd[f"{pre}.conv2.weight"] = _w(np.asarray(rcabs["conv2_w"])[b])
        sd[f"{pre}.conv2.bias"] = _f32(np.asarray(rcabs["conv2_b"])[b])
        sd[f"{pre}.channel_attention.fc.0.weight"] = _f32(
            np.asarray(rcabs["ca"]["fc1_w"])[b]).T
        sd[f"{pre}.channel_attention.fc.2.weight"] = _f32(
            np.asarray(rcabs["ca"]["fc2_w"])[b]).T
    _unconv(sd, "face_head.conv_after", hd["conv_after"])
    for s, stage in enumerate(hd["upsample"]):
        sd[f"face_head.upsample.stages.{s}.conv.weight"] = _w(stage["conv_w"])
        sd[f"face_head.upsample.stages.{s}.conv.bias"] = _f32(stage["conv_b"])
        sd[f"face_head.upsample.stages.{s}.prelu.weight"] = _f32(
            stage["prelu_a"])
    _unconv(sd, "face_head.conv_last", hd["conv_last"])
    return sd


# FaceEnhanceNetConfig fields the REFERENCE dataclass accepts
# (src/models/custom.py:23-43) — the exported 'config' dict must stay inside
# this set or `FaceEnhanceNetConfig(**checkpoint['config'])` raises there.
REFERENCE_CUSTOM_CONFIG_FIELDS = (
    "num_channels", "num_groups", "blocks_per_group", "kernel_size",
    "reduction_ratio", "scale_factor", "res_scale", "in_channels",
    "out_channels", "init_scale", "num_rcab_blocks",
)

# TransferModelConfig fields (src/models/transfer.py:24-43).
REFERENCE_TRANSFER_CONFIG_FIELDS = (
    "backbone_blocks", "freeze_blocks", "head_blocks", "head_channels",
    "scale_factor", "stage1_lr", "stage2_lr", "stage3_lr",
)


def export_pth(fckpt_path: str, out_path: str, kind: str = "auto",
               prefer_ema: bool = True) -> str:
    """Export a facesr checkpoint to a reference-loadable `.pth`.

    kind: 'auto' (from checkpoint metadata) | 'custom' | 'transfer' |
    'rrdbnet'. `prefer_ema` serves the EMA weights when present — the same
    convention every facesr eval/serving surface uses (checkpoint.py:138).
    Returns the resolved kind."""
    import torch
    from dataclasses import asdict

    from facesr.ckpt.checkpoint import load_checkpoint, load_model

    loaded = load_checkpoint(fckpt_path)
    meta = loaded[1]
    mtype = meta.get("model_type", "custom") if kind == "auto" else kind
    mtype = {"rrdbnet": "esrgan", "lite": "custom"}.get(mtype, mtype)
    if mtype not in ("custom", "transfer", "esrgan"):
        raise ValueError(
            f"Cannot export model_type '{mtype}' to a reference .pth "
            f"(supported: custom/lite, transfer, esrgan/rrdbnet)")
    cfg, params = load_model(fckpt_path, model_type=mtype,
                             prefer_ema=prefer_ema, preloaded=loaded)

    if mtype == "esrgan":
        sd = export_rrdbnet_state_dict(params)
        # the RealESRGAN container the reference's _load_weights unwraps
        # (esrgan.py:183-186); convert.py round-trips it back
        ckpt: Dict[str, Any] = {"params": {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in sd.items()}}
    else:
        if mtype == "transfer":
            sd = export_transfer_state_dict(params)
            fields = REFERENCE_TRANSFER_CONFIG_FIELDS
        else:
            sd = export_face_enhance_net_state_dict(params)
            fields = REFERENCE_CUSTOM_CONFIG_FIELDS
        cfg_dict = {k: v for k, v in asdict(cfg).items() if k in fields}
        ckpt = {
            "model_state_dict": {
                k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()},
            "config": cfg_dict,
            # reference scripts/test_model.py:127-131 prints these when set
            "epoch": meta.get("epoch", 0),
            "global_step": meta.get("step", meta.get("global_step", 0)),
        }
        if meta.get("best_psnr") is not None:
            ckpt["best_psnr"] = meta["best_psnr"]
        if meta.get("best_metric") is not None:
            ckpt["best_metric"] = meta["best_metric"]

    torch.save(ckpt, out_path)
    n_params = sum(int(np.asarray(v).size) for v in sd.values())
    print(f"Exported {fckpt_path} -> {out_path} "
          f"({mtype}, {len(sd)} tensors, {n_params:,} params"
          f"{', ema' if prefer_ema else ''})")
    return mtype


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(
        description="Export a facesr checkpoint to a reference-format .pth")
    p.add_argument("--input", required=True, help="facesr .fckpt")
    p.add_argument("--output", required=True, help="output .pth")
    p.add_argument("--kind", default="auto",
                   choices=["auto", "custom", "transfer", "rrdbnet"])
    p.add_argument("--no-ema", action="store_true",
                   help="export the raw optimized weights instead of EMA")
    a = p.parse_args()
    export_pth(a.input, a.output, a.kind, prefer_ema=not a.no_ema)
