"""PyTorch -> facesr weight converters.

Imports reference-format `.pth` checkpoints into facesr pytrees for parity
testing against published weights (SURVEY.md §5 checkpoint/resume;
BASELINE.json requires metric parity with the PyTorch checkpoints):

  - FaceEnhanceNet state dicts (reference src/models/custom.py layout)
  - torchvision VGG19 features (perceptual-loss parity, SURVEY §7 hard #2)
  - AlexNet + LPIPS linear heads (lpips pip package checkpoint format)
  - RRDBNet / RealESRGAN_x4plus (params_ema/params formats,
    reference esrgan.py:165-191)

Layout rules: conv OIHW -> HWIO via transpose(2,3,1,0); dense [out,in] ->
[in,out] via .T; repeated blocks stacked along leading axes to match the
scan-stacked parameter layout.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = [
    "convert_face_enhance_net_state_dict",
    "convert_vgg19_state_dict",
    "convert_lpips_weights",
    "convert_inception_state_dict",
    "convert_rrdbnet_state_dict",
    "convert_transfer_state_dict",
    "load_torch_state_dict",
    "convert_pth",
]


def load_torch_state_dict(path: str, weights_only: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint and return a flat {name: numpy} state dict,
    unwrapping the common container keys.

    weights_only: True restricts unpickling to tensors (use for artifacts
    that are plain state dicts, e.g. downloaded RRDBNet releases — arbitrary
    pickles in a tampered asset would otherwise execute code); False allows
    full unpickling (lpips packages custom classes); None (default) tries
    the safe mode first and falls back.
    """
    import torch

    if weights_only is None:
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=weights_only)
    for key in ("model_state_dict", "state_dict", "params_ema", "params"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def _conv(sd: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    out = {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["b"] = sd[f"{name}.bias"]
    return out


def convert_face_enhance_net_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference FaceEnhanceNet state dict -> facesr params pytree
    (stacked [G, B, ...] RCAB leaves for the scanned trunk)."""
    groups = sorted({int(m.group(1)) for k in sd
                     if (m := re.match(r"residual_groups\.(\d+)\.", k))})
    num_groups = len(groups)
    blocks = sorted({int(m.group(1)) for k in sd
                     if (m := re.match(r"residual_groups\.0\.blocks\.(\d+)\.", k))})
    blocks_per_group = len(blocks)
    if (num_groups == 0 or blocks_per_group == 0
            or groups != list(range(num_groups))
            or blocks != list(range(blocks_per_group))):
        # fail with the layout, not a downstream tree_map/KeyError
        raise ValueError(
            f"Unrecognized FaceEnhanceNet state dict (groups={groups}, "
            f"blocks={blocks}; keys e.g. {sorted(sd)[:3]}) — expected "
            f"contiguous 'residual_groups.<g>.blocks.<b>.*' keys; strip "
            f"any 'module.' prefix before converting")

    def rcab(g: int, b: int) -> Dict[str, Any]:
        pre = f"residual_groups.{g}.blocks.{b}"
        return {
            "conv1_w": sd[f"{pre}.conv1.weight"].transpose(2, 3, 1, 0),
            "conv1_b": sd[f"{pre}.conv1.bias"],
            "prelu_a": sd[f"{pre}.prelu.weight"],
            "conv2_w": sd[f"{pre}.conv2.weight"].transpose(2, 3, 1, 0),
            "conv2_b": sd[f"{pre}.conv2.bias"],
            "ca": {
                "fc1_w": sd[f"{pre}.channel_attention.fc.0.weight"].T,
                "fc2_w": sd[f"{pre}.channel_attention.fc.2.weight"].T,
            },
        }

    rcabs = [rcab(g, b) for g in range(num_groups) for b in range(blocks_per_group)]
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *rcabs)
    stacked = jax.tree.map(
        lambda a: a.reshape((num_groups, blocks_per_group) + a.shape[1:]), stacked
    )

    num_stages = len({int(m.group(1)) for k in sd
                      if (m := re.match(r"upsample\.stages\.(\d+)\.", k))})
    upsample = []
    for s in range(num_stages):
        upsample.append({
            "conv_w": sd[f"upsample.stages.{s}.conv.weight"].transpose(2, 3, 1, 0),
            "conv_b": sd[f"upsample.stages.{s}.conv.bias"],
            "prelu_a": sd[f"upsample.stages.{s}.prelu.weight"],
        })

    return {
        "conv_first": _conv(sd, "conv_first"),
        "groups": {
            "rcab": stacked,
            "conv_w": np.stack([
                sd[f"residual_groups.{g}.conv.weight"].transpose(2, 3, 1, 0)
                for g in range(num_groups)
            ]),
            "conv_b": np.stack([
                sd[f"residual_groups.{g}.conv.bias"] for g in range(num_groups)
            ]),
        },
        "conv_after_body": _conv(sd, "conv_after_body"),
        "upsample": upsample,
        "conv_last": _conv(sd, "conv_last"),
    }


# torchvision vgg19.features conv module indices, in depth order
_VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def convert_vgg19_state_dict(sd: Dict[str, np.ndarray]) -> List[Dict[str, np.ndarray]]:
    """torchvision vgg19 (full model or .features) -> facesr VGG conv list."""
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params = []
    for i, idx in enumerate(_VGG19_CONV_IDX):
        w_key = f"{prefix}{idx}.weight"
        if w_key not in sd:
            # a clean PREFIX truncation (convs 0..i-1 present, nothing
            # deeper) is a valid partial extractor; an empty result or a
            # gap means an unrecognized layout (e.g. DataParallel
            # 'module.'-prefixed keys) — a silently truncated list would
            # convert "successfully" and fail downstream without a trace
            deeper = [j for j in _VGG19_CONV_IDX[i:]
                      if f"{prefix}{j}.weight" in sd]
            if not params or deeper:
                raise ValueError(
                    f"vgg19 state dict missing {w_key!r} (have e.g. "
                    f"{sorted(sd)[:3]}) — unrecognized layout; strip any "
                    f"'module.' prefix before converting")
            break
        params.append({
            "w": sd[w_key].transpose(2, 3, 1, 0),
            "b": sd[f"{prefix}{idx}.bias"],
        })
    return params


# torchvision alexnet.features conv module indices
_ALEX_CONV_IDX = [0, 3, 6, 8, 10]


def convert_lpips_weights(
    alexnet_sd: Dict[str, np.ndarray],
    lpips_sd: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """torchvision alexnet state dict + lpips-pkg alex.pth lin heads ->
    facesr LPIPS weights pytree."""
    prefix = "features." if any(k.startswith("features.") for k in alexnet_sd) else ""
    convs = []
    for idx in _ALEX_CONV_IDX:
        convs.append({
            "w": alexnet_sd[f"{prefix}{idx}.weight"].transpose(2, 3, 1, 0),
            "b": alexnet_sd[f"{prefix}{idx}.bias"],
        })
    lins = []
    for i in range(5):
        # lpips pkg: lin{i}.model.1.weight with shape [1, C, 1, 1]
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = lpips_sd[key]
                break
        else:
            raise KeyError(f"lin{i} weight not found in LPIPS state dict")
        lins.append({"w": w.reshape(w.shape[1], 1)})  # [C, 1]
    return {"convs": convs, "lins": lins}


def convert_inception_state_dict(sd: Dict[str, np.ndarray],
                                 bn_eps: float = 1e-3) -> Dict[str, Any]:
    """InceptionV3 state dict (pytorch-fid's pt_inception-2015-12-05 or
    torchvision inception_v3) -> facesr FID-Inception params.

    Every BasicConv2d module `m` contributes m.conv.weight (OIHW -> HWIO)
    plus its eval-mode BatchNorm folded to an affine:
      scale = gamma / sqrt(running_var + eps); bias = beta - mean * scale.
    fc / AuxLogits keys are ignored (FID stops at pool3)."""
    from facesr.models.inception import CONV_SPECS

    params: Dict[str, Any] = {}
    for name, (ic, oc, (kh, kw), _, _) in CONV_SPECS.items():
        w = sd[f"{name}.conv.weight"]
        if w.shape != (oc, ic, kh, kw):
            raise ValueError(
                f"{name}.conv.weight has shape {w.shape}, expected {(oc, ic, kh, kw)}"
            )
        gamma = sd[f"{name}.bn.weight"]
        beta = sd[f"{name}.bn.bias"]
        mean = sd[f"{name}.bn.running_mean"]
        var = sd[f"{name}.bn.running_var"]
        scale = gamma / np.sqrt(var + bn_eps)
        params[name] = {
            "w": w.transpose(2, 3, 1, 0).astype(np.float32),
            "scale": scale.astype(np.float32),
            "bias": (beta - mean * scale).astype(np.float32),
        }
    return params


def convert_rrdbnet_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """RealESRGAN/ESRGAN RRDBNet state dict -> facesr params (stacked body)."""
    import jax

    idxs = {int(m.group(1)) for k in sd
            if (m := re.match(r"body\.(\d+)\.", k))}
    if not idxs or sorted(idxs) != list(range(len(idxs))):
        raise ValueError(
            f"RRDBNet state dict body indices missing or non-contiguous "
            f"(found {sorted(idxs)[:6]}): not a plain RRDBNet state dict — "
            "strip any 'module.' (DataParallel) prefix first")
    num_blocks = len(idxs)

    def rdb(i: int, j: int) -> Dict[str, np.ndarray]:
        out = {}
        for c in range(1, 6):
            pre = f"body.{i}.rdb{j}.conv{c}"
            out[f"conv{c}_w"] = sd[f"{pre}.weight"].transpose(2, 3, 1, 0)
            out[f"conv{c}_b"] = sd[f"{pre}.bias"]
        return out

    body = [{"rdb1": rdb(i, 1), "rdb2": rdb(i, 2), "rdb3": rdb(i, 3)}
            for i in range(num_blocks)]
    return {
        "conv_first": _conv(sd, "conv_first"),
        "body": jax.tree.map(lambda *xs: np.stack(xs), *body),
        "conv_body": _conv(sd, "conv_body"),
        "conv_up1": _conv(sd, "conv_up1"),
        "conv_up2": _conv(sd, "conv_up2"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }


def convert_transfer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference TransferSRModel state dict -> facesr transfer params.

    Reference layout (src/models/transfer.py:45-154): a ModuleDict
    backbone (conv_first + body.{i} RRDBs + conv_body) and a
    FaceSpecificHead (rcab_blocks.{b} + conv_after + upsample.stages.{s}
    + conv_last). facesr splits the RRDB body into scan-stacked
    `body_main` / `body_tail` at STAGE2_UNFREEZE_BLOCKS from the end
    (facesr.models.transfer.init) — the split is a trainability
    partition, not an architectural one, so conversion only restacks."""
    import jax
    from facesr.models.transfer import STAGE2_UNFREEZE_BLOCKS

    blocks = sorted({int(m.group(1)) for k in sd
                     if (m := re.match(r"backbone\.body\.(\d+)\.", k))})
    n_blocks = len(blocks)
    head_blocks = sorted({int(m.group(1)) for k in sd
                          if (m := re.match(r"face_head\.rcab_blocks\.(\d+)\.", k))})
    if (n_blocks == 0 or blocks != list(range(n_blocks))
            or not head_blocks or head_blocks != list(range(len(head_blocks)))):
        raise ValueError(
            f"Unrecognized TransferSRModel state dict (body blocks={blocks}, "
            f"head blocks={head_blocks}; keys e.g. {sorted(sd)[:3]}) — "
            f"expected 'backbone.body.<i>.*' + 'face_head.rcab_blocks.<b>.*' "
            f"keys; strip any 'module.' prefix before converting")

    def rdb(i: int, j: int) -> Dict[str, np.ndarray]:
        out = {}
        for c in range(1, 6):
            pre = f"backbone.body.{i}.rdb{j}.conv{c}"
            out[f"conv{c}_w"] = sd[f"{pre}.weight"].transpose(2, 3, 1, 0)
            out[f"conv{c}_b"] = sd[f"{pre}.bias"]
        return out

    rrdbs = [{"rdb1": rdb(i, 1), "rdb2": rdb(i, 2), "rdb3": rdb(i, 3)}
             for i in range(n_blocks)]
    n_tail = min(STAGE2_UNFREEZE_BLOCKS, n_blocks)
    n_main = n_blocks - n_tail

    def stack(blocks_list):
        if not blocks_list:
            return None
        return jax.tree.map(lambda *xs: np.stack(xs), *blocks_list)

    def rcab(b: int) -> Dict[str, Any]:
        pre = f"face_head.rcab_blocks.{b}"
        return {
            "conv1_w": sd[f"{pre}.conv1.weight"].transpose(2, 3, 1, 0),
            "conv1_b": sd[f"{pre}.conv1.bias"],
            "prelu_a": sd[f"{pre}.prelu.weight"],
            "conv2_w": sd[f"{pre}.conv2.weight"].transpose(2, 3, 1, 0),
            "conv2_b": sd[f"{pre}.conv2.bias"],
            "ca": {
                "fc1_w": sd[f"{pre}.channel_attention.fc.0.weight"].T,
                "fc2_w": sd[f"{pre}.channel_attention.fc.2.weight"].T,
            },
        }

    num_stages = len({int(m.group(1)) for k in sd
                      if (m := re.match(r"face_head\.upsample\.stages\.(\d+)\.", k))})
    upsample = [{
        "conv_w": sd[f"face_head.upsample.stages.{s}.conv.weight"].transpose(2, 3, 1, 0),
        "conv_b": sd[f"face_head.upsample.stages.{s}.conv.bias"],
        "prelu_a": sd[f"face_head.upsample.stages.{s}.prelu.weight"],
    } for s in range(num_stages)]

    return {
        "backbone": {
            "conv_first": _conv(sd, "backbone.conv_first"),
            "body_main": stack(rrdbs[:n_main]),
            "body_tail": stack(rrdbs[n_main:]),
            "conv_body": _conv(sd, "backbone.conv_body"),
        },
        "face_head": {
            "rcabs": stack([rcab(b) for b in head_blocks]),
            "conv_after": _conv(sd, "face_head.conv_after"),
            "upsample": upsample,
            "conv_last": _conv(sd, "face_head.conv_last"),
        },
    }


def infer_transfer_config(params: Dict[str, Any]):
    """TransferModelConfig from converted parameter shapes (self-describing
    checkpoints, like infer_model_config_from_params for the custom net)."""
    from facesr.models.transfer import TransferModelConfig

    bb = params["backbone"]
    n_main = (0 if bb["body_main"] is None
              else int(np.asarray(bb["body_main"]["rdb1"]["conv1_w"]).shape[0]))
    n_tail = (0 if bb["body_tail"] is None
              else int(np.asarray(bb["body_tail"]["rdb1"]["conv1_w"]).shape[0]))
    hd = params["face_head"]
    return TransferModelConfig(
        backbone_blocks=n_main + n_tail,
        head_blocks=int(np.asarray(hd["rcabs"]["conv1_w"]).shape[0]),
        head_channels=int(np.asarray(bb["conv_first"]["w"]).shape[-1]),
        scale_factor=2 ** len(hd["upsample"]),
    )


def convert_pth(pth_path: str, out_path: str, kind: str = "custom",
                extra_pth: Optional[str] = None) -> None:
    """CLI-style one-shot conversion to a facesr checkpoint file.

    kind: 'custom' | 'vgg19' | 'lpips' (extra_pth = lpips lin heads) |
    'rrdbnet' | 'inception' (FID backbone) | 'transfer' (TransferSRModel).
    """
    from facesr.ckpt.checkpoint import save_checkpoint

    # rrdbnet artifacts come from the download path, and torchvision
    # vgg19/inception releases are plain tensor state dicts: refuse
    # arbitrary pickle payloads in all three. Reference-trained 'custom'/
    # 'transfer' checkpoints and lpips artifacts may carry richer pickles;
    # they keep the try-safe-then-fallback default.
    sd = load_torch_state_dict(
        pth_path,
        weights_only={"rrdbnet": True, "vgg19": True,
                      "inception": True}.get(kind))
    if kind == "custom":
        params = convert_face_enhance_net_state_dict(sd)
        from facesr.ckpt.checkpoint import infer_model_config_from_params
        from dataclasses import asdict

        cfg = infer_model_config_from_params(params)
        save_checkpoint(out_path, {"params": params},
                        {"model_type": "custom", "config": asdict(cfg),
                         "converted_from": pth_path})
    elif kind == "vgg19":
        save_checkpoint(out_path, {"convs": convert_vgg19_state_dict(sd)},
                        {"model_type": "vgg19", "converted_from": pth_path})
    elif kind == "lpips":
        if extra_pth is None:
            raise ValueError("lpips conversion needs extra_pth = lpips lin heads .pth")
        lins_sd = load_torch_state_dict(extra_pth)
        weights = convert_lpips_weights(sd, lins_sd)
        save_checkpoint(out_path, weights,
                        {"model_type": "lpips_alex", "converted_from": pth_path})
    elif kind == "rrdbnet":
        from dataclasses import asdict

        from facesr.models.esrgan import infer_rrdbnet_config

        params = convert_rrdbnet_state_dict(sd)
        # store the inferred architecture so non-x4plus conversions
        # (num_feat/num_blocks variants) load with the right config instead
        # of the RRDBNetConfig defaults
        save_checkpoint(out_path, {"params": params},
                        {"model_type": "esrgan",
                         "config": asdict(infer_rrdbnet_config(params)),
                         "converted_from": pth_path})
    elif kind == "transfer":
        from dataclasses import asdict

        params = convert_transfer_state_dict(sd)
        cfg = infer_transfer_config(params)
        save_checkpoint(out_path, {"params": params},
                        {"model_type": "transfer", "config": asdict(cfg),
                         "converted_from": pth_path})
    elif kind == "inception":
        save_checkpoint(out_path, convert_inception_state_dict(sd),
                        {"model_type": "inception_fid", "converted_from": pth_path})
    else:
        raise ValueError(f"Unknown conversion kind: {kind}")
    print(f"Converted {pth_path} -> {out_path} ({kind})")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Convert PyTorch weights to facesr format")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", default=None,
                   choices=["custom", "vgg19", "lpips", "rrdbnet", "inception",
                            "transfer", "auto"],
                   help="default: custom (forward), auto (--reverse)")
    p.add_argument("--extra", default=None, help="lpips lin-heads .pth")
    p.add_argument("--reverse", action="store_true",
                   help="export a facesr .fckpt back to a reference-format "
                        ".pth (kinds: auto/custom/transfer/rrdbnet; see "
                        "facesr.ckpt.export_torch)")
    p.add_argument("--no-ema", action="store_true",
                   help="with --reverse: export raw weights instead of EMA")
    a = p.parse_args()
    if a.reverse:
        from facesr.ckpt.export_torch import export_pth

        export_pth(a.input, a.output, a.kind or "auto",
                   prefer_ema=not a.no_ema)
    else:
        if a.kind == "auto":
            p.error("--kind auto is only for --reverse")
        convert_pth(a.input, a.output, a.kind or "custom", a.extra)
