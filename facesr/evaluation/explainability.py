"""Explainability: regression Grad-CAM + SE-attention extraction.

Functional JAX redesign of the reference's two explainability variants
(`src/evaluation/explainability.py:17-330` and
`src/explainability/gradcam.py:18-379`, which SURVEY.md §1 flags as
duplicated — centralized here):

  - Grad-CAM for regression: the "class score" is the mean of the SR output
    over a face region (full / center / eyes / mouth / custom box), and the
    CAM is relu(sum_k w_k A_k) with w_k = spatial mean of dTarget/dA_k.
    Instead of forward/backward hooks, the forward pass is split at the
    chosen residual group and `jax.grad` is taken w.r.t. the intermediate
    activation — the functional equivalent of a hook.
  - AttentionExtractor reads the SE gate activations of every RCAB via the
    model's `collect_attention` path (hook-free).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from facesr.models import face_enhance_net as fen
from facesr.models import blocks as blocks_lib
from facesr.ops import conv2d, bicubic_up

__all__ = [
    "FACE_REGIONS",
    "GradCAM",
    "AttentionExtractor",
    "apply_heatmap",
    "create_attention_report",
    "create_gradcam_visualization",
    "visualize_attention_flow",
]

# Face region boxes as (y0, x0, y1, x1) fractions of the output image
# (reference gradcam.py face regions full/center/eyes/mouth).
FACE_REGIONS = {
    "full": (0.0, 0.0, 1.0, 1.0),
    "center": (0.25, 0.25, 0.75, 0.75),
    "eyes": (0.3, 0.2, 0.5, 0.8),
    "mouth": (0.6, 0.3, 0.85, 0.7),
}


def _split_forward(params, x, cfg: fen.FaceEnhanceNetConfig, split_group: int):
    """Run conv_first + groups[:split_group]; return the intermediate
    activation and a closure completing the forward pass from there."""
    pad = cfg.kernel_size // 2
    skip = bicubic_up(x.astype(jnp.float32), cfg.scale_factor)

    feat = conv2d(x, params["conv_first"]["w"], params["conv_first"]["b"], padding=pad)
    residual = feat

    head_groups = jax.tree.map(lambda a: a[:split_group], params["groups"])
    tail_groups = jax.tree.map(lambda a: a[split_group:], params["groups"])

    if split_group > 0:
        feat, _ = blocks_lib.residual_groups(head_groups, feat, cfg.res_scale, pad)

    def finish(intermediate):
        h = intermediate
        if split_group < cfg.num_groups:
            h, _ = blocks_lib.residual_groups(tail_groups, h, cfg.res_scale, pad)
        h = conv2d(h, params["conv_after_body"]["w"], params["conv_after_body"]["b"], padding=pad)
        # at split 0 the intermediate IS the conv_first output feeding the
        # long skip — rebind it so jax.grad attributes the skip's (large,
        # conv_last is near-zero-init) contribution to the CAM target
        h = h + (intermediate if split_group == 0 else residual)
        h = blocks_lib.upsample(params["upsample"], h)
        out = conv2d(h, params["conv_last"]["w"], params["conv_last"]["b"], padding=pad)
        return out.astype(jnp.float32) + skip

    return feat, finish


class GradCAM:
    """Region-aware Grad-CAM on a FaceEnhanceNet.

    target_layer: 'group{i}' — the activation after residual group i
    (0 = after conv_first).
    """

    def __init__(self, model, target_layer: str = "group3"):
        self.model = model
        self.cfg = model.config
        if target_layer.startswith("group"):
            self.split_group = int(target_layer[len("group"):])
        elif target_layer == "conv_first":
            self.split_group = 0
        else:
            raise ValueError(f"Unknown target layer: {target_layer}")
        self.split_group = min(self.split_group, self.cfg.num_groups)

    def _region_box(self, region, out_hw) -> Tuple[int, int, int, int]:
        if isinstance(region, str):
            fy0, fx0, fy1, fx1 = FACE_REGIONS[region]
        else:
            fy0, fx0, fy1, fx1 = region
        H, W = out_hw
        return int(fy0 * H), int(fx0 * W), max(int(fy1 * H), int(fy0 * H) + 1), max(int(fx1 * W), int(fx0 * W) + 1)

    def generate(self, x: jax.Array, region: str | tuple = "full") -> np.ndarray:
        """x: NHWC LR input. Returns CAM heatmap [N, h, w] in [0, 1] at the
        target layer's spatial resolution."""
        feat, finish = _split_forward(self.model.params, x, self.cfg, self.split_group)
        return self._cam(feat, finish, x, region)

    def _cam(self, feat, finish, x, region) -> np.ndarray:
        out_hw = (x.shape[1] * self.cfg.scale_factor, x.shape[2] * self.cfg.scale_factor)
        y0, x0, y1, x1 = self._region_box(region, out_hw)

        def target_fn(intermediate):
            out = finish(intermediate)
            return out[:, y0:y1, x0:x1, :].mean()

        grads = jax.grad(target_fn)(feat)  # dTarget/dA, NHWC
        weights = grads.mean(axis=(1, 2), keepdims=True)  # GAP over space
        cam = jax.nn.relu((weights * feat).sum(axis=-1))  # [N, h, w]

        cam = np.asarray(cam)
        cmin = cam.min(axis=(1, 2), keepdims=True)
        cmax = cam.max(axis=(1, 2), keepdims=True)
        return (cam - cmin) / (cmax - cmin + 1e-8)

    def generate_multi_region(self, x: jax.Array) -> Dict[str, np.ndarray]:
        # one head forward shared across regions — only the CAM target (and
        # its pullback) differs per region
        feat, finish = _split_forward(self.model.params, x, self.cfg, self.split_group)
        return {name: self._cam(feat, finish, x, name) for name in FACE_REGIONS}


class AttentionExtractor:
    """Per-RCAB SE attention weights, keyed 'group{g}_rcab{b}' (reference
    evaluation/explainability.py:103-162)."""

    def __init__(self, model):
        self.model = model

    def extract(self, x: jax.Array) -> Dict[str, np.ndarray]:
        maps = self.model.get_attention_maps(x)
        return {k: np.asarray(v) for k, v in maps.items()}

    def summary(self, x: jax.Array) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, attn in self.extract(x).items():
            out[name] = {
                "mean": float(attn.mean()),
                "std": float(attn.std()),
                "min": float(attn.min()),
                "max": float(attn.max()),
            }
        return out


def apply_heatmap(image: np.ndarray, cam: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Overlay a [h,w] CAM in [0,1] on an HWC uint8/float image (JET
    colormap, reference gradcam.py:213-247)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    h, w = img.shape[:2]
    cam_r = cv2.resize(cam.astype(np.float32), (w, h))
    heat = cv2.applyColorMap((cam_r * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    return (alpha * heat + (1 - alpha) * img).astype(np.uint8)


def create_gradcam_visualization(
    model,
    lr_image: np.ndarray,
    save_path: Optional[str] = None,
    target_layer: str = "group3",
):
    """Panel: SR output + CAM overlays for each face region (reference
    gradcam.py:250-309)."""
    import matplotlib

    matplotlib.use("Agg", force=False)  # never hijack an interactive backend
    import matplotlib.pyplot as plt

    x = jnp.asarray(lr_image[None] if lr_image.ndim == 3 else lr_image, jnp.float32)
    sr = np.asarray(model(x))[0]
    cam_gen = GradCAM(model, target_layer)
    cams = cam_gen.generate_multi_region(x)

    fig, axes = plt.subplots(1, len(cams) + 1, figsize=(4 * (len(cams) + 1), 4))
    axes[0].imshow(np.clip(sr, 0, 1))
    axes[0].set_title("SR output")
    axes[0].axis("off")
    for ax, (region, cam) in zip(axes[1:], cams.items()):
        ax.imshow(apply_heatmap(sr, cam[0]))
        ax.set_title(f"Grad-CAM: {region}")
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_attention_report(
    model,
    lr_image: np.ndarray,
    save_dir: str,
    target_layer: str = "group3",
) -> Dict[str, object]:
    """Full explainability report for one image (reference
    evaluation/explainability.py:165-330): Grad-CAM overlays per face
    region, per-RCAB SE attention statistics (JSON), and an attention-flow
    panel. Returns the summary dict."""
    import json

    out = Path(save_dir)
    out.mkdir(parents=True, exist_ok=True)

    create_gradcam_visualization(model, lr_image, save_path=str(out / "gradcam_regions.png"),
                                 target_layer=target_layer)
    visualize_attention_flow(model, lr_image, save_path=str(out / "attention_flow.png"))

    x = jnp.asarray(lr_image[None] if lr_image.ndim == 3 else lr_image, jnp.float32)
    summary = AttentionExtractor(model).summary(x)
    if not summary:
        raise ValueError(
            f"{type(model).__name__} exposes no SE attention maps — the "
            "attention report needs a channel-attention model "
            "(FaceEnhanceNet); Grad-CAM panels were still written to "
            f"{out}")
    report = {
        "target_layer": target_layer,
        "attention_summary": summary,
        "most_active_block": max(summary, key=lambda k: summary[k]["mean"]),
        "least_active_block": min(summary, key=lambda k: summary[k]["mean"]),
    }
    (out / "attention_report.json").write_text(json.dumps(report, indent=2))
    return report


def visualize_attention_flow(model, lr_image: np.ndarray,
                             save_path: Optional[str] = None):
    """CAMs at every depth (after each residual group) in one panel
    (reference gradcam.py:312-379)."""
    import matplotlib

    matplotlib.use("Agg", force=False)  # never hijack an interactive backend
    import matplotlib.pyplot as plt

    x = jnp.asarray(lr_image[None] if lr_image.ndim == 3 else lr_image, jnp.float32)
    sr = np.asarray(model(x))[0]
    G = model.config.num_groups

    fig, axes = plt.subplots(1, G + 1, figsize=(4 * (G + 1), 4))
    axes[0].imshow(np.clip(sr, 0, 1))
    axes[0].set_title("SR output")
    axes[0].axis("off")
    for g in range(G):
        cam = GradCAM(model, f"group{g + 1}").generate(x, "full")
        axes[g + 1].imshow(apply_heatmap(sr, cam[0]))
        axes[g + 1].set_title(f"after group {g + 1}")
        axes[g + 1].axis("off")
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
