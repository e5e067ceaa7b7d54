"""Transfer-learning SR model: ESRGAN backbone + face-specific RCAB head,
with progressive unfreezing expressed functionally.

Re-design of reference `src/models/transfer.py:17-338`. The torch version
mutates `requires_grad` per stage (transfer.py:184-244); here freezing is a
property of the *optimizer*, not the params: each training stage maps every
leaf to a label ('frozen' | 'backbone' | 'head') and an
`optax.multi_transform` applies set_to_zero / AdamW(backbone_lr) /
AdamW(head_lr) respectively — the stage-specific per-group learning rates
of reference transfer.py:271-304.

To keep stage-2 partial unfreezing expressible as per-leaf labels while the
RRDB trunk stays scan-stacked, the body is stored as two stacks:
`body_main` (first N-4 blocks) and `body_tail` (last 4, the stage-2
unfreeze set — reference transfer.py:202-207).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
import optax

from facesr.models import blocks as blocks_lib
from facesr.models import esrgan as esrgan_lib
from facesr.ops import conv2d
from facesr.ops import init as finit

Params = Dict[str, Any]

STAGE2_UNFREEZE_BLOCKS = 4


class TrainingStage(Enum):
    STAGE1_HEAD_ONLY = 1
    STAGE2_PARTIAL_FINETUNE = 2
    STAGE3_FULL_FINETUNE = 3


@dataclass
class TransferModelConfig:
    backbone_blocks: int = 16
    freeze_blocks: int = 16
    head_blocks: int = 4
    head_channels: int = 64
    scale_factor: int = 4
    stage1_lr: float = 2e-4
    stage2_lr: float = 2e-5
    stage3_lr: float = 1e-5


# ---------------------------------------------------------------------------
# Init / forward
# ---------------------------------------------------------------------------

def init(key: jax.Array, cfg: TransferModelConfig = TransferModelConfig()) -> Params:
    kb, kh = jax.random.split(key)
    nf = cfg.head_channels
    n_tail = min(STAGE2_UNFREEZE_BLOCKS, cfg.backbone_blocks)
    n_main = cfg.backbone_blocks - n_tail

    bkeys = jax.random.split(kb, cfg.backbone_blocks + 2)
    rrdbs = [esrgan_lib.init_rrdb(bkeys[i], nf, 32) for i in range(cfg.backbone_blocks)]

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks) if blocks else None

    backbone = {
        "conv_first": {
            "w": finit.kaiming_normal(bkeys[-2], (3, 3, 3, nf), mode="fan_in",
                                      nonlinearity="leaky_relu", a=0.2),
            "b": jnp.zeros((nf,)),
        },
        "body_main": stack(rrdbs[:n_main]),
        "body_tail": stack(rrdbs[n_main:]),
        "conv_body": {
            "w": finit.kaiming_normal(bkeys[-1], (3, 3, nf, nf), mode="fan_in",
                                      nonlinearity="leaky_relu", a=0.2),
            "b": jnp.zeros((nf,)),
        },
    }

    hkeys = jax.random.split(kh, 4)
    rcabs = [
        blocks_lib.init_rcab(k, nf, 3, 4)
        for k in jax.random.split(hkeys[0], cfg.head_blocks)
    ]
    head = {
        "rcabs": jax.tree.map(lambda *xs: jnp.stack(xs), *rcabs),
        "conv_after": {
            "w": finit.kaiming_normal(hkeys[1], (3, 3, nf, nf), mode="fan_out", nonlinearity="relu"),
            "b": jnp.zeros((nf,)),
        },
        "upsample": blocks_lib.init_upsample(hkeys[2], nf, cfg.scale_factor),
        "conv_last": {
            "w": finit.kaiming_normal(hkeys[3], (3, 3, nf, 3), mode="fan_out", nonlinearity="relu"),
            "b": jnp.zeros((3,)),
        },
    }
    return {"backbone": backbone, "face_head": head}


def apply(params: Params, x: jax.Array, cfg: TransferModelConfig = TransferModelConfig(),
          train: bool = False, dtype=None) -> jax.Array:
    """Backbone features + feature skip, then the face head
    (reference transfer.py:246-269 and FaceSpecificHead at :79-91)."""
    bb = params["backbone"]
    h = x.astype(dtype) if dtype is not None else x
    feat = conv2d(h, bb["conv_first"]["w"], bb["conv_first"]["b"], padding=1)

    def body_fn(f, bp):
        return esrgan_lib.rrdb(bp, f), None

    body_feat = feat
    if bb["body_main"] is not None:
        body_feat, _ = lax.scan(body_fn, body_feat, bb["body_main"])
    if bb["body_tail"] is not None:
        body_feat, _ = lax.scan(body_fn, body_feat, bb["body_tail"])
    body_feat = conv2d(body_feat, bb["conv_body"]["w"], bb["conv_body"]["b"], padding=1)
    feat = feat + body_feat

    # Face-specific head
    hd = params["face_head"]

    def rcab_fn(f, rp):
        f, _ = blocks_lib.rcab(rp, f, res_scale=0.2, padding=1)
        return f, None

    residual = feat
    feat, _ = lax.scan(rcab_fn, feat, hd["rcabs"])
    feat = conv2d(feat, hd["conv_after"]["w"], hd["conv_after"]["b"], padding=1)
    feat = feat + residual
    w_last, b_last = hd["conv_last"]["w"], hd["conv_last"]["b"]
    # int8 serving: consume the packed upsample output with the
    # subpixel-repacked conv_last (bit-exact; see face_enhance_net.apply).
    from facesr.ops.quant import is_int8_kernel

    use_subpixel = is_int8_kernel(w_last)
    feat = blocks_lib.upsample(hd["upsample"], feat, next_w=w_last,
                               keep_last_packed=use_subpixel)
    if use_subpixel and feat.dtype == jnp.int8:
        from facesr.ops import pixel_shuffle
        from facesr.ops.pixel_shuffle import subpixel_pack_kernel

        w_packed = {"q": subpixel_pack_kernel(w_last["q"]),
                    "scale": jnp.repeat(w_last["scale"], 4, axis=-1),
                    "a": w_last["a"]}
        out = pixel_shuffle(
            conv2d(feat, w_packed, jnp.repeat(b_last, 4), padding=1), 2)
    else:
        out = conv2d(feat, w_last, b_last, padding=1)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Stage-based trainability (functional freezing)
# ---------------------------------------------------------------------------

def param_labels(params: Params, stage: TrainingStage) -> Params:
    """Per-leaf labels: 'frozen' / 'backbone' / 'head'."""
    def label_tree(tree, label):
        return jax.tree.map(lambda _: label, tree)

    bb = params["backbone"]
    if stage == TrainingStage.STAGE1_HEAD_ONLY:
        bb_labels = label_tree(bb, "frozen")
    elif stage == TrainingStage.STAGE2_PARTIAL_FINETUNE:
        bb_labels = {
            "conv_first": label_tree(bb["conv_first"], "frozen"),
            "body_main": label_tree(bb["body_main"], "frozen"),
            "body_tail": label_tree(bb["body_tail"], "backbone"),
            "conv_body": label_tree(bb["conv_body"], "backbone"),
        }
    else:
        bb_labels = label_tree(bb, "backbone")
    return {"backbone": bb_labels, "face_head": label_tree(params["face_head"], "head")}


def stage_learning_rates(cfg: TransferModelConfig, stage: TrainingStage):
    """(head_lr, backbone_lr) per stage (reference transfer.py:288-297)."""
    if stage == TrainingStage.STAGE1_HEAD_ONLY:
        return cfg.stage1_lr, 0.0
    if stage == TrainingStage.STAGE2_PARTIAL_FINETUNE:
        return cfg.stage2_lr, cfg.stage2_lr * 0.1
    return cfg.stage3_lr, cfg.stage3_lr


def make_stage_optimizer(
    params: Params,
    cfg: TransferModelConfig,
    stage: TrainingStage,
    weight_decay: float = 0.0,
    gradient_clip: float = 0.0,
) -> optax.GradientTransformation:
    """multi_transform optimizer implementing frozen/backbone/head groups."""
    head_lr, backbone_lr = stage_learning_rates(cfg, stage)
    labels = param_labels(params, stage)
    transforms = {
        "frozen": optax.set_to_zero(),
        "backbone": optax.adamw(backbone_lr, weight_decay=weight_decay)
        if backbone_lr > 0 else optax.set_to_zero(),
        "head": optax.adamw(head_lr, weight_decay=weight_decay),
    }
    tx = optax.multi_transform(transforms, labels)
    if gradient_clip and gradient_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx


def trainable_param_count(params: Params, stage: TrainingStage) -> int:
    labels = param_labels(params, stage)
    flat_p = jax.tree.leaves(params)
    flat_l = jax.tree.leaves(labels)
    return sum(int(p.size) for p, l in zip(flat_p, flat_l) if l != "frozen")


class TransferSRModel:
    """Stateful wrapper mirroring the reference class surface
    (set_training_stage / get_model_info / forward)."""

    def __init__(self, config: Optional[TransferModelConfig] = None,
                 pretrained_path: Optional[str] = None, seed: int = 0,
                 params: Optional[Params] = None):
        self.config = config or TransferModelConfig()
        self.model_type = "transfer"
        # pass params through like FaceEnhanceNet/RRDBNet: loading a
        # checkpoint must not random-init 12M params only to discard them
        self.params = (params if params is not None
                       else init(jax.random.PRNGKey(seed), self.config))
        self.current_stage = TrainingStage.STAGE1_HEAD_ONLY
        if pretrained_path:
            self.load_pretrained_backbone(pretrained_path)
        cfg = self.config
        self.apply_fn = lambda p, x, train=False, dtype=None: apply(p, x, cfg, train=train, dtype=dtype)
        self._jitted = jax.jit(lambda p, x: apply(p, x, cfg, train=False))

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self._jitted(self.params, x)

    def set_training_stage(self, stage: TrainingStage) -> None:
        self.current_stage = stage
        print(f"Training stage set to: {stage.name}")

    def load_pretrained_backbone(self, path: str) -> None:
        """Load a converted RRDBNet checkpoint into the backbone (reference
        remaps the official ESRGAN state dict, transfer.py:156-182)."""
        from facesr.ckpt import load_checkpoint, restack_scanned

        tree, _ = load_checkpoint(path)
        src = jax.tree.map(jnp.asarray, tree["params"])
        bb = self.params["backbone"]
        bb["conv_first"] = src["conv_first"]
        bb["conv_body"] = src["conv_body"]
        body = restack_scanned(src["body"])
        n_src = int(jax.tree.leaves(body)[0].shape[0])
        need = self.config.backbone_blocks
        if n_src < need:
            raise ValueError(
                f"Pretrained backbone at {path} has only {n_src} RRDB "
                f"blocks; config.backbone_blocks={need} — a silent "
                f"short-load would leave an empty stage-2 unfreeze set")
        if n_src > need:
            # intentional truncation (the reference takes the first N
            # blocks of RealESRGAN's 23, transfer.py:156-182) — say so
            print(f"Using the first {need} of {n_src} source RRDB blocks")
        n_tail = min(STAGE2_UNFREEZE_BLOCKS, self.config.backbone_blocks)
        n_main = self.config.backbone_blocks - n_tail
        bb["body_main"] = jax.tree.map(lambda a: a[:n_main], body)
        bb["body_tail"] = jax.tree.map(lambda a: a[n_main:n_main + n_tail], body)
        print(f"Loaded pre-trained backbone from {path}")

    def get_trainable_params(self):
        head_lr, backbone_lr = stage_learning_rates(self.config, self.current_stage)
        return [{"group": "backbone", "lr": backbone_lr},
                {"group": "head", "lr": head_lr}]

    def get_model_info(self) -> Dict[str, Any]:
        total = sum(int(p.size) for p in jax.tree.leaves(self.params))
        trainable = trainable_param_count(self.params, self.current_stage)
        return {
            "name": "TransferSRModel",
            "total_params": total,
            "trainable_params": trainable,
            "size_mb": total * 4 / (1024 ** 2),
            "backbone_blocks": self.config.backbone_blocks,
            "head_blocks": self.config.head_blocks,
            "current_stage": self.current_stage.name,
            "frozen_params": total - trainable,
        }


def create_transfer_model(pretrained_path: Optional[str] = None, **kwargs) -> TransferSRModel:
    known = {k: v for k, v in kwargs.items() if k in TransferModelConfig.__dataclass_fields__}
    return TransferSRModel(TransferModelConfig(**known), pretrained_path)
