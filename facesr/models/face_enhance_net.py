"""FaceEnhanceNet — flagship 4x face-SR generator, TPU-native.

Re-designed (not translated) from the reference architecture
(`/root/reference/src/models/custom.py:46-292`):

  conv_first (3 -> C) -> G residual groups (B RCABs each, scanned) ->
  conv_after_body + feature skip -> log2(scale) PixelShuffle stages ->
  conv_last (C -> 3, zero-init) -> + global bicubic skip -> clamp at eval.

TPU specifics:
  - NHWC everywhere; convs hit the MXU with f32 accumulation.
  - The global bicubic skip uses the matmul-based parity resize
    (`facesr.ops.resize`), always in float32 — exactly matching
    `F.interpolate(..., mode='bicubic', align_corners=False)`
    (reference custom.py:157-161).
  - conv_last zero-init guarantees initial output == bicubic upsample
    (reference custom.py:141-145) — used as a built-in parity test.
  - Optional bf16 compute dtype for the feature trunk (params stay f32).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from facesr.models import blocks
from facesr.ops import bicubic_up, conv2d
from facesr.ops import init as finit

Params = Dict[str, Any]


@dataclass
class FaceEnhanceNetConfig:
    """Mirrors the reference `FaceEnhanceNetConfig` (custom.py:22-43)."""

    num_channels: int = 64
    num_groups: int = 3
    blocks_per_group: int = 4
    kernel_size: int = 3
    reduction_ratio: int = 4
    scale_factor: int = 4
    res_scale: float = 0.2
    in_channels: int = 3
    out_channels: int = 3
    init_scale: float = 0.1
    # Legacy field kept for config-surface compatibility (custom.py:43).
    num_rcab_blocks: int = 8
    # Backward-pass memory/FLOPs trade for the trunk: "rcab" | "save_ca" |
    # "save_convs" | "none" (see blocks.residual_groups). Affects training
    # only. Default "save_ca": full per-RCAB remat EXCEPT the tiny SE
    # squeeze/gate tensors (~4 MB total), which skips recomputing the
    # global-mean reduces in the backward sweep — measured +3% stage-1
    # throughput over "rcab" at the same effective HBM (BENCH.md round 2).
    remat: str = "save_ca"

    def replace(self, **kwargs) -> "FaceEnhanceNetConfig":
        d = asdict(self)
        if "upscale_factor" in kwargs:  # reference YAML spelling
            kwargs["scale_factor"] = kwargs.pop("upscale_factor")
        unknown = set(kwargs) - set(d)
        if unknown:
            # silent dropping turned typos into wrong architectures; the
            # reference's dataclass constructor raises too (custom.py:77-80)
            raise TypeError(f"Unknown FaceEnhanceNetConfig field(s): "
                            f"{sorted(unknown)}")
        d.update(kwargs)
        return FaceEnhanceNetConfig(**d)


def init(key: jax.Array, cfg: FaceEnhanceNetConfig) -> Params:
    """Build the parameter pytree (Kaiming fan_out/relu, zero conv_last)."""
    kf, kg, kab, kup, kl = jax.random.split(key, 5)
    ks = cfg.kernel_size
    c = cfg.num_channels
    return {
        "conv_first": {
            "w": finit.kaiming_normal(kf, (ks, ks, cfg.in_channels, c), mode="fan_out", nonlinearity="relu"),
            "b": finit.zeros((c,)),
        },
        "groups": blocks.init_residual_groups(
            kg, cfg.num_groups, cfg.blocks_per_group, c, ks, cfg.reduction_ratio
        ),
        "conv_after_body": {
            "w": finit.kaiming_normal(kab, (ks, ks, c, c), mode="fan_out", nonlinearity="relu"),
            "b": finit.zeros((c,)),
        },
        "upsample": blocks.init_upsample(kup, c, cfg.scale_factor),
        # Zero-initialized so the initial output equals bicubic exactly
        # (reference custom.py:141-145).
        "conv_last": {
            "w": finit.zeros((ks, ks, c, cfg.out_channels)),
            "b": finit.zeros((cfg.out_channels,)),
        },
    }


def apply(
    params: Params,
    x: jax.Array,
    cfg: FaceEnhanceNetConfig,
    train: bool = False,
    dtype: Optional[jnp.dtype] = None,
    collect_attention: bool = False,
    trunk_fn=None,
):
    """Forward pass. x: NHWC LR image in [0, 1].

    Returns SR image (NHWC, scale x spatial), clamped to [0,1] at inference
    only (clamping blocks gradients during training — custom.py:187-188).
    With collect_attention=True returns (out, attn [G, B, N, C]).

    `trunk_fn`: optional override `(groups_params, feat) -> feat` for the
    residual-group trunk — the hook the pipeline-parallel schedule uses
    (facesr.parallel.pipeline) to run the trunk as a shard_map'd microbatch
    pipeline while the head/tail stay in ordinary SPMD code.
    """
    pad = cfg.kernel_size // 2
    skip = bicubic_up(x.astype(jnp.float32), cfg.scale_factor)

    h = x.astype(dtype) if dtype is not None else x
    feat = conv2d(h, params["conv_first"]["w"], params["conv_first"]["b"], padding=pad, dtype=dtype)
    residual = feat

    if trunk_fn is not None:
        if collect_attention:
            raise ValueError("collect_attention is not supported with a "
                             "custom trunk_fn (pipeline-parallel trunk)")
        feat, attn = trunk_fn(params["groups"], feat), None
    else:
        feat, attn = blocks.residual_groups(
            params["groups"], feat, cfg.res_scale, pad,
            collect_attention=collect_attention,
            remat=cfg.remat if train else "none",
        )
    feat = conv2d(feat, params["conv_after_body"]["w"], params["conv_after_body"]["b"], padding=pad)
    feat = feat + residual

    w_last = params["conv_last"]["w"]
    b_last = params["conv_last"]["b"]
    # int8 serving with calibrated static scales: consume the upsample
    # output in PACKED layout with a subpixel-repacked conv_last —
    # bit-identical (integer accumulation commutes) but skips the
    # depth-to-space transpose copies of the full-size s8 feature map; the
    # shuffle runs on the 12-channel conv output instead (BENCH.md).
    from facesr.ops.quant import is_int8_kernel

    use_subpixel = (is_int8_kernel(w_last)
                    and cfg.kernel_size == 3 and cfg.scale_factor in (2, 4))
    feat = blocks.upsample(params["upsample"], feat, next_w=w_last,
                           keep_last_packed=use_subpixel)
    if use_subpixel and feat.dtype == jnp.int8:
        from facesr.ops import pixel_shuffle
        from facesr.ops.pixel_shuffle import subpixel_pack_kernel

        w_packed = {"q": subpixel_pack_kernel(w_last["q"]),
                    "scale": jnp.repeat(w_last["scale"], 4, axis=-1),
                    "a": w_last["a"]}
        residual_out = pixel_shuffle(
            conv2d(feat, w_packed, jnp.repeat(b_last, 4), padding=1), 2)
    else:
        residual_out = conv2d(feat, w_last, b_last, padding=pad)

    out = residual_out.astype(jnp.float32) + skip
    if not train:
        out = jnp.clip(out, 0.0, 1.0)

    if collect_attention:
        return out, attn
    return out


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def get_model_info(params: Params, cfg: FaceEnhanceNetConfig) -> Dict[str, Any]:
    """Model statistics (reference custom.py:232-256)."""
    total = param_count(params)
    input_size = 64
    return {
        "name": "FaceEnhanceNet",
        "total_params": total,
        "trainable_params": total,
        "size_mb": total * 4 / (1024 ** 2),
        "num_groups": cfg.num_groups,
        "blocks_per_group": cfg.blocks_per_group,
        "total_rcab_blocks": cfg.num_groups * cfg.blocks_per_group,
        "num_channels": cfg.num_channels,
        "scale_factor": cfg.scale_factor,
        "input_size": f"{input_size}x{input_size}",
        "output_size": f"{input_size * cfg.scale_factor}x{input_size * cfg.scale_factor}",
    }


class FaceEnhanceNet:
    """Thin stateful wrapper bundling (config, params) with the pure fns.

    Mirrors the reference class surface (forward/`__call__`,
    `get_attention_maps`, `get_model_info`, `from_pretrained`) while all
    compute stays in jit-friendly pure functions.
    """

    def __init__(self, config: Optional[FaceEnhanceNetConfig] = None, params: Optional[Params] = None, seed: int = 0, **kwargs):
        cfg = config or FaceEnhanceNetConfig()
        if kwargs:
            cfg = cfg.replace(**kwargs)
        self.config = cfg
        self.model_type = "custom"
        self.params = params if params is not None else init(jax.random.PRNGKey(seed), cfg)
        self.apply_fn = lambda p, x, train=False, dtype=None: apply(p, x, cfg, train=train, dtype=dtype)
        self._jitted = jax.jit(
            lambda p, x, train: apply(p, x, cfg, train=train),
            static_argnums=(2,),
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self._jitted(self.params, x, train)

    def get_attention_maps(self, x: jax.Array) -> Dict[str, jax.Array]:
        """Per-RCAB SE attention weights, keyed 'group{g}_rcab{b}'
        (reference custom.py:192-230)."""
        _, attn = apply(self.params, x, self.config, train=False, collect_attention=True)
        maps = {}
        for g in range(self.config.num_groups):
            for b in range(self.config.blocks_per_group):
                maps[f"group{g}_rcab{b}"] = attn[g, b]
        return maps

    def get_model_info(self) -> Dict[str, Any]:
        return get_model_info(self.params, self.config)

    @classmethod
    def from_pretrained(cls, checkpoint_path: str) -> "FaceEnhanceNet":
        """Load from a facesr checkpoint or a converted reference `.pth`
        (reference custom.py:258-292)."""
        from facesr.ckpt import load_model

        cfg, params = load_model(checkpoint_path, model_type="custom")
        return cls(config=cfg, params=params)


def create_face_enhance_net(
    num_rcab_blocks: int = 8,
    num_channels: int = 64,
    scale_factor: int = 4,
    **kwargs,
) -> FaceEnhanceNet:
    """Factory matching reference `create_face_enhance_net` (custom.py:295-319)."""
    cfg = FaceEnhanceNetConfig(
        num_rcab_blocks=num_rcab_blocks,
        num_channels=num_channels,
        scale_factor=scale_factor,
    ).replace(**kwargs)
    return FaceEnhanceNet(cfg)


class FaceEnhanceNetLite(FaceEnhanceNet):
    """32-channel lightweight variant (reference custom.py:323-333)."""

    def __init__(self, **kwargs):
        cfg = FaceEnhanceNetConfig(num_channels=32, num_rcab_blocks=4, reduction_ratio=2).replace(**kwargs)
        super().__init__(cfg)
