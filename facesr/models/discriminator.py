"""VGG-style discriminator for adversarial training (256x256 -> scalar logit).

Behavioral parity with reference `src/models/discriminator.py:12-125`:
10 conv blocks 64->512 with stride-2 downsampling (256 -> 8), BatchNorm +
LeakyReLU(0.2), then Flatten -> Linear(512*8*8 -> 1024) -> LeakyReLU ->
Linear(1024 -> 1). Kaiming fan_in leaky_relu(0.2) init.

TPU notes: BatchNorm is functional — `apply` returns updated running stats.
Under pjit data parallelism the batch statistics are *global* means over the
sharded batch axis (XLA inserts the cross-chip reductions), i.e. sync-BN for
free — strictly better GAN training signal than per-device stats. Flatten
uses NCHW ordering so converted torch classifier weights drop in unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from facesr.ops import conv2d, leaky_relu, dense
from facesr.ops import init as finit

Params = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# (out_channels_multiplier, stride, use_bn) per conv block; first block no BN
# (reference discriminator.py:58-78).
_BLOCKS = [
    (1, 1, False),
    (1, 2, True),
    (2, 1, True),
    (2, 2, True),
    (4, 1, True),
    (4, 2, True),
    (8, 1, True),
    (8, 2, True),
    (8, 1, True),
    (8, 2, True),
]


@dataclass
class DiscriminatorConfig:
    in_channels: int = 3
    base_channels: int = 64
    input_size: int = 256
    use_bn: bool = True
    use_sigmoid: bool = False  # False for logits (BCEWithLogits training)


def init(key: jax.Array, cfg: DiscriminatorConfig = DiscriminatorConfig()) -> Tuple[Params, Params]:
    """Returns (params, batch_stats)."""
    keys = jax.random.split(key, len(_BLOCKS) + 2)
    params: Params = {"blocks": []}
    stats: Params = {"blocks": []}
    in_ch = cfg.in_channels
    for i, (mult, stride, bn) in enumerate(_BLOCKS):
        out_ch = cfg.base_channels * mult
        use_bn = bn and cfg.use_bn
        block = {
            "w": finit.kaiming_normal(
                keys[i], (3, 3, in_ch, out_ch), mode="fan_in", nonlinearity="leaky_relu", a=0.2
            ),
        }
        if use_bn:
            block["gamma"] = jnp.ones((out_ch,))
            block["beta"] = jnp.zeros((out_ch,))
            stats["blocks"].append({
                "mean": jnp.zeros((out_ch,)),
                "var": jnp.ones((out_ch,)),
            })
        else:
            block["b"] = jnp.zeros((out_ch,))
            stats["blocks"].append({})
        params["blocks"].append(block)
        in_ch = out_ch

    if cfg.input_size % 32:
        # the conv stack downsamples by ceil(s/2) five times, so any
        # non-multiple of 32 makes the flatten size disagree with this
        # floor division and apply() dies in a dense shape mismatch (the
        # reference has the same latent constraint, undocumented)
        raise ValueError(
            f"Discriminator input_size must be a multiple of 32, got "
            f"{cfg.input_size}")
    feat = cfg.input_size // 32
    flat = cfg.base_channels * 8 * feat * feat
    params["fc1_w"] = finit.kaiming_normal(keys[-2], (flat, 1024), mode="fan_in", nonlinearity="leaky_relu", a=0.2)
    params["fc1_b"] = jnp.zeros((1024,))
    params["fc2_w"] = finit.kaiming_normal(keys[-1], (1024, 1), mode="fan_in", nonlinearity="leaky_relu", a=0.2)
    params["fc2_b"] = jnp.zeros((1,))
    return params, stats


def _batch_norm(x, gamma, beta, stat, train: bool):
    """Torch-semantics BatchNorm2d over NHWC (stats per channel)."""
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))  # biased, used for normalization
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_stat = {
            "mean": (1 - BN_MOMENTUM) * stat["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stat["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stat["mean"], stat["var"]
        new_stat = stat
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    return y, new_stat


def apply(
    params: Params,
    batch_stats: Params,
    x: jax.Array,
    cfg: DiscriminatorConfig = DiscriminatorConfig(),
    train: bool = True,
    dtype=None,
) -> Tuple[jax.Array, Params]:
    """x: NHWC image. Returns (logits [N, 1], updated batch_stats).

    `dtype` is the compute policy for the conv/dense stack (bf16 under
    mixed precision); batch-norm statistics and the returned logits stay
    f32 regardless (BN variance math cancels below f32, and the GAN loss
    reduces in f32)."""
    new_stats = {"blocks": []}
    h = x.astype(dtype) if dtype is not None else x
    for block, stat, (mult, stride, bn) in zip(params["blocks"], batch_stats["blocks"], _BLOCKS):
        use_bn = "gamma" in block
        h = conv2d(h, block["w"], block.get("b"), stride=stride, padding=1)
        if use_bn:
            hf = h.astype(jnp.float32)
            hf, ns = _batch_norm(hf, block["gamma"], block["beta"], stat, train)
            h = hf.astype(h.dtype)
            new_stats["blocks"].append(ns)
        else:
            new_stats["blocks"].append({})
        h = leaky_relu(h, 0.2)

    # NCHW flatten ordering for torch classifier-weight compatibility.
    n = h.shape[0]
    h = h.transpose(0, 3, 1, 2).reshape(n, -1)
    h = leaky_relu(dense(h, params["fc1_w"], params["fc1_b"]), 0.2)
    out = dense(h, params["fc2_w"], params["fc2_b"])
    if cfg.use_sigmoid:
        out = jax.nn.sigmoid(out)
    return out.astype(jnp.float32), new_stats


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def get_model_info(params: Params) -> dict:
    total = param_count(params)
    return {
        "name": "VGGStyleDiscriminator",
        "total_params": total,
        "trainable_params": total,
        "size_mb": total * 4 / (1024 ** 2),
    }


def create_discriminator(
    input_size: int = 256,
    base_channels: int = 64,
    use_bn: bool = True,
    seed: int = 0,
    **kwargs,
) -> Tuple[DiscriminatorConfig, Params, Params]:
    """Factory matching reference `create_discriminator` (discriminator.py:196-219)."""
    fields = DiscriminatorConfig.__dataclass_fields__
    unknown = set(kwargs) - set(fields)
    if unknown:
        # silently dropped kwargs would change GAN semantics without a trace
        raise TypeError(f"create_discriminator got unknown argument(s) "
                        f"{sorted(unknown)} (valid: {sorted(fields)})")
    base = dict(in_channels=3, base_channels=base_channels,
                input_size=input_size, use_bn=use_bn, use_sigmoid=False)
    base.update(kwargs)
    cfg = DiscriminatorConfig(**base)
    params, stats = init(jax.random.PRNGKey(seed), cfg)
    return cfg, params, stats
