"""End-to-end numeric parity: a PyTorch-format FaceEnhanceNet state dict run
through (a) a torch-functional oracle of the reference architecture and
(b) facesr's converter + JAX forward must agree elementwise.

This is SURVEY.md §7 build-plan step 2: the smallest demonstrable proof
that a user's published .pth checkpoints produce bit-comparable SR outputs
on the TPU stack. The oracle below is built from torch functional ops in
this test (not reference code) and consumes the reference's state-dict
naming scheme.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from facesr.ckpt.convert import (
    convert_face_enhance_net_state_dict,
    convert_vgg19_state_dict,
    convert_rrdbnet_state_dict,
)
from facesr.models import face_enhance_net as fen
from facesr.models import vgg as vgg_lib
from facesr.models import esrgan as esr


# -- synthetic reference-format state dict ----------------------------------

def make_state_dict(C=16, G=2, B=2, reduction=4, seed=0):
    """Random FaceEnhanceNet state dict with the reference's key names."""
    rng = np.random.default_rng(seed)
    t = lambda *s: torch.from_numpy((rng.standard_normal(s) * 0.05).astype(np.float32))
    sd = {}
    sd["conv_first.weight"] = t(C, 3, 3, 3)
    sd["conv_first.bias"] = t(C)
    cr = max(C // reduction, 8)
    for g in range(G):
        for b in range(B):
            pre = f"residual_groups.{g}.blocks.{b}"
            sd[f"{pre}.conv1.weight"] = t(C, C, 3, 3)
            sd[f"{pre}.conv1.bias"] = t(C)
            sd[f"{pre}.prelu.weight"] = torch.full((C,), 0.25) + t(C) * 0.1
            sd[f"{pre}.conv2.weight"] = t(C, C, 3, 3)
            sd[f"{pre}.conv2.bias"] = t(C)
            sd[f"{pre}.channel_attention.fc.0.weight"] = t(cr, C)
            sd[f"{pre}.channel_attention.fc.2.weight"] = t(C, cr)
        sd[f"residual_groups.{g}.conv.weight"] = t(C, C, 3, 3)
        sd[f"residual_groups.{g}.conv.bias"] = t(C)
    sd["conv_after_body.weight"] = t(C, C, 3, 3)
    sd["conv_after_body.bias"] = t(C)
    for s in range(2):
        sd[f"upsample.stages.{s}.conv.weight"] = t(C * 4, C, 3, 3)
        sd[f"upsample.stages.{s}.conv.bias"] = t(C * 4)
        sd[f"upsample.stages.{s}.prelu.weight"] = torch.full((C,), 0.25)
    sd["conv_last.weight"] = t(3, C, 3, 3)
    sd["conv_last.bias"] = t(3)
    return sd


# -- torch-functional oracle of the reference forward ------------------------

def torch_oracle_forward(sd, x, G=2, B=2, res_scale=0.2, training=False):
    """FaceEnhanceNet forward per the reference semantics, written directly
    against the state dict with torch functional ops."""
    conv = lambda h, name: F.conv2d(h, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)

    skip = F.interpolate(x, scale_factor=4, mode="bicubic", align_corners=False)
    feat = conv(x, "conv_first")
    residual = feat
    for g in range(G):
        gres = feat
        for b in range(B):
            pre = f"residual_groups.{g}.blocks.{b}"
            h = conv(feat, f"{pre}.conv1")
            h = F.prelu(h, sd[f"{pre}.prelu.weight"])
            h = conv(h, f"{pre}.conv2")
            # SE channel attention
            y = h.mean(dim=(2, 3))
            y = F.relu(y @ sd[f"{pre}.channel_attention.fc.0.weight"].T)
            y = torch.sigmoid(y @ sd[f"{pre}.channel_attention.fc.2.weight"].T)
            h = h * y[:, :, None, None]
            feat = feat + h * res_scale
        feat = conv(feat, f"residual_groups.{g}.conv") + gres
    feat = conv(feat, "conv_after_body") + residual
    for s in range(2):
        feat = conv(feat, f"upsample.stages.{s}.conv")
        feat = F.pixel_shuffle(feat, 2)
        feat = F.prelu(feat, sd[f"upsample.stages.{s}.prelu.weight"])
    out = conv(feat, "conv_last") + skip
    if not training:
        out = out.clamp(0, 1)
    return out


def test_face_enhance_net_full_parity():
    G, B, C = 2, 2, 16
    sd = make_state_dict(C=C, G=G, B=B)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    params = convert_face_enhance_net_state_dict(sd_np)
    cfg = fen.FaceEnhanceNetConfig(num_channels=C, num_groups=G, blocks_per_group=B)

    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 16, 3), dtype=np.float32)

    want = torch_oracle_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                G=G, B=B).numpy()
    got = fen.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x), cfg)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_face_enhance_net_parity_train_mode():
    # train mode: no clamping — parity must hold on raw residual outputs
    sd = make_state_dict(seed=3)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_face_enhance_net_state_dict(sd_np)
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    rng = np.random.default_rng(4)
    x = rng.random((1, 8, 8, 3), dtype=np.float32)
    want = torch_oracle_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                training=True).numpy()
    got = fen.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x), cfg, train=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-5, rtol=1e-4)


def test_vgg19_conversion_parity():
    # two conv layers + pool: torch functional oracle vs converted extractor
    rng = np.random.default_rng(5)
    sd = {
        "features.0.weight": (rng.standard_normal((8, 3, 3, 3)) * 0.1).astype(np.float32),
        "features.0.bias": rng.standard_normal(8).astype(np.float32) * 0.1,
        "features.2.weight": (rng.standard_normal((8, 8, 3, 3)) * 0.1).astype(np.float32),
        "features.2.bias": rng.standard_normal(8).astype(np.float32) * 0.1,
    }
    convs = convert_vgg19_state_dict(sd)
    assert len(convs) == 2

    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    feats = vgg_lib.extract_features(
        jax.tree.map(jnp.asarray, convs), jnp.asarray(x), [2], normalize=False
    )
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    h = F.conv2d(t, torch.from_numpy(sd["features.0.weight"]),
                 torch.from_numpy(sd["features.0.bias"]), padding=1)
    h = F.relu(h)
    h = F.conv2d(h, torch.from_numpy(sd["features.2.weight"]),
                 torch.from_numpy(sd["features.2.bias"]), padding=1)
    np.testing.assert_allclose(
        np.asarray(feats[2]).transpose(0, 3, 1, 2), h.numpy(), atol=1e-5, rtol=1e-4
    )


def test_rrdbnet_conversion_structure():
    rng = np.random.default_rng(6)
    nf, gc, n_blocks = 8, 4, 2
    sd = {}
    t = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr"):
        cin = 3 if name == "conv_first" else nf
        sd[f"{name}.weight"] = t(nf, cin, 3, 3)
        sd[f"{name}.bias"] = t(nf)
    sd["conv_last.weight"] = t(3, nf, 3, 3)
    sd["conv_last.bias"] = t(3)
    for i in range(n_blocks):
        for j in (1, 2, 3):
            chans = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
            outs = [gc, gc, gc, gc, nf]
            for c in range(5):
                sd[f"body.{i}.rdb{j}.conv{c + 1}.weight"] = t(outs[c], chans[c], 3, 3)
                sd[f"body.{i}.rdb{j}.conv{c + 1}.bias"] = t(outs[c])

    params = convert_rrdbnet_state_dict(sd)
    assert params["body"]["rdb1"]["conv1_w"].shape == (n_blocks, 3, 3, nf, gc)
    cfg = esr.RRDBNetConfig(num_feat=nf, num_blocks=n_blocks, num_grow_ch=gc)
    y = esr.apply(jax.tree.map(jnp.asarray, params), jnp.zeros((1, 8, 8, 3)), cfg)
    assert y.shape == (1, 32, 32, 3)
