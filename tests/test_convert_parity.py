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


# -- converter hardening: full-size layouts, naming variants, CLI path --------
# (VERDICT r1 #4: these run unattended the day real .pth files appear)

_VGG19_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 256,
                   512, 512, 512, 512, 512, 512, 512, 512]
_VGG19_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def _make_vgg19_sd(prefix="features.", seed=7, scale=0.02):
    rng = np.random.default_rng(seed)
    sd, cin = {}, 3
    for idx, cout in zip(_VGG19_IDX, _VGG19_CHANNELS):
        sd[f"{prefix}{idx}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)) * scale).astype(np.float32)
        sd[f"{prefix}{idx}.bias"] = (
            rng.standard_normal(cout) * scale).astype(np.float32)
        cin = cout
    return sd


def test_vgg19_full_16conv_both_prefixes():
    sd_pref = _make_vgg19_sd("features.")
    sd_bare = {k.removeprefix("features."): v for k, v in sd_pref.items()}
    convs_pref = convert_vgg19_state_dict(sd_pref)
    convs_bare = convert_vgg19_state_dict(sd_bare)
    assert len(convs_pref) == len(convs_bare) == 16
    for a, b, cout in zip(convs_pref, convs_bare, _VGG19_CHANNELS):
        np.testing.assert_array_equal(a["w"], b["w"])
        assert a["w"].shape[-1] == cout

    # deepest-layer parity vs a torch functional VGG19 oracle
    x = np.random.default_rng(8).random((1, 32, 32, 3), dtype=np.float32)
    deepest = vgg_lib.LAYER_MAP["relu5_4"]  # post-relu capture == oracle below
    feats = vgg_lib.extract_features(
        jax.tree.map(jnp.asarray, convs_pref), jnp.asarray(x), [deepest],
        normalize=False)

    h = torch.from_numpy(x.transpose(0, 3, 1, 2))
    conv_i = 0
    for idx in range(_VGG19_IDX[-1] + 1):
        if idx in _VGG19_IDX:
            h = F.relu(F.conv2d(h, torch.from_numpy(sd_pref[f"features.{idx}.weight"]),
                                torch.from_numpy(sd_pref[f"features.{idx}.bias"]),
                                padding=1))
            conv_i += 1
        elif idx in (4, 9, 18, 27):  # torchvision vgg19 MaxPool positions
            h = F.max_pool2d(h, 2, 2)
    np.testing.assert_allclose(np.asarray(feats[deepest]).transpose(0, 3, 1, 2),
                               h.numpy(), atol=1e-5, rtol=1e-3)


def _make_alexnet_sd(seed=9):
    rng = np.random.default_rng(seed)
    specs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    sd = {}
    for idx, (co, ci, k) in zip([0, 3, 6, 8, 10], specs):
        sd[f"features.{idx}.weight"] = (
            rng.standard_normal((co, ci, k, k)) * 0.05).astype(np.float32)
        sd[f"features.{idx}.bias"] = (rng.standard_normal(co) * 0.05).astype(np.float32)
    return sd


def test_lpips_conversion_naming_variants_and_oracle_parity():
    from facesr.ckpt.convert import convert_lpips_weights
    from facesr.models.lpips import lpips_distance, _SHIFT, _SCALE

    alex_sd = _make_alexnet_sd()
    rng = np.random.default_rng(10)
    lin_chans = [64, 192, 384, 256, 256]
    lin_ws = [rng.random((1, c, 1, 1)).astype(np.float32) * 0.1 for c in lin_chans]

    sd_a = {f"lin{i}.model.1.weight": w for i, w in enumerate(lin_ws)}
    sd_b = {f"lins.{i}.model.1.weight": w for i, w in enumerate(lin_ws)}
    wa = convert_lpips_weights(alex_sd, sd_a)
    wb = convert_lpips_weights(alex_sd, sd_b)
    for la, lb, c in zip(wa["lins"], wb["lins"], lin_chans):
        assert la["w"].shape == (c, 1)  # [1,C,1,1] -> [C,1]
        np.testing.assert_array_equal(la["w"], lb["w"])

    # end-to-end LPIPS parity vs a torch functional oracle (lpips-pkg math)
    x0 = rng.random((2, 64, 64, 3), dtype=np.float32) * 2 - 1
    x1 = rng.random((2, 64, 64, 3), dtype=np.float32) * 2 - 1
    got = float(lpips_distance(jax.tree.map(jnp.asarray, wa),
                               jnp.asarray(x0), jnp.asarray(x1)))

    shift = torch.tensor(_SHIFT)[None, :, None, None]
    scale = torch.tensor(_SCALE)[None, :, None, None]

    def alex_feats(x):
        h = (x - shift) / scale
        out = []
        for i, (idx, stride, pad) in enumerate(
                [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]):
            h = F.relu(F.conv2d(h, torch.from_numpy(alex_sd[f"features.{idx}.weight"]),
                                torch.from_numpy(alex_sd[f"features.{idx}.bias"]),
                                stride=stride, padding=pad))
            out.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, 2)
        return out

    t0 = torch.from_numpy(x0.transpose(0, 3, 1, 2))
    t1 = torch.from_numpy(x1.transpose(0, 3, 1, 2))
    total = 0.0
    for a, b, w in zip(alex_feats(t0), alex_feats(t1), lin_ws):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        val = F.conv2d((na - nb) ** 2, torch.from_numpy(w))
        total += float(val.mean(dim=(2, 3)).mean())
    assert abs(got - total) < 1e-4, (got, total)


def _torch_rrdbnet_forward(sd, x, n_blocks):
    conv = lambda h, name, **kw: F.conv2d(h, sd[f"{name}.weight"],
                                          sd[f"{name}.bias"], padding=1, **kw)
    lrelu = lambda h: F.leaky_relu(h, 0.2)

    def rdb(pre, h):
        x1 = lrelu(conv(h, f"{pre}.conv1"))
        x2 = lrelu(conv(torch.cat([h, x1], 1), f"{pre}.conv2"))
        x3 = lrelu(conv(torch.cat([h, x1, x2], 1), f"{pre}.conv3"))
        x4 = lrelu(conv(torch.cat([h, x1, x2, x3], 1), f"{pre}.conv4"))
        x5 = conv(torch.cat([h, x1, x2, x3, x4], 1), f"{pre}.conv5")
        return h + 0.2 * x5

    with torch.no_grad():
        feat = conv(x, "conv_first")
        body = feat
        for i in range(n_blocks):
            h = rdb(f"body.{i}.rdb1", body)
            h = rdb(f"body.{i}.rdb2", h)
            h = rdb(f"body.{i}.rdb3", h)
            body = body + 0.2 * h
        feat = feat + conv(body, "conv_body")
        feat = lrelu(conv(F.interpolate(feat, scale_factor=2, mode="nearest"), "conv_up1"))
        feat = lrelu(conv(F.interpolate(feat, scale_factor=2, mode="nearest"), "conv_up2"))
        return conv(lrelu(conv(feat, "conv_hr")), "conv_last")


def _tiny_rrdbnet_sd(seed=11, nf=8, gc=4, n_blocks=2):
    rng = np.random.default_rng(seed)
    t = lambda *s: torch.from_numpy((rng.standard_normal(s) * 0.05).astype(np.float32))
    sd = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr"):
        cin = 3 if name == "conv_first" else nf
        sd[f"{name}.weight"] = t(nf, cin, 3, 3)
        sd[f"{name}.bias"] = t(nf)
    sd["conv_last.weight"] = t(3, nf, 3, 3)
    sd["conv_last.bias"] = t(3)
    chans = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    outs = [gc, gc, gc, gc, nf]
    for i in range(n_blocks):
        for j in (1, 2, 3):
            for c in range(5):
                sd[f"body.{i}.rdb{j}.conv{c + 1}.weight"] = t(outs[c], chans[c], 3, 3)
                sd[f"body.{i}.rdb{j}.conv{c + 1}.bias"] = t(outs[c])
    return sd


def test_rrdbnet_params_ema_cli_roundtrip_and_parity(tmp_path):
    """torch.save params_ema container -> convert_pth CLI -> ESRGANBaseline
    (config inferred from shapes) -> elementwise parity vs a torch oracle."""
    from facesr.ckpt.convert import convert_pth

    nf, gc, n_blocks = 8, 4, 2
    sd = _tiny_rrdbnet_sd(11, nf, gc, n_blocks)

    pth = str(tmp_path / "realesrgan.pth")
    torch.save({"params_ema": sd}, pth)
    out = str(tmp_path / "esrgan.fckpt")
    convert_pth(pth, out, kind="rrdbnet")

    baseline = esr.ESRGANBaseline(weights_path=out)
    assert baseline.pretrained
    assert baseline.config.num_feat == nf
    assert baseline.config.num_blocks == n_blocks
    assert baseline.config.num_grow_ch == gc

    x = np.random.default_rng(12).random((1, 8, 8, 3), dtype=np.float32)
    want = _torch_rrdbnet_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                  n_blocks).numpy()
    got = np.asarray(baseline(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, np.clip(want, 0, 1), atol=2e-5, rtol=1e-4)


def test_esrgan_baseline_weight_resolution_chain(tmp_path):
    """Reference-parity self-provisioning (esrgan.py:165-191): a local
    official .pth in weights_dir is converted once to a cached native
    checkpoint; later constructions reuse the cache untouched."""
    d = tmp_path / "pretrained"
    d.mkdir()
    torch.save({"params_ema": _tiny_rrdbnet_sd(21)}, d / "RealESRGAN_x4plus.pth")

    b = esr.ESRGANBaseline(weights_dir=str(d), download=False)
    fckpt = d / "RealESRGAN_x4plus.fckpt"
    assert b.pretrained and fckpt.exists()
    assert b.config.num_feat == 8 and b.config.num_blocks == 2

    mtime = fckpt.stat().st_mtime_ns
    b2 = esr.ESRGANBaseline(weights_dir=str(d), download=False)
    assert b2.pretrained
    assert fckpt.stat().st_mtime_ns == mtime  # cached, not reconverted
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(b.params)[0]),
        np.asarray(jax.tree.leaves(b2.params)[0]))

    path = esr.resolve_pretrained_weights("RealESRGAN_x4plus",
                                          str(tmp_path / "empty"),
                                          download=False)
    assert path is None  # nothing local, no download -> random-init fallback


def test_custom_cli_roundtrip_from_trainer_container(tmp_path):
    """A reference trainer checkpoint (model_state_dict container) through
    the convert_pth CLI -> FaceEnhanceNet.from_pretrained, parity-checked."""
    from facesr.ckpt.convert import convert_pth

    sd = make_state_dict(C=16, G=2, B=2, seed=13)
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model_state_dict": sd, "epoch": 7}, pth)
    out = str(tmp_path / "best_model.fckpt")
    convert_pth(pth, out, kind="custom")

    model = fen.FaceEnhanceNet.from_pretrained(out)
    assert model.config.num_channels == 16
    assert model.config.num_groups == 2
    x = np.random.default_rng(14).random((1, 16, 16, 3), dtype=np.float32)
    want = torch_oracle_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_converter_strictness_and_weight_gates(tmp_path, monkeypatch):
    """Review fixes: unrecognized layouts raise instead of silently
    truncating; an explicitly-set weights env var pointing nowhere raises;
    converted VGG19 weights round-trip through load_vgg19_weights."""
    import pytest
    from facesr.ckpt import convert as cv
    from facesr.ckpt.checkpoint import save_checkpoint

    rng = np.random.default_rng(0)

    # gapped VGG layout (DataParallel-ish) raises
    sd = {"features.0.weight": rng.standard_normal((64, 3, 3, 3)).astype(np.float32),
          "features.0.bias": np.zeros(64, np.float32),
          # gap: features.2 missing, deeper conv present
          "features.5.weight": rng.standard_normal((128, 64, 3, 3)).astype(np.float32),
          "features.5.bias": np.zeros(128, np.float32)}
    with pytest.raises(ValueError, match="unrecognized layout"):
        cv.convert_vgg19_state_dict(sd)
    with pytest.raises(ValueError, match="unrecognized layout"):
        cv.convert_vgg19_state_dict({"module.features.0.weight": sd["features.0.weight"]})

    # unrecognized FaceEnhanceNet layout raises with the key shape
    with pytest.raises(ValueError, match="Unrecognized FaceEnhanceNet"):
        cv.convert_face_enhance_net_state_dict(
            {"module.conv_first.weight": rng.standard_normal((16, 3, 3, 3))})

    # explicit-but-missing weights env var raises (no silent fallback)
    from facesr.models import lpips as lp

    monkeypatch.setenv(lp.ENV_WEIGHTS, str(tmp_path / "nope.fckpt"))
    with pytest.raises(FileNotFoundError, match="does not exist"):
        lp.default_weights_path()

    # converted VGG19 list round-trips through the env-gated loader
    from facesr.models import vgg as vgg_lib

    full = {}
    chans = [3, 64, 64, 128, 128]
    for i, idx in enumerate([0, 2, 5, 7]):
        full[f"features.{idx}.weight"] = rng.standard_normal(
            (chans[i + 1], chans[i], 3, 3)).astype(np.float32)
        full[f"features.{idx}.bias"] = np.zeros(chans[i + 1], np.float32)
    convs = cv.convert_vgg19_state_dict(full)
    out = tmp_path / "vgg19.fckpt"
    save_checkpoint(str(out), {"convs": convs}, {"kind": "vgg19"})
    monkeypatch.setenv(vgg_lib.ENV_WEIGHTS, str(out))
    loaded = vgg_lib.load_vgg19_weights()
    assert isinstance(loaded, list) and len(loaded) == 4
    np.testing.assert_array_equal(np.asarray(loaded[2]["w"]),
                                  convs[2]["w"])

    # perceptual init auto-consumes the gated weights (conv2_2 needs 4)
    from facesr.losses.perceptual import init_perceptual

    params = init_perceptual(jax.random.PRNGKey(0), layers=["conv2_2"])
    np.testing.assert_array_equal(np.asarray(params[0]["w"]), convs[0]["w"])
    # and raises when the conversion is too shallow for the request
    with pytest.raises(ValueError, match="corrupt/truncated"):
        init_perceptual(jax.random.PRNGKey(0), layers=["conv4_4"])

    # RRDBNet: non-4x scale is rejected loudly, shared configs not mutated
    from facesr.models.esrgan import RRDBNet, RRDBNetConfig

    with pytest.raises(ValueError, match="scale=4 only"):
        RRDBNet(RRDBNetConfig(scale=2, num_blocks=1))
    shared = RRDBNetConfig(num_blocks=1, num_feat=16, num_grow_ch=8)
    RRDBNet(shared, num_feat=8)
    assert shared.num_feat == 16  # caller's config untouched


# -- transfer model (ESRGAN backbone + face head) ----------------------------

def make_transfer_state_dict(nf=8, gc=4, n_body=6, n_head=2, seed=21):
    """Random TransferSRModel state dict with the reference's key names
    (reference src/models/transfer.py:45-154)."""
    rng = np.random.default_rng(seed)
    t = lambda *s: torch.from_numpy((rng.standard_normal(s) * 0.05).astype(np.float32))
    sd = {}
    sd["backbone.conv_first.weight"] = t(nf, 3, 3, 3)
    sd["backbone.conv_first.bias"] = t(nf)
    chans = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    outs = [gc, gc, gc, gc, nf]
    for i in range(n_body):
        for j in (1, 2, 3):
            for c in range(5):
                sd[f"backbone.body.{i}.rdb{j}.conv{c + 1}.weight"] = t(outs[c], chans[c], 3, 3)
                sd[f"backbone.body.{i}.rdb{j}.conv{c + 1}.bias"] = t(outs[c])
    sd["backbone.conv_body.weight"] = t(nf, nf, 3, 3)
    sd["backbone.conv_body.bias"] = t(nf)
    cr = max(nf // 4, 8)
    for b in range(n_head):
        pre = f"face_head.rcab_blocks.{b}"
        sd[f"{pre}.conv1.weight"] = t(nf, nf, 3, 3)
        sd[f"{pre}.conv1.bias"] = t(nf)
        sd[f"{pre}.prelu.weight"] = torch.full((nf,), 0.25) + t(nf) * 0.1
        sd[f"{pre}.conv2.weight"] = t(nf, nf, 3, 3)
        sd[f"{pre}.conv2.bias"] = t(nf)
        sd[f"{pre}.channel_attention.fc.0.weight"] = t(cr, nf)
        sd[f"{pre}.channel_attention.fc.2.weight"] = t(nf, cr)
    sd["face_head.conv_after.weight"] = t(nf, nf, 3, 3)
    sd["face_head.conv_after.bias"] = t(nf)
    for s in range(2):
        sd[f"face_head.upsample.stages.{s}.conv.weight"] = t(nf * 4, nf, 3, 3)
        sd[f"face_head.upsample.stages.{s}.conv.bias"] = t(nf * 4)
        sd[f"face_head.upsample.stages.{s}.prelu.weight"] = torch.full((nf,), 0.25)
    sd["face_head.conv_last.weight"] = t(3, nf, 3, 3)
    sd["face_head.conv_last.bias"] = t(3)
    return sd


def torch_transfer_forward(sd, x, n_body=6, n_head=2):
    """TransferSRModel forward per the reference semantics
    (transfer.py:246-269 + FaceSpecificHead:79-91)."""
    conv = lambda h, name: F.conv2d(h, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)
    lrelu = lambda h: F.leaky_relu(h, 0.2)

    def rdb(pre, h):
        x1 = lrelu(conv(h, f"{pre}.conv1"))
        x2 = lrelu(conv(torch.cat([h, x1], 1), f"{pre}.conv2"))
        x3 = lrelu(conv(torch.cat([h, x1, x2], 1), f"{pre}.conv3"))
        x4 = lrelu(conv(torch.cat([h, x1, x2, x3], 1), f"{pre}.conv4"))
        x5 = conv(torch.cat([h, x1, x2, x3, x4], 1), f"{pre}.conv5")
        return h + 0.2 * x5

    with torch.no_grad():
        feat = conv(x, "backbone.conv_first")
        body = feat
        for i in range(n_body):
            h = rdb(f"backbone.body.{i}.rdb1", body)
            h = rdb(f"backbone.body.{i}.rdb2", h)
            h = rdb(f"backbone.body.{i}.rdb3", h)
            body = body + 0.2 * h
        feat = feat + conv(body, "backbone.conv_body")
        # face head
        residual = feat
        h = feat
        for b in range(n_head):
            pre = f"face_head.rcab_blocks.{b}"
            o = conv(h, f"{pre}.conv1")
            o = F.prelu(o, sd[f"{pre}.prelu.weight"])
            o = conv(o, f"{pre}.conv2")
            y = o.mean(dim=(2, 3))
            y = F.relu(y @ sd[f"{pre}.channel_attention.fc.0.weight"].T)
            y = torch.sigmoid(y @ sd[f"{pre}.channel_attention.fc.2.weight"].T)
            o = o * y[:, :, None, None]
            h = h + o * 0.2
        h = conv(h, "face_head.conv_after") + residual
        for s in range(2):
            h = conv(h, f"face_head.upsample.stages.{s}.conv")
            h = F.pixel_shuffle(h, 2)
            h = F.prelu(h, sd[f"face_head.upsample.stages.{s}.prelu.weight"])
        return conv(h, "face_head.conv_last")


def test_transfer_conversion_parity(tmp_path):
    """Reference TransferSRModel .pth -> convert_pth CLI -> facesr transfer
    forward, elementwise-checked against the torch-functional oracle.
    Closes the converter gap for the published 26.97 dB transfer row."""
    from facesr.ckpt.convert import convert_pth
    from facesr.models.load import load_any_model

    n_body, n_head = 6, 2  # body_main 2 + body_tail 4 (STAGE2 split)
    sd = make_transfer_state_dict(n_body=n_body, n_head=n_head)
    pth = str(tmp_path / "transfer_model.pth")
    torch.save({"model_state_dict": sd}, pth)
    out = str(tmp_path / "transfer.fckpt")
    convert_pth(pth, out, kind="transfer")

    model = load_any_model(out)
    assert model.config.backbone_blocks == n_body
    assert model.config.head_blocks == n_head
    assert model.config.head_channels == 8

    x = np.random.default_rng(22).random((2, 8, 8, 3), dtype=np.float32)
    want = torch_transfer_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                  n_body=n_body, n_head=n_head).numpy()
    got = np.asarray(model(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_transfer_conversion_small_body_main_none():
    """n_body <= STAGE2_UNFREEZE_BLOCKS: body_main is None (everything is
    'tail'); the converter must mirror facesr.models.transfer.init."""
    from facesr.ckpt import convert as cv

    sd = make_transfer_state_dict(n_body=2, n_head=1, seed=23)
    params = cv.convert_transfer_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    assert params["backbone"]["body_main"] is None
    assert params["backbone"]["body_tail"]["rdb1"]["conv1_w"].shape[0] == 2
    cfg = cv.infer_transfer_config(params)
    assert cfg.backbone_blocks == 2 and cfg.head_blocks == 1

    from facesr.models import transfer as tr

    x = np.random.default_rng(24).random((1, 8, 8, 3), dtype=np.float32)
    want = torch_transfer_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                  n_body=2, n_head=1).numpy()
    got = np.asarray(tr.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x),
                              cfg)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# -- download branch (loopback HTTP; reference esrgan.py:165-191) ------------

class _WeightServer:
    """Tiny loopback HTTP server with switchable failure modes, so the
    download branch of resolve_pretrained_weights (urlopen -> per-pid .part
    -> sha256 gate -> atomic rename -> convert) is exercised without egress."""

    def __init__(self, payload: bytes):
        import http.server
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if server.mode == "ok":
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(server.payload)))
                    self.end_headers()
                    self.wfile.write(server.payload)
                elif server.mode == "truncate":
                    # advertise the full length, deliver half: the client's
                    # read-to-EOF must raise IncompleteRead
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(server.payload)))
                    self.end_headers()
                    self.wfile.write(server.payload[: len(server.payload) // 2])
                    self.wfile.flush()
                    self.connection.close()
                elif server.mode == "html":
                    body = b"<html>captive portal says hi</html>"
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            def log_message(self, *a):  # keep pytest output clean
                pass

        self.payload = payload
        self.mode = "ok"
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def url(self, filename: str) -> str:
        return f"http://127.0.0.1:{self.port}/{filename}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def weight_server(tmp_path):
    import io

    buf = io.BytesIO()
    torch.save({"params_ema": _tiny_rrdbnet_sd(31)}, buf)
    server = _WeightServer(buf.getvalue())
    yield server
    server.close()


def test_download_branch_success(tmp_path, weight_server, monkeypatch):
    """Happy path: download -> atomic rename -> convert -> pretrained=True,
    with no .part litter and a reusable cached .fckpt."""
    monkeypatch.setattr(
        esr, "WEIGHT_URLS",
        {"RealESRGAN_x4plus": weight_server.url("RealESRGAN_x4plus.pth")})
    d = tmp_path / "pretrained"

    b = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert b.pretrained
    assert b.config.num_feat == 8 and b.config.num_blocks == 2
    assert (d / "RealESRGAN_x4plus.pth").exists()
    assert (d / "RealESRGAN_x4plus.fckpt").exists()
    assert not list(d.glob("*.part*"))

    # second construction must hit the cache, not the network
    weight_server.mode = "truncate"
    b2 = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert b2.pretrained


def test_download_branch_truncated_then_recovers(tmp_path, weight_server,
                                                 monkeypatch, capsys):
    """A truncated transfer cleans up its .part, warns, degrades to random
    init — and a later successful download recovers."""
    monkeypatch.setattr(
        esr, "WEIGHT_URLS",
        {"RealESRGAN_x4plus": weight_server.url("RealESRGAN_x4plus.pth")})
    d = tmp_path / "pretrained"
    weight_server.mode = "truncate"

    b = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert not b.pretrained
    assert not (d / "RealESRGAN_x4plus.pth").exists()
    assert not list(d.glob("*.part*"))
    assert "could not download" in capsys.readouterr().out

    weight_server.mode = "ok"
    b2 = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert b2.pretrained


def test_download_branch_bad_content_quarantined(tmp_path, weight_server,
                                                 monkeypatch, capsys):
    """An HTTP-200 error page renamed into place must NOT permanently break
    construction (ADVICE r4 medium): conversion failure quarantines the .pth
    and every later construction still degrades cleanly, then recovers."""
    monkeypatch.setattr(
        esr, "WEIGHT_URLS",
        {"RealESRGAN_x4plus": weight_server.url("RealESRGAN_x4plus.pth")})
    d = tmp_path / "pretrained"
    weight_server.mode = "html"

    b = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert not b.pretrained
    assert (d / "RealESRGAN_x4plus.pth.bad").exists()
    assert not (d / "RealESRGAN_x4plus.pth").exists()
    assert "not a loadable" in capsys.readouterr().out

    # repeat construction: no crash, still degrades (re-downloads the bad
    # page, re-quarantines)
    b2 = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert not b2.pretrained

    weight_server.mode = "ok"
    b3 = esr.ESRGANBaseline(weights_dir=str(d), download=True)
    assert b3.pretrained


def test_download_branch_sha256_gate(tmp_path, weight_server, monkeypatch):
    """URLs embedding a torch-hub content hash are verified: a mismatch is
    rejected (no .pth lands), a match passes."""
    import hashlib

    d = tmp_path / "pretrained"
    monkeypatch.setattr(
        esr, "WEIGHT_URLS",
        {"ESRGAN_x4": weight_server.url("official-00000000.pth")})
    assert esr.resolve_pretrained_weights("ESRGAN_x4", str(d)) is None
    assert not (d / "ESRGAN_x4.pth").exists()
    assert not list(d.glob("*.part*"))

    good = hashlib.sha256(weight_server.payload).hexdigest()[:8]
    monkeypatch.setattr(
        esr, "WEIGHT_URLS",
        {"ESRGAN_x4": weight_server.url(f"official-{good}.pth")})
    path = esr.resolve_pretrained_weights("ESRGAN_x4", str(d))
    assert path is not None and path.endswith("ESRGAN_x4.fckpt")
