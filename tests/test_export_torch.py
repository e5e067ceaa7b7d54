"""Reverse-converter gates: facesr checkpoints -> reference-format .pth.

Two independent directions of evidence per model family:
  1. Round-trip identity: a reference-format state dict converted to facesr
     layout and exported back is BIT-IDENTICAL (key set + values) — proves
     the export inverts convert.py exactly, including the reference key
     names (src/models/custom.py / transfer.py / RealESRGAN basicsr names).
  2. Oracle parity on JAX-born weights: a model initialized in THIS
     framework, exported, then run through the torch-functional oracle of
     the reference forward matches the JAX forward — proves a facesr-trained
     checkpoint is semantically loadable by the reference, not just
     structurally.
Plus the container contract: export_pth writes the reference trainer's
checkpoint shape ({'model_state_dict', 'config', 'epoch'}; reference
src/training/trainer.py:700-720) with 'config' inside the reference
dataclass's field set (custom.py:23-43), serving EMA weights by default.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from facesr.ckpt.convert import (convert_face_enhance_net_state_dict,
                                 convert_rrdbnet_state_dict,
                                 convert_transfer_state_dict)
from facesr.ckpt.export_torch import (REFERENCE_CUSTOM_CONFIG_FIELDS,
                                      export_face_enhance_net_state_dict,
                                      export_pth,
                                      export_rrdbnet_state_dict,
                                      export_transfer_state_dict)
# same-directory import: pytest's prepend import mode puts tests/ on
# sys.path when collecting this module (no tests/__init__.py by design)
from test_convert_parity import (make_state_dict,
                                 make_transfer_state_dict,
                                 torch_oracle_forward,
                                 torch_transfer_forward,
                                 _torch_rrdbnet_forward)


def _np_sd(sd):
    return {k: np.asarray(v) for k, v in sd.items()}


def _assert_sd_equal(got, want):
    assert set(got) == set(want), (
        f"key mismatch: extra={sorted(set(got) - set(want))[:5]} "
        f"missing={sorted(set(want) - set(got))[:5]}")
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]), err_msg=k)


def test_custom_roundtrip_bit_exact():
    sd = _np_sd(make_state_dict(C=16, G=2, B=3, seed=3))
    back = export_face_enhance_net_state_dict(
        convert_face_enhance_net_state_dict(sd))
    _assert_sd_equal(back, sd)


def test_transfer_roundtrip_bit_exact():
    sd = _np_sd(make_transfer_state_dict(nf=8, gc=4, n_body=4, n_head=2,
                                         seed=5))
    back = export_transfer_state_dict(convert_transfer_state_dict(sd))
    _assert_sd_equal(back, sd)


def test_rrdbnet_roundtrip_bit_exact():
    from facesr.models import esrgan

    cfg = esrgan.RRDBNetConfig(num_feat=8, num_blocks=2, num_grow_ch=4)
    params = esrgan.init(jax.random.PRNGKey(0), cfg)
    sd = export_rrdbnet_state_dict(params)
    back = convert_rrdbnet_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]),
            err_msg=jax.tree_util.keystr(path))


def test_jax_born_custom_export_matches_torch_oracle():
    """A facesr-initialized FaceEnhanceNet exported to .pth layout runs
    identically under the torch oracle of the reference forward."""
    from facesr.models import face_enhance_net as fen

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2,
                                   blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(1), cfg)
    # zero-init conv_last would reduce the check to the bicubic skip
    params["conv_last"]["w"] = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2),
                          params["conv_last"]["w"].shape) * 0.05)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_face_enhance_net_state_dict(params).items()}

    x = np.random.default_rng(0).random((2, 12, 12, 3), dtype=np.float32)
    want = torch_oracle_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), G=2, B=2
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(fen.apply(params, x, cfg, train=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_jax_born_rrdbnet_export_matches_torch_oracle():
    from facesr.models import esrgan

    cfg = esrgan.RRDBNetConfig(num_feat=8, num_blocks=2, num_grow_ch=4)
    params = esrgan.init(jax.random.PRNGKey(3), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_rrdbnet_state_dict(params).items()}
    x = np.random.default_rng(1).random((1, 8, 8, 3), dtype=np.float32)
    want = _torch_rrdbnet_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), n_blocks=2
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(esrgan.apply(params, x, cfg))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_jax_born_transfer_export_matches_torch_oracle():
    from facesr.models import transfer

    cfg = transfer.TransferModelConfig(backbone_blocks=4, head_blocks=2,
                                       head_channels=8)
    params = transfer.init(jax.random.PRNGKey(4), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_transfer_state_dict(params).items()}
    x = np.random.default_rng(2).random((1, 8, 8, 3), dtype=np.float32)
    want = torch_transfer_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), n_body=4, n_head=2
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(transfer.apply(params, x, cfg, train=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_export_pth_container_contract_and_ema(tmp_path):
    """export_pth: auto kind from metadata, EMA served by default, the
    reference trainer-checkpoint container, config inside the reference
    field set, and a full convert-back round trip to the EMA weights."""
    from facesr.ckpt.checkpoint import save_checkpoint
    from facesr.models import face_enhance_net as fen

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(5), cfg)
    ema = jax.tree.map(lambda a: np.asarray(a) + 0.25, params)
    from dataclasses import asdict

    fckpt = tmp_path / "trained.fckpt"
    save_checkpoint(str(fckpt), {"params": params, "ema_params": ema},
                    {"model_type": "custom", "model_config": asdict(cfg),
                     "epoch": 7, "step": 123, "best_metric": 31.5})

    out = tmp_path / "exported.pth"
    kind = export_pth(str(fckpt), str(out))
    assert kind == "custom"
    ckpt = torch.load(str(out), map_location="cpu", weights_only=False)
    assert set(ckpt) >= {"model_state_dict", "config", "epoch"}
    assert ckpt["epoch"] == 7 and ckpt["best_metric"] == 31.5
    # the reference constructor must accept the config verbatim
    # (FaceEnhanceNetConfig(**checkpoint['config']), custom.py:273-277)
    assert set(ckpt["config"]) <= set(REFERENCE_CUSTOM_CONFIG_FIELDS)
    assert "remat" not in ckpt["config"]
    assert ckpt["config"]["num_groups"] == 1

    # EMA by default: converting back must reproduce ema, not params
    back = convert_face_enhance_net_state_dict(
        {k: v.numpy() for k, v in ckpt["model_state_dict"].items()})
    np.testing.assert_array_equal(
        np.asarray(back["conv_first"]["w"]),
        np.asarray(ema["conv_first"]["w"]))

    # --no-ema equivalent exports the raw weights
    export_pth(str(fckpt), str(out), prefer_ema=False)
    ckpt2 = torch.load(str(out), map_location="cpu", weights_only=False)
    back2 = convert_face_enhance_net_state_dict(
        {k: v.numpy() for k, v in ckpt2["model_state_dict"].items()})
    np.testing.assert_array_equal(
        np.asarray(back2["conv_first"]["w"]),
        np.asarray(params["conv_first"]["w"]))


def test_export_pth_rrdbnet_params_container(tmp_path):
    """ESRGAN checkpoints export to the RealESRGAN {'params': ...} container
    the reference's _load_weights unwraps (esrgan.py:183-186)."""
    from facesr.ckpt.checkpoint import save_checkpoint
    from facesr.models import esrgan

    cfg = esrgan.RRDBNetConfig(num_feat=8, num_blocks=2, num_grow_ch=4)
    params = esrgan.init(jax.random.PRNGKey(6), cfg)
    fckpt = tmp_path / "rrdb.fckpt"
    from dataclasses import asdict

    save_checkpoint(str(fckpt), {"params": params},
                    {"model_type": "esrgan", "config": asdict(cfg)})
    out = tmp_path / "rrdb.pth"
    assert export_pth(str(fckpt), str(out)) == "esrgan"
    ckpt = torch.load(str(out), map_location="cpu", weights_only=False)
    assert set(ckpt) == {"params"}
    assert "body.0.rdb1.conv1.weight" in ckpt["params"]
    # and the forward converter ingests it unchanged (the params unwrap)
    from facesr.ckpt.convert import load_torch_state_dict

    sd = load_torch_state_dict(str(out))
    back = convert_rrdbnet_state_dict(sd)
    np.testing.assert_array_equal(np.asarray(back["conv_first"]["w"]),
                                  np.asarray(params["conv_first"]["w"]))


def test_export_pth_rejects_unsupported_kind(tmp_path):
    from facesr.ckpt.checkpoint import save_checkpoint

    fckpt = tmp_path / "vgg.fckpt"
    save_checkpoint(str(fckpt), {"convs": []}, {"model_type": "vgg19"})
    with pytest.raises(ValueError, match="Cannot export"):
        export_pth(str(fckpt), str(tmp_path / "x.pth"))
