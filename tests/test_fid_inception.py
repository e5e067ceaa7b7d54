"""FID backend tests: Fréchet math, InceptionV3 structure, and full forward
parity against an independent torch oracle transcribed from torchvision's
Inception3 (with pytorch-fid's pool quirks).

The oracle hardcodes torchvision's strides/paddings/branch order literally
(NOT read from facesr's CONV_SPECS table), so wiring mistakes in
facesr.models.inception cannot self-confirm.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facesr.evaluation.fid import (
    frechet_distance, fid_from_activations, inception_activations,
    fid_from_images,
)
from facesr.models import inception


def test_frechet_closed_form_diagonal():
    rng = np.random.default_rng(0)
    d = 8
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1 = np.diag(rng.uniform(0.5, 2.0, d))
    s2 = np.diag(rng.uniform(0.5, 2.0, d))
    expected = float(
        np.sum((mu1 - mu2) ** 2)
        + np.sum(np.diag(s1) + np.diag(s2) - 2 * np.sqrt(np.diag(s1) * np.diag(s2)))
    )
    assert abs(frechet_distance(mu1, s1, mu2, s2) - expected) < 1e-8


def test_fid_from_activations_gaussians():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4000, 4))
    shift = np.array([2.0, 0.0, 0.0, 0.0])
    b = rng.normal(size=(4000, 4)) + shift
    fid = fid_from_activations(a, b)
    # closed form for equal covariances: |shift|^2 = 4; sampling noise ~ O(0.1)
    assert abs(fid - 4.0) < 0.3
    assert fid_from_activations(a, a) < 1e-9


def test_fid_single_image_set_raises_actionably():
    """np.cov squeezes a (1, D) set to a scalar; without the guard the
    failure is an opaque eigh LinAlgError that never mentions N<2."""
    rng = np.random.default_rng(2)
    one = rng.normal(size=(1, 8))
    many = rng.normal(size=(16, 8))
    with pytest.raises(ValueError, match=">=2 images"):
        fid_from_activations(one, many)
    with pytest.raises(ValueError, match=">=2 images"):
        fid_from_activations(many, one)


def test_inception_activations_accepts_hwc1_grayscale():
    """(H, W, 1) single-channel images are expanded to 3 channels like the
    ndim==2 grayscale case, instead of crashing the conv stem."""
    weights = inception.init_random_inception(jax.random.PRNGKey(0))
    imgs = [np.zeros((32, 32, 1), np.uint8), np.zeros((32, 32), np.uint8),
            np.zeros((32, 32, 3), np.uint8)]
    acts = inception_activations(imgs, weights, batch_size=3)
    assert acts.shape == (3, 2048)
    np.testing.assert_allclose(acts[0], acts[1], rtol=1e-5, atol=1e-5)


def test_architecture_invariants():
    # InceptionV3's feature extractor has exactly 94 BasicConv2d modules.
    assert len(inception.CONV_SPECS) == 94
    assert inception.FEATURE_DIM == 2048
    # channel continuity through each block's concat
    outs = {"Mixed_5b": 256, "Mixed_5c": 288, "Mixed_5d": 288, "Mixed_6a": 768,
            "Mixed_6b": 768, "Mixed_6c": 768, "Mixed_6d": 768, "Mixed_6e": 768,
            "Mixed_7a": 1280, "Mixed_7b": 2048, "Mixed_7c": 2048}
    assert {n for _, n in inception.BLOCKS[1:]} == set(outs)


def _synthetic_state_dict(seed=0):
    """Random torch-layout state dict with stable activation magnitudes."""
    rng = np.random.default_rng(seed)
    sd = {}
    for name, (ic, oc, (kh, kw), _, _) in inception.CONV_SPECS.items():
        fan_in = kh * kw * ic
        sd[f"{name}.conv.weight"] = (
            rng.normal(size=(oc, ic, kh, kw)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, oc).astype(np.float32)
        sd[f"{name}.bn.bias"] = (rng.normal(size=oc) * 0.1).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = (rng.normal(size=oc) * 0.1).astype(np.float32)
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, oc).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# Independent torch oracle (torchvision Inception3 semantics, FID variant)
# ---------------------------------------------------------------------------

def _torch_fid_inception_forward(sd, x_nchw):
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def bc(name, x, stride=1, padding=0):
        x = F.conv2d(x, t[f"{name}.conv.weight"], stride=stride, padding=padding)
        x = F.batch_norm(x, t[f"{name}.bn.running_mean"], t[f"{name}.bn.running_var"],
                         t[f"{name}.bn.weight"], t[f"{name}.bn.bias"],
                         training=False, eps=1e-3)
        return F.relu(x)

    def avgp(x):  # pytorch-fid FIDInception* pool branch
        return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                            count_include_pad=False)

    def block_a(n, x):
        b1 = bc(f"{n}.branch1x1", x)
        b5 = bc(f"{n}.branch5x5_2", bc(f"{n}.branch5x5_1", x), padding=2)
        b3 = bc(f"{n}.branch3x3dbl_3",
                bc(f"{n}.branch3x3dbl_2", bc(f"{n}.branch3x3dbl_1", x), padding=1),
                padding=1)
        bp = bc(f"{n}.branch_pool", avgp(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(n, x):
        b3 = bc(f"{n}.branch3x3", x, stride=2)
        bd = bc(f"{n}.branch3x3dbl_3",
                bc(f"{n}.branch3x3dbl_2", bc(f"{n}.branch3x3dbl_1", x), padding=1),
                stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)

    def block_c(n, x):
        b1 = bc(f"{n}.branch1x1", x)
        b7 = bc(f"{n}.branch7x7_1", x)
        b7 = bc(f"{n}.branch7x7_2", b7, padding=(0, 3))
        b7 = bc(f"{n}.branch7x7_3", b7, padding=(3, 0))
        bd = bc(f"{n}.branch7x7dbl_1", x)
        bd = bc(f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = bc(f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = bc(f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = bc(f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = bc(f"{n}.branch_pool", avgp(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(n, x):
        b3 = bc(f"{n}.branch3x3_2", bc(f"{n}.branch3x3_1", x), stride=2)
        b7 = bc(f"{n}.branch7x7x3_1", x)
        b7 = bc(f"{n}.branch7x7x3_2", b7, padding=(0, 3))
        b7 = bc(f"{n}.branch7x7x3_3", b7, padding=(3, 0))
        b7 = bc(f"{n}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    def block_e(n, x, max_pool_branch):
        b1 = bc(f"{n}.branch1x1", x)
        b3 = bc(f"{n}.branch3x3_1", x)
        b3 = torch.cat([bc(f"{n}.branch3x3_2a", b3, padding=(0, 1)),
                        bc(f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = bc(f"{n}.branch3x3dbl_2", bc(f"{n}.branch3x3dbl_1", x), padding=1)
        bd = torch.cat([bc(f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
                        bc(f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        pooled = (F.max_pool2d(x, 3, stride=1, padding=1) if max_pool_branch
                  else avgp(x))
        bp = bc(f"{n}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], 1)

    with torch.no_grad():
        x = torch.from_numpy(x_nchw)
        x = bc("Conv2d_1a_3x3", x, stride=2)
        x = bc("Conv2d_2a_3x3", x)
        x = bc("Conv2d_2b_3x3", x, padding=1)
        x = F.max_pool2d(x, 3, stride=2)
        x = bc("Conv2d_3b_1x1", x)
        x = bc("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, stride=2)
        x = block_a("Mixed_5b", x)
        x = block_a("Mixed_5c", x)
        x = block_a("Mixed_5d", x)
        x = block_b("Mixed_6a", x)
        x = block_c("Mixed_6b", x)
        x = block_c("Mixed_6c", x)
        x = block_c("Mixed_6d", x)
        x = block_c("Mixed_6e", x)
        x = block_d("Mixed_7a", x)
        x = block_e("Mixed_7b", x, max_pool_branch=False)
        x = block_e("Mixed_7c", x, max_pool_branch=True)  # FIDInceptionE_2
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return x.squeeze(-1).squeeze(-1).numpy()


def test_inception_forward_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from facesr.ckpt.convert import convert_inception_state_dict

    sd = _synthetic_state_dict(seed=0)
    params = jax.tree.map(jnp.asarray, convert_inception_state_dict(sd))

    rng = np.random.default_rng(2)
    x = rng.random((1, 299, 299, 3), dtype=np.float32)  # already [0,1] @ 299
    # bypass the input resize; scaling to [-1,1] happens inside apply
    acts, shapes = inception.apply(params, jnp.asarray(x), resize_input=True,
                                   return_block_shapes=True)
    acts = np.asarray(acts)

    expected = _torch_fid_inception_forward(
        sd, (x * 2.0 - 1.0).transpose(0, 3, 1, 2).copy())

    assert shapes["stem"][1:] == (35, 35, 192)
    assert shapes["Mixed_5d"][1:] == (35, 35, 288)
    assert shapes["Mixed_6e"][1:] == (17, 17, 768)
    assert shapes["Mixed_7a"][1:] == (8, 8, 1280)
    assert shapes["Mixed_7c"][1:] == (8, 8, 2048)
    assert acts.shape == (1, 2048)

    denom = max(np.abs(expected).max(), 1e-6)
    assert np.abs(acts - expected).max() / denom < 1e-3, (
        np.abs(acts - expected).max(), denom)


def test_fid_pipeline_end_to_end_random_weights(tmp_path, monkeypatch):
    """fid_from_images through converted weights: identical sets -> ~0,
    distinct sets -> > 0; weights loaded via the env-var gate."""
    from facesr.ckpt.convert import convert_inception_state_dict
    from facesr.ckpt import save_checkpoint

    sd = _synthetic_state_dict(seed=3)
    path = str(tmp_path / "inception_fid.fckpt")
    save_checkpoint(path, convert_inception_state_dict(sd),
                    {"model_type": "inception_fid"})
    monkeypatch.setenv(inception.ENV_WEIGHTS, path)

    rng = np.random.default_rng(4)
    # small images: exercises the host-side bilinear resize to 299
    real = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(3)]
    fake = [np.clip(r.astype(np.int32) + rng.integers(-40, 40, r.shape), 0,
                    255).astype(np.uint8) for r in real]
    f_same = fid_from_images(real, real, batch_size=2)
    f_diff = fid_from_images(real, fake, batch_size=2)
    assert f_same < 1e-4
    assert f_diff > f_same


def test_fid_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv(inception.ENV_WEIGHTS, raising=False)
    monkeypatch.setattr(inception, "default_weights_path", lambda: None)
    with pytest.raises(RuntimeError, match="weights unavailable"):
        fid_from_images([np.zeros((8, 8, 3), np.uint8)],
                        [np.zeros((8, 8, 3), np.uint8)])


def test_inception_convert_pth_cli_roundtrip(tmp_path, monkeypatch):
    """torch.save -> convert_pth(kind='inception') -> load_inception_weights
    (env-var gate) -> jitted forward: the unattended path for the day real
    pt_inception weights appear."""
    torch = pytest.importorskip("torch")
    from facesr.ckpt.convert import convert_pth

    sd = {k: torch.from_numpy(v) for k, v in _synthetic_state_dict(seed=5).items()}
    sd["fc.weight"] = torch.zeros(1000, 2048)  # classifier head: ignored
    sd["fc.bias"] = torch.zeros(1000)
    pth = str(tmp_path / "pt_inception-2015-12-05.pth")
    torch.save(sd, pth)
    out = str(tmp_path / "inception_fid.fckpt")
    convert_pth(pth, out, kind="inception")

    monkeypatch.setenv(inception.ENV_WEIGHTS, out)
    weights = inception.load_inception_weights()
    assert weights is not None and len(weights) == 94
    acts = inception.apply(weights, jnp.zeros((1, 75, 75, 3)))
    assert acts.shape == (1, 2048)
    assert bool(jnp.isfinite(acts).all())
