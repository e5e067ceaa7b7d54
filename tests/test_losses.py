"""Loss tests: golden SSIM parity vs a torch implementation of the standard
SSIM definition, identical-image checks (mirroring reference
ssim_loss.py:293-294), GAN loss parity vs torch BCE/MSE, combined loss
component tracking and gradient flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from facesr import losses
from facesr.losses import combined as fc


def _pair(shape=(2, 3, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random(shape, dtype=np.float32)
    b = rng.random(shape, dtype=np.float32)
    return a, b


def _torch_ssim(pred, target, win=11, sigma=1.5, data_range=1.0):
    """Independent torch reference of the standard gaussian-window SSIM
    (Wang et al. 2004) with zero-pad SAME convolution and biased variance."""
    coords = torch.arange(win, dtype=torch.float32) - win // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2 = torch.outer(g, g)
    C = pred.shape[1]
    w = w2.expand(C, 1, win, win).contiguous()
    pad = win // 2
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    f = lambda t: F.conv2d(t, w, padding=pad, groups=C)
    mp, mt = f(pred), f(target)
    spp = f(pred * pred) - mp * mp
    stt = f(target * target) - mt * mt
    spt = f(pred * target) - mp * mt
    s = ((2 * mp * mt + c1) * (2 * spt + c2)) / ((mp * mp + mt * mt + c1) * (spp + stt + c2))
    return s.mean().item()


def test_ssim_matches_torch_golden():
    a, b = _pair()
    want = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(losses.ssim(jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(got - want) < 1e-5


def test_ssim_identical_is_one():
    a, _ = _pair(seed=1)
    x = jnp.asarray(a.transpose(0, 2, 3, 1))
    assert abs(float(losses.ssim(x, x)) - 1.0) < 1e-5
    assert abs(float(losses.ssim_loss(x, x))) < 1e-5


def test_ssim_per_image():
    a, b = _pair(seed=2)
    x, y = jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1))
    per = losses.ssim(x, y, size_average=False)
    assert per.shape == (2,)
    assert abs(float(per.mean()) - float(losses.ssim(x, y))) < 1e-6


def test_ms_ssim_identical_is_one():
    a, _ = _pair(shape=(1, 3, 176, 176), seed=3)
    x = jnp.asarray(a.transpose(0, 2, 3, 1))
    assert abs(float(losses.ms_ssim(x, x)) - 1.0) < 1e-4


def test_ms_ssim_ordering():
    # A slightly noisy copy must score higher than an unrelated image.
    rng = np.random.default_rng(4)
    a = rng.random((1, 176, 176, 3), dtype=np.float32)
    near = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    far = rng.random((1, 176, 176, 3), dtype=np.float32)
    x = jnp.asarray(a)
    assert float(losses.ms_ssim(x, jnp.asarray(near))) > float(losses.ms_ssim(x, jnp.asarray(far)))


def test_pixel_losses_match_torch():
    a, b = _pair(seed=5)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    assert abs(float(losses.l1_loss(ja, jb)) - F.l1_loss(ta, tb).item()) < 1e-6
    assert abs(float(losses.l2_loss(ja, jb)) - F.mse_loss(ta, tb).item()) < 1e-6
    eps = 1e-3
    want = torch.sqrt((ta - tb) ** 2 + eps ** 2).mean().item()
    assert abs(float(losses.charbonnier_loss(ja, jb, eps)) - want) < 1e-6


def test_gan_loss_matches_torch():
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((4, 1)).astype(np.float32)
    t = torch.from_numpy(logits)
    j = jnp.asarray(logits)
    # vanilla == BCEWithLogits
    want_real = F.binary_cross_entropy_with_logits(t, torch.ones_like(t)).item()
    want_fake = F.binary_cross_entropy_with_logits(t, torch.zeros_like(t)).item()
    assert abs(float(losses.gan_loss(j, True, "vanilla")) - want_real) < 1e-6
    assert abs(float(losses.gan_loss(j, False, "vanilla")) - want_fake) < 1e-6
    # lsgan == MSE vs labels
    assert abs(float(losses.gan_loss(j, True, "lsgan")) - F.mse_loss(t, torch.ones_like(t)).item()) < 1e-6
    # wgan: raw scores
    assert abs(float(losses.gan_loss(j, True, "wgan")) + logits.mean()) < 1e-6


def test_perceptual_identical_zero_and_grads():
    a, b = _pair(shape=(1, 3, 64, 64), seed=7)
    x = jnp.asarray(a.transpose(0, 2, 3, 1))
    y = jnp.asarray(b.transpose(0, 2, 3, 1))
    params = losses.init_perceptual(jax.random.PRNGKey(0), layers=("conv3_4",))
    assert float(losses.perceptual_loss(params, x, x, layers=("conv3_4",))) < 1e-6
    val, grad = jax.value_and_grad(
        lambda p: losses.perceptual_loss(params, p, y, layers=("conv3_4",))
    )(x)
    assert float(val) > 0
    assert np.isfinite(np.asarray(grad)).all() and float(jnp.abs(grad).max()) > 0


def test_combined_loss_components_and_weights():
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.2)
    a, b = _pair(shape=(2, 3, 32, 32), seed=8)
    x = jnp.asarray(a.transpose(0, 2, 3, 1))
    y = jnp.asarray(b.transpose(0, 2, 3, 1))
    total, comps = loss_fn(x, y)
    assert set(comps) == {"l1", "ssim", "total"}
    expect = float(comps["l1"]) + 0.2 * float(comps["ssim"])
    assert abs(float(total) - expect) < 1e-6
    assert loss_fn.get_weights() == {"l1": 1.0, "ssim": 0.2}


def test_combined_loss_charbonnier_and_perceptual():
    loss_fn = fc.CombinedLoss(
        fc.LossConfig(
            l1_weight=1.0,
            perceptual_weight=0.5,
            ssim_weight=0.0,
            use_charbonnier=True,
            perceptual_layers=["conv2_2"],
        )
    )
    a, b = _pair(shape=(1, 3, 32, 32), seed=9)
    x = jnp.asarray(a.transpose(0, 2, 3, 1))
    y = jnp.asarray(b.transpose(0, 2, 3, 1))
    total, comps = loss_fn(x, y)
    assert "perceptual" in comps and "l1" in comps
    # jit-compatibility of the pure apply
    jitted = jax.jit(loss_fn.apply)
    total2, _ = jitted(loss_fn.params, x, y)
    assert abs(float(total) - float(total2)) < 1e-6


def test_loss_tracker():
    tr = losses.LossTracker(window_size=5)
    for i in range(10):
        tr.update({"total": float(i)})
    assert tr.get_moving_average("total") == 7.0  # mean of 5..9
    avgs = tr.end_epoch()
    assert avgs["total"] == 4.5
    tr.update({"total": 1.0})
    tr.end_epoch()
    summary = tr.get_summary()
    assert summary["total"]["best"] == 1.0 and summary["total"]["worst"] == 4.5


def test_perceptual_bf16_policy_tracks_f32():
    # The mixed-precision policy on the VGG sweep (BENCH.md round-2: +168%
    # step throughput) must not change loss values beyond bf16 noise, and
    # gradients must flow and stay aligned with the f32 path.
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    params = losses.init_perceptual(jax.random.PRNGKey(0), layers=("conv3_4",))

    f32 = float(losses.perceptual_loss(params, x, y, layers=("conv3_4",)))
    bf16 = float(losses.perceptual_loss(params, x, y, layers=("conv3_4",),
                                        dtype=jnp.bfloat16))
    assert abs(bf16 - f32) / max(abs(f32), 1e-9) < 0.05, (bf16, f32)

    g32 = jax.grad(lambda p: losses.perceptual_loss(
        params, p, y, layers=("conv3_4",)))(x)
    g16 = jax.grad(lambda p: losses.perceptual_loss(
        params, p, y, layers=("conv3_4",), dtype=jnp.bfloat16))(x)
    g32, g16 = np.asarray(g32).ravel(), np.asarray(g16, np.float32).ravel()
    cos = g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-12)
    # ~0.98 observed with random VGG weights (which maximize relative bf16
    # noise); 0.95 is the regression floor.
    assert cos > 0.95, cos

    # remat on/off must be value-identical (same math, different schedule)
    on = float(losses.perceptual_loss(params, x, y, layers=("conv3_4",),
                                      dtype=jnp.bfloat16, remat=True))
    off = float(losses.perceptual_loss(params, x, y, layers=("conv3_4",),
                                       dtype=jnp.bfloat16, remat=False))
    assert on == off


def test_ssim_separable_filter_matches_full_window():
    # The separable 1-D gaussian passes must equal the full 11x11 depthwise
    # conv (outer(g, g) identity) to float precision.
    from facesr.losses.ssim import _filter, create_gaussian_window
    from facesr.ops import conv2d

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    full = conv2d(x, jnp.asarray(create_gaussian_window(11, 1.5, 3)),
                  padding=5, feature_group_count=3)
    sep = _filter(x, 11, 1.5, 3)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(full),
                               atol=2e-6, rtol=1e-5)


def test_ms_ssim_matches_torch_oracle():
    # Full 5-scale MS-SSIM vs a torch functional oracle implementing the
    # reference semantics (ssim_loss.py:101-171), including its quirk of
    # NOT raising the final-scale term to weights[-1].
    import torch
    import torch.nn.functional as F

    def torch_ms_ssim(pred, target, weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
        channels = pred.shape[1]
        coords = torch.arange(11, dtype=torch.float32) - 5
        g = torch.exp(-(coords ** 2) / (2 * 1.5 ** 2))
        g = g / g.sum()
        win = (g[:, None] @ g[None, :]).expand(channels, 1, 11, 11).contiguous()
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        mcs, last = [], None
        for i in range(len(weights)):
            f = lambda x: F.conv2d(x, win, padding=5, groups=channels)
            mu_p, mu_t = f(pred), f(target)
            s_pp = f(pred * pred) - mu_p ** 2
            s_tt = f(target * target) - mu_t ** 2
            s_pt = f(pred * target) - mu_p * mu_t
            lum = (2 * mu_p * mu_t + C1) / (mu_p ** 2 + mu_t ** 2 + C1)
            cs = (2 * s_pt + C2) / (s_pp + s_tt + C2)
            if i == len(weights) - 1:
                last = (lum * cs).mean()
            else:
                mcs.append(cs.mean())
                pred = F.avg_pool2d(pred, 2, 2)
                target = F.avg_pool2d(target, 2, 2)
        out = last
        for i, m in enumerate(mcs):
            out = out * (m ** weights[i])
        return float(out)

    rng = np.random.default_rng(22)
    a = rng.random((2, 176, 176, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape).astype(np.float32), 0, 1)
    got = float(losses.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    want = torch_ms_ssim(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                         torch.from_numpy(b.transpose(0, 3, 1, 2)))
    assert abs(got - want) < 1e-4, (got, want)
