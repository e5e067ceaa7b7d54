"""Evaluation tests: PSNR/SSIM parity, skimage-compat metrics golden-tested
against torch-free references, LPIPS structure, GradCAM, visualization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facesr.evaluation import (
    psnr,
    psnr_batch,
    MetricCalculator,
    peak_signal_noise_ratio,
    structural_similarity,
    create_metrics_table,
    tensor_to_image,
)
from facesr.models import face_enhance_net as fen
from facesr.models import lpips as lpips_lib


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.ones((1, 8, 8, 3)) * 0.1
    # mse = 0.01 -> psnr = 20
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4
    assert np.isinf(float(psnr(a, a)))


def test_psnr_batch_per_image():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((3, 8, 8, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((3, 8, 8, 3), dtype=np.float32))
    per = psnr_batch(a, b)
    assert per.shape == (3,)
    # identical pair has huge psnr
    per2 = psnr_batch(a, a)
    assert float(per2.min()) > 90


def test_skimage_psnr_matches_formula():
    rng = np.random.default_rng(1)
    a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    got = peak_signal_noise_ratio(a, b, data_range=255)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    want = 10 * np.log10(255.0 ** 2 / mse)
    assert abs(got - want) < 1e-9


def test_skimage_ssim_properties():
    rng = np.random.default_rng(2)
    a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert abs(structural_similarity(a, a, data_range=255, channel_axis=-1) - 1.0) < 1e-9
    noisy = np.clip(a.astype(np.int32) + rng.integers(-10, 10, a.shape), 0, 255).astype(np.uint8)
    other = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s_near = structural_similarity(a, noisy, data_range=255, channel_axis=-1)
    s_far = structural_similarity(a, other, data_range=255, channel_axis=-1)
    assert 0 < s_far < s_near < 1

    # channel_axis=0 (CHW) measures the SPATIAL dims against win_size —
    # a 3x64x64 image must not be rejected as "3 < 7" — and matches HWC
    chw = structural_similarity(np.moveaxis(a, -1, 0), np.moveaxis(noisy, -1, 0),
                                data_range=255, channel_axis=0)
    assert abs(chw - s_near) < 1e-12
    # even windows drift from skimage (asymmetric crop) — reject like it does
    import pytest as _pytest
    with _pytest.raises(ValueError, match="odd"):
        structural_similarity(a, noisy, data_range=255, channel_axis=-1,
                              win_size=8)


def test_metric_calculator_and_dataset_eval():
    calc = MetricCalculator()
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    m = calc.compute_metrics(pred, tgt)
    assert "psnr" in m and "ssim" in m

    class Loader:
        def __iter__(self):
            for _ in range(2):
                hr = rng.random((2, 32, 32, 3), dtype=np.float32)
                lr = rng.random((2, 8, 8, 3), dtype=np.float32)
                yield {"hr": hr, "lr": lr}

    from facesr.ops import bicubic_up

    res = calc.evaluate_dataset(lambda lr: bicubic_up(jnp.asarray(lr), 4), Loader())
    assert "psnr_mean" in res and "ssim_std" in res


def test_lpips_structure_random_weights():
    # Random weights: not meaningful values, but d(x,x)=0 and d(x,y)>0.
    w = lpips_lib.init_random_alexnet(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32)) * 2 - 1
    b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32)) * 2 - 1
    assert float(lpips_lib.lpips_distance(w, a, a)) < 1e-6
    assert float(lpips_lib.lpips_distance(w, a, b)) > 0


def test_gradcam_and_attention():
    from facesr.evaluation.explainability import GradCAM, AttentionExtractor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    # Perturb conv_last so gradients reach the trunk.
    model.params["conv_last"]["w"] = jnp.full_like(model.params["conv_last"]["w"], 0.01)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))

    cam = GradCAM(model, "group1").generate(x, "center")
    assert cam.shape == (1, 16, 16)
    assert 0.0 <= cam.min() and cam.max() <= 1.0

    attn = AttentionExtractor(model).extract(x)
    assert len(attn) == 4
    summ = AttentionExtractor(model).summary(x)
    assert all(0 <= v["mean"] <= 1 for v in summ.values())


def test_visualize_helpers(tmp_path):
    from facesr.evaluation.explainability import apply_heatmap

    rng = np.random.default_rng(6)
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert tensor_to_image(img).dtype == np.uint8
    cam = rng.random((8, 8)).astype(np.float32)
    overlay = apply_heatmap(img, cam)
    assert overlay.shape == (32, 32, 3) and overlay.dtype == np.uint8

    table = create_metrics_table(
        {"Bicubic": {"psnr": 26.31, "ssim": 0.7861}, "Ours": {"psnr": 27.0, "ssim": 0.80}},
        save_path=str(tmp_path / "t.md"),
        metrics=("psnr", "ssim"),
    )
    assert "Bicubic" in table and (tmp_path / "t.md").exists()


def test_attention_report(tmp_path):
    from facesr.explainability import create_attention_report

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = jnp.full_like(model.params["conv_last"]["w"], 0.01)
    x = np.random.default_rng(7).random((8, 8, 3)).astype(np.float32)
    report = create_attention_report(model, x, str(tmp_path / "report"))
    assert "most_active_block" in report
    assert (tmp_path / "report" / "gradcam_regions.png").exists()
    assert (tmp_path / "report" / "attention_report.json").exists()
