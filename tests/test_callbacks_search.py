"""Tests for training callbacks/monitors and hyperparameter grid search."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facesr.training.callbacks import (
    GradientMonitor,
    ActivationMonitor,
    WeightMonitor,
    MetricLogger,
    LRWarmup,
)
from facesr.training.hyperparameter_search import (
    ExperimentConfig,
    GridSearchTrainer,
)
from facesr.models import face_enhance_net as fen


def test_gradient_monitor():
    gm = GradientMonitor()
    grads = {"a": {"w": jnp.ones((2, 2))}, "b": jnp.zeros((3,))}
    norms = gm.update(grads)
    assert abs(norms["a.w"] - 2.0) < 1e-6
    assert norms["b"] == 0.0
    assert gm.vanishing_layers() == ["b"]
    assert abs(gm.global_norm(grads) - 2.0) < 1e-6
    s = gm.summary()
    assert s["a.w"]["last"] == s["a.w"]["mean"]


def test_weight_monitor():
    wm = WeightMonitor()
    p1 = {"w": jnp.ones((4,))}
    assert wm.update(p1) == {}
    p2 = {"w": jnp.ones((4,)) * 1.001}
    ratios = wm.update(p2)
    assert abs(ratios["w"] - 0.001) < 1e-5


def test_activation_monitor():
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    am = ActivationMonitor(model)
    stats = am.update(jnp.ones((1, 8, 8, 3)) * 0.5)
    assert len(stats) == 2
    assert all(0 <= s["mean"] <= 1 for s in stats.values())


def test_metric_logger(tmp_path):
    ml = MetricLogger(log_dir=str(tmp_path))
    ml.on_epoch_end(None, 0, {"loss": 1.0})
    ml.on_epoch_end(None, 1, {"loss": 0.5})
    records = json.loads((tmp_path / "metrics.json").read_text())
    assert len(records) == 2 and records[1]["loss"] == 0.5


def test_lr_warmup():
    w = LRWarmup(base_lr=1e-3, warmup_steps=100)
    assert w(0) == 1e-7  # reference initial_lr (callbacks.py:257), not 0.0
    assert abs(w(50) - (1e-7 + (1e-3 - 1e-7) * 0.5)) < 1e-12
    assert w(100) == 1e-3
    assert w(1000) == 1e-3
    assert LRWarmup(base_lr=1e-3, warmup_steps=100, start_lr=0.0)(0) == 0.0


def test_grid_search_run_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    train = rng.random((8, 16, 16, 3)).astype(np.float32)
    val = rng.random((4, 16, 16, 3)).astype(np.float32)
    grid = {
        "learning_rate": [1e-3, 1e-4],
        "batch_size": [4],
        "perceptual_weight": [0.0],
        "num_rcab_blocks": [2],
    }
    path = str(tmp_path / "results.json")
    gs = GridSearchTrainer(train, val, grid=grid, results_path=path,
                           steps_per_epoch=2)
    # tiny epochs via config defaults: override through ExperimentConfig epochs
    for cfg in gs.experiment_configs():
        assert cfg.experiment_id
    results = gs.run()
    assert len(results) == 2
    assert all(r.status == "completed" for r in results.values())

    # resume skips completed
    gs2 = GridSearchTrainer(train, val, grid=grid, results_path=path,
                            steps_per_epoch=2)
    results2 = gs2.run()
    assert len(results2) == 2

    df = gs2.report()
    assert len(df) == 2 and "psnr" in df.columns
    impact = gs2.impact_analysis()
    assert "learning_rate" in impact and len(impact["learning_rate"]) == 2
    assert gs2.best() is not None


@pytest.mark.slow
def test_grid_search_mesh_parallel(tmp_path):
    """devices='auto' pins concurrent experiments to distinct devices and
    reproduces the sequential results (same seeds -> same math per
    experiment; only the placement changes)."""
    import jax

    rng = np.random.default_rng(1)
    train = rng.random((8, 16, 16, 3)).astype(np.float32)
    val = rng.random((4, 16, 16, 3)).astype(np.float32)
    grid = {
        "learning_rate": [1e-3, 1e-4],
        "batch_size": [4],
        "perceptual_weight": [0.0],
        "num_rcab_blocks": [2, 4],
    }

    gs_seq = GridSearchTrainer(train, val, grid=grid, steps_per_epoch=2,
                               results_path=str(tmp_path / "seq.json"))
    seq = gs_seq.run()

    gs_par = GridSearchTrainer(train, val, grid=grid, steps_per_epoch=2,
                               results_path=str(tmp_path / "par.json"))
    par = gs_par.run(devices="auto")

    assert len(par) == 4
    assert all(r.status == "completed" for r in par.values())
    # 4 experiments over the 8-device conftest mesh: each on its own device.
    used = {r.device for r in par.values()}
    assert len(used) == 4 and all(d for d in used)
    # Same math regardless of placement (virtual devices share one CPU
    # backend, so the programs are identical -> results match tightly).
    for k in seq:
        assert abs(seq[k].final_psnr - par[k].final_psnr) < 1e-3
        assert abs(seq[k].final_ssim - par[k].final_ssim) < 1e-4

    # JSON resume still works in parallel mode: everything skips.
    gs3 = GridSearchTrainer(train, val, grid=grid, steps_per_epoch=2,
                            results_path=str(tmp_path / "par.json"))
    t0 = __import__("time").time()
    again = gs3.run(devices="auto")
    assert __import__("time").time() - t0 < 5.0
    assert all(r.status == "completed" for r in again.values())

    # Explicit device list caps the worker count.
    gs4 = GridSearchTrainer(train, val, grid=grid, steps_per_epoch=2,
                            results_path=str(tmp_path / "two.json"))
    two = gs4.run(devices=jax.local_devices()[:2])
    assert {r.device for r in two.values()} <= {
        f"{d.platform}:{d.id}" for d in jax.local_devices()[:2]}
