"""End-to-end CLI smoke tests: prepare -> train -> test -> compare -> demo.

Runs the real scripts in subprocesses on tiny synthetic data (CPU backend),
locking the full user-facing surface in CI. Mirrors the reference's
"evaluation scripts as acceptance tests" strategy (SURVEY.md §4).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import cv2
import pytest

REPO = Path(__file__).parent.parent


def run(args, timeout=300):
    proc = subprocess.run(
        [sys.executable, "-u"] + args,
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"{args}\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-2000:]}"
    return proc.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    raw = root / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        img = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (31, 31), 8)
        cv2.imwrite(str(raw / f"im_{i:03d}.png"), img)

    run(["-m", "facesr.data.prepare_data", "--input", str(raw),
         "--output", str(root / "processed"), "--hr-size", "64", "--lr-size", "16"])

    cfg = f"""
project: {{name: e2e, seed: 42}}
data: {{data_root: "{root / 'processed'}", hr_size: 64, lr_size: 16, scale_factor: 4, batch_size: 4, num_workers: 2}}
augmentation: {{horizontal_flip: 0.5, random_crop: {{hr_patch_size: 32}}}}
model: {{type: custom, custom: {{num_channels: 16, num_groups: 1, blocks_per_group: 2, reduction_ratio: 4, upscale_factor: 4}}}}
loss: {{l1_weight: 1.0, perceptual_weight: 0.0, ssim_weight: 0.0, gan: {{weight: 0.0}}}}
training:
  epochs: 1
  optimizer: {{lr: 0.001, weight_decay: 0.0}}
  scheduler: {{type: cosine, T_max: 1, eta_min: 1.0e-07}}
  gradient_clip: 0.5
  mixed_precision: false
  early_stopping: {{patience: 30, metric: val_psnr, mode: max}}
checkpoint: {{save_dir: "{root / 'ckpt'}", save_every: 100, save_best: true}}
logging: {{wandb: {{enabled: false}}}}
"""
    (root / "cfg.yaml").write_text(cfg)
    # Train once here so every test (including ones run in isolation) has
    # checkpoints available; test_train_cli re-runs the CLI deliberately.
    run(["scripts/train.py", "--config", str(root / "cfg.yaml"),
         "--no-wandb", "--yes", "--platform", "cpu"])
    return root


def test_train_cli(workdir):
    out = run(["scripts/train.py", "--config", str(workdir / "cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu"])
    assert "Training complete!" in out
    assert (workdir / "ckpt" / "final_model.fckpt").exists()
    assert (workdir / "ckpt" / "best_model.fckpt").exists()


def test_test_model_cli(workdir):
    out = run(["scripts/test_model.py",
               "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
               "--input", str(workdir / "processed" / "test" / "HR"),
               "--output", str(workdir / "test_out"),
               "--platform", "cpu", "--max-images", "2"])
    assert "vs bicubic" in out
    assert list((workdir / "test_out").glob("*_sr.png"))


def test_compare_cli(workdir):
    run(["scripts/compare_two_models.py",
         "--checkpoint-dir", str(workdir / "ckpt"),
         "--test-dir", str(workdir / "processed" / "test" / "HR"),
         "--output", str(workdir / "cmp"),
         "--num-images", "2", "--platform", "cpu"])
    summary = (workdir / "cmp" / "results_summary.txt").read_text()
    assert "Bicubic" in summary and "Best Model" in summary


def test_demo_headless_cli(workdir):
    # A 200x200 input takes the has-ground-truth path (center-crop HR,
    # synthesize LR) so per-method metric rows are produced.
    raw = next((workdir / "raw").glob("*.png"))
    out = run(["app/demo.py", "--checkpoint-dir", str(workdir / "ckpt"),
               "--image", str(raw), "--output", str(workdir / "demo_out"),
               "--platform", "cpu"])
    # All comparison panels (reference app/demo.py:268-359) ...
    for panel in ("lr", "bicubic", "lanczos", "sr", "hr"):
        assert (workdir / "demo_out" / f"{panel}.png").exists()
    # ... and a per-method metrics row for each comparison method.
    for method in ("Bicubic", "Lanczos4", "Model"):
        assert f"{method}: PSNR" in out


def test_demo_headless_lr_input(workdir):
    """Small inputs are treated as already-LR: SR still produced, no
    ground truth so no metric rows."""
    hr = next((workdir / "processed" / "test" / "HR").glob("*.png"))
    out = run(["app/demo.py", "--checkpoint-dir", str(workdir / "ckpt"),
               "--image", str(hr), "--output", str(workdir / "demo_out_lr"),
               "--platform", "cpu"])
    assert (workdir / "demo_out_lr" / "sr.png").exists()
    assert not (workdir / "demo_out_lr" / "hr.png").exists()
    assert "No ground truth" in out


def test_demo_headless_int8(workdir):
    """The demo serves the production quantized path (--dtype int8_full
    with calibrated static scales, same plumbing as app/api.py)."""
    raw = next((workdir / "raw").glob("*.png"))
    out = run(["app/demo.py", "--checkpoint-dir", str(workdir / "ckpt"),
               "--image", str(raw),
               "--output", str(workdir / "demo_out_int8"),
               "--dtype", "int8_full",
               "--calib-dir", str(workdir / "processed" / "val" / "LR"),
               "--platform", "cpu"])
    for panel in ("bicubic", "lanczos", "sr"):
        assert (workdir / "demo_out_int8" / f"{panel}.png").exists()
    assert "Model: PSNR" in out


def test_resume_cli(workdir):
    out = run(["scripts/train.py", "--config", str(workdir / "cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu",
               "--resume", str(workdir / "ckpt" / "final_model.fckpt"),
               "--fine-tune"])
    assert "fine-tuning mode" in out


@pytest.mark.slow
def test_train_gan_cli(workdir):
    """Stage-3-style GAN training through the CLI (tiny discriminator)."""
    cfg = (workdir / "cfg.yaml").read_text()
    gan_cfg = cfg.replace(
        "loss: {l1_weight: 1.0, perceptual_weight: 0.0, ssim_weight: 0.0, gan: {weight: 0.0}}",
        "loss: {l1_weight: 1.0, perceptual_weight: 0.0, ssim_weight: 0.0, "
        "gan: {weight: 0.005, type: vanilla, d_lr: 0.0001, d_channels: 8, start_epoch: 0}}",
    )
    assert gan_cfg != cfg
    (workdir / "gan_cfg.yaml").write_text(gan_cfg)
    out = run(["scripts/train.py", "--config", str(workdir / "gan_cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu"])
    assert "GAN Training Configuration" in out
    assert "Training complete!" in out


@pytest.mark.slow
def test_train_transfer_cli(workdir):
    """Transfer-model training through the CLI (tiny backbone)."""
    cfg = (workdir / "cfg.yaml").read_text()
    t_cfg = cfg.replace(
        "model: {type: custom, custom: {num_channels: 16, num_groups: 1, "
        "blocks_per_group: 2, reduction_ratio: 4, upscale_factor: 4}}",
        "model: {type: transfer, transfer: {backbone_blocks: 3, head_blocks: 1, "
        "head_channels: 16, scale_factor: 4}}",
    ).replace('save_dir: "', 'save_dir: "').replace("ckpt\"", "ckpt_tr\"")
    assert "transfer" in t_cfg
    (workdir / "transfer_cfg.yaml").write_text(t_cfg)
    out = run(["scripts/train.py", "--config", str(workdir / "transfer_cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu"])
    assert "Training complete!" in out


def test_stage_chaining_via_config_resume(workdir):
    """A `resume:` path in the YAML loads weights-only (stage chaining) —
    a full resume of a completed stage would train zero epochs."""
    cfg = (workdir / "cfg.yaml").read_text()
    chained = cfg.replace(
        f"save_dir: \"{workdir / 'ckpt'}\"",
        f"save_dir: \"{workdir / 'ckpt_chain'}\", "
        f"resume: \"{workdir / 'ckpt' / 'final_model.fckpt'}\"",
    )
    assert "resume:" in chained
    (workdir / "chain_cfg.yaml").write_text(chained)
    out = run(["scripts/train.py", "--config", str(workdir / "chain_cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu"])
    assert "Chaining from stage checkpoint" in out
    assert "weights only" in out
    assert "Training complete!" in out
    assert "Epoch 1/1" in out  # actually trained (not resumed past the end)


def test_train_fast_loader_cli(workdir):
    """Native fast-loader path through the CLI."""
    out = run(["scripts/train.py", "--config", str(workdir / "cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu", "--fast-loader"])
    assert "Fast loader: native assembler" in out
    assert "Training complete!" in out


@pytest.mark.slow
def test_batched_eval_matches_per_image(workdir):
    """VERDICT r1 #5: the batched sharded eval path must produce identical
    per-image metrics to the legacy batch-1 loop, in both eval CLIs."""
    def rows(out):
        return [l for l in out.splitlines() if "model PSNR" in l]

    common = ["scripts/test_model.py",
              "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
              "--input", str(workdir / "processed" / "test" / "HR"),
              "--platform", "cpu", "--max-images", "3", "--no-comparison"]
    batched = run(common + ["--output", str(workdir / "tm_batched")])
    legacy = run(common + ["--output", str(workdir / "tm_legacy"), "--per-image"])
    assert rows(batched) == rows(legacy) and rows(batched)

    common = ["scripts/compare_two_models.py",
              "--checkpoint-dir", str(workdir / "ckpt"),
              "--test-dir", str(workdir / "processed" / "test" / "HR"),
              "--num-images", "3", "--platform", "cpu", "--save-every", "0"]
    run(common + ["--output", str(workdir / "cmp_batched")])
    run(common + ["--output", str(workdir / "cmp_legacy"), "--per-image"])
    assert (workdir / "cmp_batched" / "results_summary.txt").read_text() == \
           (workdir / "cmp_legacy" / "results_summary.txt").read_text()


def test_compare_cli_int8_serve_dtype(workdir):
    run(["scripts/compare_two_models.py",
         "--checkpoint-dir", str(workdir / "ckpt"),
         "--test-dir", str(workdir / "processed" / "test" / "HR"),
         "--output", str(workdir / "cmp_int8"),
         "--num-images", "2", "--platform", "cpu", "--save-every", "0",
         "--serve-dtype", "int8_full", "--calibrate", "2"])
    summary = (workdir / "cmp_int8" / "results_summary.txt").read_text()
    assert "Best Model" in summary


def test_export_quantized_cli(workdir):
    # train -> export calibrated int8 artifact -> serve from the cache
    out = workdir / "ckpt" / "best.int8.fckpt"
    stdout = run(["scripts/export_quantized.py",
                  "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
                  "--calib-dir", str(workdir / "processed" / "val" / "HR"),
                  "--calib-hr", "--num-images", "4",
                  "--output", str(out), "--platform", "cpu"])
    assert out.exists() and "Wrote calibrated int8 tree" in stdout

    import jax
    from facesr.models.load import load_any_model
    from facesr.parallel.serving import ShardedPredictor

    m = load_any_model(str(workdir / "ckpt" / "best_model.fckpt"))
    pred = ShardedPredictor(m, dtype="int8_full", max_batch=8,
                            quant_cache=str(out))
    sr = pred(np.random.default_rng(0).random((2, 16, 16, 3), dtype=np.float32))
    assert sr.shape == (2, 64, 64, 3)
    assert np.isfinite(sr).all()


def test_sigterm_saves_interrupt_checkpoint(workdir, tmp_path):
    """Preemption safety: SIGTERM mid-training must save interrupted.fckpt
    and exit cleanly (TPU pods are preempted with SIGTERM; the reference
    only catches Ctrl-C, train.py:387-391)."""
    import signal
    import time as _time

    cfg = (workdir / "cfg.yaml").read_text()
    cfg = cfg.replace("epochs: 1", "epochs: 200")
    cfg = cfg.replace(str(workdir / "ckpt"), str(tmp_path / "ckpt_sig"))
    (tmp_path / "sig_cfg.yaml").write_text(cfg)

    proc = subprocess.Popen(
        [sys.executable, "-u", "scripts/train.py", "--config",
         str(tmp_path / "sig_cfg.yaml"), "--no-wandb", "--yes",
         "--platform", "cpu"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # wait until the first epoch completes (a checkpointable state
        # exists and the signal handler is installed)
        deadline = _time.monotonic() + 240
        saw_epoch = False
        for line in proc.stdout:
            if "Epoch 1/" in line:
                saw_epoch = True
                break
            if _time.monotonic() > deadline:
                break
        assert saw_epoch, "training never reached epoch 1"
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, out[-2000:]
    assert "SIGTERM" in out, out[-2000:]
    assert (tmp_path / "ckpt_sig" / "interrupted.fckpt").exists()


@pytest.mark.slow
def test_train_qat_scales_cli(workdir, tmp_path):
    """CLI loop: export a calibrated int8 artifact, then QAT-fine-tune the
    checkpoint pinned to that artifact's static serving grid
    (--qat-scales); the guard rejects the flag without training.qat."""
    art = tmp_path / "qat.int8.fckpt"
    run(["scripts/export_quantized.py",
         "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
         "--calib-dir", str(workdir / "processed" / "val" / "HR"),
         "--calib-hr", "--num-images", "2",
         "--output", str(art), "--platform", "cpu"])

    cfg = (workdir / "cfg.yaml").read_text()
    cfg = cfg.replace("  epochs: 1", "  epochs: 1\n  qat: true")
    cfg = cfg.replace(str(workdir / "ckpt"), str(tmp_path / "ckpt_qs"))
    (tmp_path / "qs_cfg.yaml").write_text(cfg)

    out = run(["scripts/train.py", "--config", str(tmp_path / "qs_cfg.yaml"),
               "--no-wandb", "--yes", "--platform", "cpu",
               "--resume", str(workdir / "ckpt" / "best_model.fckpt"),
               "--fine-tune", "--qat-scales", str(art)])
    assert "QAT pinned to calibrated activation scales" in out
    assert (tmp_path / "ckpt_qs" / "final_model.fckpt").exists()

    # guard: --qat-scales without training.qat refuses
    proc = subprocess.run(
        [sys.executable, "scripts/train.py", "--config",
         str(workdir / "cfg.yaml"), "--no-wandb", "--yes", "--platform",
         "cpu", "--qat-scales", str(art)],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "requires training.qat" in (proc.stderr + proc.stdout)


@pytest.mark.slow
def test_validate_parity_harness_e2e(tmp_path):
    """The parity-acceptance harness runs end to end TODAY on synthetic
    oracle-generated .pth fixtures (VERDICT r2 next-round #1): classify +
    convert every artifact kind, evaluate with the converted LPIPS/FID
    backends, and pass/fail against a targets file — so real published
    weights become a one-command acceptance event."""
    import torch

    sys.path.insert(0, str(REPO / "tests"))
    from test_convert_parity import make_state_dict, make_transfer_state_dict
    from test_convert_parity import _make_alexnet_sd
    from test_fid_inception import _synthetic_state_dict

    art = tmp_path / "artifacts"
    art.mkdir()
    # every artifact family the harness classifies, in reference containers
    torch.save({"model_state_dict": make_state_dict(C=16, G=1, B=2, seed=60)},
               str(art / "custom_gan.pth"))
    torch.save(make_transfer_state_dict(nf=8, gc=4, n_body=2, n_head=1, seed=61),
               str(art / "transfer_model.pth"))
    torch.save(_make_alexnet_sd(seed=62), str(art / "alexnet.pth"))
    rng = np.random.default_rng(63)
    lins = {f"lin{i}.model.1.weight":
            torch.from_numpy(np.abs(rng.standard_normal((1, c, 1, 1))
                                    ).astype(np.float32) * 0.1)
            for i, c in enumerate([64, 192, 384, 256, 256])}
    torch.save(lins, str(art / "lpips_alex.pth"))
    torch.save({k: torch.from_numpy(v)
                for k, v in _synthetic_state_dict(seed=64).items()},
               str(art / "pt_inception.pth"))
    (art / "garbage.pth").write_bytes(b"not a checkpoint")

    test_dir = tmp_path / "test_hr"
    test_dir.mkdir()
    for i in range(5):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(test_dir / f"im_{i}.png"), cv2.GaussianBlur(img, (11, 11), 3))

    base = ["scripts/validate_parity.py", "--artifacts", str(art),
            "--test-dir", str(test_dir), "--num-images", "5",
            "--platform", "cpu"]
    targets = tmp_path / "targets.json"

    # 1) measure-and-emit (self-consistency mode)
    out1 = run(base + ["--output", str(tmp_path / "o1"),
                       "--emit-targets", str(targets)], timeout=420)
    assert "SKIP garbage.pth" in out1
    emitted = json.loads(targets.read_text())
    for row in ("Bicubic", "Bilinear", "Lanczos4", "custom_gan",
                "transfer_model"):
        assert {"psnr", "ssim", "lpips", "fid"} <= set(emitted["rows"][row])

    # 2) check mode against the just-measured targets: everything PASSes,
    #    including the int8 serving-delta gates
    out2 = run(base + ["--output", str(tmp_path / "o2"),
                       "--targets", str(targets), "--int8",
                       "--calibrate", "3"], timeout=420)
    assert "Verdict: PASS" in out2
    report = json.loads((tmp_path / "o2" / "parity_report.json").read_text())
    assert report["verdict"] == "PASS"
    statuses = {(e["row"], e["metric"]): e["status"] for e in report["report"]}
    assert statuses[("custom_gan", "psnr")] == "PASS"
    assert statuses[("custom_gan", "fid")] == "INFO"  # no published target
    assert statuses[("custom_gan [int8]", "delta_psnr")] == "PASS"
    assert report["int8"]["transfer_model"]["agreement_psnr"] > 20.0

    # 3) a target off by more than the tolerance must FAIL with exit 1
    bad = json.loads(targets.read_text())
    bad["rows"]["Bicubic"]["psnr"] += 1.0
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    proc = subprocess.run(
        [sys.executable, "-u"] + base + [
            "--output", str(tmp_path / "o3"),
            "--targets", str(tmp_path / "bad.json")],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 1, proc.stdout[-2000:]
    report3 = json.loads((tmp_path / "o3" / "parity_report.json").read_text())
    assert report3["verdict"] == "FAIL"
    fails = [e for e in report3["report"] if e["status"] == "FAIL"]
    assert [(e["row"], e["metric"]) for e in fails] == [("Bicubic", "psnr")]


def test_validate_parity_model_row_not_binarized(tmp_path):
    """Regression: evaluate_methods must consume sr_batched's uint8 output
    as-is. A re-scaling bug (clip(uint8, 0, 1) * 255) binarized every model
    row to {0, 255} (~6 dB PSNR) while the --emit-targets self-consistency
    e2e still passed. At init FaceEnhanceNet's SR equals the bicubic
    upsample (guarded parity invariant), so its harness row must track the
    cv2-Bicubic baseline row — impossible on binarized images."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_validate_parity_mod", REPO / "scripts" / "validate_parity.py")
    vp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vp)

    from facesr.ckpt import save_model
    from facesr.models import face_enhance_net as fen

    art = tmp_path / "artifacts"
    art.mkdir()
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(art / "init_model.fckpt"), model.params, cfg, "custom")

    test_dir = tmp_path / "hr"
    test_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(test_dir / f"im_{i}.png"),
                    cv2.GaussianBlur(img, (11, 11), 3))

    inv = vp.discover_and_convert(art, tmp_path / "conv")
    rows, _, _ = vp.evaluate_methods(
        inv, test_dir, num_images=3, scale=4, int8=False, calibrate=0,
        max_batch=4)
    assert abs(rows["init_model"]["psnr"] - rows["Bicubic"]["psnr"]) < 3.0
    assert rows["init_model"]["ssim"] > 0.5


def test_validate_parity_unmatched_model_fails():
    """A model row whose name matches no target must fail loudly (NO_TARGET),
    never silently become all-INFO and print PASS (self-review r3)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "validate_parity", REPO / "scripts" / "validate_parity.py")
    vp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vp)

    rows = {"Bicubic": {"psnr": 26.31, "ssim": 0.7861},
            "best_model": {"psnr": 27.0, "ssim": 0.80}}
    report, any_fail = vp.build_report(
        rows, vp.DEFAULT_TARGETS, vp.DEFAULT_TOLERANCES, {}, 0.5,
        model_names={"best_model"})
    assert any_fail
    assert any(e["row"] == "best_model" and e["status"] == "NO_TARGET"
               for e in report)
    # the stem-matched case still resolves and passes normally
    rows2 = {"custom_gan": {"psnr": 26.39, "ssim": 0.7734}}
    report2, fail2 = vp.build_report(
        rows2, vp.DEFAULT_TARGETS, vp.DEFAULT_TOLERANCES, {}, 0.5,
        model_names={"custom_gan"})
    assert not fail2
    assert all(e["status"] == "PASS" for e in report2)


def test_demo_headless_exported(workdir):
    """The demo serves an AOT artifact (--exported) with no checkpoints on
    the host — same deployment surface as api --exported."""
    art = workdir / "serve" / "tiny_f32.jaxexp"
    run(["scripts/export_serving.py",
         "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
         "--output", str(art), "--dtype", "f32",
         "--platforms", "cpu", "--platform", "cpu"])
    raw = next((workdir / "raw").glob("*.png"))
    out = run(["app/demo.py",
               "--checkpoint-dir", str(workdir / "no_such_dir"),
               "--exported", str(art),
               "--image", str(raw),
               "--output", str(workdir / "demo_out_exported"),
               "--platform", "cpu"])
    assert "Loaded exported artifact" in out
    assert (workdir / "demo_out_exported" / "sr.png").exists()
    assert "Model: PSNR" in out


def test_dress_rehearsal_workdir_plumbing(tmp_path):
    """A custom workdir must chain stages from ITS OWN checkpoints: the
    script generates /tmp/rehearsal-free config copies into $WORK (VERDICT
    r4 weak #1). Setup-only mode gates the plumbing without training."""
    import os

    work = tmp_path / "other_rehearsal"
    env = dict(os.environ, REHEARSAL_SETUP_ONLY="1")
    proc = subprocess.run(
        ["bash", "scripts/dress_rehearsal.sh", str(work)],
        cwd=REPO, capture_output=True, text=True, timeout=60, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    from facesr.config import load_config

    for stage, prev in (("stage1_psnr", None), ("stage2_ssim", "ckpt_s1"),
                        ("stage3_gan", "ckpt_s2")):
        path = work / "configs" / f"{stage}.yaml"
        text = path.read_text()
        assert "/tmp/rehearsal" not in text or str(work).startswith("/tmp/rehearsal")
        cfg = load_config(str(path))  # generated copy still schema-valid
        assert cfg["data"]["data_root"] == str(work / "processed")
        assert cfg["checkpoint"]["save_dir"].startswith(str(work))
        resume = cfg["checkpoint"].get("resume")
        if prev is None:
            assert resume is None
        else:
            assert resume == str(work / prev / "best_model.fckpt")


@pytest.mark.slow
def test_compare_cli_fid_column_with_weights(workdir, tmp_path):
    """The FID column activates automatically once converted InceptionV3
    weights exist (VERDICT r4 next #5): SR-vs-HR FID per method in the
    summary, sane ordering (identity GT comparison not included, but model
    rows must be finite and non-negative)."""
    import os

    from test_fid_inception import _synthetic_state_dict  # tests/ on sys.path
    from facesr.ckpt.convert import convert_inception_state_dict
    from facesr.ckpt import save_checkpoint

    weights = str(tmp_path / "inception_fid.fckpt")
    save_checkpoint(weights,
                    convert_inception_state_dict(_synthetic_state_dict(seed=7)),
                    {"model_type": "inception_fid"})

    env = dict(os.environ, FACESR_INCEPTION_WEIGHTS=weights)
    proc = subprocess.run(
        [sys.executable, "-u", "scripts/compare_two_models.py",
         "--checkpoint-dir", str(workdir / "ckpt"),
         "--test-dir", str(workdir / "processed" / "test" / "HR"),
         "--output", str(tmp_path / "cmp_fid"),
         "--num-images", "2", "--platform", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    summary = (tmp_path / "cmp_fid" / "results_summary.txt").read_text()
    lines = summary.splitlines()
    assert "FID" in lines[0]
    table = lines[2:lines.index("")]  # rows between separator and blank
    assert len(table) >= 3  # bicubic, lanczos, model
    for line in table:
        fid = float(line.split()[-1])
        assert np.isfinite(fid) and fid >= 0
    assert "FID" in [l for l in lines if " vs " in l][0]


def test_stage_panel_cli(workdir, tmp_path):
    """Crop-panel script: two checkpoints (stage2-vs-stage3 shape), eye and
    mouth regions, tiled panel written."""
    ckpt = str(workdir / "ckpt" / "best_model.fckpt")
    out = run(["scripts/stage_panel.py",
               "--checkpoints", ckpt, ckpt,
               "--labels", "stage2", "stage3",
               "--test-dir", str(workdir / "processed" / "test" / "HR"),
               "--output", str(tmp_path / "panel"),
               "--num-images", "2", "--platform", "cpu"])
    assert "Panel saved" in out
    panel = cv2.imread(str(tmp_path / "panel" / "stage_panel.png"))
    assert panel is not None and panel.shape[0] > 40
    # one per-row file per image x region
    assert len(list((tmp_path / "panel").glob("panel_*_eyes.png"))) == 2
    assert len(list((tmp_path / "panel").glob("panel_*_mouth.png"))) == 2


@pytest.mark.slow
def test_trained_checkpoint_pth_roundtrip_metrics(workdir, tmp_path):
    """VERDICT r4 #7: round-trip a REAL trained checkpoint (EMA enabled, so
    ema_params are exported by default; conv_last drifted off zero-init)
    through the reverse converter and back, asserting identical test-set
    metrics via the production QA CLI — the migration contract on weights
    that matter, not synthetic params."""
    cfg = (workdir / "cfg.yaml").read_text().replace(
        "training:\n  epochs: 1",
        "training:\n  ema_decay: 0.99\n  epochs: 2",
    ).replace(str(workdir / "ckpt"), str(tmp_path / "ckpt_ema"))
    assert "ema_decay" in cfg and str(tmp_path / "ckpt_ema") in cfg
    (tmp_path / "cfg_ema.yaml").write_text(cfg)
    run(["scripts/train.py", "--config", str(tmp_path / "cfg_ema.yaml"),
         "--no-wandb", "--yes", "--platform", "cpu"])
    trained = tmp_path / "ckpt_ema" / "best_model.fckpt"
    assert trained.exists()

    def metrics(ckpt) -> str:
        out = run(["scripts/test_model.py", "--checkpoint", str(ckpt),
                   "--input", str(workdir / "processed" / "test" / "HR"),
                   "--output", str(tmp_path / f"qa_{Path(ckpt).stem}"),
                   "--platform", "cpu", "--max-images", "3"])
        return "\n".join(l for l in out.splitlines()
                         if l.startswith(("Bicubic", "Model", "vs bicubic")))

    before = metrics(trained)
    assert "Model" in before

    # facesr -> reference .pth -> facesr, through the CLI both ways
    pth = tmp_path / "exported.pth"
    back = tmp_path / "back.fckpt"
    run(["-m", "facesr.ckpt.convert", "--reverse",
         "--input", str(trained), "--output", str(pth)])
    run(["-m", "facesr.ckpt.convert", "--kind", "custom",
         "--input", str(pth), "--output", str(back)])
    after = metrics(back)
    assert before == after, f"metric drift:\n{before}\nvs\n{after}"


def test_plot_training_stages_cli(workdir, tmp_path):
    """Per-stage curve plots + combined overview from checkpoint
    training_history (the README workflow command)."""
    ckpt = str(workdir / "ckpt" / "best_model.fckpt")
    out = run(["scripts/plot_training_stages.py",
               "--checkpoints", ckpt, "--names", "Stage 1 (PSNR)",
               "--output", str(tmp_path / "plots")])
    assert "Saved" in out
    pngs = list((tmp_path / "plots").glob("*.png"))
    assert pngs, "no plots written"


def test_measure_inference_time_cli(workdir):
    """Latency CLI on the tiny trained checkpoint (CPU): per-batch stats
    printed, on-device scalar sync path exercised."""
    out = run(["scripts/measure_inference_time.py",
               "--checkpoint", str(workdir / "ckpt" / "best_model.fckpt"),
               "--platform", "cpu", "--num-runs", "3", "--warmup", "1",
               "--input-size", "16"])
    assert "ms" in out.lower()
