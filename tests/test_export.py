"""jax.export serving artifacts: batch-polymorphic export, round-trip
equality vs the live forward across dtype modes, and the CLI."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facesr.models import face_enhance_net as fen
from facesr.ckpt.export import (
    build_serving_fn,
    export_built,
    export_serving,
    load_exported,
)

REPO = Path(__file__).parent.parent


def _tiny_model(seed=0):
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(seed),
                          model.params["conv_last"]["w"].shape) * 0.05)
    return model


def test_export_symbolic_batch_round_trip():
    """One artifact (symbolic batch) serves MULTIPLE batch sizes and matches
    the live forward exactly (same program, baked constants)."""
    model = _tiny_model()
    blob = export_serving(model, dtype=None, input_size=16,
                          platforms=("cpu",))
    serve = load_exported(blob)

    fn, params = build_serving_fn(model, dtype=None)
    live = jax.jit(fn)
    rng = np.random.default_rng(1)
    for batch in (1, 3, 8):
        x = rng.random((batch, 16, 16, 3), dtype=np.float32)
        got = serve(x)
        want = np.asarray(live(params, x))
        assert got.shape == (batch, 64, 64, 3)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_full"])
def test_export_dtype_modes_match_live(dtype):
    model = _tiny_model(seed=2)
    d = jnp.bfloat16 if dtype == "bf16" else dtype
    fn, params = build_serving_fn(model, dtype=d)
    blob = export_built(fn, params, batch=2, input_size=16,
                        platforms=("cpu",))
    serve = load_exported(blob)
    x = np.random.default_rng(3).random((2, 16, 16, 3), dtype=np.float32)
    want = np.asarray(jax.jit(fn)(params, x))
    # bf16-compute modes tolerate bf16-ulp-level drift: baking params as
    # constants lets XLA fold/fuse the weight casts differently than the
    # params-as-arguments program (int8_full's integer convs are exact and
    # land tighter in practice). 5e-3 worst-case / 1e-3 mean, half the
    # export CLI's designed --verify tolerance (1e-2): the worst pixel is
    # fold noise, the mean is the real equivalence gate.
    np.testing.assert_allclose(serve(x), want, atol=5e-3)
    assert float(np.mean(np.abs(serve(x) - want))) < 1e-3


def test_export_file_and_cli(tmp_path):
    """CLI: export --verify round-trips through a real file; load_exported
    accepts the path form."""
    from facesr.ckpt.checkpoint import save_checkpoint

    model = _tiny_model(seed=4)
    from dataclasses import asdict

    ckpt = tmp_path / "m.fckpt"
    save_checkpoint(str(ckpt), {"params": model.params},
                    {"model_type": "custom", "config": asdict(model.config)})

    out = tmp_path / "m.jaxexp"
    proc = subprocess.run(
        [sys.executable, "scripts/export_serving.py",
         "--checkpoint", str(ckpt), "--output", str(out),
         "--dtype", "f32", "--input-size", "16",
         "--platforms", "cpu", "--platform", "cpu", "--verify"],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout
    assert out.exists() and out.stat().st_size > 1000

    serve = load_exported(str(out))
    y = serve(np.zeros((1, 16, 16, 3), np.float32))
    assert y.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(y))

    # the artifact is a first-class eval target: test_model.py --exported
    # scores the exact deployed program on a directory (QA what you ship)
    import cv2
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(hr_dir / f"im_{i}.png"), cv2.GaussianBlur(img, (15, 15), 4))
    proc = subprocess.run(
        [sys.executable, "scripts/test_model.py",
         "--exported", str(out), "--input", str(hr_dir),
         "--output", str(tmp_path / "eval_out"), "--no-save",
         "--platform", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Evaluating exported artifact" in proc.stdout
    assert "vs bicubic" in proc.stdout

    # bf16 --verify must pass with the dtype-appropriate tolerance (its
    # legit drift is ~one bf16 ulp; a hard 1e-5 gate spuriously failed it
    # — 'tpu, cpu' also checks platform-list whitespace handling)
    out2 = tmp_path / "m_bf16.jaxexp"
    proc = subprocess.run(
        [sys.executable, "scripts/export_serving.py",
         "--checkpoint", str(ckpt), "--output", str(out2),
         "--dtype", "bf16", "--input-size", "16",
         "--platforms", " cpu", "--platform", "cpu", "--verify"],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout


def test_load_exported_many_validation(tmp_path):
    """Shared --exported parser: loud load-time rejection of spatial
    mismatches, pinned batch dims (when variable batching is required),
    and duplicate artifact stems."""
    model = _tiny_model(seed=7)
    from facesr.ckpt.export import export_serving, load_exported_many

    sym = tmp_path / "a.jaxexp"
    sym.write_bytes(export_serving(model, input_size=16, platforms=("cpu",)))
    pinned = tmp_path / "p.jaxexp"
    pinned.write_bytes(export_serving(model, batch=4, input_size=16,
                                      platforms=("cpu",)))

    got = load_exported_many(str(sym), spatial=16)
    assert list(got) == ["a"]

    with pytest.raises(ValueError, match="16x16"):
        load_exported_many(str(sym), spatial=64)
    with pytest.raises(ValueError, match="pinned to 4"):
        load_exported_many(str(pinned), spatial=16)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "a.jaxexp").write_bytes(sym.read_bytes())
    with pytest.raises(ValueError, match="duplicate artifact name"):
        load_exported_many(f"{sym},{sub / 'a.jaxexp'}", spatial=16)
    # whitespace/empty specs parse to an empty dict, not a crash
    assert load_exported_many(" , ") == {}
