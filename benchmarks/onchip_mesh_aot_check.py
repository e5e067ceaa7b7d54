"""On-chip smoke of the composed-mesh Trainer, the pp Trainer, and AOT
artifact loading — the round-3 features that had only virtual-CPU-mesh
evidence (VERDICT r3 item 3).

Runs on whatever the default JAX backend is (axon TPU in this
environment; only one chip exists, so composed meshes are degenerate
(1, 1) shapes — the point is that the shard_map/psum/ppermute programs
LOWER AND EXECUTE on the TPU backend, and that a StableHLO serving
artifact exported offline deserializes and runs on it).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/onchip_mesh_aot_check.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MemLoader:
    def __init__(self, n_batches=2, batch=8, size=32, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = [
            {"hr": rng.random((batch, size, size, 3), dtype=np.float32)}
            for _ in range(n_batches)
        ]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def main() -> None:
    import jax

    aot_only = "--aot-only" in sys.argv

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} / {dev.device_kind}")

    from facesr.models import face_enhance_net as fen
    from facesr.losses import combined as fc
    from facesr.training.trainer import Trainer, TrainerConfig

    cfg2 = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2,
                                    blocks_per_group=2)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0,
                                      ssim_weight=0.1)

    n = len(jax.devices())
    shape = (n, 1)  # degenerate second axis on a 1-chip host
    results = {}
    mesh_cases = [] if aot_only else [
        ("data", {}), ("data,model", {}), ("data,pp", {}), ("data,space", {})]
    for axes, extra in mesh_cases:
        model = fen.FaceEnhanceNet(cfg2)
        tcfg = TrainerConfig(
            epochs=1, learning_rate=1e-3, use_amp=False, use_wandb=False,
            checkpoint_dir=f"/tmp/onchip_mesh/{axes.replace(',', '_')}",
            log_dir="/tmp/onchip_mesh/logs", save_every=100,
            scheduler_T_max=1, scale_factor=4,
            mesh_axes=axes, mesh_shape=None if axes == "data" else shape,
            **extra,
        )
        tr = Trainer(model, MemLoader(), MemLoader(n_batches=1, seed=1),
                     loss_fn, config=tcfg)
        t0 = time.time()
        hist = tr.train()
        loss, psnr = hist["train_loss"][-1], hist["val_psnr"][-1]
        results[axes] = (loss, psnr)
        print(f"mesh_axes={axes:<12} shape={shape if axes != 'data' else (n,)} "
              f"loss={loss:.6f} val_psnr={psnr:.3f} ({time.time() - t0:.1f}s)")
        assert np.isfinite(loss) and np.isfinite(psnr), axes

    if not aot_only:
        base = results["data"]
        for axes, got in results.items():
            if axes == "data":
                continue
            assert abs(got[0] - base[0]) < 1e-4, (axes, got, base)
            assert abs(got[1] - base[1]) < 1e-3, (axes, got, base)
        print("composed-mesh Trainer epochs match pure-dp on this backend")

    # --- AOT artifact: export here, deserialize, run on the chip ---
    from facesr.ckpt import export as ck_export

    model = fen.FaceEnhanceNet(cfg2)
    # break the zero-init conv_last (output == bicubic) so the comparison
    # actually exercises the trunk, like tests/test_export.py::_tiny_model
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(7),
                          model.params["conv_last"]["w"].shape) * 0.05)
    x = np.random.default_rng(0).random((2, 24, 24, 3), dtype=np.float32)
    import jax.numpy as jnp
    for name, dtype in (("bf16", jnp.bfloat16), ("int8", "int8")):
        # string names are the CLI surface (scripts/export_serving.py:64-69
        # maps "bf16" -> jnp.bfloat16); build_serving_fn takes jnp dtypes
        # or the "int8"/"int8_full" mode strings
        t0 = time.time()
        blob = ck_export.export_serving(model, dtype=dtype, input_size=24)
        fn = ck_export.load_exported(blob)
        out = np.asarray(fn(x))
        # the correctness gate is exported-vs-LIVE-SERVING at the SAME
        # dtype (like export_serving.py --verify) — comparing against the
        # f32 forward would conflate bf16/int8 precision loss with
        # artifact fidelity
        live_fn, live_params = ck_export.build_serving_fn(model, dtype=dtype)
        live = np.asarray(jax.jit(live_fn)(live_params, x), np.float32)
        err = float(np.max(np.abs(out.astype(np.float32) - live)))
        print(f"AOT {name}: exported {len(blob) / 1e6:.2f} MB, ran on "
              f"{dev.platform}, max|err vs live serving|={err:.6f} "
              f"({time.time() - t0:.1f}s)")
        assert np.isfinite(out).all()
        assert err < 1e-2, (name, err)
    print("OK: composed meshes + pp + AOT artifacts all execute on this backend")


if __name__ == "__main__":
    main()
