"""Per-device HBM budget of the production train step across mesh
compositions — compile-time numbers from XLA's buffer assignment
(facesr.utils.profiling.memory_report), no execution, no TPU needed.

This is the concrete form of the tp/pp "capability axis" claim in
docs/parallelism.md: tp shards conv kernels + Adam moments over output
channels, pp shards the residual groups + their moments over stages —
both cut the per-chip argument bytes that replicated dp pays in full.

Run on the 8-device virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/memory_budget.py [--batch 32] [--hr 128]

Buffer assignment is per-backend; CPU numbers differ from TPU in padding
details but the sharding RATIOS are the design quantity.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hr", type=int, default=128)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--groups", type=int, default=6)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from facesr.models import face_enhance_net as fen
    from facesr.losses import combined as fc
    from facesr.training import Trainer, TrainerConfig

    n = len(jax.devices())
    if n < 4 or n % 2:
        raise SystemExit(f"need an even mesh >= 4 devices, have {n} — set "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    cfg_model = fen.FaceEnhanceNetConfig(
        num_channels=args.channels, num_groups=args.groups,
        blocks_per_group=args.blocks)

    class _OneBatch:
        def __iter__(self):
            return iter(())

        def __len__(self):
            return 0

    rows = []
    for mesh_axes, mesh_shape in (("data", None),
                                  ("data,model", (n // 2, 2)),
                                  ("data,pp", (n // 2, 2))):
        model = fen.FaceEnhanceNet(cfg_model)
        loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0,
                                          ssim_weight=0.0)
        tcfg = TrainerConfig(epochs=1, use_wandb=False, use_amp=True,
                             checkpoint_dir="/tmp/mem_budget_ckpt",
                             log_dir="/tmp/mem_budget_logs",
                             mesh_axes=mesh_axes, mesh_shape=mesh_shape)
        tr = Trainer(model, _OneBatch(), _OneBatch(), loss_fn, config=tcfg)
        rep = tr.memory_report(args.batch, args.hr, echo=False)
        rows.append((mesh_axes, rep))
        mb = 1 << 20
        print(f"{mesh_axes:12s} args {rep['argument_size_in_bytes']/mb:8.1f} MB"
              f"  temps {rep['temp_size_in_bytes']/mb:8.1f} MB"
              f"  budget {rep['total_budget_in_bytes']/mb:8.1f} MB")

    base = rows[0][1]["argument_size_in_bytes"]
    for name, rep in rows[1:]:
        r = rep["argument_size_in_bytes"] / base
        print(f"{name}: argument bytes = {r:.2f}x of replicated dp")


if __name__ == "__main__":
    main()
