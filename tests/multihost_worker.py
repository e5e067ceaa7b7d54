"""Worker process for the REAL multi-host smoke test.

Launched (2x) by tests/test_multihost_real.py. Each worker is one
`jax.distributed` process with its own set of CPU devices; together they
form one global mesh, exactly like two hosts of a TPU pod (the reference
is single-GPU and has no equivalent — SURVEY.md §5 "distributed
communication backend"). The worker trains a tiny FaceEnhanceNet for two
epochs through the production Trainer, then restores the final checkpoint
and reports everything the test asserts on:

  - which dataset indices THIS host's loader consumed (host_shard
    disjointness is checked across the two reports),
  - how many checkpoint files THIS process physically wrote
    (single-writer discipline: must be 0 on process 1),
  - the per-epoch metric history (global losses must be identical on
    both hosts — the batch is assembled across processes),
  - a digest of the final and the restored parameters (both hosts must
    resume to the identical state).

Not a pytest file: run only via the parent test (or by hand, two
terminals, --process-id 0/1).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TrackedFaces:
    """Deterministic synthetic HR faces, identical on every host, that
    record which indices were fetched (the host_shard evidence)."""

    def __init__(self, n: int, size: int):
        import numpy as np

        self.n, self.size = n, size
        self.accessed: list[int] = []
        self._np = np

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        np = self._np
        self.accessed.append(int(i))
        rng = np.random.default_rng(1000 + i)
        return {"hr": rng.random((self.size, self.size, 3), dtype=np.float32)}


def digest(tree) -> str:
    import jax
    import numpy as np

    flat = sorted(
        jax.tree_util.tree_flatten_with_path(tree)[0],
        key=lambda kv: jax.tree_util.keystr(kv[0]),
    )
    h = hashlib.sha256()
    for path, leaf in flat:
        h.update(jax.tree_util.keystr(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    return h.hexdigest()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--local-devices", type=int, default=2)
    a = p.parse_args()

    import jax

    # same forcing pattern as tests/conftest.py (the axon plugin ignores
    # JAX_PLATFORMS); must run before backend init
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", a.local_devices)
    jax.distributed.initialize(coordinator_address=a.coordinator,
                               num_processes=a.num_processes,
                               process_id=a.process_id)
    assert jax.process_count() == a.num_processes
    assert jax.local_device_count() == a.local_devices

    import numpy as np
    from jax.experimental import multihost_utils

    from facesr.data.loader import DataLoader
    from facesr.losses import combined as fc
    from facesr.models import face_enhance_net as fen
    from facesr.training import trainer as trainer_mod
    from facesr.training.trainer import Trainer, TrainerConfig

    # count the msgpack writes this PROCESS performs (discipline evidence)
    real_save = trainer_mod.save_checkpoint
    writes: list[str] = []

    def counting_save(path, state_dict, meta):
        writes.append(os.path.basename(path))
        return real_save(path, state_dict, meta)

    trainer_mod.save_checkpoint = counting_save

    train_ds = TrackedFaces(n=40, size=32)
    val_ds = TrackedFaces(n=8, size=32)
    train_loader = DataLoader(train_ds, batch_size=8, shuffle=True,
                              drop_last=True, num_workers=0, seed=7)
    val_loader = DataLoader(val_ds, batch_size=4, num_workers=0)

    cfg = fen.FaceEnhanceNetConfig(num_channels=8, num_groups=1,
                                   blocks_per_group=1)
    model = fen.FaceEnhanceNet(cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0,
                                      ssim_weight=0.1)
    tcfg = TrainerConfig(
        epochs=2, learning_rate=1e-3, use_amp=False, use_wandb=False,
        checkpoint_dir=os.path.join(a.workdir, "ckpt"),
        log_dir=os.path.join(a.workdir, "logs"),
        save_every=1, scheduler_T_max=2, scale_factor=4,
    )
    tr = Trainer(model, train_loader, val_loader, loss_fn, config=tcfg)
    hist = tr.train()
    final = digest(tr.state.params)

    # process 0 may still be flushing its async writes; all hosts must see
    # the final checkpoint before restoring
    multihost_utils.sync_global_devices("facesr_multihost_ckpt_written")

    model2 = fen.FaceEnhanceNet(cfg)
    tr2 = Trainer(model2, train_loader, val_loader, loss_fn, config=tcfg)
    tr2.load_checkpoint(os.path.join(a.workdir, "ckpt", "final_model.fckpt"))
    restored = digest(tr2.state.params)

    out = {
        "process": a.process_id,
        "is_writer": bool(tr.is_writer),
        # raw access SEQUENCE: shuffle reshards samples across hosts each
        # epoch, so disjointness is a PER-EPOCH property — the test
        # reconstructs epochs from this (16 train fetches per epoch here)
        "train_access_seq": train_ds.accessed,
        "val_indices": sorted(set(val_ds.accessed)),
        "history": {k: [float(x) for x in v] for k, v in hist.items()},
        "writes": writes,
        "params_digest": final,
        "restored_digest": restored,
        "resumed_epoch": tr2.current_epoch,
    }
    with open(os.path.join(a.workdir, f"result_{a.process_id}.json"), "w") as f:
        json.dump(out, f)
    print(f"[worker {a.process_id}] done", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
