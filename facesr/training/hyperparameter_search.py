"""Grid search with JSON persistence and resume.

Redesign of reference `src/training/hyperparameter_search.py:26-608`:
ExperimentConfig/ExperimentResult dataclasses, a default grid of
lr x batch_size x perceptual_weight x num_rcab_blocks, per-experiment
try/except marking status='failed', completed-experiment skip on resume
(reference :118-157, 195-197, 380-402, 424-426), pandas report + per-param
impact analysis (:442-531) and `quick_search` (:534-585).

Each experiment runs a self-contained SINGLE-DEVICE jitted train loop
(content losses only) — grid points are small/short by design and the
search parallelizes ACROSS experiments, not within one; use the full
Trainer for sharded runs. Unlike the reference's crude PSNR-derived
SSIM approximation (:331-333), validation uses the real SSIM.

TPU-first: `run(devices="auto")` pins up to n_devices experiments
concurrently, one per local device (`jax.device_put` of params + batches
commits each experiment's whole computation to its device; each thread's
jitted programs then execute chip-local with no cross-device traffic).
The reference had one GPU so its sequential loop idled nothing; on an
8-chip pod the sequential loop would idle 7 chips for the whole search.
"""

from __future__ import annotations

import itertools
import json
import queue
import threading
import time
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ExperimentConfig", "ExperimentResult", "GridSearchTrainer", "quick_search"]


@dataclass
class ExperimentConfig:
    """One grid point (reference :26-38)."""

    learning_rate: float = 1e-4
    batch_size: int = 16
    perceptual_weight: float = 0.01
    num_rcab_blocks: int = 8  # total blocks; mapped to groups x blocks
    num_channels: int = 64
    epochs: int = 3
    experiment_id: str = ""

    def make_id(self) -> str:
        # EVERY searchable field participates: ids that omitted
        # num_channels/epochs collapsed grid points into one "completed"
        # entry, silently skipping the rest of the axis
        return (f"lr{self.learning_rate}_bs{self.batch_size}"
                f"_pw{self.perceptual_weight}_blocks{self.num_rcab_blocks}"
                f"_ch{self.num_channels}_ep{self.epochs}")


@dataclass
class ExperimentResult:
    """Outcome record (reference :41-51)."""

    config: Dict[str, Any] = field(default_factory=dict)
    status: str = "pending"  # pending / completed / failed
    final_psnr: float = 0.0
    final_ssim: float = 0.0
    final_loss: float = float("inf")
    wall_time_s: float = 0.0
    error: str = ""
    device: str = ""  # "platform:id" that ran the experiment (parallel mode)


DEFAULT_GRID = {
    "learning_rate": [1e-3, 1e-4, 1e-5],
    "batch_size": [8, 16, 32],
    "perceptual_weight": [0.0, 0.01, 0.1],
    "num_rcab_blocks": [4, 8, 12],
}


class GridSearchTrainer:
    """Runs the grid, persisting results after each experiment.

    train_data/val_data: numpy arrays [N, H, W, 3] float32 of HR crops
    (small search sets — the reference also trains on a subset)."""

    def __init__(
        self,
        train_data: np.ndarray,
        val_data: np.ndarray,
        grid: Optional[Dict[str, list]] = None,
        results_path: str = "outputs/grid_search/results.json",
        scale_factor: int = 4,
        steps_per_epoch: int = 20,
        seed: int = 0,
        use_amp: bool = True,
    ):
        self.train_data = np.asarray(train_data, np.float32)
        self.val_data = np.asarray(val_data, np.float32)
        self.grid = grid or DEFAULT_GRID
        self.results_path = Path(results_path)
        self.scale_factor = scale_factor
        self.steps_per_epoch = steps_per_epoch
        # bf16 compute policy for the mini loop (the reference grid search
        # trains under AMP, hyperparameter_search.py:199-402); f32 eval.
        self.use_amp = use_amp
        self.seed = seed
        self.results: Dict[str, ExperimentResult] = {}
        self._load_results()

    # -- persistence (reference :118-157) --------------------------------
    def _load_results(self) -> None:
        if self.results_path.exists():
            data = json.loads(self.results_path.read_text())
            from dataclasses import fields as _fields

            known = {f.name for f in _fields(ExperimentResult)}
            for k, v in data.items():
                try:
                    # tolerate schema drift (results.json written by an
                    # older/newer version): ignore unknown fields, and skip
                    # a record missing required ones — it just re-runs
                    self.results[k] = ExperimentResult(
                        **{a: b for a, b in v.items() if a in known})
                except TypeError as e:
                    print(f"Warning: skipping unreadable result record "
                          f"{k!r} ({e}); it will be re-run")
            done = sum(1 for r in self.results.values() if r.status == "completed")
            print(f"Resumed grid search: {done} completed experiments found")

    def _save_results(self) -> None:
        self.results_path.parent.mkdir(parents=True, exist_ok=True)
        self.results_path.write_text(
            json.dumps({k: asdict(v) for k, v in self.results.items()}, indent=2)
        )

    # -- grid enumeration -------------------------------------------------
    def experiment_configs(self) -> List[ExperimentConfig]:
        keys = list(self.grid)
        configs = []
        for combo in itertools.product(*(self.grid[k] for k in keys)):
            cfg = ExperimentConfig(**dict(zip(keys, combo)))
            cfg.experiment_id = cfg.make_id()
            configs.append(cfg)
        return configs

    # -- one experiment ----------------------------------------------------
    def _run_experiment(self, cfg: ExperimentConfig,
                        device=None) -> ExperimentResult:
        from facesr.models import face_enhance_net as fen
        from facesr.losses import combined as fc
        from facesr.losses.ssim import ssim as ssim_fn
        from facesr.ops import bicubic_down
        import optax

        # Map total block count onto groups x blocks (2 blocks per group,
        # mirroring the search dimension of the reference grid).
        blocks_per_group = 2
        num_groups = max(cfg.num_rcab_blocks // blocks_per_group, 1)
        model_cfg = fen.FaceEnhanceNetConfig(
            num_channels=cfg.num_channels,
            num_groups=num_groups,
            blocks_per_group=blocks_per_group,
            scale_factor=self.scale_factor,
        )
        # Committing params (and every batch below) to `device` pins the
        # whole experiment's computation chip-local: jit follows committed
        # input placement, so N threads drive N devices with no cross-device
        # traffic and no sharing of the default device.
        def pin(x):
            # device_put handles whole pytrees; with no device the jitted
            # fns consume numpy/pytrees directly on the default device.
            return jax.device_put(x, device) if device is not None else x

        params = pin(fen.init(jax.random.PRNGKey(self.seed), model_cfg))
        loss_fn = fc.create_loss_function(
            l1_weight=1.0, perceptual_weight=cfg.perceptual_weight,
            ssim_weight=0.0, perceptual_layers=["conv2_2"],
        )
        tx = optax.adamw(cfg.learning_rate)
        opt_state = tx.init(params)

        compute_dtype = jnp.bfloat16 if self.use_amp else None

        @jax.jit
        def train_step(params, opt_state, hr):
            lr_img = bicubic_down(hr, self.scale_factor)

            def loss_f(p):
                sr = fen.apply(p, lr_img, model_cfg, train=True, dtype=compute_dtype)
                total, _ = loss_fn.apply(loss_fn.params, sr, hr,
                                         compute_dtype=compute_dtype)
                return total

            loss, grads = jax.value_and_grad(loss_f)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_step(params, hr):
            lr_img = bicubic_down(hr, self.scale_factor)
            sr = fen.apply(params, lr_img, model_cfg, train=False)
            mse = jnp.mean((sr - hr) ** 2)
            psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
            return psnr, ssim_fn(sr, hr), mse

        rng = np.random.default_rng(self.seed)
        n = len(self.train_data)
        t0 = time.time()
        loss = pin(np.float32(0.0))
        for _ in range(cfg.epochs):
            for _ in range(self.steps_per_epoch):
                idx = rng.integers(0, n, size=min(cfg.batch_size, n))
                hr = pin(self.train_data[idx])
                params, opt_state, loss = train_step(params, opt_state, hr)

        psnr, ssim_val, _ = eval_step(params, pin(self.val_data))
        return ExperimentResult(
            config=asdict(cfg),
            status="completed",
            final_psnr=float(psnr),
            final_ssim=float(ssim_val),
            final_loss=float(loss),
            wall_time_s=time.time() - t0,
            device=f"{device.platform}:{device.id}" if device is not None else "",
        )

    # -- driver -------------------------------------------------------------
    def run(self, max_experiments: Optional[int] = None,
            devices: Optional[Sequence] = None) -> Dict[str, ExperimentResult]:
        """Run the grid, persisting after each experiment.

        devices: None = sequential on the default device (reference
        semantics, hyperparameter_search.py:199-402). "auto" = one
        concurrent experiment pinned to each local device; or an explicit
        sequence of `jax.Device`. Each experiment is single-device jit, so
        worker threads don't contend on the GIL during XLA execution and an
        8-chip mesh completes 8 grid points in one experiment's wall-clock.
        """
        configs = self.experiment_configs()
        if max_experiments:
            configs = configs[:max_experiments]
        if devices == "auto":
            devices = jax.local_devices()
        n_workers = min(len(devices), len(configs)) if devices else 1
        print(f"Grid search: {len(configs)} experiments"
              + (f" on {n_workers} devices" if n_workers > 1 else ""))

        lock = threading.Lock()
        work: "queue.Queue" = queue.Queue()
        for item in enumerate(configs):
            work.put(item)

        def worker(device) -> None:
            while True:
                try:
                    i, cfg = work.get_nowait()
                except queue.Empty:
                    return
                with lock:
                    prev = self.results.get(cfg.experiment_id, ExperimentResult())
                if prev.status == "completed":
                    print(f"[{i + 1}/{len(configs)}] {cfg.experiment_id}: "
                          "skipped (completed)")
                    continue
                where = f" on {device.platform}:{device.id}" if device is not None else ""
                print(f"[{i + 1}/{len(configs)}] {cfg.experiment_id}: running{where}...")
                try:
                    result = self._run_experiment(cfg, device=device)
                    print(f"    PSNR {result.final_psnr:.2f} dB, "
                          f"SSIM {result.final_ssim:.4f}, {result.wall_time_s:.1f}s")
                except Exception as e:  # mark failed, keep going (reference :380-402)
                    result = ExperimentResult(config=asdict(cfg), status="failed",
                                              error=str(e))
                    print(f"    FAILED: {e}")
                with lock:
                    self.results[cfg.experiment_id] = result
                    self._save_results()

        if n_workers == 1:
            worker(devices[0] if devices else None)
        else:
            threads = [threading.Thread(target=worker, args=(d,), daemon=True)
                       for d in list(devices)[:n_workers]]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        return self.results

    # -- analysis (reference :442-531) ---------------------------------------
    def report(self):
        """DataFrame of completed runs sorted by PSNR."""
        import pandas as pd

        rows = []
        for r in self.results.values():
            if r.status != "completed":
                continue
            rows.append({**r.config, "psnr": r.final_psnr, "ssim": r.final_ssim,
                         "loss": r.final_loss, "wall_time_s": r.wall_time_s})
        df = pd.DataFrame(rows)
        return df.sort_values("psnr", ascending=False) if len(df) else df

    def impact_analysis(self) -> Dict[str, Dict[str, float]]:
        """Mean PSNR per value of each grid parameter."""
        df = self.report()
        out: Dict[str, Dict[str, float]] = {}
        if not len(df):
            return out
        for param in self.grid:
            if param in df.columns:
                out[param] = {str(k): float(v) for k, v in
                              df.groupby(param)["psnr"].mean().items()}
        return out

    def best(self) -> Optional[ExperimentResult]:
        done = [r for r in self.results.values() if r.status == "completed"]
        return max(done, key=lambda r: r.final_psnr) if done else None


def quick_search(train_data, val_data, results_path: str = "outputs/grid_search/quick.json",
                 devices: Optional[Sequence] = "auto", **kwargs) -> GridSearchTrainer:
    """Reduced grid (reference :534-585); mesh-parallel by default."""
    grid = {
        "learning_rate": [1e-3, 1e-4],
        "batch_size": [8],
        "perceptual_weight": [0.0, 0.01],
        "num_rcab_blocks": [4],
    }
    searcher = GridSearchTrainer(train_data, val_data, grid=grid,
                                 results_path=results_path, **kwargs)
    searcher.run(devices=devices)
    return searcher
