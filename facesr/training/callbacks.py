"""Training-dynamics observability: gradient/activation/weight monitors,
callbacks, LR warmup.

Functional redesign of reference `src/training/callbacks.py` (which hooks
torch modules; like the reference, these are a library for notebooks and
debugging — not wired into the Trainer by default, reference
callbacks.py NOTE at SURVEY.md §2.4).

Instead of forward/backward hooks, the monitors consume pytrees:
GradientMonitor summarizes a gradient pytree per layer path, and
ActivationMonitor re-runs the model's attention/feature capture path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import jax

__all__ = [
    "GradientMonitor",
    "ActivationMonitor",
    "WeightMonitor",
    "TrainingCallback",
    "MetricLogger",
    "LRWarmup",
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


class GradientMonitor:
    """Per-parameter gradient-norm tracking (reference callbacks.py:14-88).

    Call `update(grads)` with the gradient pytree each step you want to
    sample; `summary()` reports per-layer norm statistics.
    """

    def __init__(self):
        self.history: Dict[str, List[float]] = {}

    def update(self, grads: Any) -> Dict[str, float]:
        norms = {}
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, leaf in flat:
            name = _path_str(path)
            norm = float(np.linalg.norm(np.asarray(leaf).ravel()))
            norms[name] = norm
            self.history.setdefault(name, []).append(norm)
        return norms

    def global_norm(self, grads: Any) -> float:
        leaves = jax.tree.leaves(grads)
        return float(np.sqrt(sum(float(np.sum(np.square(np.asarray(l)))) for l in leaves)))

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.history.items():
            arr = np.asarray(vals)
            out[name] = {
                "mean": float(arr.mean()),
                "max": float(arr.max()),
                "min": float(arr.min()),
                "last": float(arr[-1]),
            }
        return out

    def vanishing_layers(self, threshold: float = 1e-7) -> List[str]:
        return [n for n, v in self.summary().items() if v["last"] < threshold]


class ActivationMonitor:
    """Activation statistics + dead-channel detection via the model's SE
    attention capture (reference callbacks.py:91-143 hooks; here hook-free)."""

    def __init__(self, model):
        self.model = model
        self.stats: Dict[str, Dict[str, float]] = {}

    def update(self, x) -> Dict[str, Dict[str, float]]:
        maps = self.model.get_attention_maps(x)
        self.stats = {}
        self._channel_means = {}
        for name, attn in maps.items():
            a = np.asarray(attn)
            self.stats[name] = {
                "mean": float(a.mean()),
                "std": float(a.std()),
                "dead_fraction": float((a < 1e-3).mean()),
            }
            # batch-mean per channel, kept so dead_channels can COUNT dead
            # channels at any caller-chosen threshold (reference
            # callbacks.py counts per layer)
            self._channel_means[name] = a.reshape(-1, a.shape[-1]).mean(axis=0)
        return self.stats

    def dead_channels(self, threshold: float = 1e-3) -> Dict[str, int]:
        """Number of channels per layer whose batch-mean attention falls
        below `threshold`."""
        return {
            name: int((means < threshold).sum())
            for name, means in getattr(self, "_channel_means", {}).items()
        }


class WeightMonitor:
    """Update-ratio |Δw| / |w| tracking (reference callbacks.py:146-196).

    Healthy training typically shows ratios around 1e-3."""

    def __init__(self):
        self.prev: Optional[Any] = None
        self.history: Dict[str, List[float]] = {}

    def update(self, params: Any) -> Dict[str, float]:
        params = jax.device_get(params)
        ratios = {}
        if self.prev is not None:
            flat_new, new_def = jax.tree_util.tree_flatten_with_path(params)
            flat_old, old_def = jax.tree_util.tree_flatten_with_path(self.prev)
            if new_def != old_def:
                # positional zip across different structures would subtract
                # mismatched layers into garbage ratios — restart tracking
                print("WeightMonitor: params structure changed; resetting")
                self.prev = params
                return {}
            for (path, new), (_, old) in zip(flat_new, flat_old):
                name = _path_str(path)
                denom = float(np.linalg.norm(np.asarray(old).ravel())) + 1e-12
                delta = float(np.linalg.norm((np.asarray(new) - np.asarray(old)).ravel()))
                ratio = delta / denom
                ratios[name] = ratio
                self.history.setdefault(name, []).append(ratio)
        self.prev = params
        return ratios

    def summary(self) -> Dict[str, float]:
        return {n: float(np.mean(v)) for n, v in self.history.items() if v}


class TrainingCallback:
    """Base callback (reference callbacks.py:199-225)."""

    def on_train_begin(self, trainer) -> None: ...

    def on_train_end(self, trainer) -> None: ...

    def on_epoch_begin(self, trainer, epoch: int) -> None: ...

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None: ...

    def on_step_end(self, trainer, step: int, metrics: Dict[str, float]) -> None: ...


class MetricLogger(TrainingCallback):
    """JSON metric dump per epoch (reference callbacks.py:227-248)."""

    def __init__(self, log_dir: str = "training_logs", filename: str = "metrics.json"):
        self.log_path = Path(log_dir) / filename
        self.records: List[Dict[str, Any]] = []

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        self.records.append({"epoch": epoch, **{k: float(v) for k, v in metrics.items()}})
        self.log_path.parent.mkdir(parents=True, exist_ok=True)
        self.log_path.write_text(json.dumps(self.records, indent=2))


class LRWarmup:
    """Linear LR warmup over the first N steps (reference callbacks.py:251-288).

    Compose with an epoch schedule: lr = warmup(step) * schedule(epoch)/base.
    """

    # start_lr default matches the reference's initial_lr=1e-7
    # (callbacks.py:257) — a 0.0 default would make step 0 a dead no-op
    def __init__(self, base_lr: float, warmup_steps: int = 500,
                 start_lr: float = 1e-7):
        self.base_lr = base_lr
        self.warmup_steps = warmup_steps
        self.start_lr = start_lr

    def __call__(self, step: int) -> float:
        if step >= self.warmup_steps or self.warmup_steps <= 0:
            return self.base_lr
        frac = step / self.warmup_steps
        return self.start_lr + (self.base_lr - self.start_lr) * frac
