"""Training runtime: sharded data-parallel Trainer, early stopping, overfit test.

TPU-native redesign of the reference Trainer
(`/root/reference/src/training/trainer.py:167-760`):

  - The whole per-batch block (LR synthesis, D loop, G update) is ONE jitted
    XLA program (see `facesr.training.steps`), pjit-sharded over a 1-D
    `data` mesh: HR batches sharded on the leading axis, state replicated,
    gradient all-reduce over ICI inserted by XLA.
  - LR scheduling is epoch-granular (PyTorch scheduler semantics,
    trainer.py:347-352) via an injected hyperparameter — no recompiles.
  - bf16 compute policy replaces CUDA AMP + GradScaler.
  - Checkpoints are self-describing msgpack (facesr.ckpt) with the same
    payload as the reference (epoch, step, params, optimizer, scheduler,
    history, config, discriminator when GAN — trainer.py:701-723) and the
    same full-resume vs weights-only fine-tune modes (trainer.py:725-760).

W&B is optional and import-guarded exactly like the reference
(trainer.py:21-25).
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, asdict, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

try:  # optional, mirrors reference trainer.py:21-25
    import wandb

    WANDB_AVAILABLE = True
except ImportError:
    WANDB_AVAILABLE = False

from facesr.parallel import get_mesh, replicated, batch_sharding, replicate, pad_to_multiple
from facesr.training import steps as steps_lib
from facesr.training.steps import TrainState, make_optimizer, set_learning_rate
from facesr.training import schedules
from facesr.ckpt import save_checkpoint, load_checkpoint
from facesr.models import face_enhance_net as fen
from facesr.models import discriminator as disc_lib
from facesr.ops import nearest_up

__all__ = ["TrainerConfig", "EarlyStopping", "Trainer", "overfit_test", "save_validation_grid"]


def save_validation_grid(lr_images, sr_images, hr_images, epoch: int,
                         save_dir: str = "training_logs") -> None:
    """LR|SR|HR comparison grid PNG per epoch (reference trainer.py:34-82).

    Inputs NHWC float [0,1]; LR is nearest-upscaled to HR size.
    """
    from PIL import Image

    save_path = Path(save_dir)
    save_path.mkdir(parents=True, exist_ok=True)

    lr_images = np.clip(np.asarray(lr_images), 0, 1)
    sr_images = np.clip(np.asarray(sr_images), 0, 1)
    hr_images = np.clip(np.asarray(hr_images), 0, 1)

    scale = hr_images.shape[1] // lr_images.shape[1]
    lr_up = np.asarray(nearest_up(jnp.asarray(lr_images), scale))

    num = min(4, lr_images.shape[0])
    pad = 2
    h, w = hr_images.shape[1], hr_images.shape[2]
    grid = np.ones((num * (h + pad) + pad, 3 * (w + pad) + pad, 3), dtype=np.float32)
    for i in range(num):
        for j, img in enumerate((lr_up[i], sr_images[i], hr_images[i])):
            y0 = pad + i * (h + pad)
            x0 = pad + j * (w + pad)
            grid[y0:y0 + h, x0:x0 + w] = img
    out = (grid * 255).astype(np.uint8)
    Image.fromarray(out).save(save_path / f"epoch_{epoch:04d}.png")


@dataclass
class TrainerConfig:
    """Mirrors reference TrainerConfig (trainer.py:85-131) + TPU extras."""

    epochs: int = 50
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    gradient_clip: float = 1.0
    accumulation_steps: int = 1

    # Mixed precision: bf16 trunk compute on TPU (replaces CUDA AMP).
    use_amp: bool = True

    scheduler_type: str = "cosine"  # 'cosine', 'step', 'plateau'
    scheduler_T_max: int = 50
    scheduler_eta_min: float = 1e-7
    scheduler_step_size: int = 10
    scheduler_gamma: float = 0.5

    early_stopping_patience: int = 10
    early_stopping_metric: str = "val_psnr"
    early_stopping_mode: str = "max"

    checkpoint_dir: str = "checkpoints"
    save_every: int = 10
    save_best: bool = True
    # Async checkpointing: the msgpack encode + atomic file write run on a
    # single FIFO writer thread so the step loop never stalls on disk (the
    # reference's torch.save blocks the epoch; at pod scale that is dead
    # ICI time for every chip). The device->host copy stays synchronous —
    # the jitted step DONATES its input state, so buffers must be
    # materialized before the next step invalidates them. Writes are
    # flushed at train() end and before any load.
    async_checkpoint: bool = True

    log_every: int = 100
    log_images_every: int = 5
    # Console liveness: print a one-line "step i/N loss x" postfix every N
    # steps (reference's tqdm postfix, trainer.py:407-521, without its
    # per-batch host sync). Multiples of 8 ride the sync the dispatch
    # throttle pays anyway (hence the default); other cadences add their
    # own host round trip at each print. 0 = per-epoch prints only.
    # Overwrites in place on a tty; plain lines when redirected to a file.
    step_log_every: int = 24
    # Sample per-layer gradient norms every N steps into a GradientMonitor
    # (+ W&B when enabled) — the reference's wandb.watch(log='gradients',
    # log_freq=100) equivalent (trainer.py:324). 0 = off: the step is built
    # without the norm outputs, so there is no cost when disabled.
    log_gradients_every: int = 0
    use_wandb: bool = True
    wandb_project: str = "face-super-resolution"

    # GAN
    gan_weight: float = 0.0
    gan_type: str = "vanilla"
    d_learning_rate: float = 1e-4
    d_weight_decay: float = 0.0
    d_updates_per_g: int = 1
    gan_start_epoch: int = 0

    # TPU / mesh
    scale_factor: int = 4
    mesh_axis: str = "data"
    # Mesh COMPOSITION (docs/parallelism.md): comma-separated axis names,
    # first axis = the batch (dp) axis named by `mesh_axis`. Options:
    #   "data"        pure dp (default — batch sharded, state replicated)
    #   "data,space"  dp x sp: each batch shard's image ROWS split too
    #   "data,model"  dp x tp: conv kernels + Adam moments sharded over
    #                 output channels under the batch partition
    #   "data,pp"     dp x pipeline: each dp replica's residual-group trunk
    #                 runs as a shard_map+ppermute microbatch pipeline
    # Multi-axis requires `mesh_shape`, e.g. [4, 2] on 8 chips. All modes
    # are exactness-gated vs single-device in tests/test_parallel.py.
    mesh_axes: str = "data"
    mesh_shape: Optional[tuple] = None
    # pp microbatches per step; 0 = one per pipeline stage (always divides
    # the padded local batch). More microbatches shrink the pipeline
    # bubble but must divide batch_size / dp_size.
    pp_microbatches: int = 0
    log_dir: str = "training_logs"
    # Remat the perceptual VGG sweep in backward. False (measured fastest,
    # BENCH.md: +7% at batch 128 bf16) fits HBM up to batch ~128 per v5e
    # chip; set True for larger per-chip batches.
    vgg_remat: bool = False
    # Quantization-aware training: run every conv through the int8 serving
    # grid (fake-quantized weights + activations, straight-through
    # gradients) so the exported int8 model keeps its quality. Validation
    # also runs fake-quant, so val PSNR/early-stopping track the QUANTIZED
    # model. Checkpoints keep the plain latent float params — quantize at
    # export (scripts/export_quantized.py). See facesr.ops.quant.
    qat: bool = False
    # Exponential moving average of the generator weights (the standard
    # SR-GAN serving trick — RealESRGAN ships params_ema; the reference
    # trainer has none). 0 = off. When on, validation / best-checkpoint
    # selection run on the EMA weights and `facesr.ckpt.load_model` serves
    # them by default (prefer_ema). Typical: 0.999.
    ema_decay: float = 0.0
    # Skip parameter/moment updates on steps whose gradients contain
    # inf/NaN — the reference's AMP GradScaler skip-step semantics
    # (trainer.py:482-505) without loss scaling (bf16 keeps the f32
    # exponent range). Value = consecutive bad steps tolerated before the
    # guard stops protecting (a persistently broken run must fail loudly,
    # not silently never update). 0 = off. The running skip count is
    # reported as the `opt_notfinite` step metric.
    skip_nonfinite_updates: int = 0
    # Multi-host write discipline: on a multi-process mesh (TPU pod) only
    # process 0 writes checkpoints / validation grids / W&B — N processes
    # race-writing the same best_model.fckpt on shared storage corrupts it.
    # Data stays sharded per host (facesr.data.loader.host_shard); training
    # state is replicated so process 0's copy IS the global state. Set True
    # only for per-host local disks that want a copy each.
    write_all_processes: bool = False


class EarlyStopping:
    """Early stopping handler (reference trainer.py:134-164)."""

    def __init__(self, patience: int = 10, mode: str = "max", min_delta: float = 0.0):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.counter = 0
        self.best_score: Optional[float] = None
        self.should_stop = False

    def __call__(self, score: float) -> bool:
        if self.best_score is None:
            self.best_score = score
            return False
        if self.mode == "max":
            improved = score > self.best_score + self.min_delta
        else:
            improved = score < self.best_score - self.min_delta
        if improved:
            self.best_score = score
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


class Trainer:
    """Sharded data-parallel training manager.

    Args:
        model: a FaceEnhanceNet-like wrapper (has .config, .params) — or pass
            (model_apply, params, model_config) style kwargs.
        train_loader / val_loader: iterables of {'hr': NHWC float32 [0,1]}
            numpy batches (see facesr.data).
        loss_fn: CombinedLoss instance (facesr.losses).
        discriminator / gan_loss handled via config.gan_weight > 0.
    """

    def __init__(
        self,
        model,
        train_loader,
        val_loader,
        loss_fn,
        config: Optional[TrainerConfig] = None,
        discriminator: Optional[tuple] = None,  # (cfg, params, stats)
        mesh=None,
        optimizer=None,
        qat_scales=None,
    ):
        """`optimizer`: optional optax GradientTransformation overriding the
        default AdamW(+clip+freeze-labels). For the transfer model's
        stage-specific per-group LRs use
        `facesr.models.transfer.make_stage_optimizer` here; the default path
        mirrors the reference's actual training (train.py:357-365: one AdamW
        LR over all unfrozen params). Epoch LR scheduling only applies when
        the optimizer carries an injected `learning_rate` hyperparameter.

        `qat_scales`: with config.qat, a calibrated int8 tree (see
        facesr.parallel.serving.load_calibrated_qparams) pins the
        fake-quant activation grid to the CALIBRATED serving scales —
        saturation included — instead of dynamic per-image scales."""
        self.config = config or TrainerConfig()
        self.model = model
        self.model_cfg = model.config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.loss_fn = loss_fn

        axes = tuple(a.strip() for a in self.config.mesh_axes.split(",") if a.strip())
        if not axes:
            raise ValueError(
                "training.mesh_axes must name at least the batch axis "
                "(e.g. 'data'), got an empty value")
        if axes[0] != self.config.mesh_axis:
            raise ValueError(
                f"mesh_axes must start with the batch axis {self.config.mesh_axis!r}, "
                f"got {axes}")
        extra = set(axes[1:]) - {"space", "model", "pp"}
        if extra:
            raise ValueError(f"Unknown mesh axes {sorted(extra)}; supported "
                             f"extra axes: space, model, pp")
        self._use_tp = "model" in axes
        self._use_pp = "pp" in axes
        if self._use_tp and self._use_pp:
            raise ValueError("mesh_axes cannot combine 'model' and 'pp': both "
                             "shard the parameter tree")
        if self._use_pp and "space" in axes:
            # Inside the pipeline's shard_map the sharding is MANUAL: XLA
            # would not insert the conv halo exchanges row sharding needs,
            # so the rows would just be gathered back (paying the axis for
            # nothing). Reject rather than silently replicate.
            raise ValueError("mesh_axes cannot combine 'space' and 'pp': the "
                             "pipelined trunk runs under manual sharding "
                             "(no automatic halo exchange); use dp x pp or "
                             "dp x sp")
        if (self._use_tp or self._use_pp) and jax.process_count() > 1:
            raise NotImplementedError(
                "tp/pp-sharded training state is single-host for now: "
                "checkpoint saves device_get the state, which requires all "
                "shards addressable by the writing process; multi-host "
                "tp/pp needs an all-gather-on-save path")
        if mesh is not None:
            self.mesh = mesh
        elif len(axes) == 1:
            self.mesh = get_mesh(axis_names=axes)
        else:
            if self.config.mesh_shape is None:
                raise ValueError(
                    "mesh_shape is required with multiple mesh_axes, e.g. "
                    "mesh_shape: [4, 2] for 'data,space' on 8 chips")
            self.mesh = get_mesh(axis_names=axes,
                                 shape=tuple(self.config.mesh_shape))
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        # Batch divisibility: the batch dim rides only the data axis (sp
        # shards rows, tp shards channels — neither constrains the batch);
        # under pp the local batch must additionally split into the
        # microbatches, so the divisor is dp * n_micro.
        data_size = int(self.mesh.shape[self.config.mesh_axis])
        if self._use_pp:
            n_micro = (self.config.pp_microbatches
                       or int(self.mesh.shape["pp"]))
            self._batch_divisor = data_size * n_micro
        else:
            self._batch_divisor = data_size
        # Multi-process: the loader feeds HOST-LOCAL batches (host_shard
        # slices), so the per-host divisibility requirement is 1/P of the
        # global one, and the data axis must split evenly over processes
        # (jax.devices() is process-major, data is the leading mesh axis).
        self._proc_count = jax.process_count()
        if self._proc_count > 1:
            if data_size % self._proc_count:
                raise ValueError(
                    f"multi-process training needs the data axis "
                    f"({data_size}) divisible by the process count "
                    f"({self._proc_count})")
            inner = self.n_devices // data_size
            if inner > 1 and jax.local_device_count() % inner:
                raise ValueError(
                    "composed mesh axes must not span process boundaries: "
                    f"local device count {jax.local_device_count()} is not "
                    f"a multiple of the non-data axes' product {inner}")
        self._local_batch_divisor = self._batch_divisor // self._proc_count

        cfgm = self.model_cfg
        if hasattr(model, "apply_fn"):
            self._model_apply = lambda p, x, train, dtype: model.apply_fn(p, x, train=train, dtype=dtype)
        else:
            self._model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfgm, train=train, dtype=dtype)
        self.model_type = getattr(model, "model_type", "custom")
        if self._use_pp:
            # Pipelined trunk: a drop-in model_apply (train AND eval steps)
            # whose residual groups run one-stage-per-device. Only the
            # FaceEnhanceNet family has the scan-stacked [G] trunk.
            if self.model_type != "custom":
                raise ValueError("mesh_axes 'pp' requires the FaceEnhanceNet "
                                 f"trunk, not model_type={self.model_type!r}")
            if self.config.qat:
                raise ValueError("qat + pipeline parallelism is not supported "
                                 "(fake-quant scale leaves break the stage "
                                 "sharding rule); use dp/sp/tp meshes for QAT")
            from facesr.parallel import make_pp_apply

            # default n_micro = S: batches are padded to a multiple of
            # dp*S (_batch_divisor), so the local batch is always a
            # multiple of S and the schedule never rejects a batch size.
            pp_stages = int(self.mesh.shape["pp"])
            apply_pp = make_pp_apply(
                cfgm, self.mesh,
                n_micro=self.config.pp_microbatches or pp_stages,
                axis="pp", dp_axis=self.config.mesh_axis)
            self._model_apply = lambda p, x, train, dtype: apply_pp(
                p, x, train=train, dtype=dtype)
        self._qat_scales = qat_scales
        self._qat_scales_frozen = False
        if self.config.qat:
            from facesr.ops.quant import fake_quant_params

            _base_apply = self._model_apply

            def _qat_apply(p, x, train, dtype):
                # runs under trace: the scales tree is captured into the
                # compiled step here, so later set_qat_scales must refuse
                self._qat_scales_frozen = True
                return _base_apply(
                    fake_quant_params(p, act_scales=self._qat_scales),
                    x, train=train, dtype=dtype)

            self._model_apply = _qat_apply
        self.compute_dtype = jnp.bfloat16 if self.config.use_amp else None
        # The mixed-precision policy extends to the loss's VGG sweep (its
        # 256^2 convs are the single most expensive part of the stage-1
        # step in f32 — BENCH.md); SSIM/pixel terms stay f32 inside apply.
        _cd = self.compute_dtype
        _vr = self.config.vgg_remat
        self._loss_apply = lambda lp, p, t: loss_fn.apply(
            lp, p, t, compute_dtype=_cd, vgg_remat=_vr)
        # Validation stays f32 end to end (the eval forward already is):
        # best-model selection / early stopping on val_loss must not compare
        # bf16-noisy values, and no backward runs so remat is moot.
        self._loss_apply_eval = lambda lp, p, t: loss_fn.apply(
            lp, p, t, compute_dtype=None, vgg_remat=False)

        # Optimizers. For the transfer model, frozen leaves (progressive
        # unfreezing) get zero updates — reference passes requires_grad=False
        # params into AdamW with the same net effect (train.py:357-365).
        param_labels = None
        if self.model_type == "transfer":
            from facesr.models import transfer as transfer_lib

            labels3 = transfer_lib.param_labels(model.params, model.current_stage)
            param_labels = jax.tree.map(
                lambda l: "frozen" if l == "frozen" else "train", labels3,
                is_leaf=lambda x: isinstance(x, str),
            )
        if optimizer is not None:
            self.tx = optimizer
            if self.config.skip_nonfinite_updates > 0:
                # a custom optimizer (e.g. the transfer model's
                # make_stage_optimizer) must not silently lose the guard
                # the config asked for — apply_if_finite wraps any optax
                # transformation
                import optax

                self.tx = optax.apply_if_finite(
                    self.tx, self.config.skip_nonfinite_updates)
        else:
            self.tx = make_optimizer(
                weight_decay=self.config.weight_decay,
                gradient_clip=self.config.gradient_clip,
                accumulation_steps=self.config.accumulation_steps,
                param_labels=param_labels,
                skip_nonfinite=self.config.skip_nonfinite_updates,
            )
        opt_state = self.tx.init(model.params)
        opt_state = set_learning_rate(opt_state, self.config.learning_rate)

        if self.config.gan_weight > 0 and discriminator is None:
            # silently dropping the adversarial term would make a "GAN" run
            # produce stage-1-style results with no trace of why
            raise ValueError(
                "gan_weight > 0 but no discriminator was provided — pass "
                "the (config, params, stats) tuple from "
                "create_discriminator, or set gan_weight to 0")
        self.use_gan = self.config.gan_weight > 0 and discriminator is not None
        d_params = d_stats = d_opt_state = None
        self.tx_d = None
        self.disc_cfg = None
        if self.use_gan:
            self.disc_cfg, d_params, d_stats = discriminator
            self.tx_d = make_optimizer(
                weight_decay=self.config.d_weight_decay,
                gradient_clip=0.0,
                # the reference keeps a separate D GradScaler
                # (trainer.py:229-249) — same skip semantics here
                skip_nonfinite=self.config.skip_nonfinite_updates,
            )
            d_opt_state = self.tx_d.init(d_params)
            d_opt_state = set_learning_rate(d_opt_state, self.config.d_learning_rate)

        self.use_ema = self.config.ema_decay > 0
        ema_params = steps_lib.init_ema(model.params) if self.use_ema else None
        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=model.params,
            opt_state=opt_state,
            loss_params=loss_fn.params,
            d_params=d_params,
            d_stats=d_stats,
            d_opt_state=d_opt_state,
            ema_params=ema_params,
        )
        # State placement: replicated for dp/sp; a path/shape-ruled sharding
        # tree for tp (kernels + moments over 'model' channels) and pp
        # (groups + their moments over 'pp' stages). load_checkpoint places
        # every restore through the same self._state_sharding tree.
        if self._use_tp:
            from facesr.parallel import tp_param_shardings

            self._state_sharding = tp_param_shardings(self.state, self.mesh,
                                                      axis="model")
        elif self._use_pp:
            from facesr.parallel import pp_param_shardings

            self._state_sharding = pp_param_shardings(self.state, self.mesh,
                                                      axis="pp")
        else:
            self._state_sharding = replicated(self.mesh)
        self.state = jax.device_put(self.state, self._state_sharding)

        # Jitted steps with explicit shardings (batch sharded over `data`,
        # and over 'space' rows too on a dp x sp mesh). tp/pp pin
        # out_shardings so step outputs feed the next step in-layout.
        repl = self._state_sharding
        state_out = (repl, None) if (self._use_tp or self._use_pp) else None
        if "space" in axes:
            from facesr.parallel import grid_sharding

            bsh = grid_sharding(self.mesh, batch_axis=self.config.mesh_axis,
                                row_axis="space")
        else:
            bsh = batch_sharding(self.mesh, self.config.mesh_axis)
        self._batch_sharding = bsh

        self._grad_norms_on = self.config.log_gradients_every > 0
        self.gradient_monitor = None
        if self._grad_norms_on:
            from facesr.training.callbacks import GradientMonitor

            self.gradient_monitor = GradientMonitor()

        content_step = steps_lib.make_train_step(
            self._model_apply, self._loss_apply, self.tx,
            scale_factor=self.config.scale_factor, compute_dtype=self.compute_dtype,
            grad_norms=self._grad_norms_on,
            ema_decay=self.config.ema_decay,
        )
        self._content_step = jax.jit(
            content_step, in_shardings=(repl, bsh), out_shardings=state_out,
            donate_argnums=0
        )
        self._gan_step = None
        if self.use_gan:
            dcfg = self.disc_cfg
            disc_apply = lambda p, s, x, train: disc_lib.apply(
                p, s, x, dcfg, train=train, dtype=self.compute_dtype)
            gan_step = steps_lib.make_gan_train_step(
                self._model_apply, self._loss_apply, disc_apply, self.tx, self.tx_d,
                scale_factor=self.config.scale_factor,
                gan_weight=self.config.gan_weight,
                gan_type=self.config.gan_type,
                d_updates_per_g=self.config.d_updates_per_g,
                compute_dtype=self.compute_dtype,
                grad_norms=self._grad_norms_on,
                ema_decay=self.config.ema_decay,
                # BN running stats sit outside the optimizer guard —
                # revert them on non-finite steps
                guard_stats=self.config.skip_nonfinite_updates > 0,
            )
            self._gan_step = jax.jit(gan_step, in_shardings=(repl, bsh),
                                     out_shardings=state_out, donate_argnums=0)

        eval_step = steps_lib.make_eval_step(
            self._model_apply, self._loss_apply_eval,
            scale_factor=self.config.scale_factor,
            use_ema=self.use_ema,
        )
        self._eval_step = jax.jit(eval_step, in_shardings=(repl, bsh))

        # Scheduler / early stopping / bookkeeping
        self.plateau = (
            schedules.ReduceLROnPlateau(self.config.learning_rate)
            if self.config.scheduler_type == "plateau" else None
        )
        self.early_stopping = EarlyStopping(
            patience=self.config.early_stopping_patience,
            mode=self.config.early_stopping_mode,
        )
        self.checkpoint_dir = Path(self.config.checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self._warned_pad = False
        self._warned_trim = False
        self._last_val_batches = 1
        self.best_metric: Optional[float] = None
        self.current_epoch = 0
        self.global_step = 0
        self.current_lr = self.config.learning_rate
        self.training_history: Dict[str, List] = {
            "train_loss": [],
            "val_loss": [],
            "val_psnr": [],
            "val_ssim": [],
            "learning_rate": [],
        }
        if self.use_gan:
            for k in ("d_loss", "g_loss", "d_real", "d_fake"):
                self.training_history[k] = []

        # one writer per pod: every host computes identical replicated state,
        # so process 0's copy is the global state (TrainerConfig doc)
        self.is_writer = (bool(self.config.write_all_processes)
                          or jax.process_index() == 0)
        self._warned_nonwriter = False
        self._ckpt_pool = None  # lazy single-thread FIFO checkpoint writer
        self._ckpt_futures = []

        self.use_wandb = (self.config.use_wandb and WANDB_AVAILABLE
                          and self.is_writer)
        if self.use_wandb:
            self._init_wandb()

    # ------------------------------------------------------------------
    def set_qat_scales(self, qat_scales) -> None:
        """Pin the fake-quant grid to calibrated scales AFTER construction
        (but before any step has traced). Exists because the calibration
        provenance check must see the weights the trainer will actually
        train — i.e. run after load_checkpoint, which happens after
        __init__ (scripts/train.py --resume + --qat-scales)."""
        if not self.config.qat:
            raise ValueError("set_qat_scales requires config.qat")
        if self._qat_scales_frozen:
            raise RuntimeError(
                "a training/eval step already traced with the previous "
                "qat_scales; set them before the first step")
        self._qat_scales = qat_scales

    # ------------------------------------------------------------------
    def _init_wandb(self):
        wandb.init(
            project=self.config.wandb_project,
            config={
                "epochs": self.config.epochs,
                "learning_rate": self.config.learning_rate,
                "weight_decay": self.config.weight_decay,
                "gradient_clip": self.config.gradient_clip,
                "use_amp": self.config.use_amp,
                "model": type(self.model).__name__,
                "n_devices": self.n_devices,
            },
        )

    def _epoch_lr(self, epoch: int) -> float:
        return schedules.compute_lr(
            self.config.scheduler_type,
            self.config.learning_rate,
            epoch,
            T_max=self.config.scheduler_T_max,
            eta_min=self.config.scheduler_eta_min,
            step_size=self.config.scheduler_step_size,
            gamma=self.config.scheduler_gamma,
            plateau=self.plateau,
        )

    def _set_lr(self, lr: float) -> None:
        # current_lr None = unknown (e.g. right after a full resume, where
        # the restored opt_state carries the CHECKPOINT's LR): always apply.
        if self.current_lr is None or abs(lr - self.current_lr) > 1e-12:
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )
        self.current_lr = lr

    def _shard_hr(self, hr: np.ndarray) -> jax.Array:
        """Make the batch divisible by the mesh. Remainder samples are
        DROPPED (duplicating them would silently overweight the last sample
        in gradients and bias validation metrics); only a batch smaller than
        the mesh itself is padded by repetition, with a warning.

        Multi-process: `hr` is this host's host_shard-ed loader batch; the
        global batch (P x local rows) is assembled with
        jax.make_array_from_process_local_data, so every host's samples
        land on its own devices and ALL loaded data trains. A plain
        device_put here would instead treat each host's local batch as the
        global array and keep only its addressable 1/P of it — silently
        training on 1/P of the dataset per epoch."""
        hr = np.asarray(hr)
        n = hr.shape[0]
        div = self._local_batch_divisor
        rem = n % div
        if rem:
            if n >= div:
                if not self._warned_trim:
                    print(f"Warning: batch of {n} trimmed to "
                          f"{n - rem} for mesh_axes={self.config.mesh_axes} "
                          f"({rem} samples dropped per batch — pick a "
                          f"batch_size divisible by {div})")
                    self._warned_trim = True
                hr = hr[: n - rem]
            else:
                if not self._warned_pad:
                    print(f"Warning: batch of {n} padded by repetition to a "
                          f"multiple of {div} for "
                          f"mesh_axes={self.config.mesh_axes}; metrics over "
                          "this batch include duplicate samples")
                    self._warned_pad = True
                hr, _ = pad_to_multiple(hr, div)
        if "space" in self.mesh.axis_names:
            rows = int(self.mesh.shape["space"])
            if hr.shape[1] % rows:
                raise ValueError(
                    f"image height {hr.shape[1]} must divide over the "
                    f"{rows}-way 'space' axis (pick an hr_patch_size "
                    f"divisible by {rows})")
        if self._proc_count > 1:
            global_shape = (hr.shape[0] * self._proc_count,) + hr.shape[1:]
            return jax.make_array_from_process_local_data(
                self._batch_sharding, hr, global_shape)
        return jax.device_put(hr, self._batch_sharding)

    # ------------------------------------------------------------------
    def memory_report(self, batch_size: int, hr_size: int,
                      gan: Optional[bool] = None, echo: bool = True) -> dict:
        """Per-device HBM budget of the train step (XLA buffer assignment,
        no execution — facesr.utils.profiling.memory_report). On composed
        meshes this shows the capability claims directly: tp/pp cut the
        per-chip argument bytes (params + Adam moments shards), dp/sp cut
        the batch/temp bytes. Adds one AOT compile of the step."""
        from facesr.utils.profiling import memory_report, format_memory_report

        use_gan = self.use_gan if gan is None else gan
        if use_gan and self._gan_step is None:
            raise ValueError("memory_report(gan=True) needs a GAN trainer "
                             "(config.gan_weight > 0 and a discriminator)")
        step = self._gan_step if use_gan else self._content_step
        if batch_size % self._batch_divisor:
            # lowering a shape the train loop would trim/pad would report a
            # different program than training executes
            raise ValueError(
                f"batch_size {batch_size} is not a multiple of "
                f"{self._batch_divisor} (mesh_axes="
                f"{self.config.mesh_axes}); the train loop would reshape it")
        hr_spec = jax.ShapeDtypeStruct(
            (batch_size, hr_size, hr_size, 3), jnp.float32,
            sharding=self._batch_sharding)
        report = memory_report(step, self.state, hr_spec)
        if echo:
            label = (f"{'GAN' if use_gan else 'content'} step, "
                     f"mesh_axes={self.config.mesh_axes}, "
                     f"batch={batch_size}@{hr_size}px")
            print(format_memory_report(report, label))
        return report

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        """Full training loop (reference trainer.py:326-388)."""
        print(f"Starting training on {self.n_devices} device(s): "
              f"{self.mesh.devices.flat[0].platform}")
        print(f"Epochs: {self.config.epochs}")
        if self.current_epoch >= self.config.epochs:
            print(f"Warning: resumed at epoch {self.current_epoch} >= "
                  f"configured epochs {self.config.epochs}; nothing to train. "
                  "Use weights-only loading (--fine-tune) to start a new stage.")

        for epoch in range(self.current_epoch, self.config.epochs):
            self.current_epoch = epoch
            self._set_lr(self._epoch_lr(epoch))

            train_metrics = self._train_epoch()
            val_metrics = self._validate_epoch()

            if self.plateau is not None and self._last_val_batches > 0:
                self.plateau.step(val_metrics["psnr"])

            self._log_epoch_metrics(epoch, train_metrics, val_metrics, self.current_lr)

            if self.config.save_every and (epoch + 1) % self.config.save_every == 0:
                self.save_checkpoint(f"epoch_{epoch + 1}.fckpt")

            metric_key = self.config.early_stopping_metric.replace("val_", "")
            metric_value = val_metrics.get(metric_key, val_metrics.get("psnr", 0.0))
            if self._last_val_batches > 0:  # zero-batch val = garbage metrics
                if self.config.save_best and self._is_best(metric_value):
                    self.save_checkpoint("best_model.fckpt", is_best=True)

                if self.early_stopping(metric_value):
                    print(f"\nEarly stopping triggered at epoch {epoch + 1}")
                    break

        self.save_checkpoint("final_model.fckpt")
        self.flush_checkpoints()
        if self.use_wandb:
            wandb.finish()
        return self.training_history

    def _train_epoch(self) -> Dict[str, float]:
        gan_active = self.use_gan and self.current_epoch >= self.config.gan_start_epoch
        step_fn = self._gan_step if gan_active else self._content_step

        # Metrics stay on-device so steps pipeline without a per-step host
        # sync (the reference's .item()-per-batch pattern serializes
        # dispatch; on a tunneled TPU that dominates step time). The queue
        # is throttled every few steps: an unbounded async queue of
        # replicated programs can blow XLA:CPU's collective-rendezvous
        # timeout on virtual multi-device meshes.
        pending: list = []
        num_batches = 0
        t0 = time.time()
        for batch in self.train_loader:
            hr = self._shard_hr(batch["hr"])
            self.state, metrics = step_fn(self.state, hr)
            grad_norms = metrics.pop("grad_norms", None)
            pending.append(metrics)
            num_batches += 1
            self.global_step += 1
            if (grad_norms is not None
                    and self.global_step % self.config.log_gradients_every == 0):
                norms_host = jax.device_get(grad_norms)
                layer_norms = self.gradient_monitor.update(norms_host)
                if self.use_wandb:
                    wandb.log({f"grads/{k}": v for k, v in layer_norms.items()}
                              | {"train/step": self.global_step})
            postfix_due = (self.config.step_log_every > 0
                           and num_batches % self.config.step_log_every == 0)
            if num_batches % 8 == 0 or postfix_due:
                jax.block_until_ready(metrics["loss"])
                loss_now = float(metrics["loss"])
                if postfix_due:
                    total = f"/{len(self.train_loader)}" if hasattr(
                        self.train_loader, "__len__") else ""
                    print(f"  step {num_batches}{total} "
                          f"loss {loss_now:.4f}",
                          end="\r" if sys.stdout.isatty() else "\n",
                          flush=True)
            if (self.use_wandb and self.config.log_every
                    and self.global_step % self.config.log_every == 0):
                metrics_host = {k: float(v) for k, v in metrics.items()}
                wandb.log({f"train/{k}": v for k, v in metrics_host.items()}
                          | {"train/step": self.global_step})

        if num_batches == 0:
            # batch_size > dataset with drop_last yields silent zero-step
            # "epochs" (loss 0.0) — make the misconfiguration loud
            print("WARNING: train loader yielded 0 batches this epoch — "
                  "is batch_size larger than the training split "
                  "(drop_last removes the only partial batch)? "
                  "No optimization happened.")

        totals: Dict[str, float] = {}
        last: Dict[str, float] = {}
        # ONE host transfer for the whole epoch's metric scalars — a
        # float(v) per scalar would round-trip the tunnel per value
        for metrics in jax.device_get(pending):
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
                last[k] = float(v)

        out = {k: v / max(num_batches, 1) for k, v in totals.items()}
        # cumulative counters: averaging a running total is meaningless —
        # the epoch value is the LAST step's count
        for k in ("opt_notfinite", "d_opt_notfinite"):
            if k in last:
                out[k] = last[k]
        out["time_s"] = time.time() - t0
        out.setdefault("loss", 0.0)
        return out

    def _validate_epoch(self) -> Dict[str, float]:
        totals = {"loss": 0.0, "psnr": 0.0, "ssim": 0.0}
        num_batches = 0
        sample = None
        pending = []
        for batch_idx, batch in enumerate(self.val_loader):
            hr = self._shard_hr(batch["hr"])
            metrics, sr, lr_img = self._eval_step(self.state, hr)
            # accumulate device scalars; float() here would serialize eval
            # dispatch on the tunnel round-trip per batch — the same
            # per-batch .item() stall _train_epoch documents avoiding
            pending.append(metrics)
            num_batches += 1
            if batch_idx == 0 and self._proc_count == 1:
                # multi-process: rows [:8] of the global batch live on
                # process 0's devices only — np.asarray would raise on the
                # other hosts (non-addressable shards), so pods skip the
                # validation-grid sample; metrics are unaffected
                sample = (np.asarray(lr_img[:8]), np.asarray(sr[:8]), np.asarray(hr[:8]))

        # ONE host sync for the whole epoch's metric scalars
        for m in jax.device_get(pending):
            for k in totals:
                totals[k] += float(m[k])

        self._last_val_batches = num_batches
        if num_batches == 0:
            print("WARNING: val loader yielded 0 batches — all validation "
                  "metrics are 0.0 and best-model selection / early "
                  "stopping are skipped this epoch. Is the val split "
                  "smaller than the batch size?")
        metrics = {k: v / max(num_batches, 1) for k, v in totals.items()}
        if sample is not None and self.is_writer:
            try:
                save_validation_grid(*sample, epoch=self.current_epoch,
                                     save_dir=self.config.log_dir)
            except Exception as e:  # visualization must never kill training
                print(f"Warning: failed to save validation grid: {e}")
            # Sample images to W&B every log_images_every epochs
            # (reference trainer.py:610-617, 667-683).
            if (self.use_wandb and self.config.log_images_every
                    and self.current_epoch % self.config.log_images_every == 0):
                lr_s, sr_s, hr_s = sample
                wandb.log({
                    "samples/lr": wandb.Image(np.clip(lr_s[0], 0, 1), caption="Low Resolution"),
                    "samples/sr": wandb.Image(np.clip(sr_s[0], 0, 1), caption="Super Resolution"),
                    "samples/hr": wandb.Image(np.clip(hr_s[0], 0, 1), caption="High Resolution"),
                })
        return metrics

    # ------------------------------------------------------------------
    def _log_epoch_metrics(self, epoch, train_metrics, val_metrics, lr):
        self.training_history["train_loss"].append(train_metrics["loss"])
        self.training_history["val_loss"].append(val_metrics["loss"])
        self.training_history["val_psnr"].append(val_metrics["psnr"])
        self.training_history["val_ssim"].append(val_metrics["ssim"])
        self.training_history["learning_rate"].append(lr)
        if self.use_gan:
            # append every epoch (0.0 during pre-GAN warmup epochs) so the
            # GAN series stay index-aligned with train_loss/val_psnr — a
            # gan_start_epoch > 0 would otherwise shift every plotted GAN
            # curve left by the warmup length (plot_training_stages plots
            # each list against its own index)
            self.training_history["d_loss"].append(train_metrics.get("d_loss", 0.0))
            self.training_history["g_loss"].append(train_metrics.get("g_adv", 0.0))
            self.training_history["d_real"].append(train_metrics.get("d_real", 0.0))
            self.training_history["d_fake"].append(train_metrics.get("d_fake", 0.0))

        print(f"\nEpoch {epoch + 1}/{self.config.epochs}")
        print(f"  Train Loss: {train_metrics['loss']:.4f}")
        print(f"  Val Loss:   {val_metrics['loss']:.4f}")
        print(f"  Val PSNR:   {val_metrics['psnr']:.2f} dB")
        print(f"  Val SSIM:   {val_metrics['ssim']:.4f}")
        print(f"  LR:         {lr:.2e}  ({train_metrics.get('time_s', 0):.1f}s)")

        if self.use_wandb:
            wandb.log({
                "epoch": epoch + 1,
                "train/epoch_loss": train_metrics["loss"],
                "val/loss": val_metrics["loss"],
                "val/psnr": val_metrics["psnr"],
                "val/ssim": val_metrics["ssim"],
                "learning_rate": lr,
            })

    def _is_best(self, metric_value: float) -> bool:
        if self.best_metric is None:
            self.best_metric = metric_value
            return True
        better = (metric_value > self.best_metric
                  if self.config.early_stopping_mode == "max"
                  else metric_value < self.best_metric)
        if better:
            self.best_metric = metric_value
        return better

    # ------------------------------------------------------------------
    def save_checkpoint(self, filename: str, is_best: bool = False) -> None:
        """Reference checkpoint payload (trainer.py:701-723), msgpack format.

        No-op on non-writer processes (multi-host write discipline — see
        TrainerConfig.write_all_processes); covers every caller incl. the
        SIGTERM/KeyboardInterrupt paths."""
        if not self.is_writer:
            if not self._warned_nonwriter:
                print(f"process {jax.process_index()}: checkpoint writes "
                      f"delegated to process 0 (write_all_processes=False)")
                self._warned_nonwriter = True
            if is_best:
                print(f"  New best model: {self.best_metric:.4f} "
                      f"(saved by process 0)")
            return
        state_dict = serialization.to_state_dict(self.state)
        meta = {
            "epoch": self.current_epoch,
            "global_step": self.global_step,
            "best_metric": self.best_metric,
            "training_history": self.training_history,
            "config": asdict(self.config),
            "model_config": asdict(self.model_cfg),
            "model_type": self.model_type,
            "scheduler_state": self.plateau.state_dict() if self.plateau else None,
            "use_gan": self.use_gan,
        }
        path = str(self.checkpoint_dir / filename)
        if self.config.async_checkpoint:
            # materialize to host NOW (donation safety), write in background;
            # snapshot meta too — it references the live training_history,
            # which the main thread keeps appending to while the writer
            # serializes
            import copy

            meta = copy.deepcopy(meta)
            state_host = jax.device_get(state_dict)
            if self._ckpt_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._ckpt_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt-writer")
            # submit FIRST, reap after: an earlier write's failure must not
            # abort THIS save (the SIGTERM interrupted.fckpt in particular
            # must be enqueued before any stale error is re-raised)
            self._ckpt_futures.append(
                self._ckpt_pool.submit(save_checkpoint, path, state_host, meta))
            self._reap_ckpt_errors(wait=False)
        else:
            save_checkpoint(path, state_dict, meta)
        if is_best:
            print(f"  New best model saved: {self.best_metric:.4f}")

    def _reap_ckpt_errors(self, wait: bool) -> None:
        # Prune FIRST, raise AFTER: a failed future must be consumed by the
        # raise that reports it, never re-raised by every later save — that
        # would poison subsequent checkpoints (including the SIGTERM
        # interrupted.fckpt, which must still be enqueued after a transient
        # earlier failure). With wait=True all futures are awaited before
        # any error surfaces, honoring flush_checkpoints' contract.
        pending, errors = [], []
        for fut in self._ckpt_futures:
            if fut.done() or wait:
                exc = fut.exception()  # blocks if wait and not done
                if exc is not None:
                    errors.append(exc)
            else:
                pending.append(fut)
        self._ckpt_futures = pending
        if errors:
            # a lost checkpoint must be loud, not a silent thread death
            raise RuntimeError(
                f"async checkpoint write(s) failed: {errors}")

    def flush_checkpoints(self) -> None:
        """Block until every queued checkpoint write has hit disk (raises if
        any failed, after awaiting all of them). Called at train() end and
        before loads; call it before reading checkpoint files written by
        this trainer. Also retires the writer thread so Trainer-per-
        experiment patterns (grid search) don't accumulate idle threads."""
        try:
            self._reap_ckpt_errors(wait=True)
        finally:
            if self._ckpt_pool is not None:
                self._ckpt_pool.shutdown(wait=True)
                self._ckpt_pool = None

    def load_checkpoint(self, path: str, weights_only: bool = False) -> None:
        """Full resume vs weights-only fine-tune (reference trainer.py:725-760)."""
        self.flush_checkpoints()  # the file may still be in the write queue
        tree, meta = load_checkpoint(path, target=None)

        if weights_only:
            params = serialization.from_state_dict(
                jax.device_get(self.state.params), tree["params"]
            )
            # EMA restarts from the loaded weights (fresh stage, fresh average)
            ema = steps_lib.init_ema(params) if self.use_ema else None
            psh = (self._state_sharding.params
                   if (self._use_tp or self._use_pp) else self._state_sharding)
            esh = (self._state_sharding.ema_params
                   if (self._use_tp or self._use_pp) else self._state_sharding)
            self.state = self.state.replace(
                params=jax.device_put(params, psh),
                ema_params=jax.device_put(ema, esh) if ema is not None else None)
            print(f"Loaded model weights from epoch {meta.get('epoch')} (fine-tuning mode)")
            print(f"  Starting fresh with LR={self.config.learning_rate}")
            return

        # EMA compatibility: pre-EMA checkpoints lack the field, and the
        # flag may differ between the checkpoint and this run. Normalize the
        # tree to THIS trainer's EMA structure: seed a fresh average from
        # the checkpoint's params when turning EMA on, drop a stored average
        # when it is off.
        tree = dict(tree)
        if self.use_ema and tree.get("ema_params") is None:
            tree["ema_params"] = jax.tree.map(np.asarray, tree["params"])
        elif not self.use_ema:
            # also INSERTS the key for pre-EMA checkpoints — from_state_dict
            # requires every TrainState field to be present
            tree["ema_params"] = None

        if self.use_gan and not meta.get("use_gan", False):
            # Full resume of a non-GAN checkpoint into a GAN trainer: restore
            # the generator side, keep the freshly-initialized D state.
            host = jax.device_get(self.state)
            restored = host.replace(
                step=serialization.from_state_dict(host.step, tree["step"]),
                params=serialization.from_state_dict(host.params, tree["params"]),
                opt_state=serialization.from_state_dict(host.opt_state, tree["opt_state"]),
                ema_params=(serialization.from_state_dict(
                    host.ema_params, tree["ema_params"])
                    if self.use_ema else None),
            )
            print("  Checkpoint has no discriminator state; D starts fresh")
        else:
            restored = serialization.from_state_dict(jax.device_get(self.state), tree)
        self.state = jax.device_put(restored, self._state_sharding)
        # the restored opt_state carries the checkpoint's LR; mark ours
        # unknown so the first epoch's _set_lr unconditionally applies the
        # schedule instead of skipping on a stale equality check
        self.current_lr = None
        self.current_epoch = meta["epoch"] + 1
        self.global_step = meta["global_step"]
        self.best_metric = meta["best_metric"]
        self.training_history = meta["training_history"]
        # a checkpoint from a differently-configured trainer (e.g. non-GAN
        # stage 1 resumed into a GAN trainer) lacks keys _log_epoch_metrics
        # appends to every epoch — backfill like __init__ does, or the
        # first resumed epoch dies with a KeyError AFTER training it
        for k in ("train_loss", "val_loss", "val_psnr", "val_ssim",
                  "learning_rate"):
            self.training_history.setdefault(k, [])
        if self.use_gan:
            for k in ("d_loss", "g_loss", "d_real", "d_fake"):
                self.training_history.setdefault(k, [])
        if self.plateau is not None and meta.get("scheduler_state"):
            self.plateau.load_state_dict(meta["scheduler_state"])
        print(f"Loaded checkpoint from epoch {meta['epoch'] + 1}")


def overfit_test(
    model,
    dataloader,
    loss_fn=None,
    num_images: int = 10,
    num_iterations: int = 1000,
    learning_rate: float = 2e-4,
    mesh=None,
) -> Dict[str, Any]:
    """Overfit sanity harness (reference trainer.py:763-848): overfit
    `num_images` HR crops with pure MSE; converged iff final PSNR > 35 dB.
    The SR output is clamped to [0,1] *before* the loss, as in the reference
    (trainer.py:819). `loss_fn` is accepted for signature parity but — like
    the reference ("Use pure MSE for overfitting test", trainer.py:790) —
    deliberately unused: the harness optimizes PSNR directly."""
    print(f"\nOverfitting test on {num_images} images...")
    mesh = mesh if mesh is not None else get_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    batch = next(iter(dataloader))
    hr = np.asarray(batch["hr"][:num_images], dtype=np.float32)
    hr, _ = pad_to_multiple(hr, n_dev)
    hr_dev = jax.device_put(hr, batch_sharding(mesh))

    cfg = model.config
    scale = getattr(cfg, "scale_factor", getattr(cfg, "scale", 4))
    apply_fn = (model.apply_fn if hasattr(model, "apply_fn")
                else (lambda p, x, train=False, dtype=None: fen.apply(p, x, cfg, train=train, dtype=dtype)))
    tx = optax.adam(learning_rate)
    params = replicate(model.params, mesh)
    opt_state = replicate(tx.init(params), mesh)

    from facesr.ops import bicubic_down

    @jax.jit
    def step(params, opt_state, hr):
        lr_img = bicubic_down(hr, scale)

        def loss_f(p):
            sr = apply_fn(p, lr_img, train=True)
            sr = jnp.clip(sr, 0.0, 1.0)
            mse = jnp.mean((sr - hr) ** 2)
            return mse

        mse, grads = jax.value_and_grad(loss_f)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        return params, opt_state, mse, psnr

    losses, psnrs = [], []
    for i in range(num_iterations):
        params, opt_state, mse, psnr = step(params, opt_state, hr_dev)
        # Per-iteration sync: on multi-device CPU meshes a deep async queue
        # of replicated programs can blow XLA's collective-rendezvous
        # timeout (fatal abort); fetching the scalar keeps device queues in
        # lockstep and costs nothing on a real accelerator at this scale.
        mse_host = float(mse)
        if i % 50 == 0 or i == num_iterations - 1:
            losses.append(mse_host)
            psnrs.append(float(psnr))
            print(f"  iter {i}: loss={losses[-1]:.6f} psnr={psnrs[-1]:.2f}")

    results = {
        "final_loss": losses[-1],
        "final_psnr": psnrs[-1],
        "loss_history": losses,
        "psnr_history": psnrs,
        "converged": psnrs[-1] > 35,
    }
    print(f"\nOverfit test results:")
    print(f"  Final loss: {results['final_loss']:.6f}")
    print(f"  Final PSNR: {results['final_psnr']:.2f} dB")
    print(f"  Converged: {results['converged']}")
    model.params = jax.device_get(params)
    return results
