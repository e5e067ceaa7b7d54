"""Pipeline parallelism (pp) over the residual-group trunk.

The reference is single-GPU (SURVEY.md §5: no distributed layer exists);
this is the fourth TPU-native scaling axis after dp / sp / tp. Unlike
those three — which are pure sharding annotations that XLA SPMD turns into
collectives — a pipeline needs a *schedule*, so the trunk runs under
`jax.shard_map` with an explicit microbatch loop and `lax.ppermute`
stage-to-stage transfers riding ICI neighbor links.

Design (TPU-first, not a port — the reference has nothing to port):

  - The flagship model is conv_first -> G residual groups (scan-stacked,
    leading [G] axis on every leaf) -> tail. >97% of FLOPs are in the
    groups, and their scan-stacked layout makes stage assignment a plain
    leading-axis sharding: stage i owns groups [i*G/S, (i+1)*G/S).
  - Only the trunk is pipelined (`fen.apply(trunk_fn=...)` hook). The
    tiny head/tail (conv_first, conv_after_body, upsample, conv_last,
    bicubic skip — <3% of FLOPs) stay ordinary replicated SPMD code, so
    the loss / GAN / optimizer machinery is completely unchanged: the
    pp apply is a drop-in `model_apply` for `make_train_step`.
  - Schedule: GPipe-style. The local batch is split into `n_micro`
    microbatches; at step t stage 0 injects microbatch t, every stage
    applies its local groups, activations shift one stage down the open
    chain (stage 0 receives zeros during drain), and the last stage
    banks finished microbatches. T = n_micro + S - 1 steps; bubble
    fraction (S-1)/T shrinks as n_micro grows.
  - Autodiff: `shard_map`/`ppermute`/`lax.scan` are all differentiable —
    `jax.grad` of the pipelined forward IS the reverse pipeline (the
    ppermute transpose shifts cotangents stage-up), so gradients of the
    group params land on (and stay on) their owning stage. GPipe
    activation stash: the scan saves one carry per timestep; the
    per-RCAB interior tensors follow the model's remat policy.
  - Composes with dp: on a ("data", "pp") mesh the batch rides the data
    axis into the shard_map (each pp chain pipelines its local batch
    shard) — see `make_pp_apply(dp_axis=...)`.

Because every trunk op is per-sample independent, pipelined microbatching
is numerically identical to the full-batch trunk — exactness vs the
single-device forward and train step is gated in tests/test_parallel.py.

Why pp at all for a 4.9M-param model: like tp it is a capability axis —
it bounds per-chip params+optimizer+activation memory by 1/S with only
neighbor (not all-to-all) communication, the right shape for scaling the
trunk depth (groups) far past HBM, and it demonstrates the framework's
schedule-based parallelism alongside the sharding-based axes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facesr.models import blocks

__all__ = ["pp_param_shardings", "make_pp_apply", "pipeline_trunk"]


def pp_param_shardings(tree: Any, mesh: Mesh, axis: str = "pp") -> Any:
    """Sharding tree for pipeline parallelism: every leaf under a `groups`
    path is sharded on its leading [G] axis over `axis` (stage i holds its
    own groups' params — and, because optimizer moments mirror the param
    paths, its Adam moments too); everything else is replicated over
    `axis`. Like `tp_param_shardings` this applies to a whole TrainState.
    """
    n = int(mesh.shape[axis])

    def rule(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        shape = np.shape(leaf)
        if "groups" in keys and len(shape) >= 1 and shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return treedef.unflatten([rule(p, l) for p, l in flat])


def pipeline_trunk(
    gp_local: Any,
    feat: jax.Array,
    *,
    res_scale: float,
    padding: int,
    n_micro: int,
    n_stages: int,
    axis: str,
    remat: str,
) -> jax.Array:
    """Per-device body of the pipelined trunk (runs inside shard_map).

    gp_local: this stage's groups shard (leading axis G/S).
    feat: the local [N, H, W, C] trunk input (full batch per pp chain).
    """
    stage = lax.axis_index(axis)
    n = feat.shape[0]
    if n % n_micro:
        raise ValueError(
            f"pipeline n_micro={n_micro} must divide the local batch {n}")
    mb = n // n_micro
    micro = feat.reshape((n_micro, mb) + feat.shape[1:])
    t_total = n_micro + n_stages - 1

    def body(carry, t):
        recv, out_buf = carry
        inj = jnp.clip(t, 0, n_micro - 1)
        x_in = jnp.where(
            stage == 0, lax.dynamic_index_in_dim(micro, inj, keepdims=False),
            recv)
        y, _ = blocks.residual_groups(gp_local, x_in, res_scale, padding,
                                      remat=remat)
        # Open-chain shift: stage i -> i+1; stage 0 receives zeros (drain).
        if n_stages > 1:
            nxt = lax.ppermute(y, axis,
                               [(i, i + 1) for i in range(n_stages - 1)])
        else:
            nxt = recv
        # Last stage banks microbatch m = t - (S-1) once it's finished.
        m = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        store = jnp.logical_and(stage == n_stages - 1, t >= n_stages - 1)
        cur = lax.dynamic_index_in_dim(out_buf, m, keepdims=False)
        out_buf = lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(store, y, cur), m, 0)
        return (recv if n_stages == 1 else nxt, out_buf), None

    init = (jnp.zeros_like(micro[0]), jnp.zeros_like(micro))
    # The carry is stage-varying (stage-dependent selects / ppermute) while
    # its zeros-init derives from the pp-replicated input; align the
    # varying-axis types up front so the scan carry typechecks.
    if hasattr(lax, "pcast"):
        init = lax.pcast(init, axis, to="varying")
    elif hasattr(lax, "pvary"):  # older spelling
        init = lax.pvary(init, axis)
    (_, out_buf), _ = lax.scan(body, init, jnp.arange(t_total))
    # Replicate the finished trunk output from the last stage to the whole
    # pp chain (one broadcast of the LR-size feature map; the tail it feeds
    # is <3% of FLOPs, so replicated tail compute is the simple/correct
    # trade — a later optimization could run the tail on the last stage
    # only and defer the gather to the SR output).
    out_buf = lax.psum(
        jnp.where(stage == n_stages - 1, out_buf, jnp.zeros_like(out_buf)),
        axis)
    return out_buf.reshape(feat.shape)


def make_pp_apply(
    cfg,
    mesh: Mesh,
    n_micro: Optional[int] = None,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
) -> Callable:
    """Build a drop-in `model_apply(params, x, train=..., dtype=...)` whose
    residual-group trunk runs as an S-stage microbatch pipeline over
    `mesh[axis]` (S = mesh.shape[axis], cfg.num_groups % S == 0).

    Feed it to `make_train_step`/`make_gan_train_step` unchanged; jit the
    step with `in_shardings=(pp_param_shardings(state, mesh, axis),
    <batch sharding>)`. With `dp_axis` set, the batch additionally rides
    that mesh axis (dp x pp composition): each pp chain pipelines its own
    batch shard.

    n_micro defaults to 2*S (bubble fraction (S-1)/(2S+S-1) ~ 1/3; raise
    it to amortize further when the local batch allows).
    """
    import facesr.models.face_enhance_net as fen

    n_stages = int(mesh.shape[axis])
    if cfg.num_groups % n_stages:
        raise ValueError(
            f"num_groups={cfg.num_groups} must divide over {n_stages} "
            f"pipeline stages")
    if n_micro is None:
        n_micro = 2 * n_stages
    data_spec = P(dp_axis) if dp_axis else P()

    def trunk(gp, feat, train):
        fn = jax.shard_map(
            partial(
                pipeline_trunk,
                res_scale=cfg.res_scale,
                padding=cfg.kernel_size // 2,
                n_micro=n_micro,
                n_stages=n_stages,
                axis=axis,
                remat=cfg.remat if train else "none",
            ),
            mesh=mesh,
            in_specs=(P(axis), data_spec),
            out_specs=data_spec,
        )
        return fn(gp, feat)

    def apply_fn(params, x, train=False, dtype=None):
        return fen.apply(params, x, cfg, train=train, dtype=dtype,
                         trunk_fn=partial(trunk, train=train))

    return apply_fn
