"""Parallelism tests: sharding utilities and data-parallel consistency —
the 8-device sharded train step must compute the same result as an
unsharded one on the same global batch (the DP correctness invariant the
reference never needed, SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from facesr.parallel import (
    get_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated,
    pad_to_multiple,
)
from facesr.models import face_enhance_net as fen
from facesr.losses import combined as fc
from facesr.training import steps as steps_lib
from facesr.training.steps import TrainState, make_optimizer, set_learning_rate


def test_mesh_and_sharding():
    mesh = get_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch({"hr": x}, mesh)
    np.testing.assert_array_equal(np.asarray(xs["hr"]), x)
    assert len(xs["hr"].sharding.device_set) == 8


def test_pad_to_multiple():
    x = np.arange(5 * 2, dtype=np.float32).reshape(5, 2)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[5], x[4])
    same, n2 = pad_to_multiple(x[:4], 4)
    assert same.shape == (4, 2) and n2 == 4


def _make_step_and_state(mesh=None):
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    opt_state = set_learning_rate(tx.init(params), 1e-3)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       opt_state=opt_state, loss_params=loss_fn.params)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                     scale_factor=4, compute_dtype=None)
    if mesh is not None:
        state = replicate(state, mesh)
        step = jax.jit(step, in_shardings=(replicated(mesh), batch_sharding(mesh)))
    else:
        step = jax.jit(step)
    return step, state


def test_data_parallel_matches_single_device():
    rng = np.random.default_rng(0)
    hr = rng.random((8, 32, 32, 3), dtype=np.float32)

    # single-device (device 0)
    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    # 8-way sharded
    mesh = get_mesh()
    step8, state8 = _make_step_and_state(mesh=mesh)
    hr_sharded = jax.device_put(hr, batch_sharding(mesh))
    state8, m8 = step8(state8, hr_sharded)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    p1 = jax.device_get(state1.params)["conv_last"]["w"]
    p8 = jax.device_get(state8.params)["conv_last"]["w"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-6)

    # second step keeps agreeing (optimizer state consistency)
    state1, m1b = step1(state1, jnp.asarray(hr))
    state8, m8b = step8(state8, hr_sharded)
    assert abs(float(m1b["loss"]) - float(m8b["loss"])) < 1e-5


def test_sharded_predictor_matches_single_device():
    from facesr.parallel.serving import ShardedPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    predictor = ShardedPredictor(model, dtype=None, max_batch=8)

    rng = np.random.default_rng(1)
    x = rng.random((11, 16, 16, 3), dtype=np.float32)  # partial chunks
    got = predictor(x)
    assert got.shape == (11, 64, 64, 3)
    want = np.asarray(model(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.clip(want, 0, 1), atol=1e-5)
