"""ESRGAN/RRDBNet, transfer model, and discriminator tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from facesr.models import esrgan as esr
from facesr.models import transfer as tr
from facesr.models import discriminator as disc_lib


SMALL_RRDB = esr.RRDBNetConfig(num_feat=16, num_blocks=2, num_grow_ch=8)


def test_rrdbnet_forward_shape():
    params = esr.init(jax.random.PRNGKey(0), SMALL_RRDB)
    x = jnp.zeros((1, 16, 16, 3))
    y = esr.apply(params, x, SMALL_RRDB)
    assert y.shape == (1, 64, 64, 3)


def test_rrdbnet_param_count_production():
    # RealESRGAN_x4plus RRDBNet: 23 blocks, 64 feat, 32 growth = 16.70M params
    params = esr.init(jax.random.PRNGKey(0), esr.RRDBNetConfig())
    n = esr.param_count(params)
    assert 16.5e6 < n < 17.0e6, n


def test_esrgan_baseline_inference_uint8():
    baseline = esr.ESRGANBaseline(download=False)
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    out = baseline.inference(img)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


SMALL_TR = tr.TransferModelConfig(backbone_blocks=5, head_blocks=2, head_channels=16)


def test_transfer_forward_shape():
    m = tr.TransferSRModel(SMALL_TR)
    x = jnp.zeros((1, 8, 8, 3))
    y = m(x)
    assert y.shape == (1, 32, 32, 3)


def test_transfer_stage_trainability():
    m = tr.TransferSRModel(SMALL_TR)
    total = m.get_model_info()["total_params"]

    m.set_training_stage(tr.TrainingStage.STAGE1_HEAD_ONLY)
    t1 = m.get_model_info()["trainable_params"]
    m.set_training_stage(tr.TrainingStage.STAGE2_PARTIAL_FINETUNE)
    t2 = m.get_model_info()["trainable_params"]
    m.set_training_stage(tr.TrainingStage.STAGE3_FULL_FINETUNE)
    t3 = m.get_model_info()["trainable_params"]
    assert t1 < t2 < t3 == total


def test_transfer_frozen_params_not_updated():
    m = tr.TransferSRModel(SMALL_TR)
    stage = tr.TrainingStage.STAGE1_HEAD_ONLY
    tx = tr.make_stage_optimizer(m.params, SMALL_TR, stage)
    opt_state = tx.init(m.params)

    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3), dtype=np.float32))
    hr = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3), dtype=np.float32))

    def loss_fn(p):
        return jnp.mean((tr.apply(p, x, SMALL_TR, train=True) - hr) ** 2)

    grads = jax.grad(loss_fn)(m.params)
    updates, _ = tx.update(grads, opt_state, m.params)
    new_params = optax.apply_updates(m.params, updates)

    # backbone untouched, head updated
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["conv_first"]["w"]),
        np.asarray(m.params["backbone"]["conv_first"]["w"]),
    )
    assert not np.array_equal(
        np.asarray(new_params["face_head"]["conv_last"]["w"]),
        np.asarray(m.params["face_head"]["conv_last"]["w"]),
    )


def test_transfer_stage2_tail_updated_main_frozen():
    m = tr.TransferSRModel(SMALL_TR)
    stage = tr.TrainingStage.STAGE2_PARTIAL_FINETUNE
    tx = tr.make_stage_optimizer(m.params, SMALL_TR, stage)
    opt_state = tx.init(m.params)
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 3), dtype=np.float32))
    hr = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 3), dtype=np.float32))

    def loss_fn(p):
        return jnp.mean((tr.apply(p, x, SMALL_TR, train=True) - hr) ** 2)

    grads = jax.grad(loss_fn)(m.params)
    updates, _ = tx.update(grads, opt_state, m.params)
    new_params = optax.apply_updates(m.params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["body_main"]["rdb1"]["conv1_w"]),
        np.asarray(m.params["backbone"]["body_main"]["rdb1"]["conv1_w"]),
    )
    assert not np.array_equal(
        np.asarray(new_params["backbone"]["body_tail"]["rdb1"]["conv1_w"]),
        np.asarray(m.params["backbone"]["body_tail"]["rdb1"]["conv1_w"]),
    )


def test_discriminator_shapes_and_info():
    cfg, params, stats = disc_lib.create_discriminator(input_size=64, base_channels=16)
    x = jnp.zeros((2, 64, 64, 3))
    logits, new_stats = disc_lib.apply(params, stats, x, cfg, train=True)
    assert logits.shape == (2, 1)
    info = disc_lib.get_model_info(params)
    assert info["total_params"] > 0


def test_discriminator_bn_stats_update():
    cfg, params, stats = disc_lib.create_discriminator(input_size=32, base_channels=8)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    _, new_stats = disc_lib.apply(params, stats, x, cfg, train=True)
    # running stats moved away from init on BN blocks
    moved = [
        not np.allclose(np.asarray(ns["mean"]), 0)
        for ns in new_stats["blocks"] if ns
    ]
    assert any(moved)
    # eval mode leaves stats unchanged
    _, same_stats = disc_lib.apply(params, new_stats, x, cfg, train=False)
    a = np.asarray(jax.tree.leaves(new_stats)[0])
    b = np.asarray(jax.tree.leaves(same_stats)[0])
    np.testing.assert_array_equal(a, b)


def test_discriminator_production_param_count():
    # Reference 256x256 discriminator: ~47M params (Linear 512*8*8->1024 dominates)
    cfg, params, _ = disc_lib.create_discriminator(input_size=256, base_channels=64)
    n = disc_lib.param_count(params)
    assert 38e6 < n < 50e6
