"""Parallelism tests: sharding utilities and data-parallel consistency —
the 8-device sharded train step must compute the same result as an
unsharded one on the same global batch (the DP correctness invariant the
reference never needed, SURVEY.md §5)."""

import pytest
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


def test_int8_weight_quantized_serving():
    """VERDICT r1 #8: int8 weight serving behind ShardedPredictor must stay
    within a quality gate of the bf16 path and actually compress 4x."""
    from facesr.parallel.serving import ShardedPredictor
    from facesr.ops.quant import quantize_pytree, quantization_summary
    from facesr.losses.ssim import ssim as ssim_fn

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    # random-init conv_last is zero (output == bicubic, quantization-proof);
    # perturb it so the trunk actually contributes to the output.
    key = jax.random.PRNGKey(5)
    model.params["conv_last"]["w"] = (
        jax.random.normal(key, model.params["conv_last"]["w"].shape) * 0.05
    )

    q_tree, _ = quantize_pytree(model.params)
    summ = quantization_summary(q_tree)
    # 8 conv kernels on the small model; SE fc matrices stay float (they
    # gate whole blocks through a sigmoid — accuracy risk for ~1KB)
    assert summ["quantized_leaves"] >= 8
    assert not isinstance(q_tree["groups"]["rcab"]["ca"]["fc1_w"], dict)
    assert q_tree["groups"]["rcab"]["ca"]["fc1_w"].dtype != jnp.int8
    assert summ["compression"] > 3.0

    rng = np.random.default_rng(6)
    x = rng.random((8, 16, 16, 3), dtype=np.float32)
    ref = ShardedPredictor(model, dtype=None, max_batch=8)(x)
    got = ShardedPredictor(model, dtype="int8", max_batch=8)(x)
    assert got.shape == ref.shape

    mse = float(np.mean((got.astype(np.float64) - ref.astype(np.float64)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    ssim_val = float(ssim_fn(jnp.asarray(got), jnp.asarray(ref)))
    assert psnr > 35.0, psnr   # quality gate vs the full-precision output
    assert ssim_val > 0.95, ssim_val
    assert not np.array_equal(got, ref)  # quantization actually happened


def test_weight_only_quant_trained_weight_structure():
    """Random-init params are the pessimal case for quality gates but the
    EASY case for quantization structure: biases are exactly zero and
    alphas constant, so a transform that wrongly int8-quantizes them is
    invisible above. This test builds trained-like skew — block-to-block
    magnitude variance in the stacked leaves — and pins the contract:
    biases/alphas stay f32, and kernel scales are per-(stack-slice, O)
    so a low-magnitude block keeps its int8 resolution."""
    from facesr.ops.quant import quantize_pytree, dequantize_pytree

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=3,
                                   blocks_per_group=4)
    model = fen.FaceEnhanceNet(cfg)
    p = model.params
    rcab = p["groups"]["rcab"]
    key = jax.random.PRNGKey(7)
    # trained-like: one block's bias ~1.0, another ~0.004, same channel —
    # a shared per-channel scale would round the small one to exactly 0
    b = np.zeros(np.shape(rcab["conv1_b"]), np.float32)   # [G, B, C]
    b[0, 0, :] = 1.0
    b[2, 3, :] = 0.004
    rcab["conv1_b"] = jnp.asarray(b)
    # and a low-magnitude group in the stacked kernels
    w = np.asarray(jax.random.normal(key, np.shape(rcab["conv1_w"]),
                                     jnp.float32)) * 0.1   # [G, B, kh, kw, I, O]
    w[0] *= 10.0   # group 0 dominates; old shared scales starve the rest
    rcab["conv1_w"] = jnp.asarray(w)

    q_tree, s_tree = quantize_pytree(p)
    # biases and PReLU alphas pass through as float, untouched
    assert q_tree["groups"]["rcab"]["conv1_b"].dtype != jnp.int8
    np.testing.assert_array_equal(
        np.asarray(q_tree["groups"]["rcab"]["conv1_b"]), b)
    assert q_tree["groups"]["rcab"]["prelu_a"].dtype != jnp.int8
    # kernel scales keep the stack axes: one scale per (G, B, O) slice
    qw = q_tree["groups"]["rcab"]["conv1_w"]
    sw = s_tree["groups"]["rcab"]["conv1_w"]
    assert qw.dtype == jnp.int8
    assert sw.shape[:2] == w.shape[:2] and sw.shape[-1] == w.shape[-1]
    # per-slice resolution: the non-dominant groups' dequant error must be
    # bounded by THEIR OWN scale step, not group 0's 10x larger one
    deq = np.asarray(dequantize_pytree(qw, sw, jnp.float32))
    err = np.abs(deq - w)
    step = np.broadcast_to(np.asarray(sw), w.shape)
    assert float(np.max(err - step / 2)) <= 1e-6


def test_int8_full_quantized_serving():
    """Full-int8 (weights + dynamic activation scales) serving: the s8 conv
    path must stay within a quality gate of f32 and produce valid shapes."""
    from facesr.parallel.serving import ShardedPredictor
    from facesr.ops.quant import quantize_conv_kernels
    from facesr.losses.ssim import ssim as ssim_fn

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )

    qp = quantize_conv_kernels(model.params)
    # conv kernels became int8 dicts; SE fc matrices stayed float
    assert qp["conv_first"]["w"]["q"].dtype == jnp.int8
    assert qp["groups"]["rcab"]["conv1_w"]["q"].shape[:2] == (2, 2)  # stacked
    assert not isinstance(qp["groups"]["rcab"]["ca"]["fc1_w"], dict)

    rng = np.random.default_rng(6)
    x = rng.random((8, 16, 16, 3), dtype=np.float32)
    ref = ShardedPredictor(model, dtype=None, max_batch=8)(x)
    got = ShardedPredictor(model, dtype="int8_full", max_batch=8)(x)
    assert got.shape == ref.shape

    mse = float(np.mean((got.astype(np.float64) - ref.astype(np.float64)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    ssim_val = float(ssim_fn(jnp.asarray(got, jnp.float32),
                             jnp.asarray(ref, jnp.float32)))
    assert psnr > 30.0, psnr
    assert ssim_val > 0.95, ssim_val


def test_int8_calibrated_serving():
    """Calibrated static activation scales: every quantized conv must end
    up with an "a" leaf (and no leftover "sid"), the serving forward must
    stay within the same quality gate as the dynamic path, and outputs must
    track the dynamic path closely (same grid up to the static-vs-per-image
    scale difference)."""
    from facesr.parallel.serving import ShardedPredictor
    from facesr.losses.ssim import ssim as ssim_fn

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )

    rng = np.random.default_rng(6)
    x = rng.random((8, 16, 16, 3), dtype=np.float32)
    calib = rng.random((12, 16, 16, 3), dtype=np.float32)

    pred = ShardedPredictor(model, dtype="int8_full", max_batch=8, calibration=calib)
    qdicts = [
        l for l in jax.tree.leaves(
            pred.params, is_leaf=lambda n: isinstance(n, dict) and "q" in n)
        if isinstance(l, dict)
    ]
    assert qdicts and all("a" in d and "sid" not in d for d in qdicts)
    # static scales slice through the nested group/block scans
    assert pred.params["groups"]["rcab"]["conv1_w"]["a"].shape == (2, 2, 1, 1, 1, 1)

    ref = ShardedPredictor(model, dtype=None, max_batch=8)(x)
    dyn = ShardedPredictor(model, dtype="int8_full", max_batch=8)(x)
    got = pred(x)

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    assert psnr(got, ref) > 30.0, psnr(got, ref)
    assert float(ssim_fn(jnp.asarray(got, jnp.float32),
                         jnp.asarray(ref, jnp.float32))) > 0.95
    assert psnr(got, dyn) > 28.0, psnr(got, dyn)


def test_spatial_predictor_matches_single_device():
    """Spatial parallelism (rows of ONE image sharded over 8 devices) must
    reproduce the unsharded forward — XLA SPMD's halo exchange for the 3x3
    convs, the SE global-pool all-reduce, and the bicubic row contraction
    must all be semantics-preserving."""
    from facesr.parallel.serving import SpatialPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )

    rng = np.random.default_rng(7)
    for h, w in ((64, 48), (52, 40)):  # even and UNEVEN row splits over 8
        x = rng.random((1, h, w, 3), dtype=np.float32)
        want = np.clip(np.asarray(model(jnp.asarray(x))), 0.0, 1.0)
        got = SpatialPredictor(model, dtype=None)(x)
        assert got.shape == (1, 4 * h, 4 * w, 3)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_spatial_predictor_warns_on_device_fallback(capsys):
    """A prime H (no divisor > 1) silently served single-chip before
    VERDICT r2 weak #6 — the fallback must announce itself, once per H."""
    from facesr.parallel.serving import SpatialPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    pred = SpatialPredictor(model, dtype=None)

    rng = np.random.default_rng(9)
    x = rng.random((1, 29, 16, 3), dtype=np.float32)  # prime H -> 1 device
    out = pred(x)
    assert out.shape == (1, 116, 64, 3)
    msg = capsys.readouterr().out
    assert "H=29" in msg and "1 device" in msg

    pred(x)  # same H again: no repeat warning
    assert "H=29" not in capsys.readouterr().out

    # divisible H: whole mesh, no warning
    pred(rng.random((1, 32, 16, 3), dtype=np.float32))
    assert "SpatialPredictor:" not in capsys.readouterr().out


def test_spatial_predictor_int8_calibrated():
    """Quantized spatial serving: static calibrated scales keep the s8 conv
    path free of per-conv cross-shard reductions; output must match the
    batch-sharded int8 path on the same image."""
    from facesr.parallel.serving import ShardedPredictor, SpatialPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )
    rng = np.random.default_rng(8)
    calib = rng.random((4, 16, 16, 3), dtype=np.float32)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)

    want = ShardedPredictor(model, dtype="int8_full", max_batch=8,
                            calibration=calib)(x)
    got = SpatialPredictor(model, dtype="int8_full", calibration=calib)(x)
    np.testing.assert_allclose(got, want, atol=2e-2)  # bf16 tail, same grid


def test_packed_quantize_commutes_with_pixel_shuffle():
    """blocks.upsample's int8 reorder (PReLU with 4x-tiled alpha +
    quantize BEFORE the depth-to-space permutation) must be exactly
    equivalent to the reference order (shuffle, PReLU, quantize at the
    consumer) — it exists purely to move the shuffle copy into int8."""
    from facesr.ops.conv import quantize_act, prelu
    from facesr.ops import pixel_shuffle

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    alpha = jnp.asarray(rng.random(4), jnp.float32)
    a = jnp.asarray(0.017)
    old = quantize_act(prelu(pixel_shuffle(y, 2), alpha), a)
    new = pixel_shuffle(quantize_act(prelu(y, jnp.repeat(alpha, 4)), a), 2)
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


@pytest.mark.slow
def test_int8_calibrated_serving_other_model_families():
    """The quant machinery is generic by leaf layout: RRDBNet (nearest-up,
    LeakyReLU — no PixelShuffle) and TransferSRModel (RRDB backbone + RCAB
    head + subpixel conv_last) must both serve int8_full with calibration
    within a quality gate of their f32 outputs."""
    from facesr.models.esrgan import RRDBNet, RRDBNetConfig
    from facesr.models.transfer import TransferSRModel, TransferModelConfig
    from facesr.parallel.serving import ShardedPredictor

    rng = np.random.default_rng(3)
    x = rng.random((8, 12, 12, 3), dtype=np.float32)
    calib = rng.random((4, 12, 12, 3), dtype=np.float32)

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    rrdb = RRDBNet(RRDBNetConfig(num_feat=16, num_blocks=2, num_grow_ch=8))
    ref = ShardedPredictor(rrdb, dtype=None, max_batch=8)(x)
    got = ShardedPredictor(rrdb, dtype="int8_full", max_batch=8,
                           calibration=calib)(x)
    assert got.shape == ref.shape
    assert psnr(got, ref) > 30.0, psnr(got, ref)

    # The transfer model has no zero-init conv_last + bicubic anchor, so
    # RANDOM weights quantize much worse in absolute terms (dynamic int8
    # itself is ~25 dB vs f32 here); the contract tested is that the
    # calibrated path matches the dynamic path's quality — i.e. the static
    # scales + subpixel conv_last machinery generalizes, not that random
    # nets quantize well.
    tr = TransferSRModel(TransferModelConfig(backbone_blocks=2,
                                             freeze_blocks=2, head_blocks=2,
                                             head_channels=16))
    ref = ShardedPredictor(tr, dtype=None, max_batch=8)(x)
    dyn = ShardedPredictor(tr, dtype="int8_full", max_batch=8)(x)
    got = ShardedPredictor(tr, dtype="int8_full", max_batch=8,
                           calibration=calib)(x)
    assert got.shape == ref.shape
    assert psnr(got, ref) > psnr(dyn, ref) - 2.0, (psnr(got, ref), psnr(dyn, ref))
    assert psnr(got, ref) > 20.0, psnr(got, ref)


def test_quant_cache_roundtrip(tmp_path):
    """Calibrated trees persist: a second predictor built from the cache
    (no calibration images) must produce IDENTICAL outputs; a cache from a
    different architecture fails loudly."""
    from facesr.parallel.serving import ShardedPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )
    rng = np.random.default_rng(6)
    x = rng.random((8, 16, 16, 3), dtype=np.float32)
    calib = rng.random((4, 16, 16, 3), dtype=np.float32)
    cache = str(tmp_path / "int8.fckpt")

    first = ShardedPredictor(model, dtype="int8_full", max_batch=8,
                             calibration=calib, quant_cache=cache)(x)
    assert (tmp_path / "int8.fckpt").exists()
    second = ShardedPredictor(model, dtype="int8_full", max_batch=8,
                              quant_cache=cache)(x)  # no calibration images
    np.testing.assert_array_equal(first, second)

    other = fen.FaceEnhanceNet(
        fen.FaceEnhanceNetConfig(num_channels=32, num_groups=1, blocks_per_group=1))
    try:
        ShardedPredictor(other, dtype="int8_full", max_batch=8, quant_cache=cache)
        raise AssertionError("mismatched cache should not restore")
    except AssertionError:
        raise
    except Exception:
        pass  # loud structure/shape failure is the contract


def test_subpixel_pack_kernel_identity():
    """conv3x3(PS(x)) == PS(conv3x3_packed(x)) — float to tolerance, int8
    quant-dict path BIT-EXACT (integer accumulation commutes). This is the
    identity behind the int8 serving path's packed conv_last."""
    from facesr.ops import pixel_shuffle
    from facesr.ops.pixel_shuffle import subpixel_pack_kernel
    from facesr.ops.conv import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 7)), jnp.float32)
    want = conv2d(pixel_shuffle(x, 2), k, padding=1)
    got = pixel_shuffle(conv2d(x, subpixel_pack_kernel(k), padding=1), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    q = jnp.asarray(rng.integers(-127, 128, (3, 3, 4, 7)), jnp.int8)
    scale = jnp.asarray(rng.random((1, 1, 1, 7)) * 0.02 + 0.01, jnp.float32)
    a = jnp.asarray(0.013, jnp.float32).reshape(1, 1, 1, 1)
    xq = jnp.asarray(rng.integers(-127, 128, (2, 6, 5, 16)), jnp.int8)
    b = jnp.asarray(rng.standard_normal(7), jnp.float32)
    w = {"q": q, "scale": scale, "a": a}
    wp = {"q": subpixel_pack_kernel(q),
          "scale": jnp.repeat(scale, 4, axis=-1), "a": a}
    want = conv2d(pixel_shuffle(xq, 2), w, b, padding=1, dtype=jnp.bfloat16)
    got = pixel_shuffle(
        conv2d(xq, wp, jnp.repeat(b, 4), padding=1, dtype=jnp.bfloat16), 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_calibration_stats_and_attach():
    """Unit-level calibration contract: sids enumerate sites, stats collect
    positive maxima for every site the forward touches, attach reshapes for
    scan, and uncovered sites fall back to scale 1.0."""
    from facesr.ops import quant

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    qp, n_sites = quant.quantize_conv_kernels(params, with_sids=True)
    sids = np.concatenate([
        np.asarray(d["sid"]).ravel()
        for d in jax.tree.leaves(qp, is_leaf=lambda n: isinstance(n, dict) and "q" in n)
        if isinstance(d, dict)
    ])
    assert sorted(sids.tolist()) == list(range(n_sites))

    fwd = jax.jit(lambda p, x: fen.apply(p, x, cfg, train=False, dtype=jnp.bfloat16))
    x = np.random.default_rng(0).random((2, 16, 16, 3), dtype=np.float32)
    with quant.collecting_act_stats(n_sites) as stats:
        jax.block_until_ready(fwd(qp, jnp.asarray(x)))
    assert np.all(stats > 0), stats  # every conv site saw activations

    # zero-stat sites must not divide by zero
    stats2 = stats.copy()
    stats2[0] = 0.0
    tree = quant.attach_act_scales(qp, stats2)
    leaf0 = [d for d in jax.tree.leaves(
        tree, is_leaf=lambda n: isinstance(n, dict) and "q" in n)
        if isinstance(d, dict) and np.asarray(d["a"]).min() == 1.0]
    assert leaf0  # the sid-0 slice fell back to 1.0


def test_spatial_parallel_train_step_matches_single_device():
    """sp TRAINING (not just serving): the same content train step compiled
    with the batch's ROWS sharded over the mesh must match the
    single-device step — XLA SPMD inserts the conv halo exchanges, the
    bicubic-matmul gathers, and the loss/grad all-reduces. The physical
    ring is the same `data` axis; what changes is which tensor dimension
    rides it (large-patch fine-tuning where H, not N, is the big axis)."""
    from facesr.parallel import row_sharding

    rng = np.random.default_rng(0)
    hr = rng.random((2, 32, 32, 3), dtype=np.float32)  # batch 2: N not
    # divisible by the 8-device mesh — rows are the sharded axis

    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh = get_mesh()
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    opt_state = set_learning_rate(tx.init(params), 1e-3)
    state_sp = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                          opt_state=opt_state, loss_params=loss_fn.params)
    state_sp = replicate(state_sp, mesh)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                        scale_factor=4, compute_dtype=None)
    step_sp = jax.jit(step_fn, in_shardings=(replicated(mesh),
                                             row_sharding(mesh)))
    hr_rows = jax.device_put(hr, row_sharding(mesh))
    state_sp, m_sp = step_sp(state_sp, hr_rows)

    assert abs(float(m1["loss"]) - float(m_sp["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_last"]["w"]),
        np.asarray(jax.device_get(state_sp.params)["conv_last"]["w"]),
        atol=1e-5)


def test_tensor_parallel_forward_matches_replicated():
    """tp: conv kernels sharded over their OUTPUT channels (params memory
    and conv FLOPs divide by the mesh) must produce the replicated
    forward's output — XLA SPMD inserts the channel collectives. The tp
    tree shards the wide trunk (64ch kernels, biases, PReLU alphas) and
    replicates SE bottlenecks and the 3-channel conv_last."""
    from facesr.parallel import tp_param_shardings

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5), params["conv_last"]["w"].shape) * 0.05
    )

    mesh = get_mesh()
    shardings = tp_param_shardings(params, mesh)
    # trunk kernels sharded on O; conv_last (3 outputs) and SE replicated
    from jax.sharding import PartitionSpec as P
    assert shardings["conv_first"]["w"].spec == P(None, None, None, "data")
    assert shardings["conv_last"]["w"].spec == P()
    assert shardings["groups"]["rcab"]["ca"]["fc1_w"].spec == P()
    assert shardings["conv_first"]["b"].spec == P("data")

    params_tp = jax.device_put(params, shardings)
    x = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3), dtype=np.float32))

    fwd = jax.jit(lambda p, x_: fen.apply(p, x_, cfg, train=False),
                  in_shardings=(shardings, replicated(mesh)))
    got = np.asarray(fwd(params_tp, jax.device_put(x, replicated(mesh))))
    want = np.asarray(fen.apply(params, x, cfg, train=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tensor_parallel_train_step_matches_single_device():
    """tp TRAINING (not just the forward): the content train step with conv
    kernels AND their Adam moments sharded over output channels must match
    the single-device step — gradients of sharded params, the global-norm
    clip's cross-shard reduction, and the optimizer update all ride XLA
    SPMD. tp_param_shardings applies to the whole TrainState because the
    moment trees mirror the param paths/shapes."""
    from facesr.parallel import tp_param_shardings

    rng = np.random.default_rng(10)
    hr = rng.random((4, 32, 32, 3), dtype=np.float32)

    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh = get_mesh()
    step_fn_unjit, state_tp = _make_step_and_state(mesh=None)
    # rebuild the unjitted step with tp shardings on the full state
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    opt_state = set_learning_rate(tx.init(params), 1e-3)
    state_tp = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                          opt_state=opt_state, loss_params=loss_fn.params)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                        scale_factor=4, compute_dtype=None)

    state_sh = tp_param_shardings(state_tp, mesh)
    # kernels and their Adam moments share the output-channel sharding
    from jax.sharding import PartitionSpec as P
    assert state_sh.params["conv_first"]["w"].spec == P(None, None, None, "data")
    flat_sh = jax.tree_util.tree_leaves_with_path(state_sh)
    mu_specs = [s.spec for path, s in flat_sh
                if any("mu" in str(getattr(p, "name", "")) for p in path)]
    assert P(None, None, None, "data") in mu_specs  # moments sharded too

    # pure tp: params sharded, data replicated (batch 4 cannot ride the
    # 8-way axis; the dp x tp composition test shards both). Pin the output
    # state to the same shardings so step outputs feed the next step
    # (otherwise XLA may propagate a different layout for some leaves).
    step_tp = jax.jit(step_fn, in_shardings=(state_sh, replicated(mesh)),
                      out_shardings=(state_sh, None))
    state_tp = jax.device_put(state_tp, state_sh)
    hr_sh = jax.device_put(hr, replicated(mesh))
    state_tp, m_tp = step_tp(state_tp, hr_sh)

    assert abs(float(m1["loss"]) - float(m_tp["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_first"]["w"]),
        np.asarray(jax.device_get(state_tp.params)["conv_first"]["w"]),
        atol=1e-5)

    # second step: sharded optimizer state stays consistent
    state1, m1b = step1(state1, jnp.asarray(hr))
    state_tp, m_tpb = step_tp(state_tp, hr_sh)
    assert abs(float(m1b["loss"]) - float(m_tpb["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_last"]["w"]),
        np.asarray(jax.device_get(state_tp.params)["conv_last"]["w"]),
        atol=1e-5)


def test_dp_sp_2d_mesh_train_step_matches_single_device():
    """dp x sp COMPOSITION on a 4x2 mesh: batch sharded over 'data' AND
    each shard's image rows sharded over 'space' (grid_sharding). One code
    path — the same train step jitted with a 2-D input sharding; XLA SPMD
    layers halo exchanges inside row shards under the batch partition."""
    from facesr.parallel import grid_sharding

    rng = np.random.default_rng(11)
    hr = rng.random((4, 32, 32, 3), dtype=np.float32)

    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh2d = get_mesh(axis_names=("data", "space"), shape=(4, 2))
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    state2 = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        opt_state=set_learning_rate(tx.init(params), 1e-3),
                        loss_params=loss_fn.params)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                        scale_factor=4, compute_dtype=None)
    step2 = jax.jit(step_fn, in_shardings=(replicated(mesh2d),
                                           grid_sharding(mesh2d)))
    state2 = replicate(state2, mesh2d)
    hr2 = jax.device_put(hr, grid_sharding(mesh2d))
    state2, m2 = step2(state2, hr2)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_last"]["w"]),
        np.asarray(jax.device_get(state2.params)["conv_last"]["w"]),
        atol=1e-5)

    state1, m1b = step1(state1, jnp.asarray(hr))
    state2, m2b = step2(state2, hr2)
    assert abs(float(m1b["loss"]) - float(m2b["loss"])) < 1e-5


def test_dp_sp_2d_mesh_serving_matches_single_device():
    """dp x sp serving on the 4x2 mesh: a batch-4 forward with rows also
    split 2-way must equal the single-device forward exactly."""
    from facesr.parallel import grid_sharding

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          model.params["conv_last"]["w"].shape) * 0.05
    )
    x = np.random.default_rng(12).random((4, 32, 24, 3), dtype=np.float32)
    want = np.clip(np.asarray(model(jnp.asarray(x))), 0.0, 1.0)

    mesh2d = get_mesh(axis_names=("data", "space"), shape=(4, 2))
    sh = grid_sharding(mesh2d)
    fwd = jax.jit(
        lambda p, x_: jnp.clip(fen.apply(p, x_, cfg, train=False), 0.0, 1.0),
        in_shardings=(replicated(mesh2d), sh), out_shardings=sh)
    got = np.asarray(fwd(replicate(model.params, mesh2d),
                         jax.device_put(x, sh)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dp_tp_2d_mesh_train_step_matches_single_device():
    """dp x tp COMPOSITION on a 4x2 ("data", "model") mesh: batch sharded
    over 'data' while conv kernels + Adam moments shard their output
    channels over 'model'. The per-axis divisibility is against the model
    axis (2), not the mesh (8)."""
    from facesr.parallel import tp_param_shardings

    rng = np.random.default_rng(13)
    hr = rng.random((4, 32, 32, 3), dtype=np.float32)

    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh2d = get_mesh(axis_names=("data", "model"), shape=(4, 2))
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    state2 = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        opt_state=set_learning_rate(tx.init(params), 1e-3),
                        loss_params=loss_fn.params)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                        scale_factor=4, compute_dtype=None)

    state_sh = tp_param_shardings(state2, mesh2d, axis="model")
    from jax.sharding import PartitionSpec as P
    assert state_sh.params["conv_first"]["w"].spec == P(None, None, None, "model")

    step2 = jax.jit(step_fn, in_shardings=(state_sh,
                                           batch_sharding(mesh2d, "data")),
                    out_shardings=(state_sh, None))
    state2 = jax.device_put(state2, state_sh)
    hr2 = jax.device_put(hr, batch_sharding(mesh2d, "data"))
    state2, m2 = step2(state2, hr2)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_first"]["w"]),
        np.asarray(jax.device_get(state2.params)["conv_first"]["w"]),
        atol=1e-5)

    state1, m1b = step1(state1, jnp.asarray(hr))
    state2, m2b = step2(state2, hr2)
    assert abs(float(m1b["loss"]) - float(m2b["loss"])) < 1e-5


def test_dp_sp_tp_3d_mesh_train_step_matches_single_device():
    """Full 3-axis COMPOSITION on a 2x2x2 ("data", "space", "model") mesh:
    batch sharded over 'data', each shard's image rows over 'space', and
    conv kernels + Adam moments over 'model' output channels — all three
    parallelism axes in ONE jitted train step, same step function as the
    single-device path. This is the pod-scale configuration for a model
    too large to replicate serving large inputs: dp for throughput, sp for
    the spatial footprint, tp for the parameter footprint."""
    from facesr.parallel import tp_param_shardings, grid_sharding

    rng = np.random.default_rng(14)
    hr = rng.random((4, 32, 32, 3), dtype=np.float32)

    step1, state1 = _make_step_and_state(mesh=None)
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh3d = get_mesh(axis_names=("data", "space", "model"), shape=(2, 2, 2))
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0, ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    state3 = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        opt_state=set_learning_rate(tx.init(params), 1e-3),
                        loss_params=loss_fn.params)
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                        scale_factor=4, compute_dtype=None)

    state_sh = tp_param_shardings(state3, mesh3d, axis="model")
    from jax.sharding import PartitionSpec as P
    assert state_sh.params["conv_first"]["w"].spec == P(None, None, None, "model")

    in_sh = grid_sharding(mesh3d)  # P("data", "space") on NHWC
    step3 = jax.jit(step_fn, in_shardings=(state_sh, in_sh),
                    out_shardings=(state_sh, None))
    state3 = jax.device_put(state3, state_sh)
    hr3 = jax.device_put(hr, in_sh)
    state3, m3 = step3(state3, hr3)

    assert abs(float(m1["loss"]) - float(m3["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_first"]["w"]),
        np.asarray(jax.device_get(state3.params)["conv_first"]["w"]),
        atol=1e-5)

    state1, m1b = step1(state1, jnp.asarray(hr))
    state3, m3b = step3(state3, hr3)
    assert abs(float(m1b["loss"]) - float(m3b["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state1.params)["conv_last"]["w"]),
        np.asarray(jax.device_get(state3.params)["conv_last"]["w"]),
        atol=1e-5)


# ---------------------------------------------------------------------------
# Pipeline parallelism (pp)
# ---------------------------------------------------------------------------

def _make_pp_fixture(num_groups=4):
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=num_groups,
                                   blocks_per_group=2)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.create_loss_function(l1_weight=1.0, perceptual_weight=0.0,
                                      ssim_weight=0.1)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.5)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       opt_state=set_learning_rate(tx.init(params), 1e-3),
                       loss_params=loss_fn.params)
    return cfg, loss_fn, tx, state


def test_pipeline_parallel_forward_matches_single_device():
    """4-stage GPipe-style pipeline over the residual-group trunk
    (shard_map + ppermute microbatch schedule): trunk ops are per-sample
    independent, so the pipelined forward must be BIT-EXACT vs the plain
    single-device forward, with the group params (leading [G] axis)
    sharded one-stage-per-device."""
    from facesr.parallel import make_pp_apply, pp_param_shardings
    from jax.sharding import PartitionSpec as P

    cfg, _, _, state = _make_pp_fixture()
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    ref = fen.apply(state.params, x, cfg, train=False)

    mesh = get_mesh(jax.devices()[:4], axis_names=("pp",))
    psh = pp_param_shardings(state.params, mesh)
    assert psh["groups"]["conv_w"].spec == P("pp")
    assert psh["conv_first"]["w"].spec == P()
    apply_pp = make_pp_apply(cfg, mesh, n_micro=4)
    params_pp = jax.device_put(state.params, psh)
    out = jax.jit(lambda p, xx: apply_pp(p, xx, train=False))(params_pp, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # each stage's param shard stays on its own device
    assert out.shape == ref.shape


def test_pipeline_parallel_train_step_matches_single_device():
    """pp TRAINING: grad of the shard_map'd pipeline is the reverse
    pipeline (ppermute transpose shifts cotangents stage-up); group-param
    gradients and their Adam moments live on the owning stage only. Two
    steps of the standard content train step driven through the pp apply
    must match the single-device step exactly."""
    from facesr.parallel import make_pp_apply, pp_param_shardings

    rng = np.random.default_rng(21)
    hr = rng.random((8, 32, 32, 3), dtype=np.float32)

    cfg, loss_fn, tx, state1 = _make_pp_fixture()
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step1 = jax.jit(steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                              scale_factor=4))
    mesh = get_mesh(jax.devices()[:4], axis_names=("pp",))
    _, loss_fn2, tx2, state_pp = _make_pp_fixture()
    apply_pp = make_pp_apply(cfg, mesh, n_micro=4)
    pp_model_apply = lambda p, x, train, dtype: apply_pp(p, x, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(pp_model_apply, loss_fn2.apply, tx2,
                                        scale_factor=4)
    ssh = pp_param_shardings(state_pp, mesh)
    step_pp = jax.jit(step_fn, in_shardings=(ssh, replicated(mesh)),
                      out_shardings=(ssh, None))
    state_pp = jax.device_put(state_pp, ssh)
    hr_r = jax.device_put(hr, replicated(mesh))

    for _ in range(2):
        state1, m1 = step1(state1, jnp.asarray(hr))
        state_pp, m_pp = step_pp(state_pp, hr_r)
        assert abs(float(m1["loss"]) - float(m_pp["loss"])) < 1e-6
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     jax.device_get(state1.params),
                     jax.device_get(state_pp.params))
    assert max(jax.tree.leaves(d)) < 1e-6


def test_dp_pp_2d_mesh_train_step_matches_single_device():
    """dp x pp COMPOSITION on a 2x4 ("data", "pp") mesh: batch sharded
    over 'data', each dp replica's trunk pipelined over its 4 'pp' stages
    — sharding-based and schedule-based axes composed in one jitted step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from facesr.parallel import make_pp_apply, pp_param_shardings

    rng = np.random.default_rng(22)
    hr = rng.random((8, 32, 32, 3), dtype=np.float32)

    cfg, loss_fn, tx, state1 = _make_pp_fixture()
    model_apply = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype)
    step1 = jax.jit(steps_lib.make_train_step(model_apply, loss_fn.apply, tx,
                                              scale_factor=4))
    state1, m1 = step1(state1, jnp.asarray(hr))

    mesh = get_mesh(axis_names=("data", "pp"), shape=(2, 4))
    _, loss_fn2, tx2, state2 = _make_pp_fixture()
    apply_pp = make_pp_apply(cfg, mesh, n_micro=2, dp_axis="data")
    pp_model_apply = lambda p, x, train, dtype: apply_pp(p, x, train=train, dtype=dtype)
    step_fn = steps_lib.make_train_step(pp_model_apply, loss_fn2.apply, tx2,
                                        scale_factor=4)
    ssh = pp_param_shardings(state2, mesh)
    bsh = NamedSharding(mesh, P("data"))
    step2 = jax.jit(step_fn, in_shardings=(ssh, bsh), out_shardings=(ssh, None))
    state2 = jax.device_put(state2, ssh)
    state2, m2 = step2(state2, jax.device_put(hr, bsh))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     jax.device_get(state1.params),
                     jax.device_get(state2.params))
    assert max(jax.tree.leaves(d)) < 1e-6


def test_pipeline_parallel_validation_errors():
    """Loud failures: num_groups must divide over the stages; n_micro must
    divide the local batch."""
    import pytest
    from facesr.parallel import make_pp_apply

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=3,
                                   blocks_per_group=2)
    mesh = get_mesh(jax.devices()[:4], axis_names=("pp",))
    with pytest.raises(ValueError, match="num_groups"):
        make_pp_apply(cfg, mesh)

    cfg4, _, _, state = _make_pp_fixture()
    apply_pp = make_pp_apply(cfg4, mesh, n_micro=3)
    x = jnp.zeros((8, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="n_micro"):
        jax.jit(lambda p, xx: apply_pp(p, xx))(state.params, x)


def test_quant_cache_rejects_retrained_weights(tmp_path):
    """A quant cache is pinned to the weights it was calibrated from: a
    same-architecture model with DIFFERENT weights (retrain/fine-tune)
    must be rejected loudly — shape checks alone pass and would silently
    serve the OLD model's int8 kernels."""
    import pytest
    from facesr.parallel.serving import (calibrated_qparams,
                                         load_calibrated_qparams)

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=2)
    params_a = jax.tree.map(np.asarray, fen.init(jax.random.PRNGKey(0), cfg))
    params_b = jax.tree.map(np.asarray, fen.init(jax.random.PRNGKey(1), cfg))
    apply_like = lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train,
                                                      dtype=dtype)
    calib = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    cache = str(tmp_path / "q.fckpt")
    calibrated_qparams(params_a, apply_like, calib, 2, cache_path=cache)

    # same weights: loads fine
    load_calibrated_qparams(params_a, cache)
    # different (same-architecture) weights: loud rejection
    with pytest.raises(ValueError, match="DIFFERENT"):
        load_calibrated_qparams(params_b, cache)


def test_sharded_predictor_remainder_sizes_exact():
    """Opt-in remainder programs (BENCH.md remainder-batch economics):
    the final chunk pads to the smallest enabled size instead of
    max_batch; results must be byte-identical to the default path."""
    from facesr.parallel.serving import ShardedPredictor

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)

    rng = np.random.default_rng(7)
    x = rng.random((19, 16, 16, 3), dtype=np.float32)  # 16 + remainder 3 -> pad 8

    default = ShardedPredictor(model, dtype=None, max_batch=16)
    opt = ShardedPredictor(model, dtype=None, max_batch=16,
                           remainder_sizes=(8, 200, 16, -4))
    assert opt.remainder_sizes == (8,)  # rounded/filtered to valid sizes
    np.testing.assert_array_equal(opt(x), default(x))

    # remainder larger than every enabled size falls back to max_batch
    x2 = rng.random((27, 16, 16, 3), dtype=np.float32)  # remainder 11 > 8
    np.testing.assert_array_equal(opt(x2), default(x2))
