"""Golden parity tests: facesr resize kernels vs PyTorch F.interpolate.

Bicubic parity is the foundation of the whole framework (SURVEY.md §7
"hard parts" #1): the model's global skip, the trainer's LR synthesis and
all eval scripts depend on it bit-comparably matching
`F.interpolate(..., mode='bicubic', align_corners=False)`.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from facesr.ops import bicubic_resize, resize2d, nearest_up, avg_pool2


def _rand_nchw(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random(shape, dtype=np.float32)


def _torch_resize(x_nchw, scale=None, size=None, mode="bicubic"):
    t = torch.from_numpy(x_nchw)
    kwargs = dict(mode=mode)
    if mode in ("bicubic", "bilinear"):
        kwargs["align_corners"] = False
    out = F.interpolate(t, scale_factor=scale, size=size, **kwargs)
    return out.numpy()


@pytest.mark.parametrize("scale", [4, 2])
def test_bicubic_upsample_matches_pytorch(scale):
    x = _rand_nchw((2, 3, 16, 16))
    want = _torch_resize(x, scale=scale)
    got = bicubic_resize(jnp.asarray(x.transpose(0, 2, 3, 1)), float(scale))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_bicubic_downsample_matches_pytorch():
    # The trainer's on-the-fly LR synthesis: 256 -> 64 (trainer.py:415-421).
    x = _rand_nchw((2, 3, 64, 64), seed=1)
    want = _torch_resize(x, scale=0.25)
    got = bicubic_resize(jnp.asarray(x.transpose(0, 2, 3, 1)), 0.25)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_bicubic_full_res_roundtrip_shapes():
    x = _rand_nchw((1, 3, 256, 256), seed=2)
    lr = bicubic_resize(jnp.asarray(x.transpose(0, 2, 3, 1)), 0.25)
    assert lr.shape == (1, 64, 64, 3)
    up = bicubic_resize(lr, 4.0)
    assert up.shape == (1, 256, 256, 3)
    want = _torch_resize(_torch_resize(x, scale=0.25), scale=4)
    np.testing.assert_allclose(
        np.asarray(up).transpose(0, 3, 1, 2), want, atol=5e-6, rtol=1e-5
    )


def test_bilinear_matches_pytorch():
    x = _rand_nchw((2, 3, 15, 23), seed=3)
    want = _torch_resize(x, size=(37, 11), mode="bilinear")
    got = resize2d(jnp.asarray(x.transpose(0, 2, 3, 1)), (37, 11), method="bilinear")
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-6, rtol=1e-5
    )


def test_nearest_matches_pytorch():
    x = _rand_nchw((2, 3, 8, 8), seed=4)
    want = _torch_resize(x, scale=2, mode="nearest")
    got = nearest_up(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_nearest_arbitrary_size_matches_pytorch():
    x = _rand_nchw((1, 3, 10, 10), seed=5)
    want = _torch_resize(x, size=(26, 14), mode="nearest")
    got = resize2d(jnp.asarray(x.transpose(0, 2, 3, 1)), (26, 14), method="nearest")
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_avg_pool2_matches_pytorch():
    x = _rand_nchw((2, 3, 17, 9), seed=6)
    want = F.avg_pool2d(torch.from_numpy(x), kernel_size=2, stride=2).numpy()
    got = avg_pool2(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-6
    )


def test_uint8_image_range_bicubic():
    # Bicubic overshoots [0,1]; verify we reproduce torch's overshoot too.
    x = (_rand_nchw((1, 3, 16, 16), seed=7) > 0.5).astype(np.float32)
    want = _torch_resize(x, scale=4)
    got = bicubic_resize(jnp.asarray(x.transpose(0, 2, 3, 1)), 4.0)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert want.min() < 0 or want.max() > 1  # overshoot exists
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_resize_matrix_golden_checksums():
    """Pin the parity-critical interpolation matrices with checksums so a
    refactor can't silently change bicubic semantics even in environments
    without torch (each row sums to 1 by partition of unity; |M|_1 captures
    the Keys-kernel negative lobes)."""
    from facesr.ops import resize_matrix

    golden = {
        (64, 256): (256.0, 320.6640625),
        (256, 64): (64.0, 88.0),
        (64, 128): (128.0, 163.296875),
    }
    for (src, dst), (row_sum, l1) in golden.items():
        m = resize_matrix(src, dst, "bicubic")
        assert abs(float(m.sum()) - row_sum) < 1e-3
        assert abs(float(np.abs(m).sum()) - l1) < 1e-3
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_resize_matrix_unknown_method_raises_even_same_size():
    """Method validation must precede the same-size identity shortcut, or a
    typo'd method is silently accepted whenever sizes happen to match."""
    from facesr.ops import resize_matrix

    with pytest.raises(ValueError, match="Unknown resize method"):
        resize_matrix(64, 64, "blinear")
    with pytest.raises(ValueError, match="Unknown resize method"):
        resize_matrix(64, 128, "blinear")
