"""Tests for pixel shuffle, conv wrappers and torch-parity initializers."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from facesr.ops import pixel_shuffle, pixel_unshuffle, conv2d, prelu
from facesr.ops import init as finit


def test_pixel_shuffle_matches_pytorch():
    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 5, 7), dtype=np.float32)  # NCHW, C=16, r=2 -> C=4
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_pixel_unshuffle_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 8, 6, 12), dtype=np.float32))
    assert np.array_equal(pixel_unshuffle(pixel_shuffle(x, 2), 2), x)


def test_conv2d_matches_pytorch():
    rng = np.random.default_rng(2)
    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    w = rng.standard_normal((8, 3, 3, 3), dtype=np.float32) * 0.1  # OIHW
    b = rng.standard_normal(8, dtype=np.float32) * 0.1
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1).numpy()
    w_hwio = jnp.asarray(w.transpose(2, 3, 1, 0))
    got = conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)), w_hwio, jnp.asarray(b), padding=1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5, rtol=1e-5)


def test_conv2d_strided_matches_pytorch():
    rng = np.random.default_rng(3)
    x = rng.random((1, 4, 16, 16), dtype=np.float32)
    w = rng.standard_normal((8, 4, 3, 3), dtype=np.float32) * 0.1
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
    got = conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        stride=2,
        padding=1,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5, rtol=1e-5)


def test_prelu_matches_pytorch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 4, 4)).astype(np.float32)
    alpha = rng.random(6, dtype=np.float32)
    want = F.prelu(torch.from_numpy(x), torch.from_numpy(alpha)).numpy()
    got = prelu(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-6)


def test_kaiming_normal_std():
    key = jax.random.PRNGKey(0)
    # conv HWIO 3x3, 64 -> 64: fan_out = 3*3*64 = 576, relu gain sqrt(2)
    w = finit.kaiming_normal(key, (3, 3, 64, 64), mode="fan_out", nonlinearity="relu")
    expect_std = np.sqrt(2.0 / 576.0)
    assert abs(float(w.std()) - expect_std) / expect_std < 0.05


def test_kaiming_fan_in_leaky():
    key = jax.random.PRNGKey(1)
    w = finit.kaiming_normal(key, (3, 3, 64, 128), mode="fan_in", nonlinearity="leaky_relu", a=0.2)
    expect_std = np.sqrt(2.0 / (1 + 0.2 ** 2) / (3 * 3 * 64))
    assert abs(float(w.std()) - expect_std) / expect_std < 0.05


def test_icnr_subpixel_equality():
    # After pixel shuffle, an ICNR-initialized conv must produce identical
    # values at all r^2 sub-pixel phases (checkerboard-free start).
    key = jax.random.PRNGKey(2)
    w = finit.icnr(key, (3, 3, 16, 64), scale_factor=2)
    w = np.asarray(w)
    # output channels come in groups of r^2=4 identical kernels
    for c in range(0, 64, 4):
        for j in range(1, 4):
            np.testing.assert_array_equal(w[..., c], w[..., c + j])
    # and the groups are kaiming-distributed (nonzero std)
    assert w.std() > 0
