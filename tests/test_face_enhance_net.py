"""FaceEnhanceNet model tests: shapes, zero-init bicubic identity, grads,
attention maps, param-count parity with the reference architecture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facesr.models import face_enhance_net as fen
from facesr.ops import bicubic_up


SMALL = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=2, blocks_per_group=2)


def _params(cfg=SMALL, seed=0):
    return fen.init(jax.random.PRNGKey(seed), cfg)


def test_forward_shape():
    p = _params()
    x = jnp.zeros((2, 16, 16, 3))
    y = fen.apply(p, x, SMALL)
    assert y.shape == (2, 64, 64, 3)


def test_initial_output_equals_bicubic():
    # conv_last is zero-initialized, so out == bicubic skip exactly
    # (reference custom.py:141-145): the built-in parity check.
    p = _params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    y = fen.apply(p, x, SMALL, train=True)  # train: no clamping
    skip = bicubic_up(x, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(skip), atol=1e-6)


def test_eval_output_clamped():
    p = _params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    y = fen.apply(p, x, SMALL, train=False)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_gradients_flow_to_all_params():
    p = _params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))

    def loss(params):
        y = fen.apply(params, x, SMALL, train=True)
        return jnp.mean((y - tgt) ** 2)

    g = jax.grad(loss)(p)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    # At init conv_last is zero, so only conv_last itself receives gradient
    # (same as the reference at step 0). After one "step" (perturb conv_last),
    # gradient must flow through the whole trunk back to conv_first.
    assert float(jnp.abs(g["conv_last"]["w"]).max()) > 0
    p2 = dict(p)
    p2["conv_last"] = {
        "w": jnp.full_like(p["conv_last"]["w"], 0.01),
        "b": p["conv_last"]["b"],
    }
    g2 = jax.grad(loss)(p2)
    assert float(jnp.abs(g2["conv_first"]["w"]).max()) > 0
    assert float(jnp.abs(g2["groups"]["rcab"]["conv1_w"]).max()) > 0


def test_param_count_production_config():
    # Production config: 6 groups x 10 blocks x 64ch (stage1_psnr_config.yaml)
    # must land at the reference's ~4.9M params.
    cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10)
    p = fen.init(jax.random.PRNGKey(0), cfg)
    n = fen.param_count(p)
    # Exact expected count computed from the architecture:
    C, ks = 64, 3
    conv = ks * ks * C * C + C
    ca = C * 16 + 16 * C  # fc1 + fc2, no bias
    rcab_n = 2 * conv + C + ca  # two convs + prelu + CA
    group = 10 * rcab_n + conv
    expect = (
        (ks * ks * 3 * C + C)  # conv_first
        + 6 * group
        + conv  # conv_after_body
        + 2 * (ks * ks * C * 4 * C + 4 * C + C)  # 2 upsample stages
        + (ks * ks * C * 3 + 3)  # conv_last
    )
    assert n == expect
    assert 4.5e6 < n < 5.5e6


def test_attention_maps():
    p = _params()
    x = jnp.ones((2, 8, 8, 3)) * 0.3
    out, attn = fen.apply(p, x, SMALL, collect_attention=True)
    assert attn.shape == (2, 2, 2, 16)  # [G, B, N, C]
    a = np.asarray(attn)
    assert (a >= 0).all() and (a <= 1).all()  # post-sigmoid


def test_wrapper_class():
    model = fen.FaceEnhanceNet(SMALL)
    x = jnp.zeros((1, 16, 16, 3))
    y = model(x)
    assert y.shape == (1, 64, 64, 3)
    maps = model.get_attention_maps(x)
    assert len(maps) == 4 and "group0_rcab0" in maps
    info = model.get_model_info()
    assert info["total_rcab_blocks"] == 4


def test_bf16_compute_close_to_f32():
    p = _params()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    y32 = fen.apply(p, x, SMALL)
    y16 = fen.apply(p, x, SMALL, dtype=jnp.bfloat16)
    assert float(jnp.abs(y32 - y16).mean()) < 2e-2


@pytest.mark.parametrize("scale", [2, 8])
def test_other_scale_factors(scale):
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=1, scale_factor=scale)
    p = fen.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 8, 8, 3))
    y = fen.apply(p, x, cfg)
    assert y.shape == (1, 8 * scale, 8 * scale, 3)
    # zero conv_last: output equals the bicubic skip at any scale
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    from facesr.ops import bicubic_up

    np.testing.assert_allclose(
        np.asarray(fen.apply(p, xr, cfg, train=True)),
        np.asarray(bicubic_up(xr, scale)), atol=1e-6)
