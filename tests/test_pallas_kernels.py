"""Pallas kernel correctness tests (interpreter mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from facesr.models import blocks as blocks_lib
from facesr.ops.pallas.rcab_group import (
    fused_residual_group,
    prepare_group_weights,
    supports,
)


def _one_group(B=3, C=64, seed=0):
    gp_all = blocks_lib.init_residual_groups(jax.random.PRNGKey(seed), 1, B, C, 3, 4)
    gp = jax.tree.map(lambda a: a[0], gp_all)
    return gp_all, gp


def test_fused_group_matches_reference_path():
    gp_all, gp = _one_group()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 64), dtype=np.float32))
    want, _ = blocks_lib.residual_groups(gp_all, x, 0.2, 1)
    got = fused_residual_group(x, prepare_group_weights(gp), res_scale=0.2,
                               interpret=True)
    # kernel matmuls run in bf16 (same policy as the bf16 XLA trunk)
    err = float(jnp.abs(got - want).max())
    assert err < 2e-2, err


def test_fused_group_single_block():
    gp_all, gp = _one_group(B=1, seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 8, 8, 64), dtype=np.float32))
    want, _ = blocks_lib.residual_groups(gp_all, x, 0.2, 1)
    got = fused_residual_group(x, prepare_group_weights(gp), res_scale=0.2,
                               interpret=True)
    assert float(jnp.abs(got - want).max()) < 2e-2


def test_supports_budget():
    assert supports(64, 64, 64)
    assert not supports(512, 512, 64)  # patches alone blow VMEM
