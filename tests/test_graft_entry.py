"""Guard the driver contract in __graft_entry__.py.

The driver compile-checks entry() single-chip and runs dryrun_multichip(8)
in a fresh process where the host may expose only 1 device (round-1 failure
mode: MULTICHIP_r01.json rc=1). Here we cover the in-process path (conftest
already provisioned 8 CPU devices, so _ensure_devices must early-return and
leave the backend alone) and the entry() jit contract.
"""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip_with_provisioned_mesh(capsys):
    graft.dryrun_multichip(8)
    assert "dryrun_multichip OK on 8 devices" in capsys.readouterr().out
    # _ensure_devices must not have torn down the conftest-provisioned mesh.
    assert len(jax.devices()) == 8


def test_ensure_devices_noop_when_enough():
    before = jax.devices()
    graft._ensure_devices(4)
    assert jax.devices() == before
