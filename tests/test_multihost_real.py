"""REAL multi-process multi-host smoke (VERDICT r3 item 6).

Spawns two actual `jax.distributed` processes (2 CPU devices each -> one
4-device global mesh) running the production Trainer end to end via
tests/multihost_worker.py, then asserts the pod story on the evidence
they report:

  - host_shard feeds each host a DISJOINT, equal-length slice of the
    dataset (the per-host input pipeline, SURVEY.md §5),
  - only process 0 physically writes checkpoints (single-writer
    discipline on shared storage),
  - both hosts record IDENTICAL global loss/PSNR histories (the global
    batch really is assembled across processes),
  - both hosts restore the shared checkpoint to the identical state.

This replaces tests/test_training.py::test_multihost_write_discipline's
monkeypatched process index as the load-bearing evidence — that test
stays as the fast variant.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_smoke(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the worker provisions its own 2 CPU devices (jax_num_cpu_devices);
    # conftest's 8-device XLA_FLAGS must not leak into it
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process-id", str(pid),
             "--num-processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--workdir", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for pid in (0, 1):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)
    r0, r1 = results[0], results[1]

    # --- disjoint, equal-length host shards over the 40-sample dataset.
    # Shuffling reshards samples across hosts every epoch, so disjointness
    # is a PER-EPOCH property: split each host's access sequence into its
    # two epochs (16 = 2 batches x 8 train fetches per epoch; the restore
    # Trainer never iterates, so the sequence is exactly 2 epochs long).
    seq0, seq1 = r0["train_access_seq"], r1["train_access_seq"]
    assert len(seq0) == len(seq1) == 32
    for ep in range(2):
        e0 = set(seq0[ep * 16:(ep + 1) * 16])
        e1 = set(seq1[ep * 16:(ep + 1) * 16])
        assert len(e0) == len(e1) == 16  # no duplicate fetches in an epoch
        assert not (e0 & e1), \
            f"epoch {ep}: hosts trained on overlapping samples: {e0 & e1}"
    assert not (set(r0["val_indices"]) & set(r1["val_indices"]))

    # --- single-writer discipline
    assert r0["is_writer"] and not r1["is_writer"]
    assert r1["writes"] == [], f"process 1 wrote checkpoints: {r1['writes']}"
    assert "final_model.fckpt" in r0["writes"]
    assert os.path.exists(tmp_path / "ckpt" / "final_model.fckpt")

    # --- the global batch is assembled across processes: both hosts see
    # the SAME global metrics every epoch
    for key in ("train_loss", "val_loss", "val_psnr"):
        assert r0["history"][key] == pytest.approx(r1["history"][key],
                                                   abs=1e-5), key
    assert len(r0["history"]["train_loss"]) == 2

    # --- training made progress (sanity that the run was real)
    assert r0["history"]["train_loss"][1] < r0["history"]["train_loss"][0]

    # --- both hosts resume the shared checkpoint to the identical state
    assert r0["params_digest"] == r1["params_digest"]
    assert r0["restored_digest"] == r0["params_digest"]
    assert r1["restored_digest"] == r1["params_digest"]
    assert r0["resumed_epoch"] == r1["resumed_epoch"]
