"""Native batch assembler: build, parity with the numpy fallback, loader."""

import numpy as np
import pytest

from facesr import native


def _numpy_reference(images, crop, tops, lefts, flips):
    out = np.empty((len(images), crop, crop, 3), np.float32)
    for i, img in enumerate(images):
        t, l = int(tops[i]), int(lefts[i])
        patch = img[t:t + crop, l:l + crop]
        if flips[i]:
            patch = patch[:, ::-1]
        out[i] = patch.astype(np.float32) / 255.0
    return out


def test_native_builds():
    assert native.native_available(), "g++ build of batch_assembler failed"


def test_assemble_matches_numpy():
    rng = np.random.default_rng(0)
    images = [
        (rng.random((40 + i, 50 + i, 3)) * 255).astype(np.uint8) for i in range(5)
    ]
    crop = 32
    tops = rng.integers(0, 8, 5).astype(np.int32)
    lefts = rng.integers(0, 8, 5).astype(np.int32)
    flips = np.array([0, 1, 0, 1, 1], np.uint8)
    got = native.assemble_hr_batch(images, crop, tops, lefts, flips, nthreads=2)
    want = _numpy_reference(images, crop, tops, lefts, flips)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_assemble_single_thread():
    rng = np.random.default_rng(1)
    images = [(rng.random((16, 16, 3)) * 255).astype(np.uint8)]
    got = native.assemble_hr_batch(
        images, 16, np.zeros(1, np.int32), np.zeros(1, np.int32),
        np.zeros(1, np.uint8), nthreads=1)
    np.testing.assert_allclose(got[0], images[0].astype(np.float32) / 255.0)


def test_fast_loader(tmp_path):
    import cv2
    from facesr.data.dataset import FFHQDataset
    from facesr.data.fast_loader import FastHRLoader

    d = tmp_path / "train" / "HR"
    d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(10):
        cv2.imwrite(str(d / f"{i:03d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    ds = FFHQDataset(str(tmp_path), mode="train", hr_patch_size=32, seed=0)
    loader = FastHRLoader(ds, batch_size=4, crop=32, num_workers=2, seed=0)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    hr = batches[0]["hr"]
    assert hr.shape == (4, 32, 32, 3) and hr.dtype == np.float32
    assert 0.0 <= hr.min() and hr.max() <= 1.0
