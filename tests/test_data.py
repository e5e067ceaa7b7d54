"""Data pipeline tests: prepare -> dataset backends -> loader -> batches."""

import numpy as np
import pytest
import cv2

from facesr.data import (
    FFHQDataset,
    ImageCache,
    get_dataloader,
    DataLoader,
    PairedTransform,
    to_array,
)
from facesr.data.prepare_data import (
    create_lr_image,
    resize_hr_image,
    split_dataset,
    process_and_save_images,
    save_to_hdf5,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    for i in range(12):
        img = (rng.random((300, 300, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"img_{i:03d}.png"), img)
    return d


@pytest.fixture(scope="module")
def processed_dir(raw_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("processed")
    files = sorted(raw_dir.glob("*.png"))
    train, val, test = split_dataset(files, train_ratio=0.5, val_ratio=0.25, seed=42)
    for split, flist in (("train", train), ("val", val), ("test", test)):
        process_and_save_images(flist, out / split, hr_size=64, lr_size=16)
    return out


def test_split_ratios(raw_dir):
    files = sorted(raw_dir.glob("*.png"))
    train, val, test = split_dataset(files, 0.5, 0.25, seed=42)
    assert len(train) == 6 and len(val) == 3 and len(test) == 3
    # deterministic
    train2, _, _ = split_dataset(files, 0.5, 0.25, seed=42)
    assert [f.name for f in train] == [f.name for f in train2]


def test_create_lr_methods():
    hr = (np.random.default_rng(1).random((64, 64, 3)) * 255).astype(np.uint8)
    for method in ("bicubic", "bilinear", "realistic"):
        lr = create_lr_image(hr, 16, method)
        assert lr.shape == (16, 16, 3) and lr.dtype == np.uint8
    assert resize_hr_image(hr, 32).shape == (32, 32, 3)


def test_dataset_dir_backend(processed_dir):
    ds = FFHQDataset(str(processed_dir), mode="train", scale_factor=4,
                     hr_patch_size=32, seed=0)
    assert len(ds) == 6
    s = ds[0]
    assert s["hr"].shape == (32, 32, 3) and s["lr"].shape == (8, 8, 3)
    assert s["hr"].dtype == np.float32
    assert 0.0 <= s["hr"].min() and s["hr"].max() <= 1.0


def test_dataset_hr_only_mode(processed_dir, tmp_path):
    import shutil

    d = tmp_path / "hr_only" / "train"
    shutil.copytree(processed_dir / "train" / "HR", d / "HR")
    ds = FFHQDataset(str(tmp_path / "hr_only"), mode="train", scale_factor=4,
                     hr_patch_size=32, seed=0)
    assert ds.hr_only_mode
    s = ds[0]
    assert s["lr"].shape == (8, 8, 3)


def test_dataset_hdf5_backend(processed_dir, tmp_path):
    h5p = tmp_path / "train.h5"
    save_to_hdf5(processed_dir / "train", h5p, hr_size=64, lr_size=16)
    ds = FFHQDataset(str(h5p), mode="train", scale_factor=4, hr_patch_size=32,
                     return_filename=True, seed=0)
    assert len(ds) == 6
    s = ds[0]
    assert s["hr"].shape == (32, 32, 3)
    assert s["filename"].endswith(".png")


def test_dataloader_batching(processed_dir):
    loader = get_dataloader(str(processed_dir), mode="train", batch_size=4,
                            num_workers=2, hr_patch_size=32, seed=0)
    assert len(loader) == 1  # 6 samples, drop_last
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["hr"].shape == (4, 32, 32, 3)
    # shuffling changes across epochs but sizes stay
    b2 = list(loader)[0]
    assert b2["hr"].shape == (4, 32, 32, 3)


def test_dataloader_no_workers(processed_dir):
    loader = get_dataloader(str(processed_dir), mode="val", batch_size=2,
                            num_workers=0, hr_patch_size=32)
    batches = list(loader)
    assert sum(b["hr"].shape[0] for b in batches) == 3  # no drop_last in val


def test_image_cache():
    c = ImageCache(max_size=2)
    a = np.zeros((2, 2, 3), np.uint8)
    c.put("k1", (a, a))
    c.put("k2", (a, a))
    assert c.get("k1") is not None
    c.put("k3", (a, a))  # evicts k2 (LRU)
    assert c.get("k2") is None
    assert 0 < c.hit_rate < 1


def test_paired_transform_sync():
    rng = np.random.default_rng(2)
    hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    lr = cv2.resize(hr, (16, 16), interpolation=cv2.INTER_CUBIC)
    t = PairedTransform(hr_patch_size=32, scale_factor=4, mode="train",
                        horizontal_flip=1.0, color_jitter_prob=0.0,
                        rng=np.random.default_rng(0))
    hr_t, lr_t = t(hr, lr)
    assert hr_t.shape == (32, 32, 3) and lr_t.shape == (8, 8, 3)
    # val mode: no-op
    tv = PairedTransform(hr_patch_size=32, scale_factor=4, mode="val")
    hr_v, lr_v = tv(hr, lr)
    assert hr_v.shape == hr.shape and lr_v.shape == lr.shape


def test_to_array():
    img = (np.ones((4, 4, 3)) * 128).astype(np.uint8)
    arr = to_array(img)
    assert arr.dtype == np.float32 and abs(arr[0, 0, 0] - 128 / 255) < 1e-6


def test_config_validation(tmp_path):
    from facesr.config import validate_config

    assert validate_config({"model": {"type": "custom"}}) == []
    warnings = validate_config({
        "modle": {},  # typo
        "model": {"type": "resnet"},
        "training": {"scheduler": {"type": "exp"}},
        "data": {"scale_factor": 3},
    })
    assert len(warnings) == 4


def test_lazy_package_exports():
    import facesr

    assert hasattr(facesr.models, "FaceEnhanceNet")
    assert "losses" in dir(facesr)


def test_paired_transform_thread_safety_and_determinism():
    # ADVICE r1: one shared np Generator raced across DataLoader worker
    # threads. Each thread must get its own generator; same seed must give
    # the same single-threaded draw sequence.
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(3)
    hr = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    lr = cv2.resize(hr, (24, 24), interpolation=cv2.INTER_CUBIC)

    def draws(seed):
        t = PairedTransform(hr_patch_size=32, scale_factor=4, mode="train",
                            color_jitter_prob=0.5, seed=seed)
        return [t(hr, lr)[0].tobytes() for _ in range(8)]

    assert draws(7) == draws(7)          # deterministic for num_workers <= 1
    assert draws(7) != draws(8)

    t = PairedTransform(hr_patch_size=32, scale_factor=4, mode="train",
                        color_jitter_prob=0.5, seed=0)
    with ThreadPoolExecutor(max_workers=8) as pool:
        outs = list(pool.map(lambda _: t(hr, lr)[0].shape, range(256)))
    assert all(s == (32, 32, 3) for s in outs)
    # distinct threads got distinct generators
    import threading

    barrier = threading.Barrier(4)

    def gen_id(_):
        barrier.wait(timeout=10)
        return id(t.rng)

    with ThreadPoolExecutor(max_workers=4) as pool:
        gens = set(pool.map(gen_id, range(4)))
    assert len(gens) == 4


def test_per_host_input_sharding():
    # SURVEY §5 / VERDICT r1 #10: hosts take disjoint equal-length slices of
    # the same shuffled order, so a multi-host mesh shards the dataset
    # instead of duplicating it, with identical step counts per host.
    from facesr.data.loader import DataLoader, host_shard

    class Toy:
        def __len__(self):
            return 103

        def __getitem__(self, i):
            return {"hr": np.full((2, 2, 3), i, np.float32), "idx": np.int64(i)}

    loaders = [DataLoader(Toy(), batch_size=4, shuffle=True, drop_last=True,
                          num_workers=0, seed=7, process_index=r, process_count=4)
               for r in range(4)]
    assert len(set(len(l) for l in loaders)) == 1  # lockstep step counts

    seen = []
    for l in loaders:
        host_idx = [int(v) for b in l for v in b["idx"]]
        seen.append(set(host_idx))
    all_seen = set().union(*seen)
    assert sum(len(s) for s in seen) == len(all_seen)  # disjoint
    assert len(all_seen) == 4 * (103 // 4 // 4) * 4

    # identity with one process; deterministic given (seed, epoch)
    order = np.random.default_rng(0).permutation(50)
    np.testing.assert_array_equal(host_shard(order, 0, 1), order)
    np.testing.assert_array_equal(host_shard(order, 2, 5), order[20:30])


def test_fast_loader_per_host_sharding(tmp_path):
    from facesr.data.fast_loader import FastHRLoader

    class ToyHR:
        def __len__(self):
            return 32

        def load_hr(self, i):
            return np.full((8, 8, 3), i, np.uint8)

    loaders = [FastHRLoader(ToyHR(), batch_size=4, crop=8, shuffle=True,
                            num_workers=0, seed=3, process_index=r,
                            process_count=2) for r in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 4
    vals = [set(int(b["hr"][j, 0, 0, 0] * 255 + 0.5) for b in l for j in range(4))
            for l in loaders]
    assert vals[0].isdisjoint(vals[1])
