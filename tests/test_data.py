"""Data layer tests: dataset formats, loaders, device augment, split parity."""

import pickle

import numpy as np
import pytest
from PIL import Image

from vitef_tpu.data.images import (
    Loader,
    build_dataset,
    build_loader,
    build_train_val_loader,
    make_iterable,
)
from vitef_tpu.data.images import transforms as T


# ------------------------------------------------------------------------------
# Synthetic on-disk datasets
# ------------------------------------------------------------------------------


@pytest.fixture()
def cifar10_dir(tmp_path):
    rng = np.random.default_rng(0)
    base = tmp_path / "cifar10" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    for fname, n in [("data_batch_1", 40), ("data_batch_2", 40), ("data_batch_3", 40),
                     ("data_batch_4", 40), ("data_batch_5", 40), ("test_batch", 50)]:
        entry = {
            b"data": rng.integers(0, 256, size=(n, 3072), dtype=np.uint8),
            b"labels": rng.integers(0, 10, size=n).tolist(),
        }
        with open(base / fname, "wb") as f:
            pickle.dump(entry, f)
    return tmp_path / "cifar10"


@pytest.fixture()
def cifar10c_dir(tmp_path):
    rng = np.random.default_rng(1)
    base = tmp_path / "cifar10_c"
    base.mkdir(parents=True)
    # 5 severities x 100 images (reference slices [ (s-1)*10k : s*10k ]; our
    # class reads n_per_severity per slice — shrink for test)
    data = rng.integers(0, 256, size=(500, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, size=500)
    np.save(base / "snow.npy", data)
    np.save(base / "labels.npy", labels)
    return base


@pytest.fixture()
def imagefolder_dir(tmp_path):
    rng = np.random.default_rng(2)
    base = tmp_path / "domainnet" / "sketch"
    for cls in ["apple", "banana", "cat"]:
        d = base / cls
        d.mkdir(parents=True)
        for i in range(10):
            arr = rng.integers(0, 256, size=(40 + i, 50, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return tmp_path / "domainnet"


def test_cifar10_dataset_and_loader(cifar10_dir):
    loader, n_classes = build_loader(
        {"dataset_name": "cifar10", "save_dir": str(cifar10_dir), "mode": "train",
         "batch_size": 16, "size": 64, "num_workers": 0},
        return_n_classes=True,
    )
    assert n_classes == 10
    assert len(loader) == 200 // 16
    x, y = next(iter(loader))
    assert x.shape == (16, 3, 64, 64)
    assert str(x.dtype) == "float32"
    assert y.shape == (16,)
    # normalized data should be roughly centered
    assert abs(float(x.mean())) < 2.0


def test_cifar10_eval_path(cifar10_dir):
    loader = build_loader(
        {"dataset_name": "cifar10", "save_dir": str(cifar10_dir), "mode": "test",
         "batch_size": 10, "size": 48, "num_workers": 2},
        drop_last=False,
    )
    batches = list(loader)
    assert sum(b[1].shape[0] for b in batches) == 50  # no drop_last
    x, _ = batches[0]
    assert x.shape == (10, 3, 48, 48)


def test_cifar10c_encoded_name_and_split(cifar10c_dir, monkeypatch):
    import vitef_tpu.data.images.datasets as DS

    monkeypatch.setattr(DS._CifarCDataset, "n_per_severity", 100)
    cfg = {"dataset_name": "cifar10_c-corruption-snow-severity-3",
           "save_dir": str(cifar10c_dir), "mode": "train"}
    train = build_dataset(dict(cfg))
    test = build_dataset({**cfg, "mode": "test"})
    assert len(train) == 80 and len(test) == 20
    # parity with the reference deterministic split
    st0 = np.random.get_state()
    np.random.seed(42)
    perm = np.random.permutation(100)
    np.random.set_state(st0)
    expected_train = np.sort(perm[:80])
    sev3 = np.load(cifar10c_dir / "snow.npy")[200:300]
    assert np.array_equal(train.data, sev3[expected_train])


def test_bad_corruption_type(cifar10c_dir):
    with pytest.raises(AssertionError):
        build_dataset({"dataset_name": "cifar10_c-corruption-bogus-severity-1",
                       "save_dir": str(cifar10c_dir), "mode": "train"})


def test_imagefolder_ordering_and_domainnet(imagefolder_dir):
    ds = build_dataset({"dataset_name": "domainnet-sketch",
                        "save_dir": str(imagefolder_dir), "mode": "train"})
    assert ds.n_classes == 345
    assert len(ds) == 24  # 80% of 30
    # labels follow sorted class dirs: apple=0 < banana=1 < cat=2
    labels = [s[1] for s in ds.samples]
    assert set(labels) <= {0, 1, 2}
    img, label = ds.load_image(0)
    assert img.mode == "RGB"


def test_file_backed_train_loader(imagefolder_dir):
    ds = build_dataset({"dataset_name": "domainnet-sketch",
                        "save_dir": str(imagefolder_dir), "mode": "train"})
    loader = Loader(ds, batch_size=8, size=32, mode="train", shuffle=True,
                    drop_last=True, num_workers=2)
    x, y = next(iter(loader))
    assert x.shape == (8, 3, 32, 32)


def test_train_val_loader_split(cifar10_dir):
    np.random.seed(0)
    train_loader, val_loader, n_classes = build_train_val_loader(
        {"dataset_name": "cifar10", "save_dir": str(cifar10_dir),
         "batch_size": 16, "val_batch_size": 8, "size": 32, "num_workers": 0},
        return_n_classes=True,
    )
    assert n_classes == 10
    assert set(train_loader.indices).isdisjoint(set(val_loader.indices))
    assert len(train_loader.indices) == 160 and len(val_loader.indices) == 40
    x, y = next(iter(val_loader))
    assert x.shape[0] == 8


def test_make_iterable_cycles(cifar10_dir):
    loader = build_loader(
        {"dataset_name": "cifar10", "save_dir": str(cifar10_dir), "mode": "train",
         "batch_size": 64, "size": 32, "num_workers": 0})
    it = make_iterable(loader)
    for _ in range(2 * len(loader) + 1):  # crosses epoch boundary twice
        x, y = next(it)
    assert x.shape[0] == 64


# ------------------------------------------------------------------------------
# Transform parity
# ------------------------------------------------------------------------------


def test_device_crop_resize_matches_pil():
    """Device scale_and_translate crop-resize ≈ PIL box-resize (same box)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    top, left, h, w = 10, 20, 40, 48
    size = 32
    pil = Image.fromarray(img).resize((size, size), Image.BILINEAR,
                                      box=(left, top, left + w, top + h))
    ref = np.asarray(pil, np.float32)
    ours = np.asarray(T._crop_resize_one(
        jnp.asarray(img, jnp.float32), jnp.asarray([top, left, h, w]), size))
    # PIL uses fixed-point arithmetic; agreement within ~1 intensity level
    assert np.abs(ours - ref).mean() < 1.0
    assert np.abs(ours - ref).max() < 12.0


def test_eval_upscale_parity_cifar():
    """32→224 upscale path: device resize vs PIL-parity host transform."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    host = T.eval_transform_host(Image.fromarray(img), 224).astype(np.float32)
    dev = np.asarray(T._crop_resize_one(
        jnp.asarray(img, jnp.float32), jnp.asarray([0, 0, 32, 32]), 224))
    assert np.abs(host - dev).mean() < 1.0


def test_sample_resized_crop_params_distribution():
    rng = np.random.default_rng(5)
    H, W = 32, 32
    areas, ratios = [], []
    for _ in range(500):
        top, left, h, w = T.sample_resized_crop_params(rng, H, W)
        assert 0 <= top <= H - h and 0 <= left <= W - w
        assert 0 < h <= H and 0 < w <= W
        areas.append(h * w / (H * W))
        ratios.append(w / h)
    # scale (0.08, 1.0): mean area well inside, ratios within (3/4, 4/3)+rounding
    assert 0.2 < np.mean(areas) < 0.8
    assert min(ratios) > 0.6 and max(ratios) < 1.7


def test_normalize_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    batch = rng.integers(0, 256, size=(4, 16, 16, 3), dtype=np.uint8)
    dev = np.asarray(T.normalize_device(jnp.asarray(batch)))
    host = T.normalize_host(batch)
    assert np.allclose(dev, host, atol=1e-6)


def test_augment_train_device_shapes_flip():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    boxes = np.asarray([[0, 0, 32, 32]] * 4, np.int32)
    flips = np.asarray([False, True, False, True])
    out = np.asarray(T.augment_train_device(
        jnp.asarray(batch), jnp.asarray(boxes), jnp.asarray(flips), size=32))
    assert out.shape == (4, 3, 32, 32)
    # flipped sample = flip of unflipped transform of same image
    noflip = np.asarray(T.augment_train_device(
        jnp.asarray(batch), jnp.asarray(boxes),
        jnp.asarray([False] * 4), size=32))
    assert np.allclose(out[1], noflip[1][:, :, ::-1], atol=1e-5)


def test_augment_pallas_matches_xla_path():
    """The TPU pallas augment kernel (interpret mode here) agrees with the
    XLA scale_and_translate path within ~1.5 uint8 intensity levels (same
    separable bilinear map; default-precision MXU f32 delta only)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    batch = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    boxes, flips = T.sample_crop_batch(rng, 4, 32, 32)
    ref = np.asarray(T.augment_train_device(
        jnp.asarray(batch), jnp.asarray(boxes), jnp.asarray(flips),
        size=224, compute_dtype=jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(T._augment_pallas(
            jnp.asarray(batch), jnp.asarray(boxes), jnp.asarray(flips),
            size=224, compute_dtype=jnp.float32))
    d = np.abs(ref - ours)
    # normalized units: 1 intensity level ~= 1/(255*std) ~= 0.0175
    assert d.max() < 0.05 and d.mean() < 0.005


def test_synthetic_dataset():
    """Offline verification dataset: fixed-size, class-separable, mode-seeded."""
    train = build_dataset({"dataset_name": "synthetic", "mode": "train",
                           "n_samples": 64, "image_size": 16, "n_classes": 5})
    test = build_dataset({"dataset_name": "synthetic", "mode": "test",
                          "n_samples": 32, "image_size": 16, "n_classes": 5})
    assert len(train) == 64 and len(test) == 32
    assert train.n_classes == 5
    assert train.data.shape == (64, 16, 16, 3)
    assert not np.array_equal(train.data[:32], test.data)  # different mode seed
    loader = Loader(train, batch_size=16, size=16, mode="train", shuffle=True,
                    drop_last=True, num_workers=0)
    x, y = next(iter(loader))
    assert x.shape == (16, 3, 16, 16)


def test_synthetic_encoded_n_samples():
    """``synthetic-<n>`` sizes the dataset from the name (CLI runs can't pass
    dataset kwargs; batch 512 needs more than the 256-sample default)."""
    ds = build_dataset({"dataset_name": "synthetic-4096", "mode": "train"})
    assert len(ds) == 4096


def test_loader_zero_batches_raises():
    """batch_size > dataset with drop_last must fail fast at construction —
    a 0-batch epoch inside make_iterable's infinite cycle is a silent
    pure-Python busy spin (observed: 20+ min 'hang' of apps.vit.train on the
    default 256-sample synthetic dataset at batch 512)."""
    ds = build_dataset({"dataset_name": "synthetic", "mode": "train",
                        "n_samples": 64})
    with pytest.raises(ValueError, match="0 batches"):
        Loader(ds, batch_size=128, size=16, mode="train", drop_last=True,
               num_workers=0)
    # drop_last=False keeps the short final batch: fine.
    loader = Loader(ds, batch_size=128, size=16, mode="train", drop_last=False,
                    num_workers=0)
    assert len(loader) == 1


def test_loader_sharding_disjoint_and_complete():
    """Multi-host shards: disjoint, identically-shuffled, covering the epoch."""
    from vitef_tpu.data.images.datasets import ImageDataset

    class DS(ImageDataset):
        def __init__(self):
            self.data = np.zeros((40, 8, 8, 3), np.uint8)
            self.targets = np.arange(40) % 4
            self.n_classes = 4

    ds = DS()
    orders = []
    for i in range(4):
        loader = Loader(ds, batch_size=5, size=8, mode="test", shuffle=True,
                        drop_last=True, num_workers=0, seed=7,
                        shard_index=i, shard_count=4)
        orders.append(loader._epoch_order())
        assert len(loader) == 2  # 40/4 = 10 per shard, batch 5
    all_idx = np.concatenate(orders)
    assert len(all_idx) == 40 and len(set(all_idx.tolist())) == 40


def test_loader_sharding_equal_sizes_when_ragged():
    """Epoch trimmed to a shard_count multiple: all shards equal, synchronized."""
    from vitef_tpu.data.images.datasets import ImageDataset

    class DS(ImageDataset):
        def __init__(self):
            self.data = np.zeros((42, 8, 8, 3), np.uint8)  # 42 % 4 = 2
            self.targets = np.arange(42) % 4
            self.n_classes = 4

    ds = DS()
    orders, lens = [], []
    for i in range(4):
        loader = Loader(ds, batch_size=5, size=8, mode="test", shuffle=True,
                        drop_last=True, num_workers=0, seed=7,
                        shard_index=i, shard_count=4)
        o = loader._epoch_order()
        orders.append(o)
        lens.append(len(o))
        assert len(loader) == 2
    assert lens == [10, 10, 10, 10]  # equal — hosts stay in lockstep
    all_idx = np.concatenate(orders)
    assert len(set(all_idx.tolist())) == 40  # disjoint (2 trimmed)


def test_loader_lookahead_yields_produced_batches_before_error():
    """Producer failure surfaces AFTER every successfully produced batch is
    delivered (FIFO semantics preserved by the device lookahead; code-review
    r2 finding #3)."""
    import pytest

    from vitef_tpu.data.images.datasets import SyntheticDataset, SyntheticDatasetConfig
    from vitef_tpu.data.images.loader import Loader

    ds = SyntheticDataset(SyntheticDatasetConfig(mode="train", n_samples=32))
    loader = Loader(ds, batch_size=4, size=32, mode="train", shuffle=False,
                    num_workers=0, prefetch=2)

    boom = RuntimeError("decode failed")
    original = loader._assemble
    calls = {"n": 0}

    def flaky(idx):
        calls["n"] += 1
        if calls["n"] == 4:  # batches 1-3 fine, 4th explodes
            raise boom
        return original(idx)

    loader._assemble = flaky
    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for batch in loader:
            got.append(batch)
    assert len(got) == 3  # every produced batch delivered first
