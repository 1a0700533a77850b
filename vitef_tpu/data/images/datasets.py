"""Image dataset catalog — the reference's 9 dataset families, torchvision-free.

Reference: src/vitef/data/images/{cifar10,cifar100,cifar10_c,cifar100_c,
imagenet,imagenet_c,domainnet,flowers102,pet}.py. Each reference class wraps a
torchvision dataset; here the on-disk formats are read directly (pickled CIFAR
batches, .npy corruption dumps, ImageFolder trees, .mat/.txt split files) with
**torchvision-identical sample ordering** — this matters because the
deterministic 80/20 splits (fixed numpy seed 42, reference utils.py:221-230)
index into that ordering, so membership must be bit-exact (SURVEY §7.3).

Datasets expose two access styles for the TPU loader:
  - fixed-size in-memory datasets (CIFAR*, *-C): ``.data`` (N, H, W, C) uint8 +
    ``.targets`` — batch-gathered directly, augment runs on device;
  - file-backed datasets (ImageFolder trees, Flowers102, Pet): ``.samples``
    [(path, label)] — decoded per sample by host worker threads.

No automatic downloads (the reference's torchvision ``download=True`` needs
network); a clear error points at the same URLs the reference documents.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

from ...config import DATASET_DIR
from ...utils.tree import deterministic_split

CORRUPTION_TYPES = [
    "brightness", "contrast", "defocus_blur", "elastic_transform", "fog",
    "frost", "gaussian_blur", "gaussian_noise", "glass_blur", "impulse_noise",
    "jpeg_compression", "motion_blur", "pixelate", "saturate", "shot_noise",
    "snow", "spatter", "speckle_noise", "zoom_blur",
]

DOMAINS = ["clipart", "infograph", "painting", "quickdraw", "real", "sketch"]


@dataclass
class SyntheticDatasetConfig:
    """Synthetic random-image dataset for offline/e2e verification (no
    reference counterpart — this image has zero egress, so the torchvision
    auto-downloads of the reference are impossible here)."""

    mode: str = "train"
    n_samples: int = 256
    image_size: int = 32
    n_classes: int = 10
    seed: int = 0
    save_dir: str | None = None  # accepted and ignored (loader contract)

    def __post_init__(self):
        assert self.mode in ["train", "val", "test"], (
            f"Invalid mode {self.mode}."
        )


class ImageDataset:
    """Base: either in-memory ``data``/``targets`` or file-backed ``samples``."""

    data: np.ndarray | None = None  # (N, H, W, C) uint8
    targets: Any = None
    samples: list | None = None  # [(path, label)]
    n_classes: int = 0

    def __len__(self):
        return len(self.data) if self.data is not None else len(self.samples)

    @property
    def fixed_size(self) -> bool:
        return self.data is not None

    def load_image(self, idx: int):
        """PIL image + label for file-backed datasets (reference __getitem__)."""
        from PIL import Image

        path, label = self.samples[idx]
        return Image.open(path).convert("RGB"), int(label)

    def raw(self, idx: int) -> tuple[np.ndarray, int]:
        """uint8 HWC array + label."""
        if self.data is not None:
            return self.data[idx], int(self.targets[idx])
        img, label = self.load_image(idx)
        return np.asarray(img, np.uint8), label

    def __repr__(self):
        return f"Dataset with {len(self)} images."


def _imagefolder_samples(root: Path) -> tuple[list, list[str]]:
    """torchvision.datasets.ImageFolder ordering: classes sorted; within each
    class dir, ``sorted(os.walk)`` roots and sorted file names."""
    import os

    root = Path(root)
    if not root.exists():
        raise FileNotFoundError(f"ImageFolder root {root} does not exist")
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    exts = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")
    samples = []
    for c in classes:
        d = root / c
        for sub_root, _, fnames in sorted(os.walk(d, followlinks=True)):
            for fname in sorted(fnames):
                if fname.lower().endswith(exts):
                    samples.append((str(Path(sub_root) / fname), class_to_idx[c]))
    return samples, classes


def _apply_deterministic_split(n: int, train: bool) -> np.ndarray:
    """Seed-42 permutation 80/20 split with per-subset sort (reference
    cifar10_c.py:173-182 et al.: ``indices = np.sort(indices)``)."""
    train_idx, test_idx = deterministic_split(n, 0.8)
    return np.sort(train_idx if train else test_idx)


class SyntheticDataset(ImageDataset):
    """Class-separable random uint8 images; labels encoded into channel 0."""

    def __init__(self, config: SyntheticDatasetConfig):
        mode_seed = {"train": 0, "val": 1, "test": 2}[config.mode]
        rng = np.random.default_rng(config.seed + mode_seed)
        s = config.image_size
        self.targets = rng.integers(0, config.n_classes, size=config.n_samples)
        data = rng.integers(0, 64, size=(config.n_samples, s, s, 3), dtype=np.uint8)
        bump = (self.targets * (191 // max(config.n_classes - 1, 1))).astype(np.uint8)
        data[..., 0] += bump[:, None, None]
        self.data = data
        self.n_classes = config.n_classes


# ------------------------------------------------------------------------------
# CIFAR-10 / CIFAR-100 (pickled batch files)
# ------------------------------------------------------------------------------


@dataclass
class Cifar10DatasetConfig:
    """Reference cifar10.py:20-47."""

    save_dir: str | None = None
    mode: str = "train"

    def __post_init__(self):
        assert self.mode in ["train", "test"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "cifar10")


def _load_cifar_batches(base: Path, files: list[str], labels_key: bytes):
    xs, ys = [], []
    for fname in files:
        path = base / fname
        if not path.exists():
            raise FileNotFoundError(
                f"CIFAR batch {path} not found. Download from "
                "https://www.cs.toronto.edu/~kriz/cifar.html and extract under "
                f"{base.parent}."
            )
        with open(path, "rb") as f:
            entry = pickle.load(f, encoding="bytes")
        xs.append(entry[b"data"])
        ys.extend(entry[labels_key])
    data = np.vstack(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(data), np.asarray(ys, np.int64)


class Cifar10Dataset(ImageDataset):
    """Reference cifar10.py:51-107 (50k train / 10k test, 32×32, 10 classes)."""

    def __init__(self, config: Cifar10DatasetConfig):
        base = Path(config.save_dir) / "cifar-10-batches-py"
        if config.mode == "train":
            files = [f"data_batch_{i}" for i in range(1, 6)]
        else:
            files = ["test_batch"]
        self.data, self.targets = _load_cifar_batches(base, files, b"labels")
        self.n_classes = 10


@dataclass
class Cifar100DatasetConfig:
    """Reference cifar100.py:20-47."""

    save_dir: str | None = None
    mode: str = "train"

    def __post_init__(self):
        assert self.mode in ["train", "test"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "cifar100")


class Cifar100Dataset(ImageDataset):
    """Reference cifar100.py:51-107 (fine labels, 100 classes)."""

    def __init__(self, config: Cifar100DatasetConfig):
        base = Path(config.save_dir) / "cifar-100-python"
        fname = "train" if config.mode == "train" else "test"
        self.data, self.targets = _load_cifar_batches(base, [fname], b"fine_labels")
        self.n_classes = 100


# ------------------------------------------------------------------------------
# CIFAR-10-C / CIFAR-100-C (.npy zenodo dumps, severity slices, 80/20 split)
# ------------------------------------------------------------------------------


@dataclass
class Cifar10CDatasetConfig:
    """Reference cifar10_c.py:23-110."""

    save_dir: str | None = None
    corruption_type: str = "brightness"
    corruption_severity: int = 1
    mode: str = "train"

    def __post_init__(self):
        assert self.corruption_type in CORRUPTION_TYPES, (
            f"Invalid corruption type {self.corruption_type}. "
            "See documentation for options."
        )
        assert self.corruption_severity in [1, 2, 3, 4, 5], (
            f"Invalid severity {self.corruption_severity}. Options are from 1 to 5."
        )
        assert self.mode in ["train", "test"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "cifar10_c")


class _CifarCDataset(ImageDataset):
    n_per_severity = 10_000

    def __init__(self, config, n_classes: int):
        save_dir = Path(config.save_dir)
        path_images = save_dir / f"{config.corruption_type}.npy"
        path_labels = save_dir / "labels.npy"
        if not path_images.exists():
            raise FileNotFoundError(
                f"{path_images} not found. Download CIFAR-C from "
                "https://zenodo.org/record/2535967 (see reference cifar10_c.py)."
            )
        start = (config.corruption_severity - 1) * self.n_per_severity
        end = start + self.n_per_severity
        data = np.load(path_images)[start:end]
        targets = np.asarray(
            [int(l) for l in np.load(path_labels)[start:end]], np.int64
        )
        indices = _apply_deterministic_split(len(data), config.mode == "train")
        self.data = np.ascontiguousarray(data[indices])
        self.targets = targets[indices]
        self.n_classes = n_classes


class Cifar10CDataset(_CifarCDataset):
    """Reference cifar10_c.py:113-200."""

    def __init__(self, config: Cifar10CDatasetConfig):
        super().__init__(config, n_classes=10)


@dataclass
class Cifar100CDatasetConfig(Cifar10CDatasetConfig):
    """Reference cifar100_c.py:23-110."""

    def __post_init__(self):
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "cifar100_c")
        super().__post_init__()


class Cifar100CDataset(_CifarCDataset):
    """Reference cifar100_c.py:113-199."""

    def __init__(self, config: Cifar100CDatasetConfig):
        super().__init__(config, n_classes=100)


# ------------------------------------------------------------------------------
# ImageNet / ImageNet-C / DomainNet (ImageFolder trees)
# ------------------------------------------------------------------------------


@dataclass
class ImageNetDatasetConfig:
    """Reference imagenet.py:24-52."""

    save_dir: str | None = None
    mode: str = "train"

    def __post_init__(self):
        assert self.mode in ["train", "val"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'val'."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "imagenet")


class ImageNetDataset(ImageDataset):
    """Reference imagenet.py:88-113: ImageFolder over datasets/imagenet/{train,val}."""

    def __init__(self, config: ImageNetDatasetConfig):
        split = "train" if config.mode == "train" else "val"
        self.samples, _ = _imagefolder_samples(Path(config.save_dir) / split)
        self.n_classes = 1000


@dataclass
class ImageNetCDatasetConfig:
    """Reference imagenet_c.py:24-117."""

    save_dir: str | None = None
    corruption_type: str = "brightness"
    corruption_severity: int = 1
    mode: str = "train"

    def __post_init__(self):
        assert self.corruption_type in CORRUPTION_TYPES, (
            f"Invalid corruption type {self.corruption_type}."
        )
        assert self.corruption_severity in [1, 2, 3, 4, 5], (
            f"Invalid severity {self.corruption_severity}."
        )
        assert self.mode in ["train", "val", "test"], (
            f"Invalid mode {self.mode}. Options are 'train', 'val' and 'test'."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "imagenet_c")


class ImageNetCDataset(ImageDataset):
    """Reference imagenet_c.py:120-199: ImageFolder over
    ``<corruption>/<severity>``; mode 'val' = full set, train/test = 80/20."""

    def __init__(self, config: ImageNetCDatasetConfig):
        root = (Path(config.save_dir) / config.corruption_type
                / str(config.corruption_severity))
        samples, _ = _imagefolder_samples(root)
        if config.mode == "val":
            self.samples = samples
        else:
            indices = _apply_deterministic_split(len(samples), config.mode == "train")
            self.samples = [samples[i] for i in indices]
        self.n_classes = 1000


@dataclass
class DomainNetDatasetConfig:
    """Reference domainnet.py:24-67."""

    save_dir: str | None = None
    domain: str = "clipart"
    mode: str = "train"

    def __post_init__(self):
        assert self.domain in DOMAINS, (
            f"Invalid corruption type {self.domain}. See documentation for options."
        )
        assert self.mode in ["train", "test"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "domainnet")


class DomainNetDataset(ImageDataset):
    """Reference domainnet.py:112-148: per-domain ImageFolder, 80/20, 345 classes."""

    def __init__(self, config: DomainNetDatasetConfig):
        samples, _ = _imagefolder_samples(Path(config.save_dir) / config.domain)
        indices = _apply_deterministic_split(len(samples), config.mode == "train")
        self.samples = [samples[i] for i in indices]
        self.n_classes = 345


# ------------------------------------------------------------------------------
# Flowers102 (.mat splits) / Oxford-IIIT Pet (annotation txt splits)
# ------------------------------------------------------------------------------


@dataclass
class Flowers102DatasetConfig:
    """Reference flowers102.py:20-49."""

    save_dir: str | None = None
    mode: str = "train"

    def __post_init__(self):
        assert self.mode in ["train", "val", "test"], (
            f"Invalid mode {self.mode}. Options are 'train', 'val' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "flowers102")


class Flowers102Dataset(ImageDataset):
    """Reference flowers102.py:51-109 — torchvision Flowers102 layout:
    ``<root>/flowers-102/{jpg/, imagelabels.mat, setid.mat}``; real splits."""

    _split_key = {"train": "trnid", "val": "valid", "test": "tstid"}

    def __init__(self, config: Flowers102DatasetConfig):
        from scipy.io import loadmat

        base = Path(config.save_dir)
        if (base / "flowers-102").exists():
            base = base / "flowers-102"
        set_ids = loadmat(base / "setid.mat", squeeze_me=True)
        image_ids = set_ids[self._split_key[config.mode]].tolist()
        labels = loadmat(base / "imagelabels.mat", squeeze_me=True)["labels"].tolist()
        image_id_to_label = {i + 1: l - 1 for i, l in enumerate(labels)}
        self.samples = [
            (str(base / "jpg" / f"image_{i:05d}.jpg"), image_id_to_label[i])
            for i in image_ids
        ]
        self.n_classes = 102


@dataclass
class OxfordIIITPetDatasetConfig:
    """Reference pet.py:20-49."""

    save_dir: str | None = None
    mode: str = "train"

    def __post_init__(self):
        assert self.mode in ["train", "test"], (
            f"Invalid mode {self.mode}. Options are 'train' and 'test."
        )
        if self.save_dir is None:
            self.save_dir = str(DATASET_DIR / "pet")


class OxfordIIITPetDataset(ImageDataset):
    """Reference pet.py:51-106 — torchvision OxfordIIITPet layout:
    ``<root>/oxford-iiit-pet/{images/, annotations/{trainval,test}.txt}``."""

    def __init__(self, config: OxfordIIITPetDatasetConfig):
        base = Path(config.save_dir)
        if (base / "oxford-iiit-pet").exists():
            base = base / "oxford-iiit-pet"
        split = "trainval" if config.mode == "train" else "test"
        ann = base / "annotations" / f"{split}.txt"
        if not ann.exists():
            raise FileNotFoundError(
                f"{ann} not found. Download from "
                "https://www.robots.ox.ac.uk/~vgg/data/pets/."
            )
        self.samples = []
        with open(ann) as f:
            for line in f:
                parts = line.strip().split()
                if not parts or parts[0].startswith("#"):
                    continue
                name, class_id = parts[0], int(parts[1])
                self.samples.append(
                    (str(base / "images" / f"{name}.jpg"), class_id - 1)
                )
        self.n_classes = 37
