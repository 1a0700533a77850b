"""Host→device image pipeline: dataset dispatch, loaders, prefetch.

Reference: src/vitef/data/images/utils.py (build_loader :75-122,
build_train_val_loader :130-204, build_dataset :212-307 with encoded-name
parsing, build_transform :315-369, make_iterable :64-67, DatasetFromSubset
:47-61, PREDEFINED_VAL_DATASETS :40).

TPU-first redesign of the torch DataLoader (SURVEY §7.0 "data on device"):
  - **Fixed-size datasets** (CIFAR*, *-C): the loader batch-gathers raw uint8
    (N, 32, 32, 3) on host — a numpy fancy-index, no per-sample Python loop —
    ships ONE uint8 batch over PCIe, and runs the whole train augment
    (RandomResizedCrop + flip + /255 + normalize) as a single jitted device
    program (transforms.augment_train_device). Crop boxes/flip flags are
    sampled on host with the exact torchvision distribution.
  - **File-backed datasets** (ImageNet/DomainNet/Pet/Flowers): host worker
    threads decode + crop/resize per sample (PIL C code releases the GIL), the
    uint8 (N, S, S, 3) batch is normalized on device.
  - **Eval path** always uses the PIL-parity host transform
    (Resize + CenterCrop) — bit-comparability with torchvision is load-bearing
    for the plasticity statistic (SURVEY §7.3 hard part 1).
  - A background producer thread keeps ``prefetch`` batches in flight so host
    assembly overlaps device compute (the reference gets this from DataLoader
    worker processes; threads suffice here because decode is native code).
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from itertools import repeat
from typing import Any

import jax.numpy as jnp
import numpy as np

from ...utils.typed import build_with_type_check
from . import datasets as D
from . import transforms as T

logger = logging.getLogger("vitef")

# Datasets with predefined validation sets (reference utils.py:40)
PREDEFINED_VAL_DATASETS = ["flowers102"]


def make_iterable(dataloader):
    """Infinite generator cycling a loader (reference utils.py:64-67)."""
    for loader in repeat(dataloader):
        yield from loader


# ------------------------------------------------------------------------------
# Dataset dispatch (reference utils.py:212-307, incl. encoded-name parsing)
# ------------------------------------------------------------------------------


def build_dataset(config: dict[str, Any]) -> D.ImageDataset:
    """Dispatch on dataset_name with the reference's encoded-name formats:
    ``cifar10_c-corruption-<type>-severity-<n>``, ``domainnet-<domain>``,
    ``imagenet_c-corruption-<type>-severity-<n>``."""
    config = dict(config)
    config.pop("transform", None)  # transforms live in the loader here
    dataset_name = config.pop("dataset_name", "cifar10")
    name = dataset_name.lower()

    def parse_corruption(prefix: str):
        substring = dataset_name.split(prefix, 1)[-1]
        substring = substring.split("-corruption-", 1)[-1]
        ctype, severity = substring.split("-severity-", 1)
        config["corruption_type"] = ctype
        config["corruption_severity"] = int(severity)

    if name.startswith("synthetic"):
        # Encoded sizing (same spirit as the corruption formats):
        # ``synthetic-<n_samples>`` — e.g. ``synthetic-4096`` for CLI runs
        # whose batch size exceeds the 256-sample default.
        if name != "synthetic":
            config["n_samples"] = int(name.split("synthetic-", 1)[-1])
        cls, cfg_cls = D.SyntheticDataset, D.SyntheticDatasetConfig
    elif name == "cifar10":
        cls, cfg_cls = D.Cifar10Dataset, D.Cifar10DatasetConfig
    elif "cifar10_c" in name:
        parse_corruption("cifar10_c")
        cls, cfg_cls = D.Cifar10CDataset, D.Cifar10CDatasetConfig
    elif name == "cifar100":
        cls, cfg_cls = D.Cifar100Dataset, D.Cifar100DatasetConfig
    elif "cifar100_c" in name:
        parse_corruption("cifar100_c")
        cls, cfg_cls = D.Cifar100CDataset, D.Cifar100CDatasetConfig
    elif "domainnet" in name:
        config["domain"] = dataset_name.split("domainnet-", 1)[-1]
        cls, cfg_cls = D.DomainNetDataset, D.DomainNetDatasetConfig
    elif name == "flowers102":
        cls, cfg_cls = D.Flowers102Dataset, D.Flowers102DatasetConfig
    elif name == "imagenet":
        cls, cfg_cls = D.ImageNetDataset, D.ImageNetDatasetConfig
    elif "imagenet_c" in name:
        parse_corruption("imagenet_c")
        cls, cfg_cls = D.ImageNetCDataset, D.ImageNetCDatasetConfig
    elif name == "pet":
        cls, cfg_cls = D.OxfordIIITPetDataset, D.OxfordIIITPetDatasetConfig
    else:
        raise ValueError(f"Dataset name {dataset_name} not found.")
    return cls(build_with_type_check(cfg_cls, config))


def build_transform(size: int, mode: str):
    """Host-side per-image transform for the eval path (reference utils.py:315-369).

    Train-mode augmentation is performed by the loader (on device for
    fixed-size datasets); this returns the val/test PIL-parity callable or, for
    ``mode='train'``, None as a marker that the loader augments.
    """
    mode = mode.lower()
    if mode == "train":
        return None
    if mode in ("val", "test"):
        return lambda img: T.eval_transform_host(img, size)
    raise ValueError(f"Mode {mode} not found. Options are 'train', 'val' and 'test'.")


# ------------------------------------------------------------------------------
# Loader
# ------------------------------------------------------------------------------


class Loader:
    """Iterable of device-ready ``(x, y)`` batches.

    x: (N, C, size, size) normalized ``compute_dtype`` jax array (NCHW, matching
    the model's patchify input); y: (N,) int32.
    """

    def __init__(
        self,
        dataset: D.ImageDataset,
        *,
        batch_size: int = 128,
        size: int = 224,
        mode: str = "train",
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        compute_dtype: str = "float32",
        indices: np.ndarray | None = None,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.size = size
        self.mode = mode.lower()
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )
        # Multi-host data parallelism: each process takes a disjoint stride of
        # the (identically seeded, hence identically shuffled) epoch order —
        # the host-side sharding the reference's dormant DP never added
        # (SURVEY §5.8: no DistributedSampler).
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._pool = None
        self.n_classes = dataset.n_classes
        if len(self) == 0:
            # Fail fast: a zero-batch epoch inside make_iterable's infinite
            # cycle is a pure-Python busy spin (epoch setup forever, no batch
            # ever yielded) — the classic symptom is batch_size > dataset.
            raise ValueError(
                f"Loader yields 0 batches/epoch: {len(self.indices)} sample(s)"
                f" (shard {shard_index}/{shard_count}) with batch_size="
                f"{batch_size}, drop_last={drop_last}. Lower batch_size or "
                "use a larger dataset (synthetic-<n_samples> sizes the "
                "synthetic one)."
            )

    # -- sizing ---------------------------------------------------------
    def _shard_size(self) -> int:
        # Equal shard sizes: trim the epoch to a multiple of shard_count so
        # every host runs the SAME number of batches (unequal shards would
        # desynchronize the hosts' identically-seeded RNG streams after one
        # epoch, breaking the disjointness invariant).
        if self.shard_count > 1:
            return len(self.indices) - len(self.indices) % self.shard_count
        return len(self.indices)

    def __len__(self):
        n = self._shard_size() // self.shard_count if self.shard_count > 1 \
            else len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = self.rng.permutation(self.indices) if self.shuffle else self.indices
        if self.shard_count > 1:
            order = order[: self._shard_size()][self.shard_index::self.shard_count]
        return order

    # -- host batch assembly -------------------------------------------
    def _pool_or_none(self):
        if self.num_workers > 0 and self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def _assemble(self, idx: np.ndarray):
        """Host part of one batch → (uint8 array(s), labels, aux)."""
        ds = self.dataset
        if self.mode == "train":
            if ds.fixed_size:
                x = ds.data[idx]  # (N, H, W, C) uint8 gather
                y = np.asarray(ds.targets)[idx]
                boxes, flips = T.sample_crop_batch(
                    self.rng, len(idx), x.shape[1], x.shape[2]
                )
                return ("device_augment", x, y, boxes, flips)
            # file-backed: per-sample host RandomResizedCrop + resize
            def one(i):
                img, label = ds.load_image(int(i))
                w, h = img.size
                top, left, ch, cw = T.sample_resized_crop_params(self.rng, h, w)
                from PIL import Image

                img = img.resize(
                    (self.size, self.size), Image.BILINEAR,
                    box=(left, top, left + cw, top + ch),
                )
                return np.asarray(img, np.uint8), label

            pool = self._pool_or_none()
            results = list(pool.map(one, idx)) if pool else [one(i) for i in idx]
            x = np.stack([r[0] for r in results])
            y = np.asarray([r[1] for r in results])
            flips = self.rng.random(len(idx)) < 0.5
            return ("device_normalize_flip", x, y, None, flips)
        # val/test: PIL-parity Resize + CenterCrop on host
        if ds.fixed_size:
            # Fast path: the native (C++/OpenMP) batched transform is bit-exact
            # with the PIL pipeline (vitef_tpu/native/imageops.cpp) and avoids
            # the per-image Python loop.
            from ... import native

            if native.available():
                x = native.eval_transform_batch(ds.data[idx], self.size)
                y = np.asarray(ds.targets)[idx]
                return ("device_normalize", x, y, None, None)

            def one(i):
                from PIL import Image

                img = Image.fromarray(ds.data[int(i)])
                return T.eval_transform_host(img, self.size), int(ds.targets[int(i)])
        else:
            def one(i):
                img, label = ds.load_image(int(i))
                return T.eval_transform_host(img, self.size), label

        pool = self._pool_or_none()
        results = list(pool.map(one, idx)) if pool else [one(i) for i in idx]
        x = np.stack([r[0] for r in results])
        y = np.asarray([r[1] for r in results])
        return ("device_normalize", x, y, None, None)

    # -- device part ----------------------------------------------------
    def _to_device(self, host_batch):
        kind, x, y, boxes, flips = host_batch
        y = jnp.asarray(y, jnp.int32)
        if kind == "device_augment":
            xb = T.augment_train_device(
                jnp.asarray(x), jnp.asarray(boxes), jnp.asarray(flips),
                size=self.size, compute_dtype=self.compute_dtype,
            )
        elif kind == "device_normalize_flip":
            xb = T.normalize_device(jnp.asarray(x), compute_dtype=self.compute_dtype)
            xb = jnp.where(jnp.asarray(flips)[:, None, None, None],
                           xb[:, :, :, ::-1], xb)
        else:
            xb = T.normalize_device(jnp.asarray(x), compute_dtype=self.compute_dtype)
        return xb, y

    def __iter__(self):
        order = self._epoch_order()
        n = len(order)
        ends = range(self.batch_size, n + 1, self.batch_size)
        batches = [order[e - self.batch_size:e] for e in ends]
        if not self.drop_last and n % self.batch_size:
            batches.append(order[n - (n % self.batch_size):])

        if self.prefetch <= 0:
            for idx in batches:
                yield self._to_device(self._assemble(idx))
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that honors `stop`: a consumer abandoning the
            # iterator mid-epoch must not leave the producer blocked forever
            # on a full queue (pinning batches of host memory).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in batches:
                    if stop.is_set():
                        return
                    if not put(self._assemble(idx)):
                        return
            except BaseException as e:  # surface in consumer
                put(e)
            finally:
                put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            # Device-side lookahead: enqueue the NEXT batch's H2D transfer +
            # augment (all async jax dispatches) BEFORE yielding the current
            # one, so the device input pipeline overlaps the train step that
            # the consumer dispatches in between. This is what hides the
            # per-dispatch latency the --pipeline benchmark exposed.
            ready: list = []
            done = False
            pending_exc: BaseException | None = None
            while True:
                while not done and len(ready) < 2:
                    item = q.get()
                    if item is None:
                        done = True
                    elif isinstance(item, BaseException):
                        # Deliver every successfully produced batch before
                        # surfacing the failure (FIFO semantics of the
                        # pre-lookahead iterator).
                        pending_exc = item
                        done = True
                    else:
                        ready.append(self._to_device(item))
                if ready:
                    yield ready.pop(0)
                    continue
                if pending_exc is not None:
                    raise pending_exc
                break
        finally:
            stop.set()
            thread.join(timeout=5)


# ------------------------------------------------------------------------------
# Builders (reference utils.py:75-204)
# ------------------------------------------------------------------------------

_LOADER_KEYS = ("num_workers", "seed", "prefetch", "compute_dtype",
                "shard_index", "shard_count")


def _pop_loader_kwargs(config: dict) -> dict:
    return {k: config.pop(k) for k in _LOADER_KEYS if k in config}


def build_loader(
    config: dict[str, Any],
    drop_last: bool = True,
    force_shuffle: bool = False,
    return_n_classes: bool = False,
):
    """Reference build_loader (utils.py:75-122): pops batch_size/size/mode,
    builds dataset, shuffles iff train (or forced)."""
    config = dict(config)
    batch_size = config.pop("batch_size", 128)
    size = config.pop("size", 224)
    mode = config["mode"]
    extra = _pop_loader_kwargs(config)
    dataset = build_dataset(config)
    loader = Loader(
        dataset, batch_size=batch_size, size=size, mode=mode,
        shuffle=force_shuffle or (mode == "train"), drop_last=drop_last, **extra,
    )
    if return_n_classes:
        return loader, dataset.n_classes
    return loader


def build_train_val_loader(
    config: dict[str, Any],
    train_size: float = 0.8,
    return_n_classes: bool = False,
):
    """Reference build_train_val_loader (utils.py:130-204): predefined val split
    for flowers102, else a random 80/20 split of the train set (the reference
    uses torch.random_split seeded by set_seed; here the split comes from
    numpy's global RNG, seeded by the same set_seed — parity at the statistics
    level, SURVEY §7.3 hard part 3)."""
    config = dict(config)
    batch_size = config.pop("batch_size", 128)
    val_batch_size = config.pop("val_batch_size", 128)
    size = config.pop("size", 224)
    extra = _pop_loader_kwargs(config)
    # Only the TRAIN loader shards across processes: every host must evaluate
    # the identical full validation set so the best-checkpoint decision
    # (train.py eval loop) is consistent across hosts.
    val_extra = {k: v for k, v in extra.items()
                 if k not in ("shard_index", "shard_count")}

    if config["dataset_name"] in PREDEFINED_VAL_DATASETS:
        logger.info(
            "Validation set is pre-defined and used directly without splitting "
            "the training set."
        )
        train_set = build_dataset({**config, "mode": "train"})
        val_set = build_dataset({**config, "mode": "val"})
        n_classes = train_set.n_classes
        train_loader = Loader(train_set, batch_size=batch_size, size=size,
                              mode="train", shuffle=True, drop_last=True, **extra)
        val_loader = Loader(val_set, batch_size=val_batch_size, size=size,
                            mode="val", shuffle=False, drop_last=False, **val_extra)
    else:
        logger.info(
            "Validation set is not pre-defined, thus training set is split into "
            "training and validation sets."
        )
        config["mode"] = "train"
        dataset = build_dataset(config)
        n_classes = dataset.n_classes
        n = len(dataset)
        n_train = int(train_size * n)
        perm = np.random.permutation(n)  # global RNG: seeded by set_seed
        train_idx, val_idx = perm[:n_train], perm[n_train:]
        train_loader = Loader(dataset, batch_size=batch_size, size=size,
                              mode="train", shuffle=True, drop_last=True,
                              indices=train_idx, **extra)
        val_loader = Loader(dataset, batch_size=val_batch_size, size=size,
                            mode="val", shuffle=False, drop_last=False,
                            indices=val_idx, **val_extra)

    if return_n_classes:
        return train_loader, val_loader, n_classes
    return train_loader, val_loader
