"""Patching layers: images (raw / hybrid) and time series.

Reference: src/vitef/models/transformer/utils.py:38-176 (PatchImages,
PatchTimeSeries). TPU-first design: the 'hybrid' Conv2d(k=P, s=P) is expressed as
patch-extraction + one large matmul — mathematically identical (stride equals
kernel so windows don't overlap) and it maps straight onto the MXU instead of
relying on a conv lowering.
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange


def image_patch_dims(image_dim: tuple, patch_size: int) -> tuple[int, int]:
    """(n_patches, patch_dim) for (C, H, W) images (reference utils.py:79-84)."""
    c, h, w = image_dim
    if h % patch_size != 0 or w % patch_size != 0:
        raise AssertionError("Image dimensions must be divisible by the patch size.")
    return h * w // patch_size**2, patch_size**2 * c


def extract_patches_chw(x, patch_size: int):
    """(N, C, H, W) → (N, n_patches, C·P·P) with (c, p1, p2) flattening order.

    This is the ordering of a flattened Conv2d weight (E, C, P, P), so
    ``extract_patches_chw(x) @ w.reshape(E, -1).T`` equals
    Conv2d(k=P, s=P) + Flatten (reference utils.py:90-93).
    """
    return rearrange(x, "n c (h p1) (w p2) -> n (h w) (c p1 p2)",
                     p1=patch_size, p2=patch_size)


def patch_images_raw(x, patch_size: int):
    """Raw patching, (p1, p2, c) order on NHWC input (reference utils.py:88).

    Accepts NCHW and converts, to keep one dataset-side layout.
    """
    x = jnp.transpose(x, (0, 2, 3, 1))
    return rearrange(x, "n (h p1) (w p2) c -> n (h w) (p1 p2 c)",
                     p1=patch_size, p2=patch_size)


def timeseries_patch_dims(length: int, patch_size: int, stride: int) -> tuple[int, int]:
    """(n_patches, patch_dim) — reference utils.py:153: ⌊(T−P)/S⌋ + 2."""
    return (length - patch_size) // stride + 2, patch_size


def patch_timeseries(x, patch_size: int, stride: int):
    """(N, T) → (N, n_patches, P): replication-pad end by stride, then unfold.

    Reference utils.py:169-174 (ReplicationPad1d((0, stride)) + unfold).
    """
    last = x[..., -1:]
    pad = jnp.repeat(last, stride, axis=-1)
    xp = jnp.concatenate([x, pad], axis=-1)
    n_patches, _ = timeseries_patch_dims(x.shape[-1], patch_size, stride)
    starts = jnp.arange(n_patches) * stride
    idx = starts[:, None] + jnp.arange(patch_size)[None, :]
    return xp[..., idx]
