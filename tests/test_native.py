"""Native C++ imageops: bit-parity with the PIL/torchvision pipeline."""

import numpy as np
import pytest
from PIL import Image

from vitef_tpu import native
from vitef_tpu.data.images.transforms import eval_transform_host

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native imageops"
)


@pytest.mark.parametrize("h,w,oh,ow", [
    (32, 32, 224, 224),   # CIFAR eval upscale
    (64, 80, 32, 32),     # downscale (antialias path)
    (100, 70, 50, 50),
    (17, 23, 40, 9),      # odd sizes
    (224, 224, 224, 224),  # identity
])
def test_resize_bit_exact_vs_pil(h, w, oh, ow):
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
    ours = native.resize_bilinear_batch(batch, oh, ow)
    for i in range(3):
        pil = np.asarray(Image.fromarray(batch[i]).resize((ow, oh), Image.BILINEAR))
        assert np.array_equal(ours[i], pil), f"{h}x{w}->{oh}x{ow} sample {i}"


@pytest.mark.parametrize("h,w,s", [
    (32, 32, 224), (100, 70, 48), (300, 200, 224), (75, 75, 48),
    (48, 48, 48), (30, 200, 48),
])
def test_eval_transform_bit_exact(h, w, s):
    """Resize(shorter→s) + CenterCrop(s): C++ ≡ the Python PIL-parity path
    (incl. torchvision's int() long side and banker's-rounded crop offsets)."""
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, size=(4, h, w, 3), dtype=np.uint8)
    ours = native.eval_transform_batch(batch, s)
    for i in range(4):
        ref = eval_transform_host(Image.fromarray(batch[i]), s)
        assert np.array_equal(ours[i], ref), f"{h}x{w}->{s} sample {i}"


def test_loader_uses_native_eval_path(tmp_path):
    """Fixed-size eval batches via the native path match the PIL loop."""
    import jax.numpy as jnp

    from vitef_tpu.data.images.datasets import ImageDataset
    from vitef_tpu.data.images.loader import Loader
    from vitef_tpu.data.images import transforms as T

    rng = np.random.default_rng(2)

    class FakeDS(ImageDataset):
        def __init__(self):
            self.data = rng.integers(0, 256, size=(12, 32, 32, 3), dtype=np.uint8)
            self.targets = rng.integers(0, 3, size=12)
            self.n_classes = 3

    ds = FakeDS()
    loader = Loader(ds, batch_size=12, size=48, mode="test", shuffle=False,
                    drop_last=False, num_workers=0)
    x, y = next(iter(loader))
    # reference: per-image PIL path + host normalize
    ref_u8 = np.stack([
        T.eval_transform_host(Image.fromarray(ds.data[i]), 48) for i in range(12)
    ])
    ref = T.normalize_host(ref_u8)
    assert np.allclose(np.asarray(x), ref, atol=1e-6)
