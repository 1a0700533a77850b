"""Headline benchmark: ViT-B/16 CIFAR-10 finetune throughput (images/sec/chip).

Measures the full production train path on the available accelerator: on-device
augment (RandomResizedCrop + flip + normalize of raw uint8 CIFAR batches) + one
jitted train step (forward + backward + clip + SGD + cosine schedule) in
bfloat16 with fp32 accumulation, at the published protocol's batch 512 run as
exact 2x256 gradient accumulation (the shipped app default — see PERF.md
"Batch-512 inversion").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so ``vs_baseline``
reports the fraction of the bf16 matmul roofline on the detected chip
(ViT-B/16 ≈ 17.6 GFLOPs/img forward, ×3 for training).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
WARMUP = 3
STEPS = 10

# Headline operating point: the published finetune protocol trains at batch
# 512 (reference apps/vit/configs/cifar10.yaml). A plain 1x512 step exceeds
# HBM and XLA panic-remats ~29 ms of recompute; the shipped app default
# (auto_microbatch=256) runs it as exact 2x256 gradient accumulation, which
# also amortises the fixed per-step tail — measured FASTER per image than a
# plain 256 step (PERF.md "Batch-512 inversion"). The headline measures that
# production configuration.
HEADLINE_BATCH = 512
HEADLINE_GRAD_ACC = 2

# bf16 peak TFLOPs per chip (best-effort detection; v5e = 197, v4 = 275)
PEAK_TFLOPS = {"v5e": 197e12, "v5litepod": 197e12, "v5lite": 197e12,
               "v4": 275e12, "v5p": 459e12, "v6e": 918e12}
# ViT-B/16 @224 ≈ 17.6 GMACs = 35.2 GFLOPs forward; training ≈ 3× forward.
VIT_B_TRAIN_FLOPS_PER_IMG = 3 * 35.2e9


def detect_peak() -> float:
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197e12  # assume v5e if unknown


def pipeline() -> None:
    """Loader-inclusive benchmark (``--pipeline``): drives the production
    Loader (host gather + prefetch thread + on-device augment) on a synthetic
    CIFAR-shaped dataset through the same train step — catches input-bound
    regressions the device-only headline metric cannot see. Replaces what
    DataLoader workers did in the reference (data/images/utils.py:116)."""
    from vitef_tpu.data.images.datasets import SyntheticDataset, SyntheticDatasetConfig
    from vitef_tpu.data.images.loader import Loader, make_iterable
    from vitef_tpu.models import build_model
    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    model = build_model(
        {
            "implementation": "vit",
            "model_name": "base",
            "patch_size": 16,
            "image_dim": (3, 224, 224),
            "pretrained": False,
            "finetuning": True,
            "n_classes": 10,
            "compute_dtype": "bfloat16",
        },
        key=jax.random.key(0),
    )
    schedule = build_scheduler({"scheduler": "cosine", "warmup": 100}, n_steps=1000)
    tx, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.01, "momentum": 0.9},
        schedule=schedule, grad_clip=1.0,
    )
    batch = HEADLINE_BATCH
    step_fn = make_train_step(model.apply, tx, schedule=schedule, base_lr=0.01,
                              grad_acc_steps=HEADLINE_GRAD_ACC)
    state = init_train_state(model.params, tx)

    ds = SyntheticDataset(SyntheticDatasetConfig(n_samples=4096, image_size=32))
    loader = Loader(ds, batch_size=batch, size=224, mode="train",
                    compute_dtype="bfloat16")
    it = make_iterable(loader)

    for _ in range(WARMUP):
        state, metrics = step_fn(state, next(it))
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step_fn(state, next(it))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    images_per_sec_per_chip = batch * STEPS / dt / n_chips
    roofline = detect_peak() / VIT_B_TRAIN_FLOPS_PER_IMG
    print(json.dumps({
        "metric": "vit_b16_pipeline_throughput",
        "value": round(images_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / roofline, 4),
    }))


def main() -> None:
    from vitef_tpu.data.images.transforms import augment_train_device, sample_crop_batch
    from vitef_tpu.models import build_model
    from vitef_tpu.optim import build_optimizer, build_scheduler
    from vitef_tpu.parallel import init_train_state, make_train_step

    model = build_model(
        {
            "implementation": "vit",
            "model_name": "base",
            "patch_size": 16,
            "image_dim": (3, 224, 224),
            "pretrained": False,
            "finetuning": True,
            "n_classes": 10,
            "compute_dtype": "bfloat16",
        },
        key=jax.random.key(0),
    )

    n_steps = 1000
    schedule = build_scheduler({"scheduler": "cosine", "warmup": 100}, n_steps=n_steps)
    tx, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.01, "momentum": 0.9},
        schedule=schedule, grad_clip=1.0,
    )
    batch = HEADLINE_BATCH
    step_fn = make_train_step(model.apply, tx, schedule=schedule, base_lr=0.01,
                              grad_acc_steps=HEADLINE_GRAD_ACC)
    state = init_train_state(model.params, tx)

    # Raw CIFAR-style uint8 batch; crop boxes resampled on host per step
    # (exactly what the production loader feeds the device).
    host_rng = np.random.default_rng(0)
    raw = jnp.asarray(host_rng.integers(0, 256, size=(batch, 32, 32, 3), dtype=np.uint8))
    y = jnp.asarray(host_rng.integers(0, 10, size=(batch,)), jnp.int32)

    def one_step(state, boxes, flips):
        x = augment_train_device(raw, boxes, flips, size=224,
                                 compute_dtype=jnp.bfloat16)
        return step_fn(state, (x, y))

    def sample():
        boxes, flips = sample_crop_batch(host_rng, batch, 32, 32)
        return jnp.asarray(boxes), jnp.asarray(flips)

    # NB: synchronization is a VALUE fetch, not block_until_ready — remote
    # (tunneled) backends can report buffers ready before execution completes,
    # and the final loss depends on the whole step chain anyway.
    for _ in range(WARMUP):
        state, metrics = one_step(state, *sample())
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = one_step(state, *sample())
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    images_per_sec_per_chip = batch * STEPS / dt / n_chips
    roofline = detect_peak() / VIT_B_TRAIN_FLOPS_PER_IMG  # img/s at 100% MXU
    print(json.dumps({
        "metric": "vit_b16_cifar10_finetune_throughput",
        "value": round(images_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / roofline, 4),
    }))


if __name__ == "__main__":
    import sys

    if "--pipeline" in sys.argv:
        pipeline()
    else:
        main()
