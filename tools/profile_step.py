"""Capture a jax.profiler trace of the headline bench train step (real TPU).

Run from repo root: python tools/profile_step.py [batch] [grad_acc_steps]
Writes the trace under /tmp/vitef_trace/.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.data.images.transforms import augment_train_device, sample_crop_batch
from vitef_tpu.models import build_model
from vitef_tpu.optim import build_optimizer, build_scheduler
from vitef_tpu.parallel import init_train_state, make_train_step

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
GRAD_ACC = int(sys.argv[2]) if len(sys.argv) > 2 else 1

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
step_fn = make_train_step(model.apply, tx, schedule=schedule, base_lr=0.01,
                          grad_acc_steps=GRAD_ACC)
state = init_train_state(model.params, tx)

host_rng = np.random.default_rng(0)
raw = jnp.asarray(host_rng.integers(0, 256, size=(BATCH, 32, 32, 3), dtype=np.uint8))
y = jnp.asarray(host_rng.integers(0, 10, size=(BATCH,)), jnp.int32)


def one_step(state):
    boxes, flips = sample_crop_batch(host_rng, BATCH, 32, 32)
    x = augment_train_device(raw, jnp.asarray(boxes), jnp.asarray(flips),
                             size=224, compute_dtype=jnp.bfloat16)
    return step_fn(state, (x, y))


for _ in range(3):
    state, metrics = one_step(state)
float(metrics["loss"])
print("warm; tracing...", flush=True)

jax.profiler.start_trace("/tmp/vitef_trace")
t0 = time.perf_counter()
for _ in range(5):
    state, metrics = one_step(state)
float(metrics["loss"])
dt = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"traced 5 steps in {dt*1000:.1f} ms ({dt*200:.1f} ms/step)")
