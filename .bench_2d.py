import time, numpy as np, jax, jax.numpy as jnp
from vitef_tpu.models import build_model
from vitef_tpu.optim import build_optimizer, build_scheduler
from vitef_tpu.parallel import init_train_state, make_train_step
from vitef_tpu.data.images.transforms import augment_train_device, sample_crop_batch
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
BATCH=256
model = build_model({"implementation":"vit","model_name":"base","patch_size":16,
 "image_dim":(3,224,224),"pretrained":False,"finetuning":True,"n_classes":10,
 "compute_dtype":"bfloat16"}, key=jax.random.key(0))
sched = build_scheduler({"scheduler":"cosine","warmup":100}, n_steps=1000)
tx,_ = build_optimizer({"optimizer":"sgd","lr":0.01,"momentum":0.9}, schedule=sched, grad_clip=1.0)
step_fn = make_train_step(model.apply, tx, schedule=sched, base_lr=0.01)
state = init_train_state(model.params, tx)
rng = np.random.default_rng(0)
raw = jnp.asarray(rng.integers(0,256,size=(BATCH,32,32,3),dtype=np.uint8))
yb = jnp.asarray(rng.integers(0,10,size=(BATCH,)), jnp.int32)
def one(state):
    b,f = sample_crop_batch(rng, BATCH, 32, 32)
    x = augment_train_device(raw, jnp.asarray(b), jnp.asarray(f), size=224, compute_dtype=jnp.bfloat16)
    return step_fn(state, (x, yb))
for _ in range(3): state, m = one(state)
log("warm loss", float(m["loss"]))
t0=time.perf_counter()
for _ in range(12): state, m = one(state)
float(m["loss"])
dt=(time.perf_counter()-t0)/12
log(f"2D-linear train step: {dt*1000:.1f} ms -> {BATCH/dt:.0f} img/s ({BATCH*105.6e9/dt/1e12:.1f} TF/s)")
