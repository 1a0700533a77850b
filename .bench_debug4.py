import time, numpy as np, jax, jax.numpy as jnp
from vitef_tpu.models import build_model
from vitef_tpu.parallel import cross_entropy_loss
import optax

BATCH=256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH,3,224,224)).astype(np.float32), jnp.bfloat16)
y = jnp.asarray(rng.integers(0,10,size=(BATCH,)), jnp.int32)

def bench(tag, attn_impl, norm_impl, bwd=True, steps=6):
    model = build_model({"implementation":"vit","model_name":"base","patch_size":16,
     "image_dim":(3,224,224),"pretrained":False,"finetuning":True,"n_classes":10,
     "compute_dtype":"bfloat16","attn_impl":attn_impl,"norm_impl":norm_impl}, key=jax.random.key(0))
    if bwd:
        def loss(p):
            return cross_entropy_loss(model.apply(p, x), y)
        f = jax.jit(lambda p: jax.grad(loss)(p))
        out_leaf = lambda o: jax.tree.leaves(o)[0]
    else:
        f = jax.jit(lambda p: model.apply(p, x))
        out_leaf = lambda o: o
    o = f(model.params); _ = np.asarray(out_leaf(o))[0].ravel()[0]
    t0=time.perf_counter()
    for _ in range(steps):
        o = f(model.params)
    _ = np.asarray(out_leaf(o))[0].ravel()[0]
    dt=(time.perf_counter()-t0)/steps
    print(f"{tag}: {dt*1000:.1f} ms/step -> {BATCH/dt:.0f} img/s")

bench("fwd pallas/pallas", "pallas","pallas", bwd=False)
bench("fwd xla/xla", "xla","xla", bwd=False)
bench("fwd pallas-attn/xla-norm", "pallas","xla", bwd=False)
bench("fwd xla-attn/pallas-norm", "xla","pallas", bwd=False)
bench("fwd+bwd pallas/pallas", "pallas","pallas", bwd=True)
bench("fwd+bwd xla/xla", "xla","xla", bwd=True)
