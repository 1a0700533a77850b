import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
def timeit(name, f, *args, iters=10):
    o = f(*args); jax.tree.map(lambda x: x.block_until_ready(), o)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(iters): o = f(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    dt=(time.perf_counter()-t0)/iters
    log(f"{name}: {dt*1000:.2f} ms")
    return dt

rng = np.random.default_rng(0)
N, L, E, F = 256, 197, 768, 3072
x = jnp.asarray(rng.normal(size=(N, L, E)), jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(E, F)), jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(F, E)), jnp.bfloat16)
wqkv = jnp.asarray(rng.normal(size=(E, 3*E)), jnp.bfloat16)

# raw big matmul: 256*197*768*3072*2 = 238 GFLOP
f1 = jax.jit(lambda x, w: jnp.einsum("nle,ef->nlf", x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
dt = timeit("fc1 matmul (238 GFLOP)", f1, x, w1)
log(f"  -> {238e9/dt/1e12:.1f} TFLOP/s")

# fc1+gelu+fc2 fused
def mlp(x, w1, w2):
    h = jnp.einsum("nle,ef->nlf", x, w1, preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=False)
    return jnp.einsum("nlf,fe->nle", h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
dt = timeit("mlp fc1+gelu+fc2 (476 GFLOP)", jax.jit(mlp), x, w1, w2)
log(f"  -> {476e9/dt/1e12:.1f} TFLOP/s")

# qkv matmul + head split transpose
def qkv_split(x, w):
    qkv = jnp.einsum("nle,ef->nlf", x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    q,k,v = jnp.split(qkv, 3, axis=-1)
    return tuple(t.reshape(N, L, 12, 64).transpose(0,2,1,3) for t in (q,k,v))
timeit("qkv matmul+split+transpose (178 GFLOP)", jax.jit(qkv_split), x, wqkv)

# layer norm xla
from vitef_tpu.ops.layernorm import layer_norm
wg = jnp.ones((E,), jnp.float32); bg = jnp.zeros((E,), jnp.float32)
timeit("layernorm xla", jax.jit(lambda x: layer_norm(x, wg, bg, eps=1e-12, impl="xla")), x)
timeit("layernorm pallas", jax.jit(lambda x: layer_norm(x, wg, bg, eps=1e-12, impl="pallas")), x)

# patchify + embed
from vitef_tpu.models.patching import extract_patches_chw
img = jnp.asarray(rng.normal(size=(N,3,224,224)), jnp.bfloat16)
wp = jnp.asarray(rng.normal(size=(768, E)), jnp.bfloat16)
def patch_embed(img, wp):
    p = extract_patches_chw(img, 16)
    return jnp.einsum("nld,de->nle", p, wp, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
timeit("patchify+embed", jax.jit(patch_embed), img, wp)

# full augment
from vitef_tpu.data.images.transforms import augment_train_device, sample_crop_batch
raw = jnp.asarray(rng.integers(0,256,size=(N,32,32,3),dtype=np.uint8))
b,f = sample_crop_batch(np.random.default_rng(0), N, 32, 32)
b = jnp.asarray(b); fl = jnp.asarray(f)
timeit("augment (crop-resize 32->224)", lambda r: augment_train_device(r, b, fl, size=224, compute_dtype=jnp.bfloat16), raw)
