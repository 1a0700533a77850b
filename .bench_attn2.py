import time, numpy as np, jax, jax.numpy as jnp
from vitef_tpu.ops.attention import flash_attention, attention_reference
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), jnp.bfloat16)
log("data on device")
for impl in ("pallas", "xla"):
    f = jax.jit(lambda q,k,v: flash_attention(q,k,v,impl=impl))
    o = f(q,k,v); _=float(o[0,0,0,0]); log(impl, "compiled")
    t0=time.perf_counter()
    for _ in range(10): o = f(q,k,v)
    _=float(o[0,0,0,0])
    dt=(time.perf_counter()-t0)/10
    log(f"{impl}: {dt*1000:.2f} ms/iter")
