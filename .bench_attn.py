import time, numpy as np, jax, jax.numpy as jnp
from vitef_tpu.ops.attention import flash_attention, attention_reference
rng = np.random.default_rng(0)
for dtype in (jnp.bfloat16, jnp.float32):
    q = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), dtype)
    k = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), dtype)
    v = jnp.asarray(rng.normal(size=(256, 12, 197, 64)), dtype)
    # correctness
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, impl="pallas")
    print(dtype.__name__, "maxdiff:", float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32)))))
    for impl in ("pallas", "xla"):
        f = jax.jit(lambda q,k,v: flash_attention(q,k,v,impl=impl))
        o = f(q,k,v); _=np.asarray(o)[0,0,0,0]
        t0=time.perf_counter()
        for _ in range(20): o = f(q,k,v)
        _=np.asarray(o)[0,0,0,0]
        dt=(time.perf_counter()-t0)/20
        print(f"  {impl}: {dt*1000:.2f} ms")
# causal correctness
q = jnp.asarray(rng.normal(size=(4, 12, 1024, 64)), jnp.bfloat16)
k,v = q+0, q*0.5
ref = attention_reference(q,k,v,causal=True)
out = flash_attention(q,k,v,causal=True,impl="pallas")
print("causal L=1024 maxdiff:", float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32)))))
