import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
from vitef_tpu.ops.attention import flash_attention, attention_reference
q = jnp.asarray(np.random.default_rng(0).normal(size=(2,4,197,64)), jnp.bfloat16)
print("compiling...", flush=True)
out = flash_attention(q,q,q,impl='pallas')
ref = attention_reference(q,q,q)
print("compile+run", time.time()-t0, "maxdiff",
      float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32)))), flush=True)
