"""Matmul ceiling microbench with GENUINE dependency chains inside one jit:
each iteration multiplies the previous iteration's output, so nothing can be
hoisted/CSE'd. Measures the practical per-pair ceiling for the step's shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 50432  # 256 * 197 tokens
REPS = 15  # pairs per timed call
rng = np.random.default_rng(0)


def bench(name, x, w_up, w_dn, flops_pair):
    @jax.jit
    def loop(x, w_up, w_dn):
        def body(_, x):
            h = jax.lax.dot(x, w_up, preferred_element_type=jnp.bfloat16)
            x = jax.lax.dot(h, w_dn, preferred_element_type=jnp.bfloat16)
            return x * jnp.bfloat16(0.125)  # keep magnitudes bounded
        return jax.lax.fori_loop(0, REPS, body, x)

    out = loop(x, w_up, w_dn)
    float(out[0, 0].astype(jnp.float32))  # warm + sync
    t0 = time.perf_counter()
    out = loop(x, w_up, w_dn)
    float(out[0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1000:7.3f} ms/pair  {flops_pair/dt/1e12:6.1f} TF/s", flush=True)


x = jnp.asarray(rng.normal(size=(R, 768)) * 0.1, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(768, 3072)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(3072, 768)) * 0.02, jnp.bfloat16)
bench("ffn pair (R,768)@(768,3072)+(R,3072)@(3072,768)", x, w1, w2,
      2 * R * 768 * 3072 * 2)

wq = jnp.asarray(rng.normal(size=(768, 2304)) * 0.02, jnp.bfloat16)
wo = jnp.asarray(rng.normal(size=(2304, 768)) * 0.02, jnp.bfloat16)
bench("qkv pair (R,768)@(768,2304)+(R,2304)@(2304,768)", x, wq, wo,
      2 * R * 768 * 2304 * 2)

xs = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.02, jnp.bfloat16)
ws = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.02, jnp.bfloat16)
bench("4k pair  (4096,4096)@(4096,4096) x2", xs, ws, ws,
      2 * 2 * 4096**3)
