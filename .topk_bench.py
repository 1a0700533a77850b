"""Microbench: top-k over (256, 50257) f32 logits on TPU.

Variants chained inside ONE jit with a data dependency (axon dispatch ~2.5 ms
makes single-op wall timing garbage — CLAUDE.md methodology).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N, V, K = 256, 50257, 40
REPS = 20

rng = np.random.default_rng(0)
logits = jnp.asarray(rng.standard_normal((N, V), dtype=np.float32))


def exact_topk(x, k):
    return jax.lax.top_k(x, k)


def approx_topk(x, k, recall):
    return jax.lax.approx_max_k(x, k, recall_target=recall)


def two_stage_topk(x, k, group):
    n, v = x.shape
    g = -(-v // group)
    pad = g * group - v
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-np.inf)
    xg = xp.reshape(n, g, group)
    vals, idx = jax.lax.top_k(xg, k)            # (n, g, k) local
    flat_vals = vals.reshape(n, g * k)
    base = (jnp.arange(g, dtype=jnp.int32) * group)[None, :, None]
    flat_idx = (idx.astype(jnp.int32) + base).reshape(n, g * k)
    v2, i2 = jax.lax.top_k(flat_vals, k)        # (n, k) among candidates
    return v2, jnp.take_along_axis(flat_idx, i2, axis=1)


def bench(fn, name):
    @jax.jit
    def loop(x):
        for _ in range(REPS):
            vals, idx = fn(x)
            # data dependency: perturb input with a scalar from the output
            x = x + (vals[0, -1] * 1e-12)
        return vals, idx

    vals, idx = loop(logits)
    float(vals[0, 0])  # warm + sync
    t0 = time.perf_counter()
    vals, idx = loop(logits)
    float(vals[0, 0])
    dt = (time.perf_counter() - t0) / REPS * 1000
    return dt, np.asarray(vals), np.asarray(idx)


ref_dt, ref_vals, ref_idx = bench(lambda x: exact_topk(x, K), "lax.top_k")
print(f"lax.top_k                 {ref_dt:8.2f} ms")

for recall in (0.95, 0.99):
    dt, vals, idx = bench(lambda x, r=recall: approx_topk(x, K, r), "approx")
    match = np.mean(np.sort(vals, -1) == np.sort(ref_vals, -1))
    print(f"approx_max_k r={recall}      {dt:8.2f} ms   vals-match={match:.4f}")

for group in (256, 512, 1024, 2048):
    dt, vals, idx = bench(lambda x, g=group: two_stage_topk(x, K, g), "2stage")
    ok_v = np.array_equal(vals, ref_vals)
    ok_i = np.array_equal(idx, ref_idx)
    print(f"two_stage group={group:5d}     {dt:8.2f} ms   exact_vals={ok_v} exact_idx={ok_i}")

# sampling tail comparison: categorical over k candidates vs full-vocab mask
@jax.jit
def sample_full(x, key):
    out = jnp.zeros((N,), jnp.int32)
    for i in range(REPS):
        vals, _ = exact_topk(x, K)
        kth = vals[..., -1:]
        masked = jnp.where(x < kth, -1e30, x)
        tok = jax.random.categorical(jax.random.fold_in(key, i), masked, axis=-1)
        out = out + tok.astype(jnp.int32)
        x = x + out[0] * 1e-12
    return out


@jax.jit
def sample_cand(x, key):
    out = jnp.zeros((N,), jnp.int32)
    for i in range(REPS):
        vals, idx = two_stage_topk(x, K, 512)
        c = jax.random.categorical(jax.random.fold_in(key, i), vals, axis=-1)
        tok = jnp.take_along_axis(idx, c[:, None], axis=1)[:, 0]
        out = out + tok.astype(jnp.int32)
        x = x + out[0] * 1e-12
    return out


for name, fn in (("full-vocab mask+cat", sample_full), ("candidate cat", sample_cand)):
    r = fn(logits, jax.random.key(0)); float(r[0])
    t0 = time.perf_counter()
    r = fn(logits, jax.random.key(1)); float(r[0])
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:25s} {dt:8.2f} ms")
