"""Device-measure ONE ring-attention hop: pallas state kernel vs einsum path.

The ring itself needs sp chips, but the hop — fold one visiting K/V block
into the online-softmax state — is a single-device program; its cost times
the sp hops IS the sp attention cost per layer (plus ppermute, which
overlaps). Run from the repo root on the real TPU:

    python tools/profile_ring_hop.py

Shapes are the ring-realistic ones: L in {8k, 16k} sharded sp=8, zigzag
(lseg = Lloc/2), causal, GPT2-small-ish heads (h=12, d=64), batch 1.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.parallel.sequence import (
    _attend_block,
    _attend_state_pallas,
    _hop_pallas_ok,
)

REPEATS = 3
# Hops are chained in ONE dispatch (a lax.scan feeding the state through,
# like the ring itself does) and the per-hop time is the SLOPE between two
# chain lengths: (t(C2) - t(C1)) / (C2 - C1). A single hop is ~10-100 µs of
# compute while the axon-tunnel dispatch+fetch overhead measured ~75 ms on
# this boot — the slope cancels every fixed per-dispatch cost exactly.
CHAINS = (16, 144)


def bench(make, *args):
    ts = []
    for chain in CHAINS:
        fn = make(chain)
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))),
                         out)
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (CHAINS[1] - CHAINS[0]) * 1000


def run(length, sp=8, n=1, h=12, d=64):
    lloc = length // sp
    lseg = lloc // 2  # zigzag half-blocks
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, h, lseg, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(n, h, lseg, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(n, h, lseg, d)), jnp.bfloat16)
    # mid-ring hop: every key visible (the expensive, un-skipped case)
    qpos = jnp.arange(lseg, dtype=jnp.int32) + 4 * lseg
    kpos = jnp.arange(lseg, dtype=jnp.int32)
    scale = 1.0 / np.sqrt(d)
    m0 = jnp.full((n, h, lseg, 1), -1e30, jnp.float32)
    s0 = jnp.zeros((n, h, lseg, 1), jnp.float32)
    a0 = jnp.zeros((n, h, lseg, d), jnp.float32)

    assert _hop_pallas_ok(q, lseg, d), (length, lseg)

    def one_hop_xla(q, k, v, st):
        qf = q.astype(jnp.float32) * scale
        return _attend_block(qf, qpos, k, v, kpos, st, causal=True,
                             chunk=512)

    def one_hop_pallas(q, k, v, st):
        return _attend_state_pallas(q, qpos, k, v, kpos, *st, True, 512,
                                    scale)

    def chained(one_hop):
        # `chain` hops feeding the online-softmax state through — the
        # ring's actual access pattern, one dispatch per chain length.
        def make(chain):
            def f(q, k, v, m, s, a):
                def body(st, _):
                    return one_hop(q, k, v, st), None
                (m, s, a), _ = jax.lax.scan(body, (m, s, a), None,
                                            length=chain)
                return m, s, a
            return jax.jit(f)
        return make

    def grads_of(one_hop):
        def make(chain):
            def loss(q, k, v):
                def body(st, _):
                    return one_hop(q, k, v, st), None
                (m, s, a), _ = jax.lax.scan(jax.checkpoint(body),
                                            (m0, s0, a0), None,
                                            length=chain)
                return jnp.sum(
                    (a / jnp.maximum(s, 1e-30)).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        return make

    ms_x = bench(chained(one_hop_xla), q, k, v, m0, s0, a0)
    ms_p = bench(chained(one_hop_pallas), q, k, v, m0, s0, a0)
    ms_xg = bench(grads_of(one_hop_xla), q, k, v)
    ms_pg = bench(grads_of(one_hop_pallas), q, k, v)
    # numerics: kernel vs einsum fwd state (one hop)
    op = jax.jit(lambda *a: one_hop_pallas(*a[:3], a[3:]))(q, k, v, m0, s0, a0)
    ox = jax.jit(lambda *a: one_hop_xla(*a[:3], a[3:]))(q, k, v, m0, s0, a0)
    outp = np.asarray(op[2] / np.maximum(np.asarray(op[1]), 1e-30))
    outx = np.asarray(ox[2] / np.maximum(np.asarray(ox[1]), 1e-30))
    err = float(np.max(np.abs(outp - outx)))
    print(json.dumps({
        "L": length, "sp": sp, "lseg": lseg,
        "fwd_ms_einsum": round(ms_x, 3), "fwd_ms_pallas": round(ms_p, 3),
        "fwd_speedup": round(ms_x / ms_p, 2),
        "fwdbwd_ms_einsum": round(ms_xg, 3),
        "fwdbwd_ms_pallas": round(ms_pg, 3),
        "fwdbwd_speedup": round(ms_xg / ms_pg, 2),
        "max_abs_err": err}), flush=True)


if __name__ == "__main__":
    for length in (8192, 16384):
        run(length)
