"""Sequence parallelism: ring attention over an 'sp' mesh axis.

Beyond-parity capability (SURVEY §5.7 records the reference has NO
long-context / sequence-parallel support — its causal mask is a precomputed
O(L²) buffer, architecture.py:180-184). This module scales the sequence
dimension across devices the TPU-native way:

  - Every activation is sharded on L: embedding, norms, FFN, and the qkv /
    output projections are purely local (their math is position-wise).
  - Attention — the one op that couples positions — runs as **ring
    attention**: each device holds its (N, h, L/sp, d) query block
    permanently and its K/V block initially; K/V blocks rotate around the
    'sp' ring with ``lax.ppermute`` while a blockwise online softmax
    (running max / sum / weighted accumulator, all f32) folds each visiting
    block in. After ``sp`` hops every query has seen every key.
  - The backward schedule is AD through the ``lax.scan`` of hops (ppermute
    transposes run the ring in reverse); each hop is ``jax.checkpoint``ed so
    only its INPUTS are residuals — O(sp · Lloc · d) per device, never the
    score blocks. Gradients of the replicated parameters are ``pmean``'d
    over 'sp' exactly like data parallelism.

Round-4 production upgrades (VERDICT r3 #6):

  - **Blockwise hops** — each visiting K/V block is consumed in fixed-size
    key chunks (``chunk``, default 512) through the same online softmax, so
    the biggest f32 score tensor alive is (N, h, Lloc, chunk): peak memory
    per hop is independent of Lloc² (asserted on the jaxpr in
    tests/test_sequence_parallel.py).
  - **Causality is position arithmetic on VECTORS** — each shard carries the
    global position of every row it holds (``kpos`` rotates around the ring
    with K/V), so any layout of rows onto devices is correct by
    construction.
  - **Zigzag causal sharding** — the contiguous layout is causally
    imbalanced: the last device's queries attend everything while device 0
    attends one block, and in SPMD lockstep the slowest device sets the
    pace. With ``zigzag=True`` the sequence is split into 2·sp blocks and
    shard s owns blocks {s, 2sp−1−s}: every device's two half-blocks
    together see the same number of causally-visible keys (2sp+1 halves),
    so per-hop work is balanced. Fully-future (q-half, k-half) pairs are
    SKIPPED outright with ``lax.cond`` on the device-varying position
    bounds (runtime branch per device, like parallel/pipeline.py's
    head-on-last-stage) — not just masked.
  - **Dropout + grad accumulation** in the sp train step: all four of the
    model's dropout sites (emb / attn-out / ffn / output — the reference
    has no attention-probs dropout, architecture.py:205-299) are
    position-wise, so they run locally with a per-shard folded PRNG stream;
    microbatch accumulation is the same ``lax.scan`` as
    parallel/train_step.py.
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..models.norms import apply_norm
from ..models.transformer import (
    TransformerConfig,
    _linear,
    apply_ffn,
)
from ..ops.common import best_precision, dropout as _dropout
from .train_step import TrainState

_NEG_INF = -1e30


def zigzag_permutation(length: int, sp: int) -> np.ndarray:
    """Row permutation for the zigzag layout: ``x[:, perm]`` lays the
    sequence out so that a contiguous 'sp' sharding gives shard s the
    global half-blocks {s, 2sp−1−s}. Apply the SAME permutation to tokens
    and labels; every position-wise quantity then stays aligned, and the
    attention math is position-exact because shards carry their global
    positions (``_shard_positions``)."""
    assert length % (2 * sp) == 0, (length, sp)
    lh = length // (2 * sp)
    idx = []
    for s in range(sp):
        a, b = s, 2 * sp - 1 - s
        idx.extend(range(a * lh, (a + 1) * lh))
        idx.extend(range(b * lh, (b + 1) * lh))
    return np.asarray(idx, dtype=np.int32)


def _shard_positions(me, lloc: int, sp: int, zigzag: bool):
    """Global positions of the ``lloc`` rows shard ``me`` holds."""
    if not zigzag:
        return me * lloc + jnp.arange(lloc, dtype=jnp.int32)
    lh = lloc // 2
    iota = jnp.arange(lh, dtype=jnp.int32)
    a = me * lh
    b = (2 * sp - 1 - me) * lh
    return jnp.concatenate([a + iota, b + iota])


def _pick_chunk(lk: int, chunk: int | None) -> int:
    """Largest divisor of ``lk`` that is ≤ the requested chunk."""
    c = min(lk, chunk or 512)
    while lk % c:
        c -= 1
    return c


def _attend_block(qf, qpos, kseg, vseg, kpos, state, *, causal: bool,
                  chunk: int | None):
    """Fold one K/V block into the online-softmax state, key-chunk by
    key-chunk — the biggest f32 tensor alive is (N, h, Lq, chunk)."""
    m, s, acc = state
    n, h, lk, d = kseg.shape
    c = _pick_chunk(lk, chunk)
    prec = best_precision(qf)

    def one(st, kc, vc, kp):
        m, s, acc = st
        scores = jnp.einsum("nhqd,nhkd->nhqk", qf, kc.astype(jnp.float32),
                            precision=prec, preferred_element_type=jnp.float32)
        if causal:
            mask = kp[None, None, None, :] <= qpos[None, None, :, None]
            scores = jnp.where(mask, scores, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        if causal:
            # A fully-masked chunk leaves m_new at the _NEG_INF init, where
            # exp(scores - m_new) = exp(0) = 1 for every masked score — zero
            # the masked probabilities explicitly so correctness never rests
            # on hop ordering (every visit order is valid by construction).
            p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m - m_new)
        s = s * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("nhqk,nhkd->nhqd", p, vc.astype(jnp.float32),
                        precision=best_precision(p),
                        preferred_element_type=jnp.float32)
        return (m_new, s, acc * corr + pv)

    if c == lk:
        return one(state, kseg, vseg, kpos)
    nc = lk // c
    ks = kseg.reshape(n, h, nc, c, d).transpose(2, 0, 1, 3, 4)
    vs = vseg.reshape(n, h, nc, c, d).transpose(2, 0, 1, 3, 4)
    kps = kpos.reshape(nc, c)
    state, _ = jax.lax.scan(
        lambda st, xs: (one(st, *xs), None), state, (ks, vs, kps))
    return state


# ---------------------------------------------------------------------------
# Pallas hop kernel (round 5): the per-hop online-softmax state update as ONE
# kernel — scores/probabilities live only in VMEM tiles, the qk/pv matmuls
# run in bf16 on the MXU with f32 accumulation. The XLA einsum hop keeps the
# golden-parity f32 semantics (and the CPU-mesh test path); `impl="auto"`
# picks the kernel for sub-f32 dtypes on a TPU backend, exactly like
# ops/common.resolve_impl does for the packed MHA kernel.
# ---------------------------------------------------------------------------


def _hop_state_kernel(q_ref, k_ref, v_ref, qp_ref, kp_ref, m_ref, s_ref,
                      a_ref, mo_ref, so_ref, ao_ref, *, sm_scale, causal,
                      block_kv):
    """One program = all heads for one (batch, q-block): fold the visiting
    K/V block into (m, s, acc), key-chunk by key-chunk.

    Same math as :func:`_attend_block` (including the robust masking — a
    fully-masked chunk contributes exactly zero regardless of hop order),
    with bf16 matmuls + f32 statistics instead of the einsum path's
    f32-HIGHEST contractions."""
    q = q_ref[:]  # (h, bq, d) input dtype
    h, lk, d = k_ref.shape
    qp = qp_ref[0]  # (bq,) global q positions

    def body(j, carry):
        m, s, acc = carry
        kc = k_ref[:, pl.ds(j * block_kv, block_kv), :]
        vc = v_ref[:, pl.ds(j * block_kv, block_kv), :]
        scores = jax.lax.dot_general(
            q, kc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        if causal:
            kp = kp_ref[0, pl.ds(j * block_kv, block_kv)]  # (bkv,)
            mask = kp[None, :] <= qp[:, None]  # (bq, bkv)
            scores = jnp.where(mask[None], scores, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        if causal:
            p = jnp.where(mask[None], p, 0.0)
        corr = jnp.exp(m - m_new)
        s_new = s * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(vc.dtype), vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return m_new, s_new, acc_new

    m, s, acc = jax.lax.fori_loop(
        0, lk // block_kv, body, (m_ref[:], s_ref[:], a_ref[:]))
    mo_ref[:] = m
    so_ref[:] = s
    ao_ref[:] = acc


def _hop_pallas_call(q, qpos, kseg, vseg, kpos, m, s, acc, *, causal,
                     block_kv, sm_scale):
    n, h, lq, d = q.shape
    lk = kseg.shape[2]
    bq = lq if lq <= 256 else 256
    bkv = min(block_kv, lk)
    grid = (n, lq // bq)
    kernel = functools.partial(_hop_state_kernel, sm_scale=sm_scale,
                               causal=causal, block_kv=bkv)
    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    q_spec = bspec((None, h, bq, d), lambda b, i: (b, 0, i, 0))
    acc_spec = bspec((None, h, bq, d), lambda b, i: (b, 0, i, 0))
    kv_spec = bspec((None, h, lk, d), lambda b, i: (b, 0, 0, 0))
    st1_spec = bspec((None, h, bq, 1), lambda b, i: (b, 0, i, 0))
    qp_spec = bspec((1, bq), lambda b, i: (0, i))
    kp_spec = bspec((1, lk), lambda b, i: (0, 0))
    std = jax.ShapeDtypeStruct
    mo, so, ao = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, qp_spec, kp_spec,
                  st1_spec, st1_spec, acc_spec],
        out_specs=[st1_spec, st1_spec, acc_spec],
        out_shape=[std((n, h, lq, 1), jnp.float32),
                   std((n, h, lq, 1), jnp.float32),
                   std((n, h, lq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * lq * lk * d,
            bytes_accessed=(2 * h * lk * d + h * lq * d) * q.dtype.itemsize
            + 2 * h * lq * (2 + d) * 4,
            transcendentals=h * lq * lk,
        ),
    )(q, kseg, vseg, qpos.reshape(1, -1), kpos.reshape(1, -1), m, s, acc)
    return mo, so, ao


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _attend_state_pallas(q, qpos, kseg, vseg, kpos, m, s, acc, causal,
                         chunk, scale):
    """Kernel hop with an einsum-recompute backward: the forward runs
    :func:`_hop_state_kernel`; the VJP replays the hop through the
    :func:`_attend_block` einsum path (remat-style — the hop inputs are the
    only residuals) and differentiates that. Values agree to bf16 matmul
    accumulation order; gradients are exactly the einsum hop's."""
    bkv = min(chunk or 512, kseg.shape[2])
    return _hop_pallas_call(q, qpos, kseg, vseg, kpos, m, s, acc,
                            causal=causal, block_kv=bkv, sm_scale=scale)


def _attend_state_pallas_fwd(q, qpos, kseg, vseg, kpos, m, s, acc, causal,
                             chunk, scale):
    out = _attend_state_pallas(q, qpos, kseg, vseg, kpos, m, s, acc, causal,
                               chunk, scale)
    return out, (q, qpos, kseg, vseg, kpos, m, s, acc)


def _attend_state_pallas_bwd(causal, chunk, scale, res, ct):
    q, qpos, kseg, vseg, kpos, m, s, acc = res

    def f(q_, k_, v_, m_, s_, a_):
        qf = q_.astype(jnp.float32) * scale
        return _attend_block(qf, qpos, k_, v_, kpos, (m_, s_, a_),
                             causal=causal, chunk=chunk)

    _, vjp = jax.vjp(f, q, kseg, vseg, m, s, acc)
    dq, dk, dv, dm, ds, dacc = vjp(ct)
    return dq.astype(q.dtype), None, dk.astype(kseg.dtype), \
        dv.astype(vseg.dtype), None, dm, ds, dacc


_attend_state_pallas.defvjp(_attend_state_pallas_fwd, _attend_state_pallas_bwd)


def _hop_pallas_ok(q, lseg: int, d: int) -> bool:
    """Kernel eligibility: TPU backend, sub-f32 dtype (f32 keeps the
    golden-parity einsum semantics, mirroring ops/common.resolve_impl),
    8/128-aligned segment, and the full-block K/V residency within the
    kernel's VMEM budget."""
    if jax.default_backend() != "tpu":
        return False
    if q.dtype.itemsize >= 4:
        return False
    if lseg % 128 or d % 64:
        return False
    h = q.shape[1]
    return 2 * h * lseg * d * q.dtype.itemsize <= 48 * 1024 * 1024


def ring_attention(q, k, v, *, axis_name: str = "sp", causal: bool = False,
                   zigzag: bool = False, chunk: int | None = 512,
                   impl: str = "auto"):
    """Blockwise-softmax attention over a sequence-sharded ring.

    ``q, k, v``: the local (N, h, Lloc, d) shards of (N, h, L, d) tensors
    with L = sp · Lloc sharded over ``axis_name`` — contiguously, or in the
    zigzag layout (``zigzag=True``: rows pre-permuted with
    :func:`zigzag_permutation`; the output comes back in the same layout).
    Returns the local (N, h, Lloc, d) output of full-sequence softmax
    attention — numerically the blockwise online-softmax evaluation of
    :func:`vitef_tpu.ops.attention.attention_reference`.

    Must be called inside ``shard_map`` (uses ``axis_index``/``ppermute``).
    Differentiable: each hop is rematerialised (``jax.checkpoint``), so the
    scan saves only O(sp) block inputs and AD transposes the ppermute ring.
    ``chunk`` bounds the live f32 score tensor to (N, h, Lq-seg, chunk);
    ``None`` disables inner chunking.

    ``impl``: 'xla' = the einsum hop (f32-HIGHEST contractions — golden
    parity, and the CPU-mesh test path); 'pallas' = the hop state update as
    one kernel per (batch, q-block) program (bf16 MXU matmuls + f32
    statistics; backward replays the einsum hop — remat with the kernel
    forward); 'auto' = pallas for sub-f32 dtypes on a TPU backend with
    aligned segments, else xla.
    """
    assert impl in ("auto", "xla", "pallas"), impl
    sp = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n, h, lq, d = q.shape
    if zigzag:
        assert lq % 2 == 0, "zigzag shards hold two half-blocks"
    scale = 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    pos = _shard_positions(me, lq, sp, zigzag)

    n_seg = 2 if zigzag else 1
    lseg = lq // n_seg
    use_pallas = impl == "pallas" or (impl == "auto"
                                      and _hop_pallas_ok(q, lseg, d))
    # kernel path: q stays in the compute dtype (scale folds into the
    # kernel); einsum path: pre-scaled f32 queries (HIGHEST-precision
    # golden semantics)
    qh = q if use_pallas else q.astype(jnp.float32) * scale
    qsegs = [qh[..., i * lseg:(i + 1) * lseg, :] for i in range(n_seg)]
    qpos_segs = [pos[i * lseg:(i + 1) * lseg] for i in range(n_seg)]

    def zero_state():
        return (jnp.full((n, h, lseg, 1), _NEG_INF, jnp.float32),
                jnp.zeros((n, h, lseg, 1), jnp.float32),
                jnp.zeros((n, h, lseg, d), jnp.float32))

    def hop(carry, _):
        states, kt, vt, kpos = carry
        new_states = []
        for qi in range(n_seg):
            st = states[qi]
            for ki in range(n_seg):
                kseg = kt[..., ki * lseg:(ki + 1) * lseg, :]
                vseg = vt[..., ki * lseg:(ki + 1) * lseg, :]
                kp = kpos[ki * lseg:(ki + 1) * lseg]
                if use_pallas:
                    attend = partial(
                        lambda qs, qp_, ks, vs, kp_, st: _attend_state_pallas(
                            qs, qp_, ks, vs, kp_, *st, causal, chunk, scale),
                        qsegs[qi], qpos_segs[qi], kseg, vseg, kp)
                else:
                    attend = partial(_attend_block, qsegs[qi], qpos_segs[qi],
                                     kseg, vseg, kp, causal=causal,
                                     chunk=chunk)
                if causal and not (use_pallas
                                   and jax.default_backend() != "tpu"):
                    # Fully-future k segment for every row of this q segment:
                    # SKIP the matmuls at runtime (device-varying lax.cond —
                    # the zigzag load-balance win; also saves early-ring
                    # devices' dead hops in the contiguous layout).
                    # Interpret-mode pallas (CI) must NOT sit under a
                    # device-varying cond: its io_callback barrier spans all
                    # mesh devices, so skipped devices deadlock the rest —
                    # executing the dead block instead is exact (a fully-
                    # masked chunk contributes zero by the kernel's masking).
                    skip = jnp.min(kp) > jnp.max(qpos_segs[qi])
                    st = jax.lax.cond(skip, lambda s: s, attend, st)
                else:
                    st = attend(st)
            new_states.append(st)
        kt, vt, kpos = jax.lax.ppermute((kt, vt, kpos), axis_name, perm)
        return (tuple(new_states), kt, vt, kpos), None

    init = (tuple(zero_state() for _ in range(n_seg)), k, v, pos)
    # Einsum hops get jax.checkpoint (save only the O(sp) hop inputs; the
    # f32 score chunks are recomputed in the backward). The pallas hop is
    # ALREADY remat-style — its custom VJP saves exactly the hop inputs and
    # replays the einsum path backward — so the wrapper adds nothing there,
    # and interpret-mode pallas (CI) carries an OrderedIOEffect that
    # checkpoint's partial-eval rejects.
    body = hop if use_pallas else jax.checkpoint(hop)
    (states, _, _, _), _ = jax.lax.scan(body, init, None, length=sp)
    # causal: every query sees at least its own position → s > 0
    outs = [(acc / jnp.maximum(s, 1e-30)) for (_, s, acc) in states]
    return jnp.concatenate(outs, axis=2).astype(q.dtype)


# ---------------------------------------------------------------------------
# Sequence-parallel causal-LM forward
# ---------------------------------------------------------------------------


def apply_transformer_sp(params: dict, cfg: TransformerConfig, tokens, *,
                         axis_name: str = "sp", zigzag: bool = False,
                         chunk: int | None = 512,
                         deterministic: bool = True, rng=None):
    """Pre-norm causal-LM forward on a LOCAL (N, Lloc) token shard.

    Mirrors apply_transformer/apply_block semantics (models/transformer.py)
    for the decoder configuration — dict embedding, learnable pos-emb, fused
    qkv, pre-norm blocks, seq2seq head — with every op local to the shard
    except attention (ring) and the pos-emb gather (by the shard's global
    positions, so it is layout-correct under zigzag too). Dropout
    (``deterministic=False`` + ``rng``): the model's four dropout sites are
    all position-wise (emb / attn-out / ffn / output — transformer.py:449,
    579, 633, 727), so they run locally on a per-shard stream
    (``fold_in(rng, axis_index)``); there is no attention-probs dropout to
    worry about (the reference has none either).
    """
    assert cfg.causal and cfg.pre_norm and not cfg.cls_token, (
        "apply_transformer_sp supports the pre-norm causal LM configuration"
    )
    assert cfg.emb_type.lower() == "dict" and not cfg.patch_type, (
        "sequence parallelism shards the token axis (dict embedding)"
    )
    assert cfg.output_type.lower() == "sequence_to_sequence", (
        "SP head must be position-wise (sequence_to_sequence)"
    )
    assert cfg.norm.lower() != "batch"
    cd = cfg.cdtype()
    me = jax.lax.axis_index(axis_name)
    sp = jax.lax.axis_size(axis_name)
    lloc = tokens.shape[1]
    pos = _shard_positions(me, lloc, sp, zigzag)

    drop = not deterministic and rng is not None
    rngs = [None] * (cfg.n_layers + 2)
    if drop:
        rngs = list(jax.random.split(jax.random.fold_in(rng, me),
                                     cfg.n_layers + 2))

    emb = params["embedding"]
    out = emb["token_emb"]["weight"].astype(cd)[tokens]
    if cfg.pos_emb:
        pe = jnp.take(params["embedding"]["pos_emb"], pos, axis=1)
        out = out + pe.astype(cd)
    if drop and cfg.emb_dropout > 0:
        out = _dropout(out, cfg.emb_dropout, rngs[0], deterministic=False)

    n = out.shape[0]
    e = cfg.emb_dim
    h = cfg.n_heads
    d = e // h
    for li, bp in enumerate(params["blocks"]):
        r1 = r2 = None
        if drop:
            r1, r2 = jax.random.split(rngs[1 + li])
        x = apply_norm(bp["attn_norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                       impl=cfg.norm_impl)
        qkv = _linear(bp["attn"]["qkv_mat"], x, cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(n, lloc, h, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        z = ring_attention(q, k, v, axis_name=axis_name, causal=True,
                           zigzag=zigzag, chunk=chunk)
        z = z.transpose(0, 2, 1, 3).reshape(n, lloc, e)
        z = _linear(bp["attn"]["output"], z, cd)
        if drop and cfg.attn_dropout > 0:
            z = _dropout(z, cfg.attn_dropout, r1, deterministic=False)
        out = out + z
        x = apply_norm(bp["ffn_norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                       impl=cfg.norm_impl)
        out = out + apply_ffn(bp["ffn"], cfg, x,
                              deterministic=not drop, rng=r2)

    op = params["output"]["output_layer"]
    out = apply_norm(op["norm"], out, kind=cfg.norm, eps=cfg.norm_eps,
                     impl=cfg.norm_impl)
    if drop and cfg.output_dropout > 0:
        out = _dropout(out, cfg.output_dropout, rngs[-1], deterministic=False)
    if cfg.weight_tying:
        w = emb["token_emb"]["weight"].astype(cd)
        logits = jnp.einsum("nle,ve->nlv", out.astype(cd), w,
                            precision=best_precision(w),
                            preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32)
    return _linear(op["head"], out, cd).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Sequence-parallel train step
# ---------------------------------------------------------------------------


def make_sp_train_step(
    cfg: TransformerConfig,
    tx,
    mesh: Mesh,
    *,
    loss_fn: Callable | None = None,
    grad_clip: float | None = None,
    donate: bool = True,
    zigzag: bool = False,
    chunk: int | None = 512,
    grad_acc_steps: int = 1,
):
    """Train step with the SEQUENCE axis sharded over 'sp'.

    ``batch`` is ``(tokens, labels)`` of global shape (N, L) each, L sharded
    over 'sp' (labels pre-shifted by the caller, e.g. ``roll(tokens, -1)`` —
    the shift is global, so shifting before sharding keeps the shard
    boundaries consistent). Parameters are replicated; gradients are
    ``pmean``'d over 'sp' (each device's local mean loss is a 1/sp share of
    the global mean — the DP reduction, applied along sequence).

    ``zigzag=True`` permutes tokens AND labels into the zigzag layout before
    sharding (one global gather), which load-balances the causal ring (see
    ring_attention). The loss is a position-wise mean, so permuting both
    identically leaves it exactly unchanged. ``grad_acc_steps`` splits the
    batch over microbatches with a ``lax.scan`` (summed grads / mean loss,
    the parallel/train_step.py contract). Dropout: call the step as
    ``step(state, batch, rng)`` — each microbatch and shard folds its own
    stream; omit ``rng`` for the deterministic forward.
    """
    import optax

    from ..optim import global_grad_norm

    assert "sp" in mesh.axis_names
    sp = mesh.shape["sp"]
    if loss_fn is None:
        def loss_fn(logits, labels):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels).mean()

    zz_perm = None
    if zigzag:
        # static permutation of the GLOBAL length; requires the global L
        # only at trace time (taken from the batch inside train_step)
        def zz(x):
            return jnp.take(x, jnp.asarray(
                zigzag_permutation(x.shape[1], sp)), axis=1)
        zz_perm = zz

    def per_shard(state: TrainState, tokens, labels, rng):
        def local_loss(p, tok, lab, r):
            logits = apply_transformer_sp(
                p, cfg, tok, zigzag=zigzag, chunk=chunk,
                deterministic=rng is None, rng=r)
            return loss_fn(logits, lab)

        if grad_acc_steps == 1:
            r = None if rng is None else rng
            loss, grads = jax.value_and_grad(local_loss)(
                state.params, tokens, labels, r)
        else:
            assert tokens.shape[0] % grad_acc_steps == 0, (
                f"batch size {tokens.shape[0]} must be divisible by "
                f"grad_acc_steps={grad_acc_steps} (equal microbatches keep "
                "the accumulated step exact)")
            nb = tokens.shape[0] // grad_acc_steps
            toks = tokens.reshape(grad_acc_steps, nb, -1)
            labs = labels.reshape(grad_acc_steps, nb, -1)

            def micro(carry, inp):
                loss_sum, grad_sum, i = carry
                tok, lab = inp
                r = None if rng is None else jax.random.fold_in(rng, i)
                loss, grads = jax.value_and_grad(local_loss)(
                    state.params, tok, lab, r)
                return (loss_sum + loss,
                        jax.tree.map(jnp.add, grad_sum, grads), i + 1), None

            zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                state.params)
            (loss, grads, _), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zero, jnp.zeros((), jnp.int32)),
                (toks, labs))
            loss = loss / grad_acc_steps
            grads = jax.tree.map(lambda g: g / grad_acc_steps, grads)
        loss = jax.lax.pmean(loss, "sp")
        grads = jax.lax.pmean(grads, "sp")
        gnorm = global_grad_norm(grads)
        if grad_clip is not None:
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1,
                               acc_step=state.acc_step * 0)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def train_step(state: TrainState, batch, rng=None):
        tokens, labels = batch
        if zz_perm is not None:
            tokens, labels = zz_perm(tokens), zz_perm(labels)
        sharded = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(None, "sp"), P(None, "sp"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, tokens, labels, rng)

    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   static_argnums=())


def build_sp_mesh(sp: int, devices=None) -> Mesh:
    """1-D ('sp',) mesh — stages adjacent on the ICI ring."""
    if devices is None:
        devices = jax.devices()
    assert sp == len(devices), f"sp={sp} must equal the device count"
    return Mesh(np.asarray(devices), axis_names=("sp",))
