"""SwiGLU-fused grouped matmuls for the sparse-MoE expert FFN (TPU pallas).

Round-4 trace of the 8x124m sparse-MoE step showed the expert-FFN
*elementwise* chain costing ~31 ms/step of pure HBM traffic on top of the
grouped matmuls: the swiglu forward pass over the (G, f1) fc1 output
(0.59 ms x 12 layers), XLA's rematerialisation of that same pass in the
backward (another 0.59 x 12), the backward's dh ``concatenate`` (0.82 x 12,
lowered as a pad+select loop fusion XLA refuses to fuse with its producers),
and the per-layer sorted-gate gathers. None of that work needs to touch HBM:
the swiglu sits BETWEEN two grouped matmuls, so it can ride their tiles.

This module provides megablox-style grouped-matmul kernels (same grid /
group-metadata / store-mask structure as
``jax.experimental.pallas.ops.tpu.megablox.gmm``, which
``parallel/moe._gmm`` already uses for the plain passes) with the swiglu
algebra fused in:

  - :func:`gmm_swiglu`   — ``out = (silu(hg) * hu) @ w2`` per group, where
    ``hg/hu`` are the two halves of the packed (G, 2f) fc1 output read
    in-place via two block views; the gated activation ``y`` never exists in
    HBM (forward).
  - :func:`gmm_dy_swiglu` — ``dy = g @ w2ᵀ`` per group with the swiglu
    backward applied in the store epilogue: writes ``dhg, dhu`` as two
    separate outputs (no dh concatenate, no f32 round-trip).
  - :func:`tgmm_swiglu`  — ``dw2[e] = yᵀ[rows of e] @ g[rows of e]`` with
    ``y`` recomputed tile-wise from hg/hu in the prologue (y is never
    saved; h is the only residual, exactly what gmm1 already saves).
  - :func:`gmm_dual`     — ``out = a @ r[:, :f] + b @ r[:, f:]`` per group:
    the pass-1 dx consuming dhg/dhu directly against the packed fc1 weight
    (two rhs block views), so the cotangent halves never re-join.

Numerics: matmuls run in the input dtype with fp32 accumulation; the silu /
silu-backward chains are computed in fp32 on the bf16-rounded tiles — the
same contract as the jax-level ``_swiglu_gate`` custom VJP these kernels
replace. All kernels assume regular tiling (the wrapper asserts
divisibility; ``parallel/moe.apply_moe_ffn_sparse`` rounds the row count to
the tile multiple already).

Reference counterpart: none — the reference has a single dense FeedForward
(src/vitef/models/transformer/architecture.py:247-299) and no MoE. This is
the TPU-native dropless-MoE hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.megablox.gmm import (
    _get_group_size,
    _get_store_mask,
    make_group_metadata,
)


def _silu_f32(x):
    x = x.astype(jnp.float32)
    return x * jax.nn.sigmoid(x)


def _swiglu_bwd_f32(dy, g, u):
    """d(silu(g)*u) in fp32: returns (dg, du) given upstream dy."""
    g = g.astype(jnp.float32)
    u = u.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    s = jax.nn.sigmoid(g)
    dg = dy * u * (s * (1.0 + g * (1.0 - s)))
    du = dy * (g * s)
    return dg, du


def _check(cond, msg):
    if not cond:
        raise ValueError(msg)


def _meta(group_sizes, m, tm, visit_empty):
    group_sizes = group_sizes.astype(jnp.int32)
    return make_group_metadata(
        group_sizes=group_sizes, m=m, tm=tm,
        start_group=jnp.int32(0), num_nonzero_groups=group_sizes.shape[0],
        visit_empty_groups=visit_empty)


# ---------------------------------------------------------------------------
# Forward: out = (silu(hg) * hu) @ w2   per group
# ---------------------------------------------------------------------------


def gmm_swiglu(h, w2, group_sizes, preferred_element_type=jnp.float32,
               tiling=(512, 512, 512)):
    """``out[rows of e] = (silu(h[:, :f]) * h[:, f:])[rows of e] @ w2[e]``.

    ``h``: (m, 2f) packed [gate ++ up] fc1 output; ``w2``: (E, f, n).
    The gated activation is computed tile-wise in VMEM; only ``h`` is read.
    """
    m, f2 = h.shape
    num_groups, f, n = w2.shape
    _check(f2 == 2 * f, f"h last dim {f2} != 2*{f}")
    tm, tk, tn = tiling
    tm = min(tm, m)
    _check(m % tm == 0 and f % tk == 0 and n % tn == 0,
           f"irregular tiling {tiling} for (m,k,n)=({m},{f},{n})")
    tiles_k, tiles_n = f // tk, n // tn
    input_dtype = h.dtype
    group_metadata, num_active_tiles = _meta(group_sizes, m, tm, False)

    def kernel(group_metadata, group_offset, hg, hu, w2, out, acc):
        del group_offset
        k_i = pl.program_id(2)

        @pl.when(k_i == 0)
        def _zero():
            acc[...] = jnp.zeros_like(acc)

        y = (_silu_f32(hg[...]) * hu[...].astype(jnp.float32)
             ).astype(input_dtype)
        acc[...] += lax.dot(y, w2[...].astype(input_dtype),
                            preferred_element_type=jnp.float32)

        @pl.when(k_i == tiles_k - 1)
        def _store():
            grid_id = pl.program_id(1)
            mask = _get_store_mask(grid_id=grid_id,
                                   group_metadata=group_metadata,
                                   tm=tm, tn=tn)
            out[...] = lax.select(
                mask[...], acc[...], out[...].astype(jnp.float32)
            ).astype(out.dtype)

    def lhs_idx(n_i, grid_id, k_i, group_metadata, group_offset, off=0):
        return group_metadata[2][grid_id], k_i + off

    def rhs_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], k_i, n_i

    def out_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], n_i

    flops = 2 * m * f * n + 6 * m * f
    cost = pl.CostEstimate(
        flops=flops, transcendentals=m * f,
        bytes_accessed=2 * h.size * h.itemsize + w2.size * w2.itemsize
        + m * n * jnp.dtype(preferred_element_type).itemsize)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), preferred_element_type),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tk), lhs_idx),
                pl.BlockSpec((tm, tk),
                             functools.partial(lhs_idx, off=tiles_k)),
                pl.BlockSpec((None, tk, tn), rhs_idx),
            ],
            out_specs=pl.BlockSpec((tm, tn), out_idx),
            grid=(tiles_n, num_active_tiles, tiles_k),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(group_metadata, jnp.zeros((1,), jnp.int32), h, h, w2)


# ---------------------------------------------------------------------------
# Backward dx of the fused pass: dy = g @ w2t, then the swiglu backward
# epilogue writes dhg / dhu separately
# ---------------------------------------------------------------------------


def gmm_dy_swiglu(g, w2t, h, group_sizes, preferred_element_type=jnp.float32,
                  tiling=(512, 512, 512)):
    """``dy[rows of e] = g[rows of e] @ w2t[e]``, then
    ``dhg = dy * hu * silu'(hg)``, ``dhu = dy * silu(hg)`` per tile.

    ``g``: (m, n) upstream cotangent; ``w2t``: (E, n, f) the EXPLICITLY
    transposed fc2 weight (contiguous normal-gmm layout — the
    ``parallel/moe._gmm`` dx trick); ``h``: (m, 2f) the packed fc1 output.
    Returns ``(dhg, dhu)`` — (m, f) each, never concatenated.
    """
    m, n = g.shape
    num_groups, n2, f = w2t.shape
    _check(n2 == n and h.shape == (m, 2 * f), "gmm_dy_swiglu shape mismatch")
    tm, tk, tn = tiling
    tm = min(tm, m)
    _check(m % tm == 0 and n % tk == 0 and f % tn == 0,
           f"irregular tiling {tiling} for (m,k,n)=({m},{n},{f})")
    tiles_k, tiles_n = n // tk, f // tn
    input_dtype = g.dtype
    group_metadata, num_active_tiles = _meta(group_sizes, m, tm, False)

    def kernel(group_metadata, group_offset, gref, w2t, hg, hu,
               dhg, dhu, acc):
        del group_offset
        k_i = pl.program_id(2)

        @pl.when(k_i == 0)
        def _zero():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += lax.dot(gref[...].astype(input_dtype),
                            w2t[...].astype(input_dtype),
                            preferred_element_type=jnp.float32)

        @pl.when(k_i == tiles_k - 1)
        def _store():
            grid_id = pl.program_id(1)
            dg, du = _swiglu_bwd_f32(acc[...], hg[...], hu[...])
            mask = _get_store_mask(grid_id=grid_id,
                                   group_metadata=group_metadata,
                                   tm=tm, tn=tn)
            dhg[...] = lax.select(
                mask[...], dg, dhg[...].astype(jnp.float32)).astype(dhg.dtype)
            dhu[...] = lax.select(
                mask[...], du, dhu[...].astype(jnp.float32)).astype(dhu.dtype)

    def lhs_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], k_i

    def rhs_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], k_i, n_i

    def h_idx(n_i, grid_id, k_i, group_metadata, group_offset, off=0):
        return group_metadata[2][grid_id], n_i + off

    out_spec = pl.BlockSpec((tm, tn), h_idx)
    flops = 2 * m * n * f + 10 * m * f
    cost = pl.CostEstimate(
        flops=flops, transcendentals=m * f,
        bytes_accessed=(g.size * g.itemsize + w2t.size * w2t.itemsize
                        + h.size * h.itemsize
                        + 2 * m * f * jnp.dtype(preferred_element_type).itemsize))
    shape = jax.ShapeDtypeStruct((m, f), preferred_element_type)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tk), lhs_idx),
                pl.BlockSpec((None, tk, tn), rhs_idx),
                pl.BlockSpec((tm, tn), h_idx),
                pl.BlockSpec((tm, tn),
                             functools.partial(h_idx, off=tiles_n)),
            ],
            out_specs=(out_spec, out_spec),
            grid=(tiles_n, num_active_tiles, tiles_k),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(group_metadata, jnp.zeros((1,), jnp.int32), g, w2t, h, h)


# ---------------------------------------------------------------------------
# dw2: tgmm with the gated activation recomputed in the prologue
# ---------------------------------------------------------------------------


def tgmm_swiglu(h, g, group_sizes, preferred_element_type=jnp.float32,
                tiling=(512, 512, 512)):
    """``dw2[e] = yᵀ[rows of e] @ g[rows of e]`` with
    ``y = silu(h[:, :f]) * h[:, f:]`` recomputed tile-wise (y has no HBM
    form anywhere in the fused path).

    ``h``: (m, 2f); ``g``: (m, n). Returns (E, f, n).
    """
    m, f2 = h.shape
    f = f2 // 2
    n = g.shape[1]
    num_groups = group_sizes.shape[0]
    tm, tk, tn = tiling
    tm = min(tm, m)
    _check(m % tm == 0 and f % tk == 0 and n % tn == 0,
           f"irregular tiling {tiling} for (m,k,n)=({m},{f},{n})")
    tiles_k, tiles_n = f // tk, n // tn
    input_dtype = h.dtype
    group_metadata, num_active_tiles = _meta(group_sizes, m, tm, True)

    def kernel(group_metadata, group_offset, hg, hu, gref, out, acc):
        del group_offset
        grid_id = pl.program_id(2)
        group_ids = group_metadata[1]
        group = group_ids[grid_id]
        prev = group_ids[jnp.where(grid_id > 0, grid_id - 1, 0)]
        changed = jnp.logical_or(grid_id == 0, prev != group)

        @pl.when(changed)
        def _zero():
            acc[...] = jnp.zeros_like(acc)

        dont_skip = _get_group_size(
            grid_id=grid_id, group_metadata=group_metadata) > 0

        @pl.when(dont_skip)
        def _do():
            lhs_mask = _get_store_mask(grid_id=grid_id,
                                       group_metadata=group_metadata,
                                       tm=tm, tn=tk)
            rhs_mask = _get_store_mask(grid_id=grid_id,
                                       group_metadata=group_metadata,
                                       tm=tm, tn=tn)
            y = _silu_f32(hg[...]) * hu[...].astype(jnp.float32)
            y = lax.select(lhs_mask[...], y, jnp.zeros_like(y))
            r = lax.select(rhs_mask[...], gref[...].astype(jnp.float32),
                           jnp.zeros((tm, tn), jnp.float32))
            acc[...] += lax.dot(y.swapaxes(0, 1).astype(input_dtype),
                                r.astype(input_dtype),
                                preferred_element_type=jnp.float32)

        is_end = grid_id == pl.num_programs(2) - 1
        nxt = group_ids[jnp.where(is_end, grid_id, grid_id + 1)]
        changing = jnp.logical_or(is_end, group != nxt)

        @pl.when(changing)
        def _store():
            out[...] = acc[...].astype(out.dtype)

    def h_idx(n_i, k_i, grid_id, group_metadata, group_offset, off=0):
        return group_metadata[2][grid_id], k_i + off

    def g_idx(n_i, k_i, grid_id, group_metadata, group_offset):
        return group_metadata[2][grid_id], n_i

    def out_idx(n_i, k_i, grid_id, group_metadata, group_offset):
        return group_metadata[1][grid_id], k_i, n_i

    flops = 2 * m * f * n + 6 * m * f
    cost = pl.CostEstimate(
        flops=flops, transcendentals=m * f,
        bytes_accessed=(h.size * h.itemsize + g.size * g.itemsize
                        + num_groups * f * n
                        * jnp.dtype(preferred_element_type).itemsize))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_groups, f, n),
                                       preferred_element_type),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tk), h_idx),
                pl.BlockSpec((tm, tk),
                             functools.partial(h_idx, off=tiles_k)),
                pl.BlockSpec((tm, tn), g_idx),
            ],
            out_specs=pl.BlockSpec((None, tk, tn), out_idx),
            grid=(tiles_n, tiles_k, num_active_tiles),
            scratch_shapes=[pltpu.VMEM((tk, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(group_metadata, jnp.zeros((1,), jnp.int32), h, h, g)


# ---------------------------------------------------------------------------
# Pass-1 dx: out = a @ r[:, :f] + b @ r[:, f:]  (two lhs, packed rhs)
# ---------------------------------------------------------------------------


def gmm_dual(a, b, rt, group_sizes, preferred_element_type=jnp.float32,
             tiling=(512, 512, 512)):
    """``out[rows of e] = a[rows of e] @ rt[e, :f] + b[rows of e] @ rt[e, f:]``.

    The pass-1 dx of the fused expert FFN: ``a = dhg``, ``b = dhu``,
    ``rt`` the explicitly transposed packed fc1 weight (E, 2f, n) whose gate
    rows sit at [0:f] and up rows at [f:2f] — read as two block views, so
    the cotangent halves contract against their own weight half and sum in
    the accumulator. dhg/dhu never re-join into a (m, 2f) buffer.
    """
    m, f = a.shape
    num_groups, f2, n = rt.shape
    _check(b.shape == (m, f) and f2 == 2 * f, "gmm_dual shape mismatch")
    tm, tk, tn = tiling
    tm = min(tm, m)
    _check(m % tm == 0 and f % tk == 0 and n % tn == 0,
           f"irregular tiling {tiling} for (m,k,n)=({m},{f},{n})")
    tiles_k, tiles_n = f // tk, n // tn
    input_dtype = a.dtype
    group_metadata, num_active_tiles = _meta(group_sizes, m, tm, False)

    def kernel(group_metadata, group_offset, aref, bref, rg, ru, out, acc):
        del group_offset
        k_i = pl.program_id(2)

        @pl.when(k_i == 0)
        def _zero():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += lax.dot(aref[...].astype(input_dtype),
                            rg[...].astype(input_dtype),
                            preferred_element_type=jnp.float32)
        acc[...] += lax.dot(bref[...].astype(input_dtype),
                            ru[...].astype(input_dtype),
                            preferred_element_type=jnp.float32)

        @pl.when(k_i == tiles_k - 1)
        def _store():
            grid_id = pl.program_id(1)
            mask = _get_store_mask(grid_id=grid_id,
                                   group_metadata=group_metadata,
                                   tm=tm, tn=tn)
            out[...] = lax.select(
                mask[...], acc[...], out[...].astype(jnp.float32)
            ).astype(out.dtype)

    def lhs_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], k_i

    def rhs_idx(n_i, grid_id, k_i, group_metadata, group_offset, off=0):
        return group_metadata[1][grid_id], k_i + off, n_i

    def out_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], n_i

    flops = 4 * m * f * n
    cost = pl.CostEstimate(
        flops=flops, transcendentals=0,
        bytes_accessed=(a.size * a.itemsize + b.size * b.itemsize
                        + rt.size * rt.itemsize
                        + m * n * jnp.dtype(preferred_element_type).itemsize))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), preferred_element_type),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tk), lhs_idx),
                pl.BlockSpec((tm, tk), lhs_idx),
                pl.BlockSpec((None, tk, tn), rhs_idx),
                pl.BlockSpec((None, tk, tn),
                             functools.partial(rhs_idx, off=tiles_k)),
            ],
            out_specs=pl.BlockSpec((tm, tn), out_idx),
            grid=(tiles_n, num_active_tiles, tiles_k),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(group_metadata, jnp.zeros((1,), jnp.int32), a, b, rt, rt)
