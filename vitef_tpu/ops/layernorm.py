"""Fused LayerNorm: Pallas TPU kernel with custom VJP, plus an XLA reference path.

Replaces the implicit torch F.layer_norm CUDA kernel used by the reference
(src/vitef/models/transformer/utils.py:233-293). ViT uses eps=1e-12
(src/vitef/models/vit.py:152) — statistics are always accumulated in float32
regardless of the activation dtype, which is what makes that eps meaningful in
bfloat16 pipelines.

Design: rows = all leading dims flattened; the kernel normalizes a (block_rows, E)
tile per grid step entirely in VMEM. Backward is a second Pallas kernel computing
dx in one pass from saved (mean, rstd); dscale/dbias are thin XLA reductions over
rows (bandwidth-bound, XLA fuses them with the dx pass' reload-free residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_impl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def layer_norm_xla(x, scale, bias, eps: float):
    """LayerNorm over the last axis with fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas forward / backward kernels
# ---------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = centered * rstd
    out = xhat * scale_ref[:].astype(jnp.float32)
    if bias_ref is not None:
        out = out + bias_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _ln_bwd_dx_kernel(g_ref, x_ref, scale_ref, mean_ref, rstd_ref, dx_ref):
    g = g_ref[:].astype(jnp.float32) * scale_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    mg = jnp.mean(g, axis=-1, keepdims=True)
    mgx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (g - mg - xhat * mgx)).astype(dx_ref.dtype)


def _ln_fwd_pallas(x2d, scale, bias, eps: float, block_rows: int):
    rows, dim = x2d.shape
    grid = (pl.cdiv(rows, block_rows),)
    row_spec = pl.BlockSpec((block_rows, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec, param_spec]
    args = [x2d, scale]
    if bias is not None:
        in_specs.append(param_spec)
        args.append(bias)
    kernel = functools.partial(
        _ln_fwd_kernel if bias is not None else _ln_fwd_kernel_nobias, eps=eps
    )
    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_spec, stat_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, dim), x2d.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
    )(*args)
    return out, mean, rstd


def _ln_fwd_kernel_nobias(x_ref, scale_ref, o_ref, mean_ref, rstd_ref, *, eps):
    _ln_fwd_kernel(x_ref, scale_ref, None, o_ref, mean_ref, rstd_ref, eps=eps)


def _ln_bwd_dx_pallas(g2d, x2d, scale, mean, rstd, block_rows: int):
    rows, dim = x2d.shape
    grid = (pl.cdiv(rows, block_rows),)
    row_spec = pl.BlockSpec((block_rows, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ln_bwd_dx_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, param_spec, stat_spec, stat_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, dim), x2d.dtype),
    )(g2d, x2d, scale, mean, rstd)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

_BLOCK_ROWS = 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_pallas(x2d, scale, bias, eps):
    out, _, _ = _ln_fwd_pallas(x2d, scale, bias, eps, _BLOCK_ROWS)
    return out


def _ln_pallas_fwd(x2d, scale, bias, eps):
    out, mean, rstd = _ln_fwd_pallas(x2d, scale, bias, eps, _BLOCK_ROWS)
    return out, (x2d, scale, bias, mean, rstd)


def _ln_pallas_bwd(eps, residuals, g):
    x2d, scale, bias, mean, rstd = residuals
    dx = _ln_bwd_dx_pallas(g, x2d, scale, mean, rstd, _BLOCK_ROWS)
    xf = x2d.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    gf = g.astype(jnp.float32)
    dscale = jnp.sum(gf * xhat, axis=0).astype(scale.dtype)
    dbias = None if bias is None else jnp.sum(gf, axis=0).astype(bias.dtype)
    return dx, dscale, dbias


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)


def layer_norm(x, scale, bias=None, *, eps: float = 1e-6, impl: str = "auto"):
    """LayerNorm over the last axis. ``bias=None`` means no bias (norm_bias=False).

    Reference semantics: src/vitef/models/transformer/utils.py:233-293 (LayerNorm
    with optional bias), fp32 statistics.
    """
    impl = resolve_impl(impl)
    if impl == "xla":
        return layer_norm_xla(x, scale, bias, eps)
    lead = x.shape[:-1]
    dim = x.shape[-1]
    rows = 1
    for s in lead:
        rows *= s
    x2d = x.reshape(rows, dim)
    pad_rows = _round_up(max(rows, 8), _BLOCK_ROWS)
    if pad_rows != rows:
        x2d = jnp.pad(x2d, ((0, pad_rows - rows), (0, 0)))
    out = _ln_pallas(x2d, scale, bias, eps)
    if pad_rows != rows:
        out = out[:rows]
    return out.reshape(*lead, dim)
