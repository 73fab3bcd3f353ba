"""Pallas TPU kernels for the FDS hot ops.

Two kernels replace the XLA reference paths when running on TPU:

1. :func:`pallas_moments` — per-bucket (count, sum, sum-of-squares) over a
   batch. The jnp path materializes a [N, B] one-hot in HBM (for NYUD2's
   ~550k pixels/batch x 100 buckets that's ~220 MB of traffic); this kernel
   builds the one-hot tile-by-tile in VMEM and contracts it on the MXU,
   accumulating [B, D] outputs across the batch grid dimension.

2. :func:`pallas_calibrate` — fused per-sample FDS calibration: gathers each
   sample's bucket statistics via a one-hot matmul (MXU-friendly, no dynamic
   gather) and applies the calibrate transform with all reference guards in
   one pass — the XLA path issues 4 separate [N, D] gathers plus elementwise
   temporaries. Differentiable via custom VJP (d/dx = masked sqrt(factor),
   recomputed in the backward kernel).

Both kernels are validated against the jnp reference paths in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).

Tiling: bucket axis padded to the 128 lane width; batch tiled at 256 rows;
feature axis tiled at 512 lanes. Padded samples carry bucket -1 (matches no
one-hot column). All accumulation in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# segment moments
# ---------------------------------------------------------------------------


def _moments_kernel(f_ref, e_ref, counts_ref, sums_ref, sumsq_ref):
    i_t = pl.program_id(1)  # batch-tile index (fastest-varying → accumulate)

    f = f_ref[:].astype(jnp.float32)  # [T, TD]
    e = e_ref[:]  # [T, 1] int32; -1 marks padding

    t = f.shape[0]
    b_pad = sums_ref.shape[0]
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (b_pad, t), 0)
    ohT = (bucket_ids == e.reshape(1, t)).astype(jnp.float32)  # [Bp, T]

    sums_t = jnp.dot(ohT, f, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    sumsq_t = jnp.dot(ohT, f * f, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    counts_t = jnp.sum(ohT, axis=1, keepdims=True)  # [Bp, 1]

    @pl.when(i_t == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    sums_ref[:] += sums_t
    sumsq_ref[:] += sumsq_t
    i_d = pl.program_id(0)

    @pl.when(i_d == 0)
    def _():
        counts_ref[:] += counts_t


@functools.partial(jax.jit, static_argnames=("num_buckets", "interpret"))
def pallas_moments(features, bucket_idx, num_buckets: int, *, interpret: bool = False):
    """counts [B], sums [B, D], sumsq [B, D] of ``features`` [N, D] grouped by
    ``bucket_idx`` [N] (int32; -1 = ignore sample)."""
    interpret = interpret or jax.default_backend() != "tpu"
    n, d = features.shape
    tile_n = min(256, _round_up(max(n, 8), 8))
    tile_d = min(512, _round_up(d, 128))
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, tile_d)
    b_pad = _round_up(num_buckets, 8)

    f = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(features.astype(jnp.float32))
    e = jnp.full((n_pad, 1), -1, jnp.int32).at[:n, 0].set(bucket_idx.astype(jnp.int32))

    grid = (d_pad // tile_d, n_pad // tile_n)
    counts, sums, sumsq = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_d), lambda i_d, i_t: (i_t, i_d), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i_d, i_t: (i_t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, 1), lambda i_d, i_t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, tile_d), lambda i_d, i_t: (0, i_d), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, tile_d), lambda i_d, i_t: (0, i_d), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
        ),
        interpret=interpret,
    )(f, e)
    return counts[:num_buckets, 0], sums[:num_buckets, :d], sumsq[:num_buckets, :d]


def _split3(x):
    """Split f32 ``x`` into three bf16 terms with x == h1 + h2 + h3 to full
    f32 accuracy (each term captures the next ~8 mantissa bits)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _moments_v2_kernel(f_ref, e_ref, counts_ref, sums_ref, sumsq_ref):
    i_t = pl.program_id(1)  # batch-tile index (fastest-varying → accumulate)

    f = f_ref[:].astype(jnp.float32)  # [T, TD]
    e = e_ref[:]  # [T, 1] int32; -1 marks padding

    t, td = f.shape
    b_pad = sums_ref.shape[0]
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (b_pad, t), 0)
    # 0/1 one-hot is EXACT in bf16, so only the feature operand needs the
    # 3-term mantissa split for f32-accurate products — 6 bf16 MXU passes
    # total vs ~12 for two Precision.HIGHEST f32 matmuls (which must split
    # BOTH operands), and one fused dot instead of two.
    ohT = (bucket_ids == e.reshape(1, t)).astype(jnp.bfloat16)  # [Bp, T]

    g = jnp.concatenate(_split3(f) + _split3(f * f), axis=1)  # [T, 6*TD] bf16
    out = jnp.dot(ohT, g, preferred_element_type=jnp.float32)  # [Bp, 6*TD]
    sums_t = out[:, :td] + out[:, td:2 * td] + out[:, 2 * td:3 * td]
    sumsq_t = out[:, 3 * td:4 * td] + out[:, 4 * td:5 * td] + out[:, 5 * td:]
    counts_t = jnp.sum(ohT.astype(jnp.float32), axis=1, keepdims=True)  # [Bp, 1]

    @pl.when(i_t == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    sums_ref[:] += sums_t
    sumsq_ref[:] += sumsq_t
    i_d = pl.program_id(0)

    @pl.when(i_d == 0)
    def _():
        counts_ref[:] += counts_t


@functools.partial(jax.jit, static_argnames=("num_buckets", "interpret"))
def pallas_moments_v2(features, bucket_idx, num_buckets: int, *, interpret: bool = False):
    """Same contract as :func:`pallas_moments`, computed with bf16 MXU passes
    via a 3-term mantissa split of the features (f32-accurate, ~half the MXU
    work of the HIGHEST-precision formulation)."""
    interpret = interpret or jax.default_backend() != "tpu"
    n, d = features.shape
    tile_n = min(256, _round_up(max(n, 8), 8))
    tile_d = min(512, _round_up(d, 128))
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, tile_d)
    b_pad = _round_up(num_buckets, 8)

    f = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(features.astype(jnp.float32))
    e = jnp.full((n_pad, 1), -1, jnp.int32).at[:n, 0].set(bucket_idx.astype(jnp.int32))

    grid = (d_pad // tile_d, n_pad // tile_n)
    counts, sums, sumsq = pl.pallas_call(
        _moments_v2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_d), lambda i_d, i_t: (i_t, i_d), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i_d, i_t: (i_t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, 1), lambda i_d, i_t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, tile_d), lambda i_d, i_t: (0, i_d), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, tile_d), lambda i_d, i_t: (0, i_d), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
        ),
        interpret=interpret,
    )(f, e)
    return counts[:num_buckets, 0], sums[:num_buckets, :d], sumsq[:num_buckets, :d]


# ---------------------------------------------------------------------------
# fused gather + calibrate
# ---------------------------------------------------------------------------


def _calibrate_kernel(clip_min, clip_max, positive_mode,
                      x_ref, e_ref, ok_ref, m1_ref, v1_ref, m2_ref, v2_ref,
                      v1sum_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # [T, TD]
    e = e_ref[:]  # [T, 1]
    ok = ok_ref[:]  # [T, 1] int32

    t = x.shape[0]
    b_pad = m1_ref.shape[0]
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (t, b_pad), 1)
    oh = (bucket_ids == e).astype(jnp.float32)  # [T, Bp]

    dot = lambda s_ref: jnp.dot(oh, s_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    m1, v1, m2, v2 = dot(m1_ref), dot(v1_ref), dot(m2_ref), dot(v2_ref)
    v1sum = jnp.dot(oh, v1sum_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [T, 1]

    if positive_mode:
        col_ok = (v1 > 0.0) & (v2 >= 0.0)
    else:
        col_ok = v1 != 0.0
    safe_v1 = jnp.where(col_ok, v1, 1.0)
    factor = jnp.clip(v2 / safe_v1, clip_min, clip_max)
    calibrated = (x - m1) * jnp.sqrt(factor) + m2

    mask = col_ok & (v1sum >= 1e-10) & (ok > 0)
    out_ref[:] = jnp.where(mask, calibrated, x)


def _calibrate_bwd_kernel(clip_min, clip_max, positive_mode,
                          g_ref, e_ref, ok_ref, v1_ref, v2_ref, v1sum_ref, out_ref):
    g = g_ref[:].astype(jnp.float32)
    e = e_ref[:]
    ok = ok_ref[:]

    t = g.shape[0]
    b_pad = v1_ref.shape[0]
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (t, b_pad), 1)
    oh = (bucket_ids == e).astype(jnp.float32)

    v1 = jnp.dot(oh, v1_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    v2 = jnp.dot(oh, v2_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    v1sum = jnp.dot(oh, v1sum_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    if positive_mode:
        col_ok = (v1 > 0.0) & (v2 >= 0.0)
    else:
        col_ok = v1 != 0.0
    safe_v1 = jnp.where(col_ok, v1, 1.0)
    factor = jnp.clip(v2 / safe_v1, clip_min, clip_max)
    mask = col_ok & (v1sum >= 1e-10) & (ok > 0)
    out_ref[:] = g * jnp.where(mask, jnp.sqrt(factor), 1.0)


def _calibrate_call(kernel, clip_min, clip_max, positive, num_stats, x, e, ok, stats,
                    interpret):
    interpret = interpret or jax.default_backend() != "tpu"
    n, d = x.shape
    b = stats[0].shape[0]
    tile_n = min(256, _round_up(max(n, 8), 8))
    tile_d = min(512, _round_up(d, 128))
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, tile_d)
    b_pad = _round_up(b, 8)

    xp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(x.astype(jnp.float32))
    ep = jnp.full((n_pad, 1), -1, jnp.int32).at[:n, 0].set(e.astype(jnp.int32))
    okp = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(ok.astype(jnp.int32))

    stats_p = []
    for s in stats[:num_stats]:
        if s.ndim == 1:  # v1 row-sum vector [B] → [Bp, 1]
            stats_p.append(jnp.zeros((b_pad, 1), jnp.float32).at[:b, 0].set(s.astype(jnp.float32)))
        else:
            stats_p.append(jnp.zeros((b_pad, d_pad), jnp.float32).at[:b, :d].set(s.astype(jnp.float32)))

    grid = (d_pad // tile_d, n_pad // tile_n)
    stat_specs = []
    for s in stats_p:
        if s.shape[1] == 1:
            stat_specs.append(pl.BlockSpec((b_pad, 1), lambda i_d, i_t: (0, 0), memory_space=pltpu.VMEM))
        else:
            stat_specs.append(pl.BlockSpec((b_pad, tile_d), lambda i_d, i_t: (0, i_d), memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(kernel, clip_min, clip_max, positive),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_d), lambda i_d, i_t: (i_t, i_d), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i_d, i_t: (i_t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i_d, i_t: (i_t, 0), memory_space=pltpu.VMEM),
            *stat_specs,
        ],
        out_specs=pl.BlockSpec((tile_n, tile_d), lambda i_d, i_t: (i_t, i_d), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(xp, ep, okp, *stats_p)
    return out[:n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def pallas_calibrate(x, e, ok, stats4, v1sum, clip_min, clip_max, mode, interpret=False):
    """Fused FDS calibration: ``x`` [N, D] float, ``e`` [N] bucket idx (-1 =
    skip), ``ok`` [N] bool gate, ``stats4`` = (m1, v1, m2, v2) each [B, D],
    ``v1sum`` [B] per-bucket v1 row sums (guard). Returns calibrated [N, D]."""
    m1, v1, m2, v2 = stats4
    return _calibrate_call(
        _calibrate_kernel, clip_min, clip_max, mode == "positive", 5,
        x, e, ok, (m1, v1, m2, v2, v1sum), interpret,
    )


def _pallas_calibrate_fwd(x, e, ok, stats4, v1sum, clip_min, clip_max, mode, interpret):
    out = pallas_calibrate(x, e, ok, stats4, v1sum, clip_min, clip_max, mode, interpret)
    return out, (e, ok, stats4[1], stats4[3], v1sum)


def _zero_cotangent(a):
    """float0 for integer/bool primals, zeros otherwise (custom_vjp contract)."""
    if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
        return np.zeros(a.shape, jax.dtypes.float0)
    return jnp.zeros_like(a)


def _pallas_calibrate_bwd(clip_min, clip_max, mode, interpret, residuals, g):
    e, ok, v1, v2, v1sum = residuals
    dx = _calibrate_call(
        _calibrate_bwd_kernel, clip_min, clip_max, mode == "positive", 3,
        g, e, ok, (v1, v2, v1sum), interpret,
    )
    zeros = jnp.zeros_like
    return (dx, _zero_cotangent(e), _zero_cotangent(ok),
            (zeros(v1), zeros(v1), zeros(v1), zeros(v1)), zeros(v1sum))


pallas_calibrate.defvjp(_pallas_calibrate_fwd, _pallas_calibrate_bwd)
