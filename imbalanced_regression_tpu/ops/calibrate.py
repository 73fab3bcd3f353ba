"""Feature mean/variance calibration — the core FDS transform.

``out = (x - m1) * sqrt(clip(v2 / v1, lo, hi)) + m2`` with zero/negative
variance guards. Functional (the reference mutates features in place,
``imdb-wiki-dir/fds.py:120-143``; here the calibrated array is returned).

Two guard modes exist in the reference and both are preserved:
- ``"nonzero"``  (age suites, ``imdb-wiki-dir/utils.py:97-107``): columns with
  ``v1 == 0`` pass through unchanged.
- ``"positive"`` (STS-B ``sts-b-dir/util.py:63-73`` and NYUD2
  ``nyud2-dir/util.py:151-162``): columns need ``v1 > 0`` and ``v2 >= 0``.

In both modes an all-(near-)zero ``v1`` row (``sum(v1) < 1e-10``) disables
calibration entirely for the samples it serves.

This file provides the *row-broadcast* form used in golden tests plus the
*gathered* per-sample form used inside the jit train step, where ``m1/v1/m2/v2``
have already been gathered per sample ([N, D] each).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_calibrate(x, m1, v1, m2, v2, clip_min, clip_max, mode):
    if mode == "nonzero":
        col_ok = v1 != 0.0
    elif mode == "positive":
        col_ok = (v1 > 0.0) & (v2 >= 0.0)
    else:
        raise ValueError(f"mode must be 'nonzero' or 'positive', got {mode!r}")
    safe_v1 = jnp.where(col_ok, v1, 1.0)
    factor = jnp.clip(v2 / safe_v1, clip_min, clip_max)
    out = (x - m1) * jnp.sqrt(factor) + m2
    return jnp.where(col_ok, out, x)


def calibrate_mean_var(
    matrix,
    m1,
    v1,
    m2,
    v2,
    clip_min: float = 0.1,
    clip_max: float = 10.0,
    mode: str = "nonzero",
):
    """Calibrate a [N, D] feature matrix with a single bucket's statistics.

    ``m1/v1`` are the bucket's running mean/var, ``m2/v2`` the smoothed
    targets, all [D]. Matches the reference ``calibrate_mean_var`` (clip range
    and guard mode are per-task config; defaults are the age-suite values).
    """
    out = _masked_calibrate(matrix, m1, v1, m2, v2, clip_min, clip_max, mode)
    row_ok = jnp.sum(v1) >= 1e-10
    return jnp.where(row_ok, out, matrix)


def calibrate_gathered(
    x,
    m1,
    v1,
    m2,
    v2,
    sample_ok,
    clip_min: float,
    clip_max: float,
    mode: str,
):
    """Per-sample calibration with pre-gathered bucket rows.

    ``x`` is [N, D]; ``m1/v1/m2/v2`` are [N, D] rows gathered by each sample's
    bucket; ``sample_ok`` is a [N] bool mask of samples to calibrate (edge-
    bucket gating for the age grouping; all-True otherwise). Samples whose
    gathered ``v1`` row sums below 1e-10 are left unchanged, matching the
    per-bucket early return in the reference.
    """
    out = _masked_calibrate(x, m1, v1, m2, v2, clip_min, clip_max, mode)
    row_ok = jnp.sum(v1, axis=-1, keepdims=True) >= 1e-10
    ok = row_ok & sample_ok[:, None]
    return jnp.where(ok, out, x)
