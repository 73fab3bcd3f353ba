"""FDS (Feature Distribution Smoothing), TPU-native.

The reference implements FDS as a stateful ``nn.Module`` with registered
buffers and per-unique-label Python loops over GPU tensors
(``imdb-wiki-dir/fds.py:14-144``, ``sts-b-dir/fds.py``,
``nyud2-dir/models/fds.py``). Here it is a functional state machine:

- :class:`FDSState` is a pytree of running statistics (checkpointable,
  sharding-friendly, donate-able);
- all transitions are jittable pure functions built from dense segment-moment
  contractions (MXU) and gather-based calibration — no data-dependent Python
  control flow;
- moments are additive across batches and across data-parallel shards, so the
  epoch-end full-train-set stats pass streams per-batch moments instead of
  gathering every encoding to host (``imdb-wiki-dir/train.py:269-281`` gathers
  ~191k x 2048 floats to CPU; we accumulate [B, D] moments on device).

Three grouping semantics are preserved exactly (SURVEY.md §2.3-2.5):

- ``"age"``: group by raw integer-valued label; edge buckets pool
  ``labels <= bucket_start`` / ``labels >= bucket_num - 1`` but only act when
  the exact edge label is present in the update/smooth batch
  (``imdb-wiki-dir/fds.py:91-99,120-143``).
- ``"hist"`` (STS-B): labels are pre-binned on the host with float64 histogram
  edges (see :func:`ops.binning.bin_index_hist_np`); empty buckets are imputed
  sequentially from neighbors after every update (``sts-b-dir/fds.py:112-125``).
- ``"depth"`` (NYUD2): dense per-pixel labels binned in-jit by float32
  truncation ``clamp(trunc(10 * d), bucket_start, bucket_num - 1)``
  (``nyud2-dir/models/fds.py:51-53,138-139``); the reference offloads stat
  updates to CPU — on TPU everything stays on device inside the jit step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imbalanced_regression_tpu.ops.calibrate import calibrate_gathered
from imbalanced_regression_tpu.ops.kernels import get_fds_kernel_window
from imbalanced_regression_tpu.ops.moments import BucketMoments, bucket_moments, zero_moments
from imbalanced_regression_tpu.ops.smoothing import smooth_bucket_stats

GROUPINGS = ("age", "hist", "depth")


@dataclasses.dataclass(frozen=True)
class FDSConfig:
    """Static FDS configuration (constructor parity with the reference
    ``FDS(feature_dim, bucket_num, bucket_start, start_update, start_smooth,
    kernel, ks, sigma, momentum)``; the extra fields capture what the
    reference hardcodes per suite)."""

    feature_dim: int
    bucket_num: int = 100
    bucket_start: int = 0
    start_update: int = 0
    start_smooth: int = 1
    kernel: str = "gaussian"
    ks: int = 5
    sigma: float = 2.0
    momentum: float | None = 0.9
    # per-suite deltas
    grouping: str = "age"  # 'age' | 'hist' | 'depth'
    clip_min: float = 0.1
    clip_max: float = 10.0
    guard_mode: str = "nonzero"  # 'nonzero' (age) | 'positive' (sts/nyud2)
    impute_empty: bool = False  # STS-B neighbor imputation of empty buckets

    def __post_init__(self):
        if self.grouping not in GROUPINGS:
            raise ValueError(f"grouping must be one of {GROUPINGS}, got {self.grouping!r}")

    @property
    def num_buckets(self) -> int:
        return self.bucket_num - self.bucket_start

    @functools.cached_property
    def window(self) -> np.ndarray:
        return np.asarray(get_fds_kernel_window(self.kernel, self.ks, self.sigma), np.float32)

    # ---- per-suite presets -------------------------------------------------
    @classmethod
    def for_age(cls, feature_dim: int = 2048, bucket_start: int = 0, **kw) -> "FDSConfig":
        """IMDB-WIKI (bucket_start=0) / AgeDB (bucket_start=3) preset."""
        return cls(feature_dim=feature_dim, bucket_num=kw.pop("bucket_num", 100),
                   bucket_start=bucket_start, grouping="age",
                   clip_min=0.1, clip_max=10.0, guard_mode="nonzero", **kw)

    @classmethod
    def for_sts(cls, feature_dim: int = 12000, **kw) -> "FDSConfig":
        return cls(feature_dim=feature_dim, bucket_num=kw.pop("bucket_num", 50),
                   grouping="hist", clip_min=0.5, clip_max=2.0,
                   guard_mode="positive", impute_empty=True, **kw)

    @classmethod
    def for_depth(cls, feature_dim: int = 128, **kw) -> "FDSConfig":
        return cls(feature_dim=feature_dim, bucket_num=kw.pop("bucket_num", 100),
                   bucket_start=kw.pop("bucket_start", 7), grouping="depth",
                   clip_min=0.2, clip_max=5.0, guard_mode="positive", **kw)


class FDSState(struct.PyTreeNode):
    """Running FDS statistics — the functional equivalent of the reference's
    registered buffers (``imdb-wiki-dir/fds.py:28-35``). Part of the train
    state: checkpointed and restored with everything else."""

    epoch: jax.Array  # [] int32, starts at start_update
    running_mean: jax.Array  # [B, D]
    running_var: jax.Array  # [B, D]
    running_mean_last_epoch: jax.Array  # [B, D]
    running_var_last_epoch: jax.Array  # [B, D]
    smoothed_mean_last_epoch: jax.Array  # [B, D]
    smoothed_var_last_epoch: jax.Array  # [B, D]
    num_samples_tracked: jax.Array  # [B]


def fds_init(config: FDSConfig) -> FDSState:
    b, d = config.num_buckets, config.feature_dim
    # each field gets its own buffer: aliased arrays break jit donation
    zeros = lambda: jnp.zeros((b, d), jnp.float32)
    ones = lambda: jnp.ones((b, d), jnp.float32)
    return FDSState(
        epoch=jnp.asarray(config.start_update, jnp.int32),
        running_mean=zeros(),
        running_var=ones(),
        running_mean_last_epoch=zeros(),
        running_var_last_epoch=ones(),
        smoothed_mean_last_epoch=zeros(),
        smoothed_var_last_epoch=ones(),
        num_samples_tracked=jnp.zeros((b,), jnp.float32),
    )


def fds_reset(state: FDSState) -> FDSState:
    """Zero means / unit vars / zero counts, keeping the epoch counter
    (reference ``FDS.reset``, ``imdb-wiki-dir/fds.py:69-76``)."""
    return state.replace(
        running_mean=jnp.zeros_like(state.running_mean),
        running_var=jnp.ones_like(state.running_var),
        running_mean_last_epoch=jnp.zeros_like(state.running_mean_last_epoch),
        running_var_last_epoch=jnp.ones_like(state.running_var_last_epoch),
        smoothed_mean_last_epoch=jnp.zeros_like(state.smoothed_mean_last_epoch),
        smoothed_var_last_epoch=jnp.ones_like(state.smoothed_var_last_epoch),
        num_samples_tracked=jnp.zeros_like(state.num_samples_tracked),
    )


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------


def _squeeze_labels(labels) -> jax.Array:
    labels = jnp.asarray(labels)
    if labels.ndim > 1 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return labels.reshape(-1)


def _check_features(config: FDSConfig, features) -> jax.Array:
    """Flatten to [N, feature_dim], rejecting dimension mismatches up front
    (reference asserts the same, ``imdb-wiki-dir/fds.py:88``)."""
    features = jnp.asarray(features)
    if features.shape[-1] != config.feature_dim:
        raise ValueError(
            f"feature dimension {features.shape[-1]} does not match "
            f"FDSConfig.feature_dim={config.feature_dim} (features shape {features.shape})"
        )
    return features.reshape(-1, config.feature_dim)


def _bucketize(config: FDSConfig, labels, bucket_idx):
    """Return (idx [N] int32 in [0, num_buckets), is_lo [N], is_hi [N],
    in_range [N]) for the configured grouping.

    ``is_lo/is_hi`` flag samples whose label is *exactly* the edge label
    (age grouping gate); ``in_range`` flags samples eligible without a gate
    (interior labels). For 'hist'/'depth' every sample is eligible.
    """
    if config.grouping == "hist":
        if bucket_idx is None:
            raise ValueError(
                "grouping='hist' needs host-precomputed bucket_idx "
                "(ops.binning.bin_index_hist_np) for exact histogram-edge parity"
            )
        idx = jnp.asarray(bucket_idx, jnp.int32).reshape(-1) - config.bucket_start
        n = idx.shape[0]
        true = jnp.ones((n,), bool)
        return idx, true, true, true

    labels = _squeeze_labels(labels).astype(jnp.float32)
    if config.grouping == "depth":
        scaled = (labels * jnp.float32(10.0)).astype(jnp.int32)
        idx = jnp.clip(scaled, config.bucket_start, config.bucket_num - 1) - config.bucket_start
        n = idx.shape[0]
        true = jnp.ones((n,), bool)
        return idx, true, true, true

    # 'age': group by raw integer-valued label with edge pooling
    lo = jnp.float32(config.bucket_start)
    hi = jnp.float32(config.bucket_num - 1)
    trunc = labels.astype(jnp.int32)  # labels >= 0 → trunc == floor
    idx = jnp.clip(trunc - config.bucket_start, 0, config.num_buckets - 1)
    is_lo = labels == lo
    is_hi = labels == hi
    in_range = (labels > lo) & (labels < hi)
    return idx, is_lo, is_hi, in_range


def _sample_ok(config: FDSConfig, labels, is_lo, is_hi, in_range):
    """Per-sample eligibility for smoothing/stats membership.

    For the age grouping, pooled out-of-range samples only participate when
    the exact edge label appears in the batch (torch.unique gating,
    ``imdb-wiki-dir/fds.py:120-136``)."""
    if config.grouping != "age":
        return jnp.ones(is_lo.shape, bool)
    labels = _squeeze_labels(labels).astype(jnp.float32)
    lo = jnp.float32(config.bucket_start)
    hi = jnp.float32(config.bucket_num - 1)
    has_lo = jnp.any(is_lo)
    has_hi = jnp.any(is_hi)
    return in_range | ((labels <= lo) & has_lo) | ((labels >= hi) & has_hi)


# ---------------------------------------------------------------------------
# running-stats update
# ---------------------------------------------------------------------------


def fds_bucket_moments(
    config: FDSConfig, features, labels, bucket_idx=None, use_pallas: bool | None = None
) -> BucketMoments:
    """Per-bucket moments of one batch; additive across batches/shards."""
    features = _check_features(config, features)
    idx, is_lo, is_hi, _ = _bucketize(config, labels, bucket_idx)
    edge = (is_lo, is_hi) if config.grouping == "age" else None
    return bucket_moments(features, idx, config.num_buckets, edge_labels=edge,
                          use_pallas=use_pallas)


def fds_apply_moments(config: FDSConfig, state: FDSState, moments: BucketMoments, epoch) -> FDSState:
    """EMA-update running stats from aggregated moments.

    Matches ``FDS.update_running_stats`` (``imdb-wiki-dir/fds.py:84-113``):
    per-bucket count accumulation, momentum (or count-weighted) factor,
    ``factor = 0`` on the ``start_update`` epoch, edge-bucket gating for the
    age grouping, and — for STS — sequential neighbor imputation of buckets
    empty in this update (``sts-b-dir/fds.py:112-125``). The whole update is
    skipped when ``epoch < state.epoch``.
    """
    epoch = jnp.asarray(epoch, jnp.int32)
    count = moments.count  # [B]
    gate = count > 0
    if config.grouping == "age":
        b = config.num_buckets
        edge_gate = jnp.ones((b,), bool).at[0].set(moments.has_lo).at[b - 1].set(moments.has_hi)
        gate = gate & edge_gate

    mean_b, var_b = moments.mean_var()
    new_tracked = state.num_samples_tracked + jnp.where(gate, count, 0.0)

    if config.momentum is not None:
        factor = jnp.full_like(count, config.momentum)
    else:
        factor = 1.0 - count / jnp.maximum(new_tracked, 1.0)
    factor = jnp.where(epoch == config.start_update, 0.0, factor)

    gate_col = gate[:, None]
    new_mean = jnp.where(gate_col, (1.0 - factor[:, None]) * mean_b + factor[:, None] * state.running_mean,
                         state.running_mean)
    new_var = jnp.where(gate_col, (1.0 - factor[:, None]) * var_b + factor[:, None] * state.running_var,
                        state.running_var)

    if config.impute_empty:
        new_mean, new_var = _impute_empty_buckets(new_mean, new_var, count)

    do_update = epoch >= state.epoch
    pick = lambda new, old: jnp.where(do_update, new, old)
    return state.replace(
        running_mean=pick(new_mean, state.running_mean),
        running_var=pick(new_var, state.running_var),
        num_samples_tracked=pick(new_tracked, state.num_samples_tracked),
    )


def _impute_empty_buckets(mean, var, count):
    """Sequential neighbor copy/average for buckets with zero samples in this
    update. Ascending order matters: an interior bucket's left neighbor may
    itself have just been imputed (``sts-b-dir/fds.py:112-125``)."""
    b = mean.shape[0]

    def body(j, carry):
        m, v = carry
        empty = count[j] == 0
        is_first = j == 0
        is_last = j == b - 1
        left = jnp.clip(j - 1, 0, b - 1)
        right = jnp.clip(j + 1, 0, b - 1)
        # first bucket copies its right neighbor; last copies left; interior
        # averages both (current, possibly already-imputed values)
        fill_m = jnp.where(is_first, m[right],
                           jnp.where(is_last, m[left], (m[left] + m[right]) / 2.0))
        fill_v = jnp.where(is_first, v[right],
                           jnp.where(is_last, v[left], (v[left] + v[right]) / 2.0))
        m = jnp.where(empty, m.at[j].set(fill_m), m)
        v = jnp.where(empty, v.at[j].set(fill_v), v)
        return m, v

    return jax.lax.fori_loop(0, b, body, (mean, var))


def fds_update_running_stats(
    config: FDSConfig, state: FDSState, features, labels, epoch, bucket_idx=None
) -> FDSState:
    """One-call API parity with the reference ``FDS.update_running_stats``."""
    return fds_apply_moments(config, state, fds_bucket_moments(config, features, labels, bucket_idx), epoch)


def fds_update_last_epoch_stats(config: FDSConfig, state: FDSState, epoch) -> FDSState:
    """Snapshot running stats and kernel-smooth them along the bucket axis.

    Only acts when ``epoch == state.epoch + 1``, incrementing the internal
    epoch counter (``imdb-wiki-dir/fds.py:78-82``)."""
    epoch = jnp.asarray(epoch, jnp.int32)
    do = epoch == state.epoch + 1
    window = config.window
    smoothed_mean = smooth_bucket_stats(state.running_mean, window)
    smoothed_var = smooth_bucket_stats(state.running_var, window)
    pick = lambda new, old: jnp.where(do, new, old)
    return state.replace(
        epoch=pick(state.epoch + 1, state.epoch),
        running_mean_last_epoch=pick(state.running_mean, state.running_mean_last_epoch),
        running_var_last_epoch=pick(state.running_var, state.running_var_last_epoch),
        smoothed_mean_last_epoch=pick(smoothed_mean, state.smoothed_mean_last_epoch),
        smoothed_var_last_epoch=pick(smoothed_var, state.smoothed_var_last_epoch),
    )


# ---------------------------------------------------------------------------
# smoothing (per-sample feature calibration)
# ---------------------------------------------------------------------------


def fds_smooth(config: FDSConfig, state: FDSState, features, labels, epoch, bucket_idx=None,
               use_pallas: bool | None = None):
    """Calibrate features toward the smoothed bucket statistics.

    Functional equivalent of ``FDS.smooth`` (``imdb-wiki-dir/fds.py:115-144``):
    gather each sample's bucket rows from the last-epoch running and smoothed
    stats and apply the calibrate transform. Identity while
    ``epoch < start_smooth``. Accepts [N, D] features (flatten dense maps
    before calling). On TPU the gather+calibrate runs as one fused Pallas
    kernel (``ops.pallas_kernels.pallas_calibrate`` — bit-identical to the
    gather path and ~1.7x faster at NYUD2 scale on v5e); the XLA gather path
    is the reference implementation and the CPU/test fallback."""
    features = jnp.asarray(features)
    orig_dtype = features.dtype
    x = _check_features(config, features).astype(jnp.float32)

    idx, is_lo, is_hi, in_range = _bucketize(config, labels, bucket_idx)
    ok = _sample_ok(config, labels, is_lo, is_hi, in_range)

    if use_pallas is None:
        from imbalanced_regression_tpu.ops.pallas_kernels import default_use_pallas

        use_pallas = default_use_pallas()

    if use_pallas:
        from imbalanced_regression_tpu.ops.pallas_kernels import pallas_calibrate

        stats4 = (state.running_mean_last_epoch, state.running_var_last_epoch,
                  state.smoothed_mean_last_epoch, state.smoothed_var_last_epoch)
        v1sum = jnp.sum(state.running_var_last_epoch, axis=1)
        calibrated = pallas_calibrate(
            x, idx, ok, stats4, v1sum, config.clip_min, config.clip_max, config.guard_mode
        )
    else:
        m1 = state.running_mean_last_epoch[idx]
        v1 = state.running_var_last_epoch[idx]
        m2 = state.smoothed_mean_last_epoch[idx]
        v2 = state.smoothed_var_last_epoch[idx]
        calibrated = calibrate_gathered(
            x, m1, v1, m2, v2, ok, config.clip_min, config.clip_max, config.guard_mode
        )
    epoch = jnp.asarray(epoch, jnp.int32)
    out = jnp.where(epoch >= config.start_smooth, calibrated, x)
    return out.reshape(features.shape).astype(orig_dtype)


def fds_zero_moments(config: FDSConfig) -> BucketMoments:
    """Identity moments for streaming accumulation over an epoch pass."""
    return zero_moments(config.num_buckets, config.feature_dim)
