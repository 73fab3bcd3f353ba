"""Flax ResNet backbone + linear regression head (TPU-native).

Re-design of the reference's custom torch ResNet-50 regressor
(``imdb-wiki-dir/resnet.py:73-157``): same topology (v1.5 bottleneck with the
stride on the 3x3 conv, 7x7/2 stem, [3,4,6,3] blocks, global average pool →
2048-d encoding → Linear(2048, 1)), same init scheme (He-normal fan-out convs,
BN γ=1 β=0), but laid out for the TPU:

- NHWC layout end to end (XLA TPU's preferred conv layout);
- bf16 activations/conv compute with f32 parameters and f32 batch-norm
  statistics (``dtype=jnp.bfloat16, param_dtype=jnp.float32``);
- the FDS hook point is the boundary between :class:`ResNetBackbone` (returns
  the pooled encoding, always in f32) and :class:`RegressionHead` — the
  trainer calibrates encodings between the two, exactly where the reference
  calls ``self.FDS.smooth`` before ``self.linear``
  (``imdb-wiki-dir/resnet.py:140-148``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# He-normal with fan_out: matches the reference init
# `m.weight.data.normal_(0, sqrt(2 / (k*k*out_channels)))` (resnet.py:103-106)
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _remat_policy(mode: str):
    """Residual-saving policy for per-block rematerialization.

    ``conv_outs`` keeps only the (named) conv outputs across the fwd/bwd
    boundary and recomputes the elementwise BN/ReLU chain in the backward
    pass — the step is HBM-bandwidth-bound (RESULTS.md trace attribution),
    so trading a few VPU FLOPs for not writing+re-reading the post-BN/ReLU
    activations moves the roofline. ``block`` is classic full-block remat
    (recompute everything; measured slower in round 1 — kept for A/B)."""
    if mode == "conv_outs":
        return jax.checkpoint_policies.save_only_these_names("conv_out")
    if mode == "block":
        return jax.checkpoint_policies.nothing_saveable
    raise ValueError(f"unknown remat mode {mode!r}; use 'conv_outs' or 'block'")


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1(x4) bottleneck, pre-activation-free (v1.5)."""

    features: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    tag_conv_outs: bool = False  # name conv outputs for the remat policy

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        tag = (lambda y: checkpoint_name(y, "conv_out")) if self.tag_conv_outs else (lambda y: y)
        out_features = self.features * self.expansion

        residual = x
        y = tag(conv(self.features, (1, 1))(x))
        y = norm()(y)
        y = nn.relu(y)
        y = tag(conv(self.features, (3, 3), strides=(self.stride, self.stride), padding=1)(y))
        y = norm()(y)
        y = nn.relu(y)
        y = tag(conv(out_features, (1, 1))(y))
        y = norm()(y)

        if residual.shape[-1] != out_features or self.stride != 1:
            residual = tag(conv(out_features, (1, 1), strides=(self.stride, self.stride))(x))
            residual = norm()(residual)

        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Stem + residual stages + global average pool → [N, 2048] encoding.

    With ``return_features=True`` the per-stage feature maps are returned
    instead (the NYUD2 ``E_resnet`` encoder, ``nyud2-dir/models/modules.py:33-59``)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    return_features: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: str | None = None  # None | 'conv_outs' | 'block' (see _remat_policy)

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)

        block_cls = Bottleneck
        if self.remat:
            # argnums: 0 = module instance, 1 = x, 2 = train (static bool)
            block_cls = nn.checkpoint(Bottleneck, policy=_remat_policy(self.remat),
                                      static_argnums=(2,))

        x = x.astype(self.dtype)
        x = conv(self.width, (7, 7), strides=(2, 2), padding=3)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = []
        idx = 0
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                # explicit name: keep the un-remat'd auto-naming ("Bottleneck_i")
                # so params/checkpoints and init RNG streams are identical
                # whether or not remat is enabled
                x = block_cls(self.width * 2**stage, stride=stride,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              tag_conv_outs=self.remat == "conv_outs",
                              name=f"Bottleneck_{idx}")(x, train)
                idx += 1
            features.append(x)

        if self.return_features:
            return tuple(features)
        # global average pool == the reference's AvgPool2d(7) at 224x224 input
        encoding = jnp.mean(x, axis=(1, 2))
        return encoding.astype(jnp.float32)


class RegressionHead(nn.Module):
    """Final linear regressor; optional dropout like the reference's
    ``--dropout`` path (``imdb-wiki-dir/resnet.py:146-148``)."""

    out_dim: int = 1
    dropout: float | None = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoding, train: bool = False):
        if self.dropout:
            encoding = nn.Dropout(rate=self.dropout, deterministic=not train)(encoding)
        return nn.Dense(self.out_dim, dtype=jnp.float32, param_dtype=self.param_dtype)(encoding)


def resnet50_backbone(dtype=jnp.bfloat16, remat: str | None = None) -> ResNetBackbone:
    return ResNetBackbone(stage_sizes=(3, 4, 6, 3), dtype=dtype, remat=remat)


def resnet101_backbone(dtype=jnp.bfloat16, remat: str | None = None) -> ResNetBackbone:
    """Deep bottleneck variant (reference ``nyud2-dir/models/resnet.py:186-194``)."""
    return ResNetBackbone(stage_sizes=(3, 4, 23, 3), dtype=dtype, remat=remat)


def resnet152_backbone(dtype=jnp.bfloat16, remat: str | None = None) -> ResNetBackbone:
    """Deepest bottleneck variant (reference ``nyud2-dir/models/resnet.py:197-205``)."""
    return ResNetBackbone(stage_sizes=(3, 8, 36, 3), dtype=dtype, remat=remat)


def resnet18_backbone(dtype=jnp.bfloat16, remat: str | None = None) -> "ResNetBasicBackbone":
    return ResNetBasicBackbone(stage_sizes=(2, 2, 2, 2), dtype=dtype, remat=remat)


def resnet34_backbone(dtype=jnp.bfloat16, remat: str | None = None) -> "ResNetBasicBackbone":
    """BasicBlock variant at ResNet-50 depth (``nyud2-dir/models/resnet.py:164-172``)."""
    return ResNetBasicBackbone(stage_sizes=(3, 4, 6, 3), dtype=dtype, remat=remat)


class BasicBlock(nn.Module):
    """3x3 → 3x3 basic residual block (ResNet-18/34 family,
    reference ``imdb-wiki-dir/resnet.py:14-38``)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    tag_conv_outs: bool = False  # name conv outputs for the remat policy

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        tag = (lambda y: checkpoint_name(y, "conv_out")) if self.tag_conv_outs else (lambda y: y)

        residual = x
        y = tag(conv(self.features, (3, 3), strides=(self.stride, self.stride), padding=1)(x))
        y = norm()(y)
        y = nn.relu(y)
        y = tag(conv(self.features, (3, 3), padding=1)(y))
        y = norm()(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = tag(conv(self.features, (1, 1), strides=(self.stride, self.stride))(x))
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetBasicBackbone(nn.Module):
    """BasicBlock variant (ResNet-18/34) — small-model option for tests."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: str | None = None  # None | 'conv_outs' | 'block' (see _remat_policy)

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)

        block_cls = BasicBlock
        if self.remat:
            block_cls = nn.checkpoint(BasicBlock, policy=_remat_policy(self.remat),
                                      static_argnums=(2,))

        x = x.astype(self.dtype)
        x = conv(self.width, (7, 7), strides=(2, 2), padding=3)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        idx = 0
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = block_cls(self.width * 2**stage, stride=stride,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              tag_conv_outs=self.remat == "conv_outs",
                              name=f"BasicBlock_{idx}")(x, train)
                idx += 1
        encoding = jnp.mean(x, axis=(1, 2))
        return encoding.astype(jnp.float32)
