"""NYUD2 depth encoder-decoder (TPU-native, NHWC).

Re-design of the reference architecture (``nyud2-dir/models/modules.py:6-174``,
``net.py:5-22``): ResNet-50 encoder exposing all four stage outputs → decoder
``D`` (1x1 conv halving channels + four UpProjection blocks, each doubling
resolution toward 2x the stage-1 map) → multi-scale fusion ``MFF`` (each
stage upsampled to decoder resolution with 16 output channels, concatenated,
fused by a 5x5 conv) → regression trunk ``R`` (two 5x5 conv+BN+ReLU layers on
the 128-channel concatenation). FDS calibrates the 128-channel trunk feature
map per pixel between the trunk and the final 5x5 conv head, exactly the
reference's hook (``modules.py:163-169``).

``F.upsample(mode='bilinear')`` (align_corners=False) maps to
``jax.image.resize('bilinear')`` — both use half-pixel centers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imbalanced_regression_tpu.models.resnet import ResNetBackbone, conv_kernel_init


def _resize_bilinear(x, h, w):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="bilinear")


class UpProjection(nn.Module):
    """Bilinear upsample + two-branch conv block (``modules.py:6-31``)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, size_hw, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        x = _resize_bilinear(x, *size_hw)
        branch1 = nn.relu(norm()(conv(self.features, (5, 5), padding=2)(x)))
        branch1 = norm()(conv(self.features, (3, 3), padding=1)(branch1))
        branch2 = norm()(conv(self.features, (5, 5), padding=2)(x))
        return nn.relu(branch1 + branch2)


class DepthEncoderDecoder(nn.Module):
    """E → D → MFF → R-trunk; returns the 128-channel per-pixel feature map
    (the FDS hook point). The final 5x5 conv lives in :class:`DepthHead`."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_features: int = 2048
    mff_features: int = 16
    # MXU-tiling experiment knob (RESULTS.md dense-path roofline): the
    # reference decoder narrows to 64 channels at full decoder resolution and
    # MFF works at 16 — both tile the 128-wide MXU lane dimension poorly. A
    # nonzero floor pads every decoder/UpProjection stage to at least this
    # many channels (0 = exact reference widths, modules.py:61-94). This is a
    # throughput experiment, NOT a parity configuration: it changes parameter
    # shapes and the FDS feature dim (see depth_feature_dim).
    decoder_min_features: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_kernel_init,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        up = partial(UpProjection, dtype=self.dtype, param_dtype=self.param_dtype)

        blocks = ResNetBackbone(
            stage_sizes=self.stage_sizes, width=self.width, return_features=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
        )(x, train)
        b1, b2, b3, b4 = blocks

        # decoder D (modules.py:61-94); optional channel floor (see
        # decoder_min_features above)
        w = lambda n: max(n, self.decoder_min_features)  # noqa: E731
        nf = b4.shape[-1] // 2
        d = nn.relu(norm()(conv(w(nf), (1, 1))(b4)))
        d = up(w(nf // 2))(d, b3.shape[1:3], train)
        d = up(w(nf // 4))(d, b2.shape[1:3], train)
        d = up(w(nf // 8))(d, b1.shape[1:3], train)
        out_hw = (b1.shape[1] * 2, b1.shape[2] * 2)
        d = up(w(nf // 16))(d, out_hw, train)

        # multi-scale fusion MFF (modules.py:96-128)
        ms = [up(self.mff_features)(b, out_hw, train) for b in (b1, b2, b3, b4)]
        m = jnp.concatenate(ms, axis=-1)
        m = nn.relu(norm()(conv(m.shape[-1], (5, 5), padding=2)(m)))

        # R trunk (modules.py:131-162): two 5x5 conv+BN+ReLU on [D; MFF]
        r = jnp.concatenate([d, m], axis=-1)
        nr = r.shape[-1]
        r = nn.relu(norm()(conv(nr, (5, 5), padding=2)(r)))
        r = nn.relu(norm()(conv(nr, (5, 5), padding=2)(r)))
        return r.astype(jnp.float32)  # [N, H/2, W/2, 128] FDS hook point


class DepthHead(nn.Module):
    """Final 5x5 conv → 1 channel (``modules.py:145,169``)."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        return nn.Conv(1, (5, 5), padding=2, use_bias=True,
                       kernel_init=conv_kernel_init, dtype=jnp.float32,
                       param_dtype=self.param_dtype)(features)


def depth_feature_dim(num_features: int = 2048, mff_features: int = 16,
                      decoder_min_features: int = 0) -> int:
    """64 + block4_channels // 32 == 128 for ResNet-50 (modules.py:136).

    With the experiment knobs the FDS hook width becomes
    4*mff + max(num_features//32, decoder_min_features)."""
    return 4 * mff_features + max(num_features // 32, decoder_min_features)
