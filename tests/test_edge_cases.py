"""Misc edge cases: smoothing pad bounds, optimizer validation, mesh errors."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.ops.smoothing import reflect_pad_1d, smooth_bucket_stats
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import TrainerConfig


def test_reflect_pad_requires_length():
    with pytest.raises(ValueError):
        reflect_pad_1d(jnp.ones((2, 3)), pad=2)
    # pad == 0 is identity
    x = jnp.arange(6.0).reshape(3, 2)
    np.testing.assert_array_equal(np.asarray(reflect_pad_1d(x, 0)), np.asarray(x))


def test_smooth_identity_kernel():
    x = jnp.arange(12.0).reshape(6, 2)
    out = smooth_bucket_stats(x, np.array([1.0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_trainer_config_bad_optimizer():
    from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
    from imbalanced_regression_tpu.train import Trainer

    with pytest.raises(ValueError, match="optimizer"):
        Trainer(ResNetBasicBackbone(stage_sizes=(1,), width=8), RegressionHead(),
                TrainerConfig(optimizer="lamb"), mesh=create_mesh(1))


def test_create_mesh_too_many_devices():
    with pytest.raises(ValueError, match="devices"):
        create_mesh(10_000)


def test_huber_loss_beta_binding():
    cfg = TrainerConfig(loss="huber", huber_beta=0.3)
    fn = cfg.loss_fn()
    p = jnp.asarray([[1.0]])
    t = jnp.asarray([[0.0]])
    # |err| = 1 > beta → linear branch: 1 - 0.5*0.3
    np.testing.assert_allclose(float(fn(p, t, None)), 1 - 0.15, rtol=1e-6)
