"""Golden tests for the weighted losses against torch oracles implementing
the reference formulas (imdb-wiki-dir/loss.py:5-48)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imbalanced_regression_tpu.ops import (
    weighted_focal_l1_loss,
    weighted_focal_mse_loss,
    weighted_huber_loss,
    weighted_l1_loss,
    weighted_mse_loss,
)


def _torch_focal(inputs, targets, weights, kind, activate, beta, gamma):
    if kind == "mse":
        loss = (inputs - targets) ** 2
    else:
        loss = F.l1_loss(inputs, targets, reduction="none")
    scale = (torch.tanh(beta * torch.abs(inputs - targets))) ** gamma if activate == "tanh" else \
        (2 * torch.sigmoid(beta * torch.abs(inputs - targets)) - 1) ** gamma
    loss = loss * scale
    if weights is not None:
        loss = loss * weights.expand_as(loss)
    return torch.mean(loss)


@pytest.fixture
def data(rng):
    inputs = rng.normal(size=(64, 1)).astype(np.float32) * 10
    targets = rng.normal(size=(64, 1)).astype(np.float32) * 10
    weights = rng.uniform(0.1, 3.0, size=(64, 1)).astype(np.float32)
    return inputs, targets, weights


@pytest.mark.parametrize("with_weights", [True, False])
def test_mse_l1(data, with_weights):
    inputs, targets, weights = data
    w = weights if with_weights else None
    tw = torch.tensor(weights) if with_weights else None
    ti, tt = torch.tensor(inputs), torch.tensor(targets)

    want_mse = (ti - tt) ** 2
    want_l1 = F.l1_loss(ti, tt, reduction="none")
    if tw is not None:
        want_mse, want_l1 = want_mse * tw, want_l1 * tw
    np.testing.assert_allclose(weighted_mse_loss(inputs, targets, w), want_mse.mean().item(), rtol=1e-5)
    np.testing.assert_allclose(weighted_l1_loss(inputs, targets, w), want_l1.mean().item(), rtol=1e-5)


@pytest.mark.parametrize("activate", ["sigmoid", "tanh"])
@pytest.mark.parametrize("kind", ["mse", "l1"])
def test_focal(data, activate, kind):
    inputs, targets, weights = data
    fn = weighted_focal_mse_loss if kind == "mse" else weighted_focal_l1_loss
    got = fn(inputs, targets, weights, activate=activate, beta=0.2, gamma=1.0)
    want = _torch_focal(torch.tensor(inputs), torch.tensor(targets), torch.tensor(weights),
                        kind, activate, 0.2, 1.0)
    np.testing.assert_allclose(got, want.item(), rtol=1e-5)


@pytest.mark.parametrize("beta", [1.0, 0.3])
def test_huber(data, beta):
    inputs, targets, weights = data
    ti, tt, tw = torch.tensor(inputs), torch.tensor(targets), torch.tensor(weights)
    l1 = torch.abs(ti - tt)
    want = torch.where(l1 < beta, 0.5 * l1**2 / beta, l1 - 0.5 * beta) * tw
    got = weighted_huber_loss(inputs, targets, weights, beta=beta)
    np.testing.assert_allclose(got, want.mean().item(), rtol=1e-5)


def test_weight_broadcast():
    # weights [N,1] must broadcast over a [N,K] loss like torch expand_as
    inputs = jnp.ones((4, 3)) * 2.0
    targets = jnp.zeros((4, 3))
    weights = jnp.array([[1.0], [2.0], [3.0], [4.0]])
    got = weighted_mse_loss(inputs, targets, weights)
    np.testing.assert_allclose(got, 4.0 * 2.5, rtol=1e-6)


def test_losses_differentiable():
    import jax

    g = jax.grad(lambda p: weighted_huber_loss(p, jnp.zeros((8, 1)), jnp.ones((8, 1))))(
        jnp.ones((8, 1)) * 3.0
    )
    assert np.all(np.isfinite(np.asarray(g)))
