"""Model shape/semantics tests for the Flax backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.models.resnet import (
    RegressionHead,
    ResNetBackbone,
    resnet18_backbone,
    resnet50_backbone,
)


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_resnet50_shapes_and_params():
    model = resnet50_backbone(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    enc = model.apply(variables, x, train=False)
    assert enc.shape == (2, 2048)
    assert enc.dtype == jnp.float32
    # torchvision resnet50 backbone (no fc): 25.557M total incl fc(1000);
    # conv+bn params without fc = 23,508,032
    n = _param_count(variables["params"])
    assert n == 23_508_032, n


def test_resnet18_shapes():
    model = resnet18_backbone(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    enc = model.apply(variables, x, train=False)
    assert enc.shape == (2, 512)


def test_batchnorm_mutates_in_train_mode(rng):
    model = resnet18_backbone(dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_head_dropout_determinism(rng):
    head = RegressionHead(dropout=0.5)
    enc = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    params = head.init(jax.random.key(0), enc)["params"]
    # eval mode: deterministic, no rng needed
    a = head.apply({"params": params}, enc, train=False)
    b = head.apply({"params": params}, enc, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train mode: dropout active
    c = head.apply({"params": params}, enc, train=True, rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_bf16_compute_f32_params():
    model = resnet18_backbone(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    for p in jax.tree.leaves(variables["params"]):
        assert p.dtype == jnp.float32
    enc = model.apply(variables, x, train=False)
    assert enc.dtype == jnp.float32  # encoding upcast at the boundary


def _loss_grads_stats(remat, x, targets):
    model = ResNetBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32, remat=remat)
    variables = model.init(jax.random.key(0), x[:1], train=False)

    def loss_fn(params):
        enc, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean((jnp.sum(enc, axis=-1) - targets) ** 2), updates["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    return loss, grads, stats


@pytest.mark.parametrize("remat", ["conv_outs", "block"])
def test_remat_matches_no_remat(rng, remat):
    """Selective remat is a scheduling choice, not a math change: same param
    tree (explicit Bottleneck_i names), same loss/grads/BN stats up to f32
    recompute-order noise (the backward pass re-derives BN/ReLU activations,
    so reductions reassociate)."""
    x = jnp.asarray(rng.normal(size=(4, 24, 24, 3)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    base = _loss_grads_stats(None, x, targets)
    other = _loss_grads_stats(remat, x, targets)
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(other[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(base[1]), jax.tree.leaves(other[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)
    for a, b in zip(jax.tree.leaves(base[2]), jax.tree.leaves(other[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
