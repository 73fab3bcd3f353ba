"""Model shape/semantics tests for the Flax backbones."""

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.models.resnet import (
    RegressionHead,
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
