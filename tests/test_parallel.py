"""Data-parallel correctness on the 8-device virtual CPU mesh (SURVEY.md
§4.3): DP run equals single-device run at the same global batch, and
psum-reduced FDS moments match the gathered computation."""

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data import batch_iterator, synthetic_age_dataset
from imbalanced_regression_tpu.fds import FDSConfig, fds_bucket_moments
from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
from imbalanced_regression_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch
from imbalanced_regression_tpu.train import Trainer, TrainerConfig


def tiny_backbone():
    return ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _run(n_devices, dataset, epochs=2):
    trainer = Trainer(
        tiny_backbone(), RegressionHead(), TrainerConfig(loss="mse", lr=1e-3),
        fds_config=FDSConfig.for_age(feature_dim=16, bucket_num=121),
        mesh=create_mesh(n_devices),
    )
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    losses = []
    for epoch in range(epochs):
        rng = np.random.default_rng(7)  # same batch order in both runs
        state, loss = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), epoch)
        state = trainer.fds_epoch_pass(state, batch_iterator(dataset, 32, rng=np.random.default_rng(7)), epoch)
        losses.append(loss)
    return state, losses


def test_dp_matches_single_device():
    dataset = synthetic_age_dataset(n=64, img_size=16, seed=3)
    state1, losses1 = _run(1, dataset)
    state8, losses8 = _run(8, dataset)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state1.fds.running_mean), np.asarray(state8.fds.running_mean),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state1.fds.num_samples_tracked), np.asarray(state8.fds.num_samples_tracked),
    )


def test_sharded_moments_match_gathered(rng):
    """FDS bucket moments under GSPMD sharding == gathered single-device."""
    cfg = FDSConfig(feature_dim=32, bucket_num=20, grouping="age")
    feats = rng.normal(size=(64, 32)).astype(np.float32)
    labels = rng.integers(0, 24, size=64).astype(np.float32)

    gathered = fds_bucket_moments(cfg, feats, labels)

    mesh = create_mesh(8)
    sharding = batch_sharding(mesh)
    f = jax.device_put(feats, sharding)
    l = jax.device_put(labels, sharding)
    sharded = jax.jit(lambda f, l: fds_bucket_moments(cfg, f, l))(f, l)

    np.testing.assert_allclose(np.asarray(gathered.count), np.asarray(sharded.count))
    np.testing.assert_allclose(np.asarray(gathered.total), np.asarray(sharded.total), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gathered.total_sq), np.asarray(sharded.total_sq), rtol=1e-5, atol=1e-5)
    assert bool(gathered.has_lo) == bool(sharded.has_lo)


def test_shard_batch_places_on_mesh():
    mesh = create_mesh(8)
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.num_devices == 8


def test_dense_depth_moments_sharded(rng):
    """NYUD2-style per-pixel FDS moments: sharded batch == gathered."""
    cfg = FDSConfig.for_depth(feature_dim=8, bucket_num=30, bucket_start=4)
    feats = rng.normal(size=(16, 6, 6, 8)).astype(np.float32)  # NHWC maps
    depth = rng.uniform(0, 3.2, size=(16, 6, 6, 1)).astype(np.float32)

    from imbalanced_regression_tpu.fds import fds_bucket_moments

    gathered = fds_bucket_moments(cfg, feats, depth)

    mesh = create_mesh(8)
    sharding = batch_sharding(mesh)
    f = jax.device_put(feats, sharding)
    d = jax.device_put(depth, sharding)
    sharded = jax.jit(lambda f, d: fds_bucket_moments(cfg, f, d))(f, d)
    np.testing.assert_allclose(np.asarray(gathered.count), np.asarray(sharded.count))
    np.testing.assert_allclose(np.asarray(gathered.total), np.asarray(sharded.total),
                               rtol=1e-5, atol=1e-5)


def test_indexed_step_dp_equals_host_batch_dp():
    """Device-resident index batching under the 8-device mesh: identical to
    shipping the gathered host batch (the with_sharding_constraint inside
    the indexed jit must land the gathered rows on the data axis)."""
    dataset = synthetic_age_dataset(n=64, img_size=12, seed=2)
    fds = FDSConfig.for_age(feature_dim=16, bucket_num=121, start_update=0,
                            start_smooth=0)
    idx = np.asarray([3, 60, 11, 45, 27, 9, 54, 36, 1, 18, 63, 30, 7, 42, 21, 50],
                     np.int32)
    batch = {k: v[idx] for k, v in dataset.items()}

    def make():
        return Trainer(tiny_backbone(), RegressionHead(),
                       TrainerConfig(loss="mse", lr=1e-3),
                       fds_config=fds, mesh=create_mesh(8))

    t1 = make()
    s1 = t1.init_state(jax.random.key(0), dataset["input"][:2])
    s1, loss1, pred1 = t1.train_step(s1, batch, epoch=1)
    s1 = t1.fds_epoch_pass(s1, [batch], epoch=1)

    t2 = make()
    s2 = t2.init_state(jax.random.key(0), dataset["input"][:2])
    t2.bind_device_data(dataset)
    s2, loss2, pred2 = t2.train_step_indexed(s2, idx, epoch=1)
    s2 = t2.fds_epoch_pass_indexed(s2, [idx], epoch=1)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1.fds.running_mean),
                               np.asarray(s2.fds.running_mean), rtol=1e-6)
