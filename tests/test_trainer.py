"""Integration tests: the unified trainer on tiny synthetic data (SURVEY.md
§4.2) — loss decreases, FDS stats move only after start_update, smoothing only
after start_smooth, RRT freezes the backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.data import batch_iterator, eval_batches, synthetic_age_dataset
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import Trainer, TrainerConfig


def tiny_backbone():
    return ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32)


@pytest.fixture(scope="module")
def dataset():
    return synthetic_age_dataset(n=128, img_size=16, seed=1)


def _make_trainer(fds_config=None, **cfg_kw):
    cfg = TrainerConfig(loss=cfg_kw.pop("loss", "mse"), lr=cfg_kw.pop("lr", 1e-3), **cfg_kw)
    return Trainer(tiny_backbone(), RegressionHead(), cfg, fds_config=fds_config,
                   mesh=create_mesh(1))


def test_loss_decreases(dataset):
    trainer = _make_trainer(lr=5e-3)
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    rng = np.random.default_rng(0)
    losses = []
    for epoch in range(4):
        state, loss = trainer.train_epoch(
            state, batch_iterator(dataset, 32, rng=rng), epoch
        )
        losses.append(loss)
    assert losses[-1] < losses[0], losses


def test_fds_lifecycle(dataset):
    fds_cfg = FDSConfig.for_age(feature_dim=16, bucket_num=121, start_update=1, start_smooth=2)
    trainer = _make_trainer(fds_config=fds_cfg)
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    rng = np.random.default_rng(0)

    # epoch 0: before start_update → stats untouched
    state, _ = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), 0)
    state = trainer.fds_epoch_pass(state, batch_iterator(dataset, 32, rng=rng), 0)
    np.testing.assert_array_equal(np.asarray(state.fds.num_samples_tracked), 0.0)

    # epoch 1 == start_update → stats populated with factor 0
    state, _ = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), 1)
    state = trainer.fds_epoch_pass(state, batch_iterator(dataset, 32, rng=rng), 1)
    assert np.asarray(state.fds.num_samples_tracked).sum() > 0
    # smoothed stats still at init (epoch counter moves on epoch 2's pass)
    np.testing.assert_array_equal(np.asarray(state.fds.smoothed_mean_last_epoch), 0.0)

    # epoch 2: smoothing active; last-epoch snapshot taken
    state, _ = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), 2)
    state = trainer.fds_epoch_pass(state, batch_iterator(dataset, 32, rng=rng), 2)
    assert np.abs(np.asarray(state.fds.smoothed_mean_last_epoch)).sum() > 0
    assert int(state.fds.epoch) == 2


def test_predict_with_padding(dataset):
    trainer = _make_trainer()
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    preds, targets = trainer.predict(state, eval_batches(dataset, 48))  # 128 % 48 != 0
    assert preds.shape[0] == 128
    assert targets.shape[0] == 128
    np.testing.assert_array_equal(targets, dataset["target"])


def test_rrt_freezes_backbone(dataset):
    trainer = _make_trainer(retrain_fc=True, lr=1e-2)
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    backbone_before = jax.tree.map(np.asarray, state.params["backbone"])
    head_before = jax.tree.map(np.asarray, state.params["head"])
    rng = np.random.default_rng(0)
    state, _ = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), 0)
    for b, a in zip(jax.tree.leaves(backbone_before), jax.tree.leaves(state.params["backbone"])):
        np.testing.assert_array_equal(b, np.asarray(a))
    assert any(
        not np.allclose(b, np.asarray(a))
        for b, a in zip(jax.tree.leaves(head_before), jax.tree.leaves(state.params["head"]))
    )


def test_loss_explosion_guard(dataset):
    trainer = _make_trainer(lr=1e10, loss="mse")
    state = trainer.init_state(jax.random.key(0), dataset["input"][:2])
    rng = np.random.default_rng(0)
    with pytest.raises(FloatingPointError):
        for epoch in range(3):
            state, _ = trainer.train_epoch(state, batch_iterator(dataset, 32, rng=rng), epoch)


def test_lr_schedule():
    cfg = TrainerConfig(lr=1e-3, schedule=(60, 80))
    trainer = Trainer(tiny_backbone(), RegressionHead(), cfg, mesh=create_mesh(1))
    assert trainer._lr_schedule(0) == pytest.approx(1e-3)
    assert trainer._lr_schedule(60) == pytest.approx(1e-4)
    assert trainer._lr_schedule(80) == pytest.approx(1e-5)


def test_indexed_step_matches_host_batch_step(dataset):
    """bind_device_data + train_step_indexed must be numerically identical
    to train_step on the equivalent host batch (the device-side gather is
    the only difference), including the FDS collect pass."""
    fds = FDSConfig.for_age(feature_dim=16, bucket_num=121, start_update=0,
                            start_smooth=0)
    idx = np.asarray([5, 1, 42, 17, 99, 63, 8, 70], np.int32)
    batch = {k: v[idx] for k, v in dataset.items()}

    t1 = _make_trainer(fds_config=fds)
    s1 = t1.init_state(jax.random.key(0), dataset["input"][:2])
    s1, loss1, pred1 = t1.train_step(s1, batch, epoch=1)
    s1 = t1.fds_epoch_pass(s1, [batch], epoch=1)

    t2 = _make_trainer(fds_config=fds)
    s2 = t2.init_state(jax.random.key(0), dataset["input"][:2])
    t2.bind_device_data(dataset)
    s2, loss2, pred2 = t2.train_step_indexed(s2, idx, epoch=1)
    s2 = t2.fds_epoch_pass_indexed(s2, [idx], epoch=1)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1.fds.running_mean),
                               np.asarray(s2.fds.running_mean), rtol=1e-6)
