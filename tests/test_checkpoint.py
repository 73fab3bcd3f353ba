"""Checkpoint round-trip incl. FDS buffers (SURVEY.md §5.4) and RRT
backbone-only loading."""

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data import batch_iterator, synthetic_age_dataset
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import Trainer, TrainerConfig
from imbalanced_regression_tpu.utils.checkpoint import (
    load_backbone_params,
    restore_checkpoint,
    save_checkpoint,
)


def _trained_state(tmp_path):
    data = synthetic_age_dataset(n=32, img_size=16, seed=5)
    trainer = Trainer(
        ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32),
        RegressionHead(),
        TrainerConfig(loss="mse", lr=1e-3),
        fds_config=FDSConfig.for_age(feature_dim=16, bucket_num=121),
        mesh=create_mesh(1),
    )
    state = trainer.init_state(jax.random.key(0), data["input"][:2])
    rng = np.random.default_rng(0)
    state, _ = trainer.train_epoch(state, batch_iterator(data, 16, rng=rng), 0)
    state = trainer.fds_epoch_pass(state, batch_iterator(data, 16, rng=rng), 0)
    return trainer, state, data


def test_checkpoint_roundtrip(tmp_path):
    trainer, state, data = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1, best_loss=3.25, is_best=True)

    fresh = trainer.init_state(jax.random.key(42), data["input"][:2])
    restored, epoch, best = restore_checkpoint(ckpt, fresh, which="latest")
    assert epoch == 1 and best == 3.25
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # FDS buffers persist (registered-buffer parity, fds.py:28-35)
    np.testing.assert_array_equal(
        np.asarray(state.fds.running_mean), np.asarray(restored.fds.running_mean)
    )
    np.testing.assert_array_equal(
        np.asarray(state.fds.num_samples_tracked), np.asarray(restored.fds.num_samples_tracked)
    )
    # best snapshot also readable
    restored_b, _, _ = restore_checkpoint(ckpt, fresh, which="best")
    np.testing.assert_array_equal(
        np.asarray(state.fds.running_mean), np.asarray(restored_b.fds.running_mean)
    )


def test_load_backbone_only(tmp_path):
    trainer, state, data = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1, best_loss=1.0, is_best=True)

    fresh = trainer.init_state(jax.random.key(7), data["input"][:2])
    loaded = load_backbone_params(ckpt, fresh)
    # backbone matches the checkpoint...
    for a, b in zip(jax.tree.leaves(state.params["backbone"]),
                    jax.tree.leaves(loaded.params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...head keeps the fresh init (trained head is dropped, train.py:174-183)
    for a, b in zip(jax.tree.leaves(fresh.params["head"]),
                    jax.tree.leaves(loaded.params["head"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_backbone_across_optimizers(tmp_path):
    """The real RRT flow: stage 1 saves with a plain optimizer, stage 2
    restores into a state whose masked (retrain_fc) optimizer has a different
    opt_state tree. Only params/batch_stats must be read from disk
    (imdb-wiki-dir/train.py:174-183 loads state_dict only)."""
    trainer, state, data = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1, best_loss=1.0, is_best=True)

    stage2 = Trainer(
        ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32),
        RegressionHead(),
        TrainerConfig(loss="mse", lr=1e-3, retrain_fc=True),
        fds_config=FDSConfig.for_age(feature_dim=16, bucket_num=121),
        mesh=create_mesh(1),
    )
    fresh = stage2.init_state(jax.random.key(7), data["input"][:2])
    loaded = load_backbone_params(ckpt, fresh)
    for a, b in zip(jax.tree.leaves(state.params["backbone"]),
                    jax.tree.leaves(loaded.params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(fresh.params["head"]),
                    jax.tree.leaves(loaded.params["head"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the loaded state still trains under the masked optimizer (snapshot the
    # backbone first: train_epoch donates its input state's buffers)
    before = [np.asarray(a) for a in jax.tree.leaves(loaded.params["backbone"])]
    rng = np.random.default_rng(1)
    out, _ = stage2.train_epoch(loaded, batch_iterator(data, 16, rng=rng), 0)
    for a, b in zip(jax.tree.leaves(out.params["backbone"]), before):
        np.testing.assert_array_equal(np.asarray(a), b)  # frozen


def test_load_backbone_restores_fds_stats(tmp_path):
    """Age-suite RRT semantics: the reference's pretrained-load key filter
    drops only 'fc'/'linear' keys, so 'module.FDS.*' running stats DO load
    (imdb-wiki-dir/train.py:174-183)."""
    trainer, state, data = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1, best_loss=1.0, is_best=True)

    fresh = trainer.init_state(jax.random.key(7), data["input"][:2])
    loaded = load_backbone_params(ckpt, fresh)  # restore_fds defaults True
    np.testing.assert_array_equal(
        np.asarray(state.fds.running_mean), np.asarray(loaded.fds.running_mean))
    np.testing.assert_array_equal(
        np.asarray(state.fds.num_samples_tracked),
        np.asarray(loaded.fds.num_samples_tracked))
    # STS semantics (resume_checkpoint backbone_only loads pair_encoder.*
    # only, sts-b-dir/util.py:75-84): restore_fds=False keeps the fresh stats
    loaded2 = load_backbone_params(ckpt, fresh, restore_fds=False)
    np.testing.assert_array_equal(
        np.asarray(fresh.fds.num_samples_tracked),
        np.asarray(loaded2.fds.num_samples_tracked))


def test_load_backbone_fds_fallback_on_vanilla_checkpoint(tmp_path):
    """A stage-1 checkpoint trained WITHOUT FDS has no fds subtree; loading
    it into an FDS-enabled stage-2 state must keep the fresh stats instead of
    failing (the reference simply finds no FDS keys to load)."""
    data = synthetic_age_dataset(n=32, img_size=16, seed=5)
    vanilla = Trainer(
        ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32),
        RegressionHead(),
        TrainerConfig(loss="mse", lr=1e-3),
        mesh=create_mesh(1),
    )
    state = vanilla.init_state(jax.random.key(0), data["input"][:2])
    rng = np.random.default_rng(0)
    state, _ = vanilla.train_epoch(state, batch_iterator(data, 16, rng=rng), 0)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1, best_loss=1.0, is_best=True)

    stage2 = Trainer(
        ResNetBasicBackbone(stage_sizes=(1, 1), width=8, dtype=jnp.float32),
        RegressionHead(),
        TrainerConfig(loss="mse", lr=1e-3, retrain_fc=True),
        fds_config=FDSConfig.for_age(feature_dim=16, bucket_num=121),
        mesh=create_mesh(1),
    )
    fresh = stage2.init_state(jax.random.key(7), data["input"][:2])
    loaded = load_backbone_params(ckpt, fresh)
    for a, b in zip(jax.tree.leaves(state.params["backbone"]),
                    jax.tree.leaves(loaded.params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(np.asarray(loaded.fds.num_samples_tracked).sum()) == 0  # fresh
