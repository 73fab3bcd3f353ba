"""Mid-epoch resume for the epoch drivers (age/NYUD2).

The reference restarts interrupted runs at epoch granularity
(``imdb-wiki-dir/train.py:185-196``, ``nyud2-dir/train.py:117-126``); this
framework's stated operating mode is babysat runs on a stall-prone device
tunnel, so the epoch drivers checkpoint every ``--ckpt_every_steps`` steps
and resume *inside* the epoch: per-epoch-seeded shuffles make the batch
stream reconstructible from ``state.step`` alone (the scheme the STS driver
already proves for its iteration loop, ``tasks/stsb.py`` /
``sts-b-dir/trainer.py:393-396`` — here generalized and made bit-exact)."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imbalanced_regression_tpu.utils.config import ExperimentConfig


def _leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_epoch_start_step_matches_uninterrupted(tmp_path):
    """Checkpoint after step k, restore, finish the epoch with
    ``start_step=k`` over the same per-epoch-seeded stream → parameters are
    bit-identical to the uninterrupted epoch."""
    from imbalanced_regression_tpu.data.batching import batch_iterator
    from imbalanced_regression_tpu.data.synthetic import synthetic_age_dataset
    from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
    from imbalanced_regression_tpu.parallel.mesh import create_mesh
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig
    from imbalanced_regression_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    data = synthetic_age_dataset(n=96, img_size=12, seed=0)
    bs, k = 16, 3  # 6 steps/epoch, interrupt after 3
    make_trainer = lambda: Trainer(  # noqa: E731
        ResNetBasicBackbone(stage_sizes=(1,), width=8, dtype=jnp.float32),
        RegressionHead(), TrainerConfig(loss="l1", lr=1e-3), mesh=create_mesh(1))
    batches = lambda: batch_iterator(data, bs, rng=np.random.default_rng((0, 0)))  # noqa: E731

    trainer = make_trainer()
    state0 = trainer.init_state(jax.random.key(0), data["input"][:2])
    full, _ = trainer.train_epoch(state0, batches(), epoch=0)

    # interrupted: k steps, checkpoint, restore into a FRESH trainer/state
    trainer_b = make_trainer()
    state = trainer_b.init_state(jax.random.key(0), data["input"][:2])
    state, _ = trainer_b.train_epoch(state, itertools.islice(batches(), k), epoch=0)
    save_checkpoint(str(tmp_path), state, 0, 1e5, is_best=False)

    trainer_c = make_trainer()
    template = trainer_c.init_state(jax.random.key(0), data["input"][:2])
    restored, epoch, _ = restore_checkpoint(str(tmp_path), template, which="latest")
    assert epoch == 0 and int(restored.step) == k
    resumed, _ = trainer_c.train_epoch(restored, batches(), epoch=0, start_step=k)

    assert int(resumed.step) == int(full.step)
    _leaves_equal(resumed.params, full.params)
    _leaves_equal(resumed.batch_stats, full.batch_stats)
    _leaves_equal(resumed.opt_state, full.opt_state)


def _tiny_age(monkeypatch):
    import imbalanced_regression_tpu.models.resnet as resnet_mod
    import imbalanced_regression_tpu.tasks.age as age_mod

    monkeypatch.setattr(
        age_mod, "resnet50_backbone",
        lambda dtype=jnp.float32: resnet_mod.ResNetBasicBackbone(
            stage_sizes=(1,), width=8, dtype=jnp.float32),
    )
    orig_for_age = age_mod.FDSConfig.for_age
    monkeypatch.setattr(
        age_mod.FDSConfig, "for_age",
        classmethod(lambda cls, feature_dim=2048, **kw: orig_for_age(feature_dim=8, **kw)),
    )
    return age_mod


def test_age_driver_killed_midepoch_resumes_identically(tmp_path, monkeypatch):
    """Kill the age driver right after a mid-epoch checkpoint; the resumed
    run's final test metrics equal an uninterrupted run's exactly."""
    age_mod = _tiny_age(monkeypatch)

    def cfg(root):
        return ExperimentConfig(
            dataset="synthetic", synthetic_size=128, img_size=12, batch_size=16,
            epoch=2, lr=1e-3, loss="mse", store_root=str(root), num_devices=1,
            fds=True, bucket_num=121, fds_mmt=0.9, ckpt_every_steps=2,
        )

    # uninterrupted reference trajectory
    want = age_mod.run(cfg(tmp_path / "uninterrupted"))

    # interrupted: die right after the 2nd mid-epoch save (epoch 0, step 4
    # of 5) — the checkpoint is on disk, the process is gone
    real_save = age_mod.save_checkpoint
    calls = {"n": 0}

    def dying_save(store_dir, state, epoch, best, is_best):
        real_save(store_dir, state, epoch, best, is_best)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill after mid-epoch checkpoint")

    monkeypatch.setattr(age_mod, "save_checkpoint", dying_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        age_mod.run(cfg(tmp_path / "resumed"))
    monkeypatch.setattr(age_mod, "save_checkpoint", real_save)

    c = cfg(tmp_path / "resumed")
    store = (tmp_path / "resumed") / c.derived_store_name()
    assert (store / "latest").is_dir()
    import dataclasses

    got = age_mod.run(dataclasses.replace(c, resume=str(store)))

    for key in ("mse", "l1", "gmean"):
        assert got["test"][key] == want["test"][key], key
    assert got["best_loss"] == want["best_loss"]


def test_nyud2_driver_killed_midepoch_resumes_identically(tmp_path, monkeypatch):
    """Same kill/resume invariance for the dense driver (per-pixel FDS, its
    own subset FDS pass and best-by-RMSE bookkeeping)."""
    import dataclasses

    from imbalanced_regression_tpu.tasks import nyud2 as task

    def cfg(root):
        return task.NYUDConfig(
            synthetic_size=32, batch_size=8, test_batch_size=8, epoch=2,
            store_root=str(root), num_devices=1, lds=True, reweight="sqrt_inv",
            fds=True, stage_sizes=(1, 1, 1, 1), width=8, lr=1e-3,
            ckpt_every_steps=1,
        )

    want = task.run(cfg(tmp_path / "uninterrupted"))

    real_save = task.save_checkpoint
    calls = {"n": 0}

    def dying_save(store_dir, state, epoch, best, is_best):
        real_save(store_dir, state, epoch, best, is_best)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated kill after mid-epoch checkpoint")

    monkeypatch.setattr(task, "save_checkpoint", dying_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        task.run(cfg(tmp_path / "resumed"))
    monkeypatch.setattr(task, "save_checkpoint", real_save)

    c = cfg(tmp_path / "resumed")
    store = (tmp_path / "resumed") / c.derived_store_name()
    got = task.run(dataclasses.replace(c, resume=str(store)))

    for key in ("RMSE", "MAE", "ABS_REL"):
        assert got["test"]["overall"][key] == want["test"]["overall"][key], key
    assert got["best_epoch"] == want["best_epoch"]
