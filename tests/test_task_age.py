"""Smoke test of the full age-task driver on synthetic data: train → validate
→ checkpoint best → test, plus the evaluate-only path."""

import numpy as np

from imbalanced_regression_tpu.utils.config import ExperimentConfig
from imbalanced_regression_tpu.tasks import age


def _cfg(tmp_path, **kw):
    return ExperimentConfig(
        dataset="synthetic", synthetic_size=96, img_size=16, batch_size=16,
        epoch=2, lr=1e-3, loss="mse", store_root=str(tmp_path), num_devices=1,
        **kw,
    )


def test_age_run_end_to_end(tmp_path, monkeypatch):
    import imbalanced_regression_tpu.tasks.age as age_mod
    import imbalanced_regression_tpu.models.resnet as resnet_mod
    import jax.numpy as jnp

    # shrink the backbone for CI speed
    monkeypatch.setattr(
        age_mod, "resnet50_backbone",
        lambda dtype=jnp.float32: resnet_mod.ResNetBasicBackbone(stage_sizes=(1, 1), width=8,
                                                                 dtype=jnp.float32),
    )
    cfg = _cfg(tmp_path, reweight="sqrt_inv", lds=True, fds=True, bucket_num=121,
               fds_mmt=0.9)
    # FDS feature dim must match the shrunken backbone
    orig_for_age = age_mod.FDSConfig.for_age
    monkeypatch.setattr(
        age_mod.FDSConfig, "for_age",
        classmethod(lambda cls, feature_dim=2048, **kw: orig_for_age(feature_dim=16, **kw)),
    )
    result = age.run(cfg)
    assert np.isfinite(result["test"]["mse"])
    assert "shots" in result and "many" in result["shots"]

    # evaluate-only path against the stored best checkpoint
    store = tmp_path / cfg.derived_store_name()
    cfg_eval = _cfg(tmp_path, reweight="sqrt_inv", lds=True, fds=True, bucket_num=121,
                    evaluate=True, resume=str(store))
    result2 = age.run(cfg_eval)
    assert np.isfinite(result2["test"]["mse"])


def test_save_ckpt_0_matches_checkpointed_run(tmp_path, monkeypatch):
    """--save_ckpt 0 (in-memory best state) must reproduce the checkpointed
    run's test metrics exactly — same seed, same data, only the best-model
    plumbing differs."""
    import jax.numpy as jnp

    import imbalanced_regression_tpu.models.resnet as resnet_mod
    import imbalanced_regression_tpu.tasks.age as age_mod

    monkeypatch.setattr(
        age_mod, "resnet50_backbone",
        lambda dtype=jnp.float32: resnet_mod.ResNetBasicBackbone(stage_sizes=(1,), width=8,
                                                                 dtype=jnp.float32),
    )
    a = age.run(_cfg(tmp_path / "a", save_ckpt=1))
    b = age.run(_cfg(tmp_path / "b", save_ckpt=0))
    assert a["test"]["mse"] == b["test"]["mse"]
    assert a["test"]["l1"] == b["test"]["l1"]
    assert not (tmp_path / "b").joinpath(
        "synthetic_resnet50_adam_mse_0.001_16", "best").exists()
