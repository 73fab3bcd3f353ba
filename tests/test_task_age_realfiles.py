"""Age driver end-to-end over real image files: generated JPEG corpus + meta
CSV → native batch decoder → LDS weights → training → balanced-split eval.
Covers the CSV/real-data path that the synthetic smoke test bypasses."""

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from imbalanced_regression_tpu.tasks import age
from imbalanced_regression_tpu.utils.config import ExperimentConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """~200 JPEGs whose pixel pattern encodes the age label, with an
    imbalanced train distribution and balanced val/test splits."""
    root = tmp_path_factory.mktemp("agedb")
    (root / "imgs").mkdir()
    rng = np.random.default_rng(0)
    ages = np.concatenate([
        rng.integers(25, 35, 150),  # head
        rng.integers(0, 100, 50),   # tail
    ])
    rows = []
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64
    for i, a in enumerate(ages):
        freq = a / 100 * 3 + 0.5
        img = (np.sin(freq * np.pi * (yy + xx)) * 100 + 128)[..., None]
        img = np.repeat(img, 3, -1) + rng.normal(0, 10, (64, 64, 3))
        path = f"imgs/{i}.jpg"
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(root / path, quality=90)
        split = "train" if i % 5 else ("val" if i % 10 else "test")
        rows.append({"age": int(a), "path": path, "split": split})
    pd.DataFrame(rows).to_csv(root / "agedb.csv", index=False)
    return str(root)


def test_age_real_files_end_to_end(corpus, monkeypatch):
    import imbalanced_regression_tpu.models.resnet as resnet_mod

    monkeypatch.setattr(
        age, "resnet50_backbone",
        lambda dtype=jnp.float32: resnet_mod.ResNetBasicBackbone(
            stage_sizes=(1, 1), width=8, dtype=jnp.float32),
    )
    orig_for_age = age.FDSConfig.for_age
    monkeypatch.setattr(
        age.FDSConfig, "for_age",
        classmethod(lambda cls, feature_dim=2048, **kw: orig_for_age(feature_dim=16, **kw)),
    )
    cfg = ExperimentConfig(
        dataset="agedb", data_dir=corpus, img_size=32, batch_size=16, epoch=2,
        lr=1e-3, loss="mse", reweight="sqrt_inv", lds=True, fds=True,
        bucket_num=121, store_root=os.path.join(corpus, "ckpt"), num_devices=1,
        workers=2,
    )
    result = age.run(cfg)
    assert np.isfinite(result["test"]["mse"])
    assert result["test"]["l1"] < 60  # sane scale (labels 0-100)
    assert "many" in result["shots"]
