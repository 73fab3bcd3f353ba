"""NYUD2 suite tests: model shapes, photometric augment, pixel weights,
and an end-to-end synthetic smoke run."""

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.nyud2 import (
    TRAIN_BUCKET_NUM,
    imagenet_normalize,
    make_pixel_weight_fn,
    nyud2_train_photometric,
    synthetic_depth_dataset,
)
from imbalanced_regression_tpu.models.depth_encdec import (
    DepthEncoderDecoder,
    DepthHead,
    depth_feature_dim,
)
from imbalanced_regression_tpu.ops.lds import prepare_weights_depth


def test_feature_dim():
    assert depth_feature_dim(2048) == 128  # 64 + 2048//32 (modules.py:136)


def test_depth_model_shapes():
    model = DepthEncoderDecoder(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    # output at half input resolution with 4*16 + width*8//32 channels
    assert feats.shape == (2, 32, 48, depth_feature_dim(8 * 32))
    head = DepthHead()
    hp = head.init(jax.random.key(1), feats)["params"]
    pred = head.apply({"params": hp}, feats)
    assert pred.shape == (2, 32, 48, 1)


def test_depth_model_channel_knobs():
    """The MXU-tiling experiment knobs (mff_features, decoder_min_features)
    change the FDS hook width exactly as depth_feature_dim predicts, and the
    default (0) reproduces the reference widths bit-for-bit in shape."""
    x = jnp.zeros((1, 64, 96, 3))
    for mff, dmin in ((16, 0), (32, 0), (16, 24), (32, 24)):
        model = DepthEncoderDecoder(stage_sizes=(1, 1, 1, 1), width=8,
                                    mff_features=mff, decoder_min_features=dmin,
                                    dtype=jnp.float32)
        feats = model.apply(model.init(jax.random.key(0), x, train=False),
                            x, train=False)
        assert feats.shape == (1, 32, 48, depth_feature_dim(8 * 32, mff, dmin)), (mff, dmin)


def test_photometric_augment(rng):
    imgs = (rng.random((4, 16, 16, 3)) * 255).astype(np.uint8)
    out = np.asarray(nyud2_train_photometric(jax.random.key(0), jnp.asarray(imgs)))
    assert out.shape == imgs.shape
    assert np.all(np.isfinite(out))
    # eval path is deterministic imagenet normalization
    ev = np.asarray(imagenet_normalize(jnp.asarray(imgs)))
    want = (imgs.astype(np.float32) / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(ev, want, rtol=1e-5, atol=1e-6)


def test_pixel_weight_fn():
    weights = prepare_weights_depth(TRAIN_BUCKET_NUM, "inverse", lds=True)
    fn = make_pixel_weight_fn(weights)
    depth = jnp.asarray([[0.75, 2.0], [9.99, 10.0]])[None, ..., None]
    w = np.asarray(fn({"target": depth}))
    assert w.shape == depth.shape
    # rarer (deep) pixels weigh more than common mid-range pixels
    assert w[0, 1, 1, 0] > w[0, 0, 1, 0]
    assert make_pixel_weight_fn(None) is None


def test_synthetic_depth_dataset():
    data = synthetic_depth_dataset(8)
    assert data["input"].shape == (8, 64, 96, 3)
    assert data["target"].shape == (8, 32, 48, 1)
    assert data["target"].min() >= 0.7 and data["target"].max() <= 10.0


def test_nyud2_end_to_end(tmp_path):
    from imbalanced_regression_tpu.tasks import nyud2 as task

    cfg = task.NYUDConfig(
        synthetic_size=24, batch_size=8, test_batch_size=8, epoch=2,
        store_root=str(tmp_path), num_devices=1, lds=True, reweight="sqrt_inv",
        fds=True, stage_sizes=(1, 1, 1, 1), width=8, lr=1e-3,
    )
    result = task.run(cfg)
    assert np.isfinite(result["test"]["overall"]["RMSE"])
    assert result["test"]["overall"]["NUM"] > 0
    # per-pixel FDS tracked roughly one epoch of pixels in the subset pass
    assert result["best_epoch"] >= 0

    # evaluate-only path from the stored best checkpoint (test.py:14-37)
    import dataclasses

    store = cfg.derived_store_name()
    cfg_eval = dataclasses.replace(cfg, evaluate=True,
                                   resume=str(tmp_path / store))
    result2 = task.run(cfg_eval)
    assert np.isfinite(result2["test"]["overall"]["RMSE"])
