"""Serving export: frozen StableHLO predictor parity + CLI round-trip.

The artifact must reproduce Trainer.predict_batch exactly (same eval
transform, eval-mode BN, no FDS at inference — the reference's --evaluate
semantics, imdb-wiki-dir/train.py:103-110) and reload without any model
code."""

import os

import jax
import numpy as np
import pytest

from imbalanced_regression_tpu.data.augment import normalize_only
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.serving import (
    export_predictor,
    load_predictor,
    load_predictor_file,
    save_predictor,
)
from imbalanced_regression_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def trained():
    trainer = Trainer(
        ResNetBasicBackbone(stage_sizes=(1,), width=8, dtype=np.float32),
        RegressionHead(),
        TrainerConfig(loss="l1", lr=1e-2),
        fds_config=FDSConfig.for_age(feature_dim=8, bucket_num=121, start_smooth=0),
        mesh=create_mesh(1),
        eval_transform=normalize_only,
    )
    rng = np.random.default_rng(0)
    batch = {
        "input": (rng.random((8, 24, 24, 3)) * 255).astype(np.uint8).astype(np.float32),
        "target": rng.normal(40, 20, (8, 1)).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2])
    state, _, _ = trainer.train_step(state, batch, epoch=1)  # non-init weights
    return trainer, state, batch


def test_export_matches_predict_batch(trained):
    trainer, state, batch = trained
    blob = export_predictor(trainer, state, batch["input"], platforms=("cpu",))
    predict = load_predictor(blob)
    got = predict(batch["input"])
    want = trainer.predict_batch(state, {"input": batch["input"],
                                         "target": batch["target"]})
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert predict.in_shape == batch["input"].shape
    assert predict.platforms == ("cpu",)


def test_export_roundtrip_nyud2_dense(tmp_path):
    """The NYUD2 dense predictor (encoder-decoder, per-pixel output) exports
    and reloads from disk, reproducing Trainer.predict_batch exactly — the
    dense-model counterpart of the ResNet round-trip above (the reference has
    no serving story for either, nyud2-dir/test.py:14-37 is script-only)."""
    from imbalanced_regression_tpu.data.nyud2 import (
        TRAIN_BUCKET_NUM,
        imagenet_normalize,
        make_pixel_weight_fn,
        nyud2_train_photometric,
    )
    from imbalanced_regression_tpu.fds import FDSConfig as FDS
    from imbalanced_regression_tpu.models.depth_encdec import (
        DepthEncoderDecoder,
        DepthHead,
        depth_feature_dim,
    )
    from imbalanced_regression_tpu.ops.lds import prepare_weights_depth
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    # f32 model: the export-vs-predict_batch comparison is a numerical
    # round-trip check; at bf16 the two separately-compiled programs differ
    # by bf16 ulps (~0.8%), which is dtype noise, not an export bug
    bucket_weights = prepare_weights_depth(
        TRAIN_BUCKET_NUM, "sqrt_inv", bucket_num=100, bucket_start=7, lds=True)
    trainer = Trainer(
        DepthEncoderDecoder(stage_sizes=(1, 1, 1, 1), width=8, dtype=np.float32),
        DepthHead(),
        TrainerConfig(loss="mse", lr=1e-4, adam_weight_decay=1e-4, schedule=()),
        fds_config=FDS.for_depth(feature_dim=depth_feature_dim(8 * 32),
                                 bucket_num=100, bucket_start=7,
                                 start_update=0, start_smooth=0),
        mesh=create_mesh(1),
        train_augment=nyud2_train_photometric,
        eval_transform=imagenet_normalize,
        weight_fn=make_pixel_weight_fn(bucket_weights),
    )
    rng = np.random.default_rng(0)
    batch = {
        "input": rng.random((4, 64, 96, 3)).astype(np.float32),
        "target": (rng.random((4, 32, 48, 1)) * 10).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2])
    state, _, _ = trainer.train_step(state, batch, epoch=1)  # non-init weights

    path = str(tmp_path / "dense.stablehlo")
    save_predictor(path, export_predictor(trainer, state, batch["input"],
                                          platforms=("cpu",)))
    predict = load_predictor_file(path)
    got = predict(batch["input"])
    want = trainer.predict_batch(state, dict(batch))
    assert got.shape == (4, 32, 48, 1)  # dense per-pixel depth map
    # separately-compiled f32 conv stacks reorder reductions: allow ~1e-3
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_export_weights_as_args_matches_embedded(trained, tmp_path):
    """The weights-as-arguments package (module + msgpack weight pack in one
    artifact — needed when embedded-constant modules exceed compile-service
    request limits, e.g. the NYUD2 encoder-decoder through the tunneled
    remote-compile endpoint) must reproduce the embedded-constant export
    exactly through a disk round-trip."""
    trainer, state, batch = trained
    embedded = load_predictor(export_predictor(trainer, state, batch["input"],
                                               platforms=("cpu",)))
    blob = export_predictor(trainer, state, batch["input"], platforms=("cpu",),
                            embed_weights=False)
    path = str(tmp_path / "packed.stablehlo")
    save_predictor(path, blob)
    packed = load_predictor_file(path)
    np.testing.assert_allclose(packed(batch["input"]), embedded(batch["input"]),
                               rtol=1e-6, atol=1e-7)
    assert packed.in_shape == batch["input"].shape
    assert packed.platforms == ("cpu",)


def test_export_is_self_contained(trained, tmp_path):
    """Round-trip through disk; the loaded callable must not reference the
    live trainer/state (weights are baked into the artifact)."""
    trainer, state, batch = trained
    path = str(tmp_path / "model.stablehlo")
    save_predictor(path, export_predictor(trainer, state, batch["input"],
                                          platforms=("cpu",)))
    assert os.path.getsize(path) > 1000
    predict = load_predictor_file(path)
    want = trainer.predict_batch(state, dict(batch))
    # mutate the live state afterwards — the artifact must not change
    state2 = state.replace(params=jax.tree.map(lambda x: x * 0, state.params))
    del state2
    np.testing.assert_allclose(predict(batch["input"]), want, rtol=1e-5, atol=1e-5)


def test_export_fixed_shape_rejects_other_batch(trained):
    trainer, state, batch = trained
    predict = load_predictor(
        export_predictor(trainer, state, batch["input"], platforms=("cpu",)))
    with pytest.raises(Exception):
        predict(batch["input"][:3])  # exported for batch 8, not 3


def test_export_pytree_input_stsb():
    """Dict-input models (STS-B token/mask pairs) export and reload too."""
    from imbalanced_regression_tpu.tasks.stsb import STSConfig, build_sts_trainer

    cfg = STSConfig(d_hid=16, n_layers_enc=1, n_layers_highway=0, glove=0,
                    d_word=8, dropout=0.0, dropout_embs=0.0)
    trainer = build_sts_trainer(cfg, create_mesh(1), vocab_size=50, emb_table=None)
    rng = np.random.default_rng(0)
    inp = {
        "tokens1": rng.integers(1, 50, (4, 7)).astype(np.int32),
        "mask1": np.ones((4, 7), np.float32),
        "tokens2": rng.integers(1, 50, (4, 9)).astype(np.int32),
        "mask2": np.ones((4, 9), np.float32),
    }
    state = trainer.init_state(jax.random.key(0),
                               jax.tree.map(lambda v: v[:2], inp))
    blob = export_predictor(trainer, state, inp, platforms=("cpu",))
    predict = load_predictor(blob)
    want = trainer.predict_batch(
        state, {"input": inp, "target": np.zeros((4, 1), np.float32)})
    np.testing.assert_allclose(predict(inp), want, rtol=1e-5, atol=1e-5)


def test_serve_bench_cli_smoke():
    """tools/serve_bench over the resnet18 registry entry: sane JSON rows."""
    import tools.serve_bench as sb

    results = sb.main(["--task", "age", "--model", "resnet18", "--img_size", "24",
                       "--batches", "1", "4", "--iters", "3"])
    assert [r["batch"] for r in results] == [1, 4]
    for r in results:
        assert r["ms_per_batch"] > 0 and r["img_per_sec"] > 0
        assert r["p50_ms"] <= r["p99_ms"] * 1.0001


def test_build_trainer_model_registry():
    """--model resnet18 selects the BasicBlock backbone and a 512-d FDS."""
    import pytest as _pytest

    from imbalanced_regression_tpu.parallel.mesh import create_mesh as _mk
    from imbalanced_regression_tpu.tasks.age import build_trainer
    from imbalanced_regression_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(model="resnet18", fds=True, img_size=24)
    tr = build_trainer(cfg, _mk(1))
    assert tr.fds_config.feature_dim == 512
    with _pytest.raises(ValueError, match="unknown model"):
        build_trainer(ExperimentConfig(model="vgg"), _mk(1))


def test_export_cli_roundtrip(tmp_path, monkeypatch):
    """tools/export_model.py end-to-end over a real checkpoint dir."""
    import jax.numpy as jnp

    import imbalanced_regression_tpu.tasks.age as age_mod
    import tools.export_model as em
    from imbalanced_regression_tpu.utils.checkpoint import save_checkpoint

    monkeypatch.setattr(
        age_mod, "resnet50_backbone",
        lambda dtype=jnp.bfloat16: ResNetBasicBackbone(stage_sizes=(1,), width=8,
                                                       dtype=np.float32),
    )
    # checkpoint structurally identical to what build_task reconstructs
    from imbalanced_regression_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(img_size=24)
    tr = age_mod.build_trainer(cfg, create_mesh(1))
    st = tr.init_state(jax.random.key(1), np.zeros((2, 24, 24, 3), np.float32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, st, epoch=1, best_loss=1.0, is_best=True)

    out = str(tmp_path / "m.stablehlo")
    em.main([ckpt, out, "--task", "age", "--batch", "4", "--img_size", "24",
             "--platforms", "cpu"])
    em.main(["--load", out, "--batch", "4"])
    predict = load_predictor_file(out)
    assert predict.in_shape == (4, 24, 24, 3)
