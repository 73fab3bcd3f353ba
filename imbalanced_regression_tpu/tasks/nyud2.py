"""NYUD2-DIR driver: dense depth regression with per-pixel LDS/FDS.

Reference shape (``nyud2-dir/train.py:66-264`` + ``test.py``): 10 epochs,
Adam(lr=1e-4, L2 1e-4), lr x0.1 every 5 epochs, per-pixel weighted MSE, FDS
stats pass over the 600-image clean subset, per-epoch test with bilinear
upsampling to depth resolution and the balanced test mask, best-by-RMSE
checkpointing.

Run: ``python -m imbalanced_regression_tpu.tasks.nyud2 --data_dir <nyud2
data> [--lds --reweight inverse ...]`` or ``--synthetic_size N`` for the
synthetic stand-in."""

from __future__ import annotations

import dataclasses
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.batching import batch_iterator, eval_batches
from imbalanced_regression_tpu.data.nyud2 import (
    TRAIN_BUCKET_NUM,
    imagenet_normalize,
    load_nyud2_split,
    make_pixel_weight_fn,
    nyud2_train_photometric,
    synthetic_depth_dataset,
)
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.depth_encdec import DepthEncoderDecoder, DepthHead, depth_feature_dim
from imbalanced_regression_tpu.ops.lds import prepare_weights_depth
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import Trainer, TrainerConfig
from imbalanced_regression_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from imbalanced_regression_tpu.utils.config import ExperimentConfig, build_parser
from imbalanced_regression_tpu.utils.logging_tools import MetricsWriter
from imbalanced_regression_tpu.utils.metrics import DepthEvaluator

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class NYUDConfig(ExperimentConfig):
    dataset: str = "nyud2"
    loss: str = "mse"
    lr: float = 1e-4
    epoch: int = 10
    batch_size: int = 32
    bucket_start: int = 7
    lds_sigma: float = 2.0
    fds_sigma: float = 2.0
    weight_decay: float = 1e-4
    test_batch_size: int = 8
    fds_subset_limit: int = 0  # cap FDS subset size (0 = all)
    # ImageNet-pretrained encoder init (the reference always does this:
    # nyud2-dir/train.py:110-114 loads torchvision resnet50 weights).
    # Accepts a torch .pth/.pt (requires torch) or a msgpack produced by
    # `python -m tools.convert_torch`.
    pretrained_encoder: str = ""
    # model scaling knobs (tests/CI shrink these)
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    # MXU-tiling throughput experiment knobs (see DepthEncoderDecoder):
    # NOT parity configurations — they change parameter shapes
    mff_features: int = 16
    decoder_min_features: int = 0


def parse_nyud_config(argv=None) -> NYUDConfig:
    d = NYUDConfig()
    p = build_parser(d)
    p.add_argument("--test_batch_size", type=int, default=d.test_batch_size)
    p.add_argument("--fds_subset_limit", type=int, default=d.fds_subset_limit)
    p.add_argument("--pretrained_encoder", type=str, default=d.pretrained_encoder,
                   help="torch .pth or converted .msgpack with ImageNet encoder weights")
    p.add_argument("--mff_features", type=int, default=d.mff_features,
                   help="MFF per-scale channels (reference: 16); throughput knob")
    p.add_argument("--decoder_min_features", type=int, default=d.decoder_min_features,
                   help="pad decoder stages to >= this many channels (0 = reference)")
    args, _ = p.parse_known_args(argv)
    kw = vars(args)
    kw["schedule"] = tuple(kw["schedule"])
    return NYUDConfig(**kw)


def build_nyud_trainer(config: NYUDConfig, mesh) -> Trainer:
    feat_dim = depth_feature_dim(num_features=config.width * 32,
                                 mff_features=config.mff_features,
                                 decoder_min_features=config.decoder_min_features)
    fds_config = None
    if config.fds:
        fds_config = FDSConfig.for_depth(
            feature_dim=feat_dim, bucket_num=config.bucket_num, bucket_start=config.bucket_start,
            start_update=config.start_update, start_smooth=config.start_smooth,
            kernel=config.fds_kernel, ks=config.fds_ks, sigma=config.fds_sigma,
            momentum=config.fds_mmt,
        )
    bucket_weights = prepare_weights_depth(
        TRAIN_BUCKET_NUM, config.reweight, bucket_num=100, bucket_start=config.bucket_start,
        lds=config.lds, lds_kernel=config.lds_kernel, lds_ks=config.lds_ks,
        lds_sigma=config.lds_sigma,
    ) if config.reweight != "none" else None

    tcfg = TrainerConfig(
        loss=config.loss, optimizer="adam", lr=config.lr,
        adam_weight_decay=config.weight_decay, retrain_fc=config.retrain_fc,
        schedule=(),
    )
    backbone = DepthEncoderDecoder(stage_sizes=tuple(config.stage_sizes),
                                   width=config.width,
                                   mff_features=config.mff_features,
                                   decoder_min_features=config.decoder_min_features,
                                   dtype=jnp.bfloat16)
    return Trainer(
        backbone, DepthHead(), tcfg, fds_config=fds_config, mesh=mesh,
        lr_schedule=lambda epoch: config.lr * (0.1 ** (epoch // 5)),  # train.py:230-234
        train_augment=nyud2_train_photometric,
        eval_transform=imagenet_normalize,
        weight_fn=make_pixel_weight_fn(bucket_weights),
    )


def test_epoch(trainer, state, test_data, batch_size) -> dict:
    """Per-epoch evaluation: upsample predictions to depth resolution and
    apply the balanced per-pixel mask (test.py:39-59)."""
    evaluator = DepthEvaluator()
    mask = test_data.get("mask")
    offset = 0
    data = {k: v for k, v in test_data.items() if k != "mask"}
    for batch in eval_batches(data, batch_size):
        count = batch.pop("count")
        pred = trainer.predict_batch(state, batch, count)
        depth = np.asarray(batch["target"])[:count]
        if pred.shape[1:3] != depth.shape[1:3]:
            pred = np.asarray(jax.image.resize(
                jnp.asarray(pred), (pred.shape[0],) + depth.shape[1:3] + (1,), "bilinear"))
        if mask is not None:
            m = mask[offset : offset + count]
            evaluator(pred[m[..., None] if m.ndim == 3 else m], depth[m[..., None] if m.ndim == 3 else m])
        else:
            evaluator(pred, depth)
        offset += count
    return evaluator.evaluate_shot()


def build_data(config: NYUDConfig):
    if config.synthetic_size:
        n = config.synthetic_size
        full = synthetic_depth_dataset(n)
        tr = int(n * 0.8)
        train = {k: v[:tr] for k, v in full.items()}
        test = {k: v[tr:] for k, v in full.items()}
        fds_subset = {k: v[: max(tr // 4, 1)] for k, v in train.items()}
        return train, fds_subset, test
    train = load_nyud2_split(config.data_dir, "nyu2_train.csv", train=True)
    fds_subset = load_nyud2_split(config.data_dir, "nyu2_train_FDS_subset.csv", train=True,
                                  limit=config.fds_subset_limit or None)
    test = load_nyud2_split(config.data_dir, "nyu2_test.csv", train=False,
                            mask_file="test_balanced_mask.npy")
    return train, fds_subset, test


def load_pretrained_encoder(state, path: str):
    """Initialize the DepthEncoderDecoder's ResNet encoder from ImageNet
    weights, matching the reference's ``resnet.resnet50(pretrained=True)``
    (``nyud2-dir/train.py:110-114``). ``path`` is a converted msgpack (made by
    ``python -m tools.convert_torch``) or a raw torch .pth (torch required)."""
    from tools.convert_torch import (
        convert_resnet,
        graft_encoder,
        load_converted,
        load_torch_file,
    )

    if path.endswith((".pth", ".pt", ".tar")):
        tree = convert_resnet(load_torch_file(path))
    else:
        tree = load_converted(path)
    return graft_encoder(state, tree, submodule="encoder")


def run(config: NYUDConfig) -> dict:
    from imbalanced_regression_tpu.tasks.age import setup_logging
    from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    store_dir = os.path.join(config.store_root, config.derived_store_name())
    setup_logging(store_dir)
    logger.info("Config: %s", config)

    mesh = create_mesh(config.num_devices)
    train, fds_subset, test = build_data(config)
    trainer = build_nyud_trainer(config, mesh)
    state = trainer.init_state(jax.random.key(config.seed), train["input"][:2])
    if config.pretrained_encoder:
        state = load_pretrained_encoder(state, config.pretrained_encoder)
        logger.info("Encoder initialized from %s", config.pretrained_encoder)

    if config.evaluate:
        assert config.resume
        state, _, _ = restore_checkpoint(config.resume, state, which="best")
        metric = test_epoch(trainer, state, test, config.test_batch_size)
        _log_metrics(metric)
        return {"test": metric}

    writer = MetricsWriter(store_dir)
    best_rmse, best_metric, best_epoch = float("inf"), None, -1
    # per-epoch-seeded shuffles + step-located resume: see tasks/age.py (the
    # same mid-epoch-resume scheme; the reference restarts whole epochs,
    # nyud2-dir/train.py:117-126)
    steps_per_epoch = max(len(train["target"]) // config.batch_size, 1)
    start_epoch, start_step = 0, 0
    if config.resume:
        # reference --resume restores the latest checkpoint (train.py:117-126);
        # fall back to best if latest was interrupted mid-save
        for which in ("latest", "best"):
            if os.path.isdir(os.path.join(config.resume, which)):
                state, start_epoch, best_rmse = restore_checkpoint(config.resume, state, which=which)
                start_step = int(jax.device_get(state.step)) - start_epoch * steps_per_epoch
                # == steps_per_epoch: epoch training done, death during the
                # FDS pass/validation — pass through (0 steps run, epoch falls
                # to its FDS pass/test/save); see tasks/age.py
                if not 0 <= start_step <= steps_per_epoch:
                    start_step = 0
                logger.info("Resumed %s (%s) at epoch %d step %d (best RMSE %.3f)",
                            config.resume, which, start_epoch, start_step, best_rmse)
                break
    for epoch in range(start_epoch, config.epoch):
        step_hook = None
        if config.save_ckpt and config.ckpt_every_steps:
            step_hook = lambda s, _step, e=epoch: save_checkpoint(  # noqa: E731
                store_dir, s, e, best_rmse, is_best=False)
        state, train_loss = trainer.train_epoch(
            state,
            batch_iterator(train, config.batch_size,
                           rng=np.random.default_rng((config.seed, epoch))), epoch,
            start_step=start_step if epoch == start_epoch else 0,
            step_hook=step_hook, hook_every=config.ckpt_every_steps,
        )
        # FDS pass over the clean 600-image subset (train.py:216-228)
        state = trainer.fds_epoch_pass(
            state, batch_iterator(fds_subset, min(config.batch_size, len(fds_subset["target"])),
                                  shuffle=False), epoch
        )
        metric = test_epoch(trainer, state, test, config.test_batch_size)
        rmse = metric["overall"]["RMSE"]
        is_best = rmse < best_rmse
        if is_best:
            best_rmse, best_metric, best_epoch = rmse, metric, epoch
        save_checkpoint(store_dir, state, epoch + 1, best_rmse, is_best)
        writer.log_scalar("train_loss", train_loss, epoch)
        writer.log_dict(metric["overall"], epoch, prefix="test_")
        logger.info("Epoch %d: train loss %.4f  test RMSE %.3f (best %.3f)",
                    epoch, train_loss, rmse, best_rmse)

    writer.close()
    logger.info("Best epoch: %d; RMSE: %.3f", best_epoch, best_rmse)
    _log_metrics(best_metric)
    return {"test": best_metric, "best_rmse": best_rmse, "best_epoch": best_epoch}


def _log_metrics(metric: dict):
    logger.info("***** TEST RESULTS *****")
    for shot in ("overall", "many", "medium", "few"):
        m = metric[shot]
        logger.info(" * %s: RMSE %.3f  ABS_REL %.3f  LG10 %.3f  MAE %.3f  "
                    "DELTA1 %.3f  DELTA2 %.3f  DELTA3 %.3f  NUM %d",
                    shot.capitalize(), m["RMSE"], m["ABS_REL"], m["LG10"], m["MAE"],
                    m["DELTA1"], m["DELTA2"], m["DELTA3"], m["NUM"])


def main(argv=None):
    run(parse_nyud_config(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
