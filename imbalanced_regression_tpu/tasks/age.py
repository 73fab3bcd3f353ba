"""Age-regression driver (IMDB-WIKI-DIR / AgeDB-DIR).

End-to-end workflow with the reference's shape
(``imdb-wiki-dir/train.py:112-231``): data + LDS weights → ResNet-50 → epoch
loop (train → FDS stats pass → validate → checkpoint best) → final test with
the best checkpoint, plus the evaluate-only / resume / RRT entry points.

Run: ``python -m imbalanced_regression_tpu.tasks.age --dataset agedb --lds
--reweight sqrt_inv ...`` (flags mirror the reference CLI). With
``--synthetic_size N`` a synthetic dataset stands in for the real images
(smoke tests, benchmarks, this repo's CI — the DIR image corpora are not
redistributable)."""

from __future__ import annotations

import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.augment import normalize_only, random_crop_flip_normalize
from imbalanced_regression_tpu.data.batching import batch_iterator, eval_batches
from imbalanced_regression_tpu.data.synthetic import synthetic_age_dataset
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.resnet import (
    RegressionHead,
    resnet18_backbone,
    resnet34_backbone,
    resnet50_backbone,
    resnet101_backbone,
    resnet152_backbone,
)
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import Trainer, TrainerConfig
from imbalanced_regression_tpu.utils.checkpoint import (
    load_backbone_params,
    restore_checkpoint,
    save_checkpoint,
)
from imbalanced_regression_tpu.utils.config import ExperimentConfig, parse_config
from imbalanced_regression_tpu.utils.logging_tools import MetricsWriter, host_memory_gb
from imbalanced_regression_tpu.utils.metrics import regression_metrics, shot_metrics

logger = logging.getLogger(__name__)


def setup_logging(store_dir: str) -> None:
    os.makedirs(store_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(message)s",
        handlers=[
            logging.FileHandler(os.path.join(store_dir, "training.log")),
            logging.StreamHandler(),
        ],
        force=True,
    )
    for noisy in ("orbax", "absl", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def build_data(config: ExperimentConfig):
    if config.synthetic_size:
        n = config.synthetic_size
        full = synthetic_age_dataset(n=n, img_size=config.img_size, seed=0)
        tr, va = int(n * 0.7), int(n * 0.85)
        train = {k: v[:tr] for k, v in full.items()}
        val = {k: v[tr:va] for k, v in full.items() if k != "weight"}
        test = {k: v[va:] for k, v in full.items() if k != "weight"}
        train_labels = train["target"].reshape(-1)
        from imbalanced_regression_tpu.ops.lds import prepare_weights_age

        w = prepare_weights_age(train_labels, config.reweight, lds=config.lds,
                                lds_kernel=config.lds_kernel, lds_ks=config.lds_ks,
                                lds_sigma=config.lds_sigma)
        if w is not None:
            train["weight"] = w[:, None].astype(np.float32)
        return train, val, test, train_labels

    from imbalanced_regression_tpu.data.age import load_age_datasets

    return load_age_datasets(config)


# --model registry. The reference parses --model but always builds resnet50
# (imdb-wiki-dir/train.py:140); resnet18 is a TPU-native extra used for cheap
# smoke/serving runs (same topology family, BasicBlock, 512-d encoding).
# (lambdas late-bind the module globals, so tests can monkeypatch the
# builders the way they did before the registry existed)
BACKBONES = {
    # remat is forwarded only when enabled so tests/users replacing the
    # builder with a dtype-only lambda keep working
    "resnet50": (lambda dtype, remat=None: resnet50_backbone(
        dtype=dtype, **({"remat": remat} if remat else {})), 2048),
    "resnet18": (lambda dtype, remat=None: resnet18_backbone(
        dtype=dtype, **({"remat": remat} if remat else {})), 512),
    "resnet34": (lambda dtype, remat=None: resnet34_backbone(
        dtype=dtype, **({"remat": remat} if remat else {})), 512),
    # deep variants from the reference's NYUD2 ResNet family
    # (nyud2-dir/models/resnet.py:186-205)
    "resnet101": (lambda dtype, remat=None: resnet101_backbone(
        dtype=dtype, **({"remat": remat} if remat else {})), 2048),
    "resnet152": (lambda dtype, remat=None: resnet152_backbone(
        dtype=dtype, **({"remat": remat} if remat else {})), 2048),
}


def build_trainer(config: ExperimentConfig, mesh) -> Trainer:
    if config.model not in BACKBONES:
        raise ValueError(f"unknown model {config.model!r}; choices: {sorted(BACKBONES)}")
    backbone_fn, feature_dim = BACKBONES[config.model]
    fds_config = None
    if config.fds:
        fds_config = FDSConfig.for_age(
            feature_dim=feature_dim, bucket_num=config.bucket_num, bucket_start=config.bucket_start,
            start_update=config.start_update, start_smooth=config.start_smooth,
            kernel=config.fds_kernel, ks=config.fds_ks, sigma=config.fds_sigma,
            momentum=config.fds_mmt,
        )
    tcfg = TrainerConfig(
        loss=config.loss, optimizer=config.optimizer, lr=config.lr,
        momentum=config.momentum, weight_decay=config.weight_decay,
        schedule=tuple(config.schedule), epochs=config.epoch, retrain_fc=config.retrain_fc,
    )
    return Trainer(
        backbone_fn(dtype=jnp.bfloat16, remat=config.remat or None), RegressionHead(), tcfg,
        fds_config=fds_config, mesh=mesh,
        train_augment=random_crop_flip_normalize, eval_transform=normalize_only,
    )


def validate(trainer, state, data, train_labels, batch_size, prefix="Val"):
    preds, labels = trainer.predict(state, eval_batches(data, batch_size))
    overall = regression_metrics(preds, labels)
    shots = shot_metrics(preds.reshape(-1), labels.reshape(-1), train_labels)
    logger.info("%s * Overall: MSE %.3f  L1 %.3f  G-Mean %.3f", prefix,
                overall["mse"], overall["l1"], overall["gmean"])
    for region, label in (("many", "Many"), ("median", "Median"), ("low", "Low")):
        m = shots[region]
        logger.info("%s * %s: MSE %.3f  L1 %.3f  G-Mean %.3f", prefix, label,
                    m["mse"], m["l1"], m["gmean"])
    return overall, shots


def run(config: ExperimentConfig) -> dict:
    from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    store_dir = os.path.join(config.store_root, config.derived_store_name())
    setup_logging(store_dir)
    logger.info("Config: %s", config)
    logger.info("Store dir: %s", store_dir)

    mesh = create_mesh(config.num_devices)
    num_chips = int(np.prod(mesh.devices.shape))
    train, val, test, train_labels = build_data(config)
    logger.info("Data: train=%d val=%d test=%d (chips=%d)",
                len(train["target"]), len(val["target"]), len(test["target"]), num_chips)

    trainer = build_trainer(config, mesh)
    state = trainer.init_state(jax.random.key(config.seed), train["input"][:2])

    if config.evaluate:
        assert config.resume, "Specify a trained model via --resume"
        state, epoch, best = restore_checkpoint(config.resume, state, which="best")
        logger.info("Loaded %s (epoch %d), testing...", config.resume, epoch)
        overall, shots = validate(trainer, state, test, train_labels, config.batch_size, "Test")
        return {"test": overall, "shots": shots}

    if config.retrain_fc:
        assert config.reweight != "none" and config.pretrained
        logger.info("RRT: loading backbone from %s, training head only", config.pretrained)
        state = load_backbone_params(config.pretrained, state)
    elif config.pretrained:
        state = load_backbone_params(config.pretrained, state)
        logger.info("Loaded pretrained backbone: %s", config.pretrained)

    # per-epoch batches deterministic in (seed, epoch): any epoch's stream is
    # reconstructible on resume without replaying earlier epochs (the STS
    # driver's exact data-position restore, generalized to the epoch loop)
    steps_per_epoch = max(len(train["target"]) // config.batch_size, 1)
    train_rng = lambda epoch: np.random.default_rng((config.seed, epoch))  # noqa: E731
    fds_rng = lambda epoch: np.random.default_rng((config.seed, epoch, 1))  # noqa: E731

    start_epoch, start_step, best_loss = 0, 0, 1e5
    if config.resume and os.path.isdir(os.path.join(config.resume, "latest")):
        state, start_epoch, best_loss = restore_checkpoint(config.resume, state, which="latest")
        # state.step counts every optimization step ever taken; with the
        # fixed drop-remainder batch count this locates the position inside
        # the checkpointed epoch (0 for epoch-boundary checkpoints, whose
        # meta epoch is already the next one to run)
        start_step = int(jax.device_get(state.step)) - start_epoch * steps_per_epoch
        # start_step == steps_per_epoch means the epoch's TRAINING finished but
        # the run died before the epoch-end save (FDS pass / validation): pass
        # it through — train_epoch runs 0 steps and the epoch falls through to
        # the FDS pass/validation/save instead of re-applying every optimizer
        # step on already-updated weights. Only a genuinely inconsistent value
        # (negative / beyond one epoch) resets to 0.
        if not 0 <= start_step <= steps_per_epoch:
            start_step = 0
        logger.info("Resumed %s at epoch %d step %d (best %.4f)",
                    config.resume, start_epoch, start_step, best_loss)

    writer = MetricsWriter(store_dir)
    best_state, best_epoch_mem = None, -1
    # supervised process recycling (see ExperimentConfig.max_steps_per_run):
    # count optimization steps run by THIS process; exit rc=3 right after a
    # mid-epoch checkpoint / at epoch boundaries once the cap is reached, so
    # babysit relaunches with --resume before the tunneled client's per-batch
    # host-buffer retention OOMs the host
    run_start_step = int(jax.device_get(state.step))
    recycle = max(config.max_steps_per_run, 0)
    if (config.max_steps_per_run == 0 and config.save_ckpt
            and config.ckpt_every_steps and len(train["target"]) > 50_000):
        # auto-default at IMDB-WIKI scale: any long-lived process OOMs on
        # this platform (retention measured at ~30 MB per shipped batch), so
        # large supervised runs recycle themselves. --max_steps_per_run -1
        # opts out explicitly.
        recycle = 3000
        logger.info("Large corpus + mid-epoch checkpoints: enabling "
                    "supervised process recycling every %d steps "
                    "(--max_steps_per_run -1 disables)", recycle)
    if recycle:
        assert config.save_ckpt and config.ckpt_every_steps, \
            "--max_steps_per_run needs --ckpt_every_steps (mid-epoch resume)"
    for epoch in range(start_epoch, config.epoch):
        t0 = time.time()
        step_hook = None
        if config.save_ckpt and config.ckpt_every_steps:
            # mid-epoch "latest" checkpoints: meta epoch = the CURRENT
            # (unfinished) epoch, so restore lands back inside it
            def step_hook(s, _step, e=epoch):
                save_checkpoint(store_dir, s, e, best_loss, is_best=False)
                if recycle and int(jax.device_get(s.step)) - run_start_step >= recycle:
                    logger.info("max_steps_per_run %d reached — exiting for "
                                "supervised relaunch (resume is bit-exact)", recycle)
                    raise SystemExit(3)
        state, train_loss = trainer.train_epoch(
            state, batch_iterator(train, config.batch_size, rng=train_rng(epoch)), epoch,
            start_step=start_step if epoch == start_epoch else 0,
            step_hook=step_hook, hook_every=config.ckpt_every_steps,
        )
        train_dt = time.time() - t0
        if (recycle and config.fds
                and int(jax.device_get(state.step)) - run_start_step >= recycle):
            # The FDS stats pass ships another full epoch of batches through
            # the retaining client — the 191k rehearsal's epoch-1 process
            # reached 126.7 GB RSS exactly at the FDS tail and had to be
            # stall-killed. A process that has already spent its shipping
            # budget on training recycles at the train/FDS seam instead:
            # resume lands at start_step == steps_per_epoch and falls through
            # to the FDS pass without replaying any optimizer step.
            save_checkpoint(store_dir, state, epoch, best_loss, is_best=False)
            logger.info("epoch %d train done at shipping budget — exiting for "
                        "supervised relaunch before the FDS pass", epoch)
            writer.close()
            raise SystemExit(3)
        state = trainer.fds_epoch_pass(
            state, batch_iterator(train, config.batch_size, rng=fds_rng(epoch)), epoch
        )
        overall, _ = validate(trainer, state, val, train_labels, config.batch_size)
        metric = overall["mse"] if config.loss == "mse" else overall["l1"]
        is_best = metric < best_loss
        best_loss = min(metric, best_loss)
        if config.save_ckpt:
            save_checkpoint(store_dir, state, epoch + 1, best_loss, is_best)
        elif is_best:
            # in-memory best (device-side copy — fresh buffers, safe from
            # the donated train-step aliasing). --save_ckpt 0 trades resume
            # safety for wall clock: an Orbax save costs ~15 s/epoch on this
            # host, dominating short ablation runs.
            best_state = jax.tree.map(jnp.copy, state)
            best_epoch_mem = epoch
        run_steps = steps_per_epoch - (start_step if epoch == start_epoch else 0)
        throughput = run_steps * config.batch_size / train_dt / num_chips
        writer.log_scalar("train_loss", train_loss, epoch)
        writer.log_scalar("val_loss_mse", overall["mse"], epoch)
        writer.log_scalar("val_loss_l1", overall["l1"], epoch)
        writer.log_scalar("val_loss_gmean", overall["gmean"], epoch)
        writer.log_scalar("images_per_sec_per_chip", throughput, epoch)
        rss, peak_rss = host_memory_gb()
        writer.log_scalar("host_rss_gb", rss, epoch)
        writer.log_scalar("host_peak_rss_gb", peak_rss, epoch)
        logger.info(
            "Epoch %d: train %s [%.4f]  val MSE [%.4f] L1 [%.4f] G-Mean [%.4f]  "
            "best %.3f  (%.1fs, %.0f img/s/chip, rss %.1f/%.1f GB)",
            epoch, config.loss.upper(), train_loss, overall["mse"], overall["l1"],
            overall["gmean"], best_loss, train_dt, throughput, rss, peak_rss,
        )
        if config.save_ckpt and recycle and epoch + 1 < config.epoch:
            # one epoch per process: the epoch's train + FDS passes ship
            # ~2x the train set through the retaining client — recycle at
            # the (always-safe) boundary rather than gamble on headroom.
            # (After the epoch summary above: a recycled epoch must still
            # record its throughput/RSS scalars — the 191k rehearsal's
            # per-epoch evidence comes from exactly these lines.)
            logger.info("epoch %d complete — exiting for supervised "
                        "relaunch (max_steps_per_run set)", epoch)
            writer.close()
            raise SystemExit(3)
    writer.close()

    logger.info("=" * 60)
    logger.info("Testing best model...")
    if config.save_ckpt:
        state, best_epoch, _ = restore_checkpoint(store_dir, state, which="best")
        logger.info("Loaded best checkpoint (epoch %d)", best_epoch)
    elif best_state is not None:
        state = best_state
        logger.info("Using in-memory best state (epoch %d)", best_epoch_mem)
    overall, shots = validate(trainer, state, test, train_labels, config.batch_size, "Test")
    return {"test": overall, "shots": shots, "best_loss": best_loss}


def main(argv=None):
    # --dataset selects the per-suite default profile (agedb: lds_ks=9,
    # fds_ks=9, bucket_start=3 — agedb-dir/train.py:29,37,40)
    config = parse_config(argv)
    run(config)


if __name__ == "__main__":
    main(sys.argv[1:])
