"""STS-B-DIR driver: iteration-based training with periodic validation and
patience early stopping.

Reference shape (``sts-b-dir/train.py`` + ``trainer.py:28-427``): infinite
reshuffled batch generator, validate every ``val_interval`` iterations (400),
track best val MSE, stop after ``patience`` (10) non-improving validation
checks or ``max_vals`` (100) checks; FDS stats pass at epoch rollovers
(``trainer.py:155-172``); loss computed on targets/5 with predictions x5 for
metrics; final evaluation on the test split with the best checkpoint.

Run: ``python -m imbalanced_regression_tpu.tasks.stsb --data_dir <dir with
train_new.tsv/dev_new.tsv/test_new.tsv> [--lds --reweight inverse ...]``
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.batching import (
    eval_batches,
    index_iterator,
    infinite_index_batches,
)
from imbalanced_regression_tpu.fds import FDSConfig
from imbalanced_regression_tpu.models.bilstm_pair import PairBiLSTMEncoder
from imbalanced_regression_tpu.models.resnet import RegressionHead
from imbalanced_regression_tpu.parallel.mesh import create_mesh
from imbalanced_regression_tpu.train import Trainer, TrainerConfig
from imbalanced_regression_tpu.utils.checkpoint import (
    load_backbone_params,
    load_metric_state,
    restore_checkpoint,
    save_checkpoint,
    save_metric_state,
)
from imbalanced_regression_tpu.utils.config import ExperimentConfig, build_parser
from imbalanced_regression_tpu.utils.logging_tools import MetricsWriter
from imbalanced_regression_tpu.utils.metrics import STSShotAverage

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class STSConfig(ExperimentConfig):
    """STS-B flags over the shared config (``sts-b-dir/train.py:19-95``)."""

    dataset: str = "stsb"
    loss: str = "mse"
    lr: float = 1e-4
    batch_size: int = 128
    bucket_num: int = 50
    lds_sigma: float = 2.0
    fds_sigma: float = 2.0
    max_seq_len: int = 40
    max_word_v_size: int = 30000
    word_embs_file: str = "glove/glove.840B.300d.txt"
    d_word: int = 300
    d_hid: int = 1500
    n_layers_enc: int = 2
    n_layers_highway: int = 0
    dropout: float = 0.2
    dropout_embs: float = 0.2
    glove: int = 1
    train_words: int = 0
    huber_beta: float = 0.3
    max_grad_norm: float = 5.0
    val_interval: int = 400
    max_vals: int = 100
    patience: int = 10
    eval_model: str = ""
    # 'fused' = TPU-optimized BiLSTM (hoisted input projections, one scan per
    # layer; models/bilstm_pair.py::FusedBiLSTM). Checkpoints written before
    # round 4 used the flax cell layout — evaluate them with 'flax'.
    lstm_impl: str = "fused"


def parse_sts_config(argv=None) -> STSConfig:
    d = STSConfig()
    p = build_parser(d)
    for name, default in (
        ("max_seq_len", d.max_seq_len), ("max_word_v_size", d.max_word_v_size),
        ("word_embs_file", d.word_embs_file), ("d_word", d.d_word), ("d_hid", d.d_hid),
        ("n_layers_enc", d.n_layers_enc), ("n_layers_highway", d.n_layers_highway),
        ("dropout", d.dropout), ("dropout_embs", d.dropout_embs), ("glove", d.glove),
        ("train_words", d.train_words), ("huber_beta", d.huber_beta),
        ("max_grad_norm", d.max_grad_norm), ("val_interval", d.val_interval),
        ("max_vals", d.max_vals), ("patience", d.patience), ("eval_model", d.eval_model),
        ("lstm_impl", d.lstm_impl),
    ):
        p.add_argument(f"--{name}", type=type(default), default=default)
    args, _ = p.parse_known_args(argv)
    kw = vars(args)
    kw["schedule"] = tuple(kw["schedule"])
    return STSConfig(**kw)


def build_sts_trainer(config: STSConfig, mesh, vocab_size: int, emb_table) -> Trainer:
    d_pair = 2 * config.d_hid * 4  # 12000 for defaults
    fds_config = None
    if config.fds:
        fds_config = FDSConfig.for_sts(
            feature_dim=d_pair, bucket_num=config.bucket_num,
            start_update=config.start_update, start_smooth=config.start_smooth,
            kernel=config.fds_kernel, ks=config.fds_ks, sigma=config.fds_sigma,
            momentum=config.fds_mmt,
        )
        if config.bucket_start:
            fds_config = dataclasses.replace(fds_config, bucket_start=config.bucket_start)
    encoder = PairBiLSTMEncoder(
        vocab_size=vocab_size, d_word=config.d_word, d_hid=config.d_hid,
        n_layers=config.n_layers_enc, n_highway=config.n_layers_highway,
        dropout=config.dropout, dropout_embs=config.dropout_embs,
        # without GloVe the embeddings must be learned (models.py:25-31)
        train_words=bool(config.train_words) or not config.glove,
        embedding_table=emb_table if config.glove else None,
        lstm_impl=config.lstm_impl,
        dtype=jnp.bfloat16,
    )
    tcfg = TrainerConfig(
        loss=config.loss, optimizer=config.optimizer, lr=config.lr,
        clip_grad_norm=config.max_grad_norm, huber_beta=config.huber_beta,
        target_scale=5.0, retrain_fc=config.retrain_fc,
        schedule=(),  # STS uses a flat lr (the reference's lr_decay is never applied)
    )
    return Trainer(encoder, RegressionHead(), tcfg, fds_config=fds_config, mesh=mesh)


def _ckpt_lstm_impl(ckpt_dir: str, which: str) -> str | None:
    """Detect which BiLSTM implementation wrote a checkpoint from its Orbax
    param-tree metadata: :class:`FusedBiLSTM` stores ``input_proj_<L>``
    kernels, the flax :class:`BiLSTM` stores ``OptimizedLSTMCell_*`` params.
    Returns None when undetectable (no checkpoint / foreign layout)."""
    meta = os.path.join(os.path.abspath(ckpt_dir), which, "_METADATA")
    if not os.path.isfile(meta):
        return None
    with open(meta) as fh:
        txt = fh.read()
    if "input_proj_0" in txt:
        return "fused"
    if "OptimizedLSTMCell_0" in txt:
        return "flax"
    return None


def _match_ckpt_lstm_impl(config: STSConfig, ckpt_dir: str, which: str) -> STSConfig:
    """Auto-select ``lstm_impl`` to match a checkpoint about to be restored.

    Round 4 changed the default to the TPU-optimized 'fused' layout; without
    this, ``--resume``/``--eval_model`` against a pre-round-4 checkpoint dies
    in an opaque Orbax tree-structure mismatch unless the user remembers
    ``--lstm_impl flax``. The two layouts are numerically equivalent
    (tests/test_bilstm.py), so matching the checkpoint is always correct."""
    impl = _ckpt_lstm_impl(ckpt_dir, which)
    if impl is not None and impl != config.lstm_impl:
        logger.warning(
            "Checkpoint %s/%s was written with lstm_impl=%r; overriding "
            "configured %r to match its parameter layout",
            ckpt_dir, which, impl, config.lstm_impl)
        return dataclasses.replace(config, lstm_impl=impl)
    return config


def is_new_best(history: list[float]) -> bool:
    """Whether the newest validation score (``history[-1]``) is a new best.

    Reference semantics (``sts-b-dir/trainer.py:59-62``, should_decrease):
    the score counts as best only when the best value's *first* index in the
    history is the last element — i.e. strict improvement; a tie with any
    earlier check is NOT a new best."""
    return len(history) == 1 or history[-1] < min(history[:-1])


def score_split(trainer, state, data, batch_size, return_preds: bool = False):
    scorer = STSShotAverage()
    preds, labels = trainer.predict(state, eval_batches(data, batch_size))
    scorer(preds.reshape(-1), labels.reshape(-1))
    metric = scorer.get_metric()
    if return_preds:
        return metric, preds, labels
    return metric


def export_predictions(store_dir: str, name: str, preds, labels) -> str:
    """Save test-split predictions the reference way: x5 rescale clamped to
    [0,5] (``sts-b-dir/evaluate.py:41``), compressed npz named after the
    store (``sts-b-dir/train.py:207``)."""
    path = os.path.join(store_dir, f"{name}.npz")
    clamped = np.clip(np.asarray(preds, np.float32).reshape(-1) * 5.0, 0.0, 5.0)
    np.savez_compressed(path, preds=clamped, labels=np.asarray(labels).reshape(-1))
    return path


def _log_shots(metric: dict, prefix: str):
    for shot in ("overall", "many", "medium", "few"):
        m = metric[shot]
        logger.info("%s * %s: MSE %.3f  L1 %.3f  G-Mean %.3f  Pearson %.3f  "
                    "Spearman %.3f  Number %d", prefix, shot.capitalize(),
                    m["mse"], m["l1"], m["gmean"], m["pearsonr"], m["spearmanr"],
                    m["num_samples"])


def run(config: STSConfig) -> dict:
    from imbalanced_regression_tpu.tasks.age import setup_logging
    from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    store_dir = os.path.join(config.store_root, config.derived_store_name())
    setup_logging(store_dir)
    logger.info("Config: %s", config)

    from imbalanced_regression_tpu.data.stsb import load_stsb_datasets

    train, val, test, emb, vocab = load_stsb_datasets(config.data_dir, config)
    # before building the model, match lstm_impl to any checkpoint this run
    # will restore (evaluate / resume / RRT stage-1) — see _match_ckpt_lstm_impl
    if config.retrain_fc and config.pretrained:
        config = _match_ckpt_lstm_impl(config, config.pretrained, "best")
    if config.evaluate:
        probe = config.resume or getattr(config, "eval_model", "") or store_dir
        config = _match_ckpt_lstm_impl(config, probe, "best")
    elif config.resume:
        # probed after --pretrained: the full-state self-resume restore is the
        # binding one when both exist
        for which in ("latest", "best"):
            if os.path.isdir(os.path.join(config.resume, which)):
                config = _match_ckpt_lstm_impl(config, config.resume, which)
                break
    mesh = create_mesh(config.num_devices)
    trainer = build_sts_trainer(config, mesh, len(vocab), emb)
    sample = jax.tree.map(lambda v: v[:2], train["input"])
    state = trainer.init_state(jax.random.key(config.start_update + 111 + config.seed), sample)

    if config.evaluate:
        # --eval_model path parity (sts-b-dir/train.py:196-207): default to
        # the run's own store dir when no explicit checkpoint is given
        ckpt = config.resume or getattr(config, "eval_model", "") or store_dir
        state, _, _ = restore_checkpoint(ckpt, state, which="best")
        metric = score_split(trainer, state, test, config.batch_size)
        _log_shots(metric, "Test")
        return {"test": metric}

    if config.retrain_fc:
        # RRT stage 2 (sts-b-dir/train.py:180-191): load the stage-1 encoder
        # weights only (resume_checkpoint backbone_only=True loads just
        # pair_encoder.*, util.py:75-84 — the pred layer stays fresh and, for
        # STS, FDS running stats are NOT restored), then train the regression
        # head alone (the trainer's masked optimizer freezes the rest).
        assert config.pretrained, "RRT stage 2 needs --pretrained <stage-1 ckpt dir>"
        state = load_backbone_params(config.pretrained, state, restore_fds=False)
        logger.info("RRT: loaded pretrained encoder from %s; retraining the "
                    "regression layer only", config.pretrained)

    n_tr_batches = max(len(train["target"]) // config.batch_size, 1)

    history: list[float] = []
    best_mse, n_pass, real_epoch = float("inf"), 0, 0
    resume_from = None
    if config.resume:
        # prefer latest; fall back to best when a crash left latest half-written
        for which in ("latest", "best"):
            if os.path.isdir(os.path.join(config.resume, which)):
                resume_from = which
                break
    if resume_from:
        state, real_epoch, best_mse = restore_checkpoint(config.resume, state, which=resume_from)
        n_pass = int(state.step)
        # full metric history restores so patience/stopping decisions are
        # identical to an uninterrupted run (trainer.py:398-402)
        metric_state = load_metric_state(config.resume, which=resume_from)
        if metric_state is not None:
            history = [float(h) for h in metric_state["hist"]]
            best_mse = float(metric_state["best"])
        else:
            history = [best_mse]
        logger.info("Resumed %s at iter %d (epoch %d, best val MSE %.4f)",
                    config.resume, n_pass, real_epoch, best_mse)
    # exact data-position restore: per-epoch-seeded shuffles make the resumed
    # stream identical to the uninterrupted one (vs the reference's
    # best-effort fast-forward, trainer.py:393-396).
    # Device-resident data + index batching: the whole STS-B train split is
    # ~2 MB, so it lives on the mesh and each step ships ONE [batch] int32
    # index vector instead of 6 batch arrays — on the tunneled remote
    # platform per-array transfer latency dominated the step several-fold
    # (RESULTS.md round-4 measurements).
    n_train = len(train["target"])
    trainer.bind_device_data(train)
    gen = infinite_index_batches(n_train, config.batch_size,
                                 seed=111 + config.seed, start_batches=n_pass)
    stopped = False
    writer = MetricsWriter(store_dir)
    train_scorer = STSShotAverage()
    train_losses: list = []
    train_preds: list = []  # (pred, target) device pairs since last val check
    while not stopped and n_pass < config.val_interval * config.max_vals:
        idx, _ = next(gen)
        state, loss, pred = trainer.train_step_indexed(state, idx, real_epoch)
        train_losses.append(loss)
        train_preds.append((pred, train["target"][idx]))  # host-side gather
        n_pass += 1
        if n_pass % 100 == 0 and n_pass % config.val_interval != 0:
            # heartbeat for the babysitter's stall detector (a 400-iteration
            # val interval is minutes of otherwise silent log) — the loss
            # fetch doubles as the periodic remote flush that bounds the
            # dispatch-ahead queue (cf. Trainer.train_epoch's _SYNC_EVERY)
            jax.device_get(loss)
            logger.info("iter %d/%d", n_pass, config.val_interval * config.max_vals)

        if n_pass // n_tr_batches > real_epoch:
            # epoch rollover → FDS stats pass (trainer.py:155-172), indexed
            # over the device-resident data (same shuffle stream as the
            # batch_iterator formulation: shared index_iterator)
            state = trainer.fds_epoch_pass_indexed(
                state, index_iterator(n_train, config.batch_size,
                                      rng=np.random.default_rng(config.seed * 10007 + real_epoch)),
                real_epoch,
            )
            real_epoch += 1

        if n_pass % config.val_interval == 0:
            val_check = n_pass // config.val_interval
            # training statistics since the last check (trainer.py:188-207).
            # Losses/preds accumulated on device across the interval come
            # back in ONE fetch each: per-item np.asarray/float() costs a
            # ~30 ms tunnel round trip, and 2x400 of them made every val
            # check ~24 s slower than the math it runs (round-5 measurement)
            if train_preds:
                preds_cat = np.asarray(jax.device_get(
                    jnp.concatenate([p for p, _ in train_preds])))
                targs_cat = np.concatenate([t for _, t in train_preds])
                train_scorer(preds_cat.reshape(-1), targs_cat.reshape(-1))
            tr_loss = float(np.mean(np.asarray(jax.device_get(
                jnp.stack(train_losses))))) if train_losses else 0.0
            logger.info("*** Val check %d (iter %d, epoch %d) ***", val_check, n_pass, real_epoch)
            logger.info("train loss: %.6f", tr_loss)
            _log_shots(train_scorer.get_metric(reset=True), "Train")
            train_losses, train_preds = [], []

            metric = score_split(trainer, state, val, config.batch_size)
            cur = metric["overall"]["mse"]
            history.append(cur)
            _log_shots(metric, "Val")
            writer.log_scalar("train_loss", tr_loss, val_check)
            writer.log_dict(metric["overall"], val_check, prefix="val_")
            is_best = is_new_best(history)
            if is_best:
                best_mse = cur
            save_checkpoint(store_dir, state, real_epoch, best_mse, is_best)
            save_metric_state(store_dir, history, best_mse, is_best)
            # reference patience rule (trainer.py:50-74, should_decrease=True):
            # out of patience when the current score is >= every score in the
            # trailing window of `patience + 1` checks
            window = config.patience + 1
            if len(history) > window and max(history[-window:]) <= cur:
                logger.info("Out of patience after %d val checks", val_check)
                stopped = True

    writer.close()
    logger.info("Training stopped after %d iterations (%d val checks)",
                n_pass, len(history))
    state, best_epoch, best = restore_checkpoint(store_dir, state, which="best")
    logger.info("Loaded best checkpoint (epoch %d, val MSE %.4f)", best_epoch, best)
    metric, preds, labels = score_split(trainer, state, test, config.batch_size, return_preds=True)
    _log_shots(metric, "Test")
    # test predictions exported clamped to [0,5] (sts-b-dir/train.py:207)
    export_predictions(store_dir, config.store_name or "sts", preds, labels)
    return {"test": metric, "best_val_mse": best_mse, "iterations": n_pass}


def main(argv=None):
    run(parse_sts_config(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
