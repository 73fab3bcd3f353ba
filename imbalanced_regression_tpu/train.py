"""Unified TPU trainer for all DIR task families.

One jitted train step replaces the reference's three copy-pasted epoch loops
(``imdb-wiki-dir/train.py:234-283``, ``sts-b-dir/trainer.py:28-427``,
``nyud2-dir/train.py:181-228``). Key design points:

- **Single jit, GSPMD data parallelism**: batches are sharded over the mesh's
  ``data`` axis, state is replicated; XLA inserts the gradient all-reduce and
  the FDS-moment reductions over ICI (SURVEY.md §2.26).
- **FDS inside the step**: encodings are calibrated between backbone and head
  (where the reference calls ``FDS.smooth`` before the final linear).
- **Epoch-end FDS stats pass as streaming moments**: instead of gathering
  every encoding to host (``train.py:269-279``), per-batch bucket moments are
  accumulated on device; the final EMA update is mathematically identical.
  The pass intentionally runs the backbone in train mode (BN batch statistics
  update), matching the reference's ``model.train()`` + ``torch.no_grad()``
  combination during that pass.
- **Update ordering preserved**: ``update_last_epoch_stats(epoch)`` *then*
  ``update_running_stats(..., epoch)`` (``imdb-wiki-dir/train.py:280-281``) —
  i.e. the stats snapshot used for smoothing during epoch e+1 excludes epoch
  e's features. A quirk, but a load-bearing one for parity.
- **RRT** (two-stage regressor re-training): ``retrain_fc=True`` freezes every
  parameter outside the head via a masked optimizer
  (``imdb-wiki-dir/train.py:154-172``).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from imbalanced_regression_tpu.fds import (
    FDSConfig,
    FDSState,
    fds_apply_moments,
    fds_bucket_moments,
    fds_init,
    fds_smooth,
    fds_update_last_epoch_stats,
    fds_zero_moments,
)
from imbalanced_regression_tpu.data.streaming import prefetch_batches
from imbalanced_regression_tpu.ops.losses import LOSS_REGISTRY
from imbalanced_regression_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch

logger = logging.getLogger(__name__)

# steps between epoch-loop device syncs (see train_epoch); overridable for
# tests and unusual platforms
_SYNC_EVERY = int(os.environ.get("DIR_TPU_SYNC_EVERY", "128"))


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Optimization config mirroring the reference flags
    (``imdb-wiki-dir/train.py:49-66``)."""

    loss: str = "l1"
    optimizer: str = "adam"  # 'adam' | 'sgd'
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # torch-Adam-style L2 (gradient += wd * param before Adam); the age suites
    # run Adam without decay, NYUD2 with 1e-4 (nyud2-dir/train.py:146)
    adam_weight_decay: float = 0.0
    schedule: tuple[int, ...] = (60, 80)  # epochs at which lr drops 10x
    epochs: int = 90
    retrain_fc: bool = False
    clip_grad_norm: float | None = None  # STS uses 5.0 (trainer.py:40)
    huber_beta: float = 1.0
    target_scale: float = 1.0  # STS computes loss on target/5 (models.py:101-107)

    def loss_fn(self) -> Callable:
        fn = LOSS_REGISTRY[self.loss]
        if self.loss == "huber":
            beta = self.huber_beta
            return lambda p, t, w: fn(p, t, w, beta=beta)
        return fn


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    fds: FDSState | None
    dropout_rng: jax.Array


class Trainer:
    """Composable trainer: ``backbone.apply -> fds_smooth -> head.apply ->
    weighted loss``, one jit for train, one for eval, one for the FDS pass."""

    def __init__(
        self,
        backbone,
        head,
        config: TrainerConfig,
        fds_config: FDSConfig | None = None,
        mesh=None,
        lr_schedule: Callable | None = None,
        train_augment: Callable | None = None,
        eval_transform: Callable | None = None,
        weight_fn: Callable | None = None,
    ):
        self.backbone = backbone
        self.head = head
        self.config = config
        self.fds_config = fds_config
        # on-device input transforms, traced into the jit steps:
        # train_augment(rng, images), eval_transform(images);
        # weight_fn(batch) computes per-sample/per-pixel loss weights on
        # device (e.g. NYUD2's bucket-table lookup) instead of batch['weight']
        self.train_augment = train_augment
        self.eval_transform = eval_transform
        self.weight_fn = weight_fn
        self.mesh = mesh if mesh is not None else create_mesh()
        self._loss_fn = config.loss_fn()
        # per-epoch MultiStep lr (utils.py:81-86): lr * 0.1 per passed milestone
        self._lr_schedule = lr_schedule or (
            lambda epoch: config.lr * (0.1 ** sum(epoch >= m for m in config.schedule))
        )
        self.optimizer = self._build_optimizer()
        self._train_step = None
        self._eval_step = None
        self._fds_collect = None
        self._bound_data = None
        self._indexed_train_step = None
        self._indexed_fds_collect = None

    # ------------------------------------------------------------------ setup
    def _build_optimizer(self):
        cfg = self.config
        if cfg.optimizer == "adam":
            base = optax.adam(learning_rate=1.0)
            if cfg.adam_weight_decay:
                base = optax.chain(optax.add_decayed_weights(cfg.adam_weight_decay), base)
        elif cfg.optimizer == "sgd":
            base = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(learning_rate=1.0, momentum=cfg.momentum),
            )
        else:
            raise ValueError(f"optimizer must be 'adam' or 'sgd', got {cfg.optimizer!r}")

        # lr injected per-step via scale_by_learning_rate on a traced scalar:
        # keep base lr 1.0 and multiply by the scheduled lr in the step.
        tx = optax.chain(base)
        if cfg.clip_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), tx)
        if cfg.retrain_fc:
            # freeze everything but the head (RRT stage 2)
            def label_fn(params):
                return jax.tree.map_with_path(
                    lambda path, _: "train" if path[0].key == "head" else "freeze", params
                )
            tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, label_fn)
        return tx

    def init_state(self, rng: jax.Array, sample_input) -> TrainState:
        rng, b_rng, h_rng, d_rng = jax.random.split(rng, 4)
        variables = self.backbone.init(b_rng, sample_input, train=False)
        backbone_params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        enc_shape = jax.eval_shape(
            lambda v, x: self.backbone.apply(v, x, train=False), variables, sample_input
        ).shape
        head_params = self.head.init(
            h_rng, jnp.zeros((1,) + enc_shape[1:], jnp.float32)
        )["params"]
        params = {"backbone": backbone_params, "head": head_params}
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            fds=fds_init(self.fds_config) if self.fds_config else None,
            dropout_rng=d_rng,
        )

    # ------------------------------------------------------------------ steps
    def _forward(self, params, batch_stats, fds_state, batch, epoch, train, dropout_rng,
                 augment_rng=None):
        x = batch["input"]
        if train and self.train_augment is not None:
            x = self.train_augment(augment_rng, x)
        elif not train and self.eval_transform is not None:
            x = self.eval_transform(x)
        vars_in = {"params": params["backbone"], "batch_stats": batch_stats}
        if train:
            encoding, updates = self.backbone.apply(
                vars_in, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            new_stats = updates["batch_stats"]
        else:
            encoding = self.backbone.apply(vars_in, x, train=False)
            new_stats = batch_stats

        enc_s = encoding
        if self.fds_config is not None and train:
            enc_s = fds_smooth(
                self.fds_config, fds_state, encoding, batch["target"], epoch,
                bucket_idx=batch.get("bucket_idx"),
            )
        rngs = {"dropout": dropout_rng} if train else None
        pred = self.head.apply({"params": params["head"]}, enc_s, train=train, rngs=rngs)
        return pred, encoding, new_stats

    def _make_train_step(self):
        loss_fn = self._loss_fn
        scale = self.config.target_scale

        def train_step(state: TrainState, batch, epoch, lr):
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)
            dropout_rng, augment_rng = jax.random.split(step_rng)

            def loss_f(params):
                pred, _, new_stats = self._forward(
                    params, state.batch_stats, state.fds, batch, epoch, True, dropout_rng,
                    augment_rng=augment_rng,
                )
                target = batch["target"] / scale if scale != 1.0 else batch["target"]
                weights = self.weight_fn(batch) if self.weight_fn else batch.get("weight")
                loss = loss_fn(pred, target, weights)
                return loss, (new_stats, pred)

            (loss, (new_stats, pred)), grads = jax.value_and_grad(loss_f, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
            # optimizer runs at unit lr; the per-epoch scheduled lr is a traced
            # scalar so epoch-boundary drops don't retrigger compilation
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
            ), loss, pred

        return train_step

    def _make_eval_step(self):
        def eval_step(state: TrainState, batch):
            pred, _, _ = self._forward(
                state.params, state.batch_stats, state.fds, batch, 0, False, state.dropout_rng
            )
            return pred

        return eval_step

    def _make_fds_collect(self):
        cfg = self.fds_config

        def collect(state: TrainState, batch, augment_rng):
            # train-mode backbone (BN batch stats update, like the reference's
            # model.train() + no_grad stats pass), but pre-smooth encodings.
            # The age suites run this pass over the *augmented* train loader
            # (imdb-wiki-dir/train.py:273) — augmentation applies here too.
            x = batch["input"]
            if self.train_augment is not None:
                x = self.train_augment(augment_rng, x)
            vars_in = {"params": state.params["backbone"], "batch_stats": state.batch_stats}
            # dropout stays live here too: the STS FDS pass runs the forward
            # with the model left in train mode (sts-b-dir/trainer.py:158-166)
            encoding, updates = self.backbone.apply(
                vars_in, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": augment_rng},
            )
            moments = fds_bucket_moments(cfg, encoding, batch["target"], batch.get("bucket_idx"))
            return state.replace(batch_stats=updates["batch_stats"]), moments

        return collect

    def _jit(self):
        if self._train_step is None:
            repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
            data = batch_sharding(self.mesh)
            self._train_step = jax.jit(
                self._make_train_step(),
                in_shardings=(repl, data, None, None),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                self._make_eval_step(), in_shardings=(repl, data), out_shardings=repl
            )
            if self.fds_config is not None:
                self._fds_collect = jax.jit(
                    self._make_fds_collect(),
                    in_shardings=(repl, data, None),
                    out_shardings=(repl, repl),
                    donate_argnums=(0,),
                )

    # ---------------------------------------------------- device-resident data
    def bind_device_data(self, data: dict) -> None:
        """Ship a (small) full dataset to the mesh once; subsequent
        :meth:`train_step_indexed` / :meth:`fds_epoch_pass_indexed` calls
        gather their batch ON DEVICE from an index vector.

        Rationale: on the tunneled remote-TPU platform every host→device
        array transfer is a high-latency round trip, and a conventional loop
        ships 4-7 arrays per step — for STS-B that dominates the 60 ms step
        several-fold. The whole STS-B train split is ~2 MB, so the
        TPU-native design is device residency + a single [batch] int32
        index transfer per step. Data is replicated over the mesh; the
        per-step batch is re-sharded onto the data axis inside the jit, so
        multi-chip DP semantics are identical to the host-batch path
        (equality-tested on the virtual 8-device mesh)."""
        repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        self._bound_data = jax.device_put(data, repl)
        self._indexed_train_step = None
        self._indexed_fds_collect = None

    def _jit_indexed(self):
        self._jit()
        if self._indexed_train_step is not None:
            return
        repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        data_s = batch_sharding(self.mesh)
        train_step = self._make_train_step()

        def gather(data, idx):
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
            # constrain the gathered batch onto the data axis (idx arrives
            # replicated; without this the whole step would run replicated)
            return jax.lax.with_sharding_constraint(batch, data_s)

        def step_indexed(state, data, idx, epoch, lr):
            return train_step(state, gather(data, idx), epoch, lr)

        self._indexed_train_step = jax.jit(
            step_indexed,
            in_shardings=(repl, repl, repl, None, None),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0,),
        )
        if self.fds_config is not None:
            collect = self._make_fds_collect()

            def collect_indexed(state, data, idx, augment_rng):
                return collect(state, gather(data, idx), augment_rng)

            self._indexed_fds_collect = jax.jit(
                collect_indexed,
                in_shardings=(repl, repl, repl, None),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )

    def train_step_indexed(self, state: TrainState, idx, epoch: int):
        """One jitted step over ``bind_device_data`` rows ``idx`` (host
        int array, one ~0.5 KB transfer). Semantics identical to
        :meth:`train_step` on the gathered batch."""
        assert self._bound_data is not None, "call bind_device_data first"
        self._jit_indexed()
        lr = self._lr_schedule(epoch)
        # pass host numpy: jit places it per in_shardings (a pre-committed
        # single-device jnp array would conflict with the mesh sharding)
        idx = np.asarray(idx, np.int32)
        return self._indexed_train_step(state, self._bound_data, idx, epoch, lr)

    def fds_epoch_pass_indexed(self, state: TrainState, idx_batches, epoch: int) -> TrainState:
        """Indexed twin of :meth:`fds_epoch_pass` over device-resident data."""
        if self.fds_config is None or epoch < self.fds_config.start_update:
            return state
        assert self._bound_data is not None, "call bind_device_data first"
        self._jit_indexed()
        moments = fds_zero_moments(self.fds_config)
        rng = jax.random.key(epoch)
        for i, idx in enumerate(idx_batches):
            idx = np.asarray(idx, np.int32)
            state, m = self._indexed_fds_collect(
                state, self._bound_data, idx, jax.random.fold_in(rng, i))
            moments = moments + m
            if i % _SYNC_EVERY == _SYNC_EVERY - 1:
                jax.device_get(m.count)  # remote flush (see train_epoch)
        fds = fds_update_last_epoch_stats(self.fds_config, state.fds, epoch)
        fds = fds_apply_moments(self.fds_config, fds, moments, epoch)
        return state.replace(fds=fds)

    # ------------------------------------------------------------------ loops
    def _stage_batch(self, batch: dict):
        """Prefetch transform: materialize + ship one batch to the mesh."""
        return shard_batch(self.mesh, batch)

    def train_step(self, state: TrainState, batch: dict, epoch: int):
        """One jitted optimization step. Returns (state, loss, predictions);
        loss/preds stay on device (no host sync — fetch when needed)."""
        self._jit()
        lr = self._lr_schedule(epoch)
        batch = shard_batch(self.mesh, batch)
        return self._train_step(state, batch, epoch, lr)

    def train_epoch(self, state: TrainState, batches: Iterable[dict], epoch: int,
                    *, start_step: int = 0, step_hook: Callable | None = None,
                    hook_every: int = 0):
        """One epoch over host batches; returns (state, mean train loss).

        Losses stay on device until the epoch ends (a per-step host sync
        costs ~2x wall clock through the device tunnel); the loss-explosion
        guard (reference train.py:256) therefore fires at epoch granularity.

        Mid-epoch resume support (beyond the reference's epoch granularity,
        modeled on the STS driver's exact data-position restore,
        ``tasks/stsb.py`` / ``sts-b-dir/trainer.py:393-396``):

        - ``start_step``: skip the first N batches of the (per-epoch-seeded)
          stream without staging them to the device — with a lazy/mmap
          dataset the skipped batches are never decoded — so a resumed epoch
          continues the uninterrupted step sequence exactly (the augment /
          dropout RNGs fold in ``state.step``, which the checkpoint carries).
        - ``step_hook(state, step_in_epoch)``: called every ``hook_every``
          completed steps with the *post-step* state; drivers use it to
          write a mid-epoch checkpoint. The hook runs after a device sync so
          the state it sees is fully materialized."""
        self._jit()
        lr = self._lr_schedule(epoch)
        losses, counts = [], []
        it = iter(batches)
        for _ in range(start_step):
            if next(it, None) is None:
                break
        # host work (lazy decode / mmap page-in / device_put) for batch k+1
        # overlaps the device step k — the round-1 loop did both serially
        for i, batch in enumerate(prefetch_batches(it, transform=self._stage_batch),
                                  start=start_step):
            counts.append(len(jax.tree.leaves(batch)[0]))
            state, loss, _ = self._train_step(state, batch, epoch, lr)
            losses.append(loss)
            # Periodic device sync. On the remote-TPU platform only a VALUE
            # FETCH flushes enqueued execution (block_until_ready does not);
            # without it the client pins every staged batch's host buffer
            # until epoch end — ~29 GB and a tunnel stall at IMDB-WIKI scale
            # (1,496 steps x 19.3 MB uint8 batches). One scalar fetch per
            # _SYNC_EVERY steps (~30 ms) keeps the pipeline deep but bounded.
            if i % _SYNC_EVERY == _SYNC_EVERY - 1:
                # the fetched loss doubles as a babysit heartbeat: at IMDB-WIKI
                # scale an epoch is many minutes of otherwise silent log and
                # the stall supervisor would kill a healthy run
                logger.info("epoch %d: step %d, loss %.4f", epoch, i + 1,
                            float(jax.device_get(loss)))
            if step_hook is not None and hook_every and (i + 1) % hook_every == 0:
                jax.device_get(loss)  # flush before checkpointing
                step_hook(state, i + 1)
        if not losses:
            return state, 0.0
        losses = np.asarray(jax.device_get(jnp.stack(losses)))  # single flush
        if np.any(~np.isfinite(losses)) or np.any(losses > 1e6):
            raise FloatingPointError(f"Loss explosion: max={losses.max()}")
        counts = np.asarray(counts)
        return state, float((losses * counts).sum() / counts.sum())

    def fds_epoch_pass(self, state: TrainState, batches: Iterable[dict], epoch: int) -> TrainState:
        """Epoch-end FDS stats pass (streaming moments), preserving the
        reference's snapshot-then-update ordering."""
        if self.fds_config is None or epoch < self.fds_config.start_update:
            return state
        self._jit()
        moments = fds_zero_moments(self.fds_config)
        rng = jax.random.key(epoch)
        for i, batch in enumerate(prefetch_batches(batches, transform=self._stage_batch)):
            state, m = self._fds_collect(state, batch, jax.random.fold_in(rng, i))
            moments = moments + m
            if i % _SYNC_EVERY == _SYNC_EVERY - 1:
                jax.device_get(m.count)  # remote flush (see train_epoch)
                logger.info("fds stats pass: batch %d", i + 1)  # babysit heartbeat
        fds = fds_update_last_epoch_stats(self.fds_config, state.fds, epoch)
        fds = fds_apply_moments(self.fds_config, fds, moments, epoch)
        return state.replace(fds=fds)

    def predict_batch(self, state: TrainState, batch: dict, count: int | None = None) -> np.ndarray:
        """Predict one (possibly padded) eval batch; returns the first
        ``count`` rows on host. The public per-batch inference API — task
        drivers with custom eval loops (e.g. NYUD2's upsample+mask pass)
        build on this."""
        self._jit()
        batch = {k: v for k, v in batch.items() if k != "count"}
        n = count if count is not None else len(np.asarray(batch["target"]))
        p = self._eval_step(state, shard_batch(self.mesh, batch))
        return np.asarray(p)[:n]

    def predict(self, state: TrainState, batches: Iterable[dict]):
        """Gather predictions and targets on host for metric computation."""
        self._jit()
        preds, targets = [], []
        for batch in batches:
            n = batch.pop("count", len(np.asarray(batch["target"])))
            preds.append(self.predict_batch(state, batch, n))
            targets.append(np.asarray(batch["target"])[:n])
        return np.concatenate(preds), np.concatenate(targets)
