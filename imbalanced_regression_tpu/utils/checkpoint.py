"""Orbax checkpointing: full train state (params, BN stats, optimizer, FDS
buffers, epoch bookkeeping) with a separate "best" snapshot.

Replaces the reference's ``torch.save({'epoch', 'model', 'best_loss',
'state_dict', 'optimizer'})`` + best-copy flow (``imdb-wiki-dir/utils.py:89-94``,
``train.py:185-196,209-215``). FDS running statistics ride along because they
are part of :class:`TrainState` (the reference persists them as registered
buffers, ``fds.py:28-35``). Also provides the RRT backbone-only load that
drops head parameters (``train.py:174-183``)."""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state, epoch: int, best_loss: float, is_best: bool) -> None:
    """Save latest (and optionally best) full-state checkpoints."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    payload = {
        "state": state,
        "meta": {"epoch": epoch, "best_loss": float(best_loss)},
    }
    with _checkpointer() as cp:
        cp.save(os.path.join(ckpt_dir, "latest"), payload, force=True)
        if is_best:
            cp.save(os.path.join(ckpt_dir, "best"), payload, force=True)


def restore_checkpoint(ckpt_dir: str, state_template, which: str = "latest"):
    """Restore (state, epoch, best_loss) from a checkpoint directory.

    ``state_template`` is a concrete state (e.g. fresh ``init_state`` output)
    providing the tree structure/shapes/shardings for restoration."""
    path = os.path.join(os.path.abspath(ckpt_dir), which)
    template = {"state": state_template, "meta": {"epoch": 0, "best_loss": 0.0}}
    with _checkpointer() as cp:
        payload = cp.restore(path, template)
    return payload["state"], int(payload["meta"]["epoch"]), float(payload["meta"]["best_loss"])


def save_metric_state(ckpt_dir: str, history, best: float, is_best: bool) -> None:
    """Persist the validation-metric history alongside the state checkpoint.

    The reference stores the full per-metric history in ``metric_state.th``
    (``sts-b-dir/trainer.py:357-363``) and restores it on resume
    (``trainer.py:398-402``) so patience/early-stopping decisions after a
    resume are identical to an uninterrupted run. Writes are tmp+rename so a
    crash never leaves a half-written file."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"hist": [float(h) for h in history], "best": float(best)}
    names = ["metric_state.json"] + (["metric_state_best.json"] if is_best else [])
    for name in names:
        tmp = os.path.join(ckpt_dir, name + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(ckpt_dir, name))


def load_metric_state(ckpt_dir: str, which: str = "latest") -> dict | None:
    """Restore ``{'hist': [...], 'best': float}`` or None if never saved."""
    name = "metric_state.json" if which == "latest" else "metric_state_best.json"
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    if not os.path.isfile(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def load_backbone_params(ckpt_dir: str, state, which: str = "best", restore_fds: bool = True):
    """RRT stage-2: restore backbone parameters (and BN stats) only, keeping
    the freshly initialized head — the reference filters out 'linear'/'fc'
    keys (``imdb-wiki-dir/train.py:174-183``).

    Restores *partially* (params + batch_stats subtrees, nothing else): the
    stage-2 state's masked optimizer (``retrain_fc``) has a different
    opt_state tree than the stage-1 checkpoint's plain optimizer, so a
    full-state template restore would fail on the structure mismatch — and
    the reference likewise ignores the checkpoint's optimizer state when
    loading a pretrained backbone (``train.py:174-183`` touches only
    ``state_dict``).

    ``restore_fds``: the age suites' key filter keeps every non-'fc'/'linear'
    key, so 'module.FDS.*' running stats DO ride along when the stage-1
    checkpoint has them (``imdb-wiki-dir/train.py:174-183``); STS's
    ``resume_checkpoint(backbone_only=True)`` loads only ``pair_encoder.*``
    and drops FDS stats (``sts-b-dir/util.py:75-84``). Pass True for age-family
    semantics (silently kept fresh when either side has no FDS state), False
    for STS semantics."""
    path = os.path.join(os.path.abspath(ckpt_dir), which)
    template = {"state": {"params": state.params, "batch_stats": state.batch_stats}}
    if restore_fds and state.fds is not None:
        template["state"]["fds"] = state.fds
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as cp:
        try:
            payload = _partial_restore(cp, path, template)
        except Exception:
            if "fds" not in template["state"]:
                raise
            # stage-1 checkpoint has no FDS subtree (e.g. a vanilla run):
            # keep the freshly initialized stats, like the reference loading
            # a checkpoint that simply has no FDS keys
            del template["state"]["fds"]
            payload = _partial_restore(cp, path, template)
    params = dict(state.params)
    params["backbone"] = payload["state"]["params"]["backbone"]
    return state.replace(
        params=params,
        batch_stats=payload["state"]["batch_stats"],
        fds=payload["state"].get("fds", state.fds),
    )


def _partial_restore(cp, path: str, template: dict):
    return cp.restore(
        path,
        args=ocp.args.PyTreeRestore(
            item=template,
            restore_args=ocp.checkpoint_utils.construct_restore_args(template),
            partial_restore=True,
        ),
    )


def state_byte_size(state) -> int:
    return sum(leaf.nbytes for leaf in jax.tree.leaves(state) if hasattr(leaf, "nbytes"))
