"""Torch → Flax ResNet weight converter.

The reference initializes its NYUD2 encoder from torchvision ImageNet weights
(``/root/reference/nyud2-dir/models/resnet.py:175-183``, loaded in
``nyud2-dir/train.py:110-114`` via ``resnet.resnet50(pretrained=True)``) and
saves age-suite checkpoints as plain ``model.state_dict()`` with the same
``conv1/bn1/layer{1..4}.{i}.conv{j}/bn{j}/downsample.{0,1}`` naming
(``imdb-wiki-dir/resnet.py:73-157``, head ``linear``; torchvision head ``fc``).
This tool maps those state_dicts onto the framework's Flax modules
(:class:`~imbalanced_regression_tpu.models.resnet.ResNetBackbone` /
:class:`ResNetBasicBackbone`) so quality-parity runs can start from the same
pretrained weights without torch on the training host.

Layout transforms:
- conv weight  OIHW → HWIO (``transpose(2, 3, 1, 0)``)
- BN ``weight/bias`` → params ``scale/bias``; ``running_mean/var`` →
  batch_stats ``mean/var``
- linear weight (out, in) → Dense kernel (in, out)

CLI::

    python -m tools.convert_torch model.pth out.msgpack --arch resnet50

writes a msgpack file holding ``{"params": ..., "batch_stats": ...}`` (plus
``"head"`` if the state_dict carries ``fc``/``linear``) that
:func:`load_converted` reads back without torch installed.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Mapping

import numpy as np

ARCHS = {
    # name -> (block kind, stage sizes)
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}

# keys the reference age checkpoints carry that have no Flax counterpart:
# FDS buffers (imdb-wiki-dir/fds.py registers running/smoothed stats) and
# BN num_batches_tracked counters.
_IGNORED_SUBSTRINGS = ("FDS.", "num_batches_tracked")


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _conv(sd: Mapping[str, Any], key: str) -> np.ndarray:
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd: Mapping[str, Any], prefix: str):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def normalize_state_dict(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Unwrap ``{'state_dict': ...}`` containers and strip the
    ``module.`` DataParallel prefix the reference training saves with
    (``imdb-wiki-dir/train.py:115``: ``torch.nn.DataParallel(model)``)."""
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_resnet(
    state_dict: Mapping[str, Any],
    stage_sizes=(3, 4, 6, 3),
    block: str = "bottleneck",
) -> dict[str, Any]:
    """Convert a torchvision-style ResNet state_dict to Flax variables.

    Returns ``{"params": ..., "batch_stats": ..., "head": ...}`` where
    params/batch_stats fit ``ResNetBackbone`` (``block='bottleneck'``) or
    ``ResNetBasicBackbone`` (``'basic'``) with the given ``stage_sizes``, and
    ``head`` (present only if the state_dict has an ``fc``/``linear`` layer)
    fits :class:`RegressionHead`'s Dense.
    """
    sd = normalize_state_dict(state_dict)
    n_convs = 3 if block == "bottleneck" else 2
    block_name = "Bottleneck" if block == "bottleneck" else "BasicBlock"

    params: dict[str, Any] = {"Conv_0": {"kernel": _conv(sd, "conv1.weight")}}
    stats: dict[str, Any] = {}
    bn_p, bn_s = _bn(sd, "bn1")
    params["BatchNorm_0"] = bn_p
    stats["BatchNorm_0"] = bn_s

    consumed = {"conv1.weight", "bn1.weight", "bn1.bias",
                "bn1.running_mean", "bn1.running_var"}
    k = 0  # global block index (Flax compact numbering spans stages)
    for stage, num_blocks in enumerate(stage_sizes):
        for i in range(num_blocks):
            t = f"layer{stage + 1}.{i}"
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            for j in range(n_convs):
                bp[f"Conv_{j}"] = {"kernel": _conv(sd, f"{t}.conv{j + 1}.weight")}
                p, s = _bn(sd, f"{t}.bn{j + 1}")
                bp[f"BatchNorm_{j}"] = p
                bs[f"BatchNorm_{j}"] = s
                consumed |= {f"{t}.conv{j + 1}.weight"} | {
                    f"{t}.bn{j + 1}.{x}"
                    for x in ("weight", "bias", "running_mean", "running_var")}
            if f"{t}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {"kernel": _conv(sd, f"{t}.downsample.0.weight")}
                p, s = _bn(sd, f"{t}.downsample.1")
                bp[f"BatchNorm_{n_convs}"] = p
                bs[f"BatchNorm_{n_convs}"] = s
                consumed |= {f"{t}.downsample.0.weight"} | {
                    f"{t}.downsample.1.{x}"
                    for x in ("weight", "bias", "running_mean", "running_var")}
            params[f"{block_name}_{k}"] = bp
            stats[f"{block_name}_{k}"] = bs
            k += 1

    out: dict[str, Any] = {"params": params, "batch_stats": stats}
    for head in ("fc", "linear"):
        if f"{head}.weight" in sd:
            out["head"] = {"Dense_0": {"kernel": _np(sd[f"{head}.weight"]).T,
                                       "bias": _np(sd[f"{head}.bias"])}}
            consumed |= {f"{head}.weight", f"{head}.bias"}
            break

    leftover = [x for x in sd if x not in consumed
                and not any(s in x for s in _IGNORED_SUBSTRINGS)]
    if leftover:
        raise KeyError(f"unconverted torch keys (wrong --arch?): {leftover[:8]}")
    return out


def load_torch_file(path: str) -> dict[str, Any]:
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    return normalize_state_dict(sd)


def save_converted(path: str, tree: dict[str, Any]) -> None:
    from flax.serialization import msgpack_serialize

    with open(path, "wb") as f:
        f.write(msgpack_serialize(tree))


def load_converted(path: str) -> dict[str, Any]:
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        return msgpack_restore(f.read())


def graft_encoder(state, converted: dict[str, Any], submodule: str | None = None):
    """Graft converted backbone weights into a live ``TrainState``.

    ``submodule=None`` replaces the whole backbone subtree (the age suites,
    where the torch model IS the backbone); ``submodule='encoder'`` replaces
    just the named encoder inside a composite backbone (NYUD2's
    ``DepthEncoderDecoder``, matching the reference's ImageNet encoder init,
    ``nyud2-dir/train.py:110-114``). Head weights in ``converted`` are applied
    only in whole-backbone mode (NYUD2's ImageNet fc has no depth meaning).
    Shapes are validated against the existing tree.
    """
    import jax

    params = jax.tree.map(lambda x: x, state.params)  # shallow-copy containers
    batch_stats = jax.tree.map(lambda x: x, dict(state.batch_stats))

    def _check(old, new, where):
        o = jax.tree.map(np.shape, old)
        n = jax.tree.map(np.shape, new)
        if o != n:
            raise ValueError(f"{where}: converted tree does not match model: {o} vs {n}")

    if submodule is None:
        _check(params["backbone"], converted["params"], "params.backbone")
        params = dict(params)
        params["backbone"] = converted["params"]
        _check(batch_stats, converted["batch_stats"], "batch_stats")
        batch_stats = converted["batch_stats"]
        if "head" in converted and "head" in params:
            _check(params["head"], converted["head"], "params.head")
            params["head"] = converted["head"]
    else:
        _check(params["backbone"][submodule], converted["params"], f"params.{submodule}")
        params = dict(params)
        params["backbone"] = dict(params["backbone"])
        params["backbone"][submodule] = converted["params"]
        batch_stats = dict(batch_stats)
        _check(batch_stats[submodule], converted["batch_stats"], f"batch_stats.{submodule}")
        batch_stats[submodule] = converted["batch_stats"]
    return state.replace(params=params, batch_stats=batch_stats)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="torch .pth/.pt checkpoint (state_dict or wrapped)")
    p.add_argument("dst", help="output msgpack path")
    p.add_argument("--arch", default="resnet50", choices=sorted(ARCHS))
    args = p.parse_args(argv)
    block, stages = ARCHS[args.arch]
    tree = convert_resnet(load_torch_file(args.src), stage_sizes=stages, block=block)
    save_converted(args.dst, tree)
    n = sum(x.size for x in _tree_leaves(tree))
    print(f"converted {args.arch}: {n:,} values -> {args.dst}")


def _tree_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _tree_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main(sys.argv[1:])
