"""Experiment configuration preserving the reference CLI flag surface.

One dataclass replaces the three per-suite argparse blocks
(``imdb-wiki-dir/train.py:23-73``, ``sts-b-dir/train.py:19-95``,
``nyud2-dir/train.py:15-57``). Flag names, choices and defaults match the
reference; the derived experiment store name follows the same recipe
(``imdb-wiki-dir/train.py:78-93``)."""

from __future__ import annotations

import argparse
import dataclasses


@dataclasses.dataclass
class ExperimentConfig:
    # imbalanced-regression techniques
    lds: bool = False
    lds_kernel: str = "gaussian"
    lds_ks: int = 5
    lds_sigma: float = 1.0
    fds: bool = False
    fds_kernel: str = "gaussian"
    fds_ks: int = 5
    fds_sigma: float = 1.0
    start_update: int = 0
    start_smooth: int = 1
    bucket_num: int = 100
    bucket_start: int = 0
    fds_mmt: float = 0.9
    reweight: str = "none"  # none | sqrt_inv | inverse
    retrain_fc: bool = False
    # training/optimization
    dataset: str = "imdb_wiki"  # imdb_wiki | agedb | stsb | nyud2 | synthetic
    data_dir: str = "./data"
    model: str = "resnet50"
    store_root: str = "checkpoint"
    store_name: str = ""
    optimizer: str = "adam"
    loss: str = "l1"
    lr: float = 1e-3
    epoch: int = 90
    momentum: float = 0.9
    weight_decay: float = 1e-4
    schedule: tuple[int, ...] = (60, 80)
    batch_size: int = 256
    print_freq: int = 10
    img_size: int = 224
    workers: int = 8
    max_target: int = 121  # integer age bins [0, max_target)
    # checkpoints
    resume: str = ""
    pretrained: str = ""
    evaluate: bool = False
    # TPU-native extras (not in the reference)
    synthetic_size: int = 0  # >0: synthetic dataset of this size (smoke/bench)
    num_devices: int | None = None
    # backbone rematerialization: "" (off) | conv_outs (save conv outputs,
    # recompute BN/ReLU in backward — cuts HBM residual traffic) | block
    remat: str = ""
    # bounded-memory image input (data/streaming.py): ram | mmap | stream |
    # auto (ram if the decoded corpus fits ram_budget_gb, else mmap — the
    # reference instead streams through a 32-worker DataLoader,
    # imdb-wiki-dir/train.py:128-133)
    data_mode: str = "auto"
    ram_budget_gb: float = 8.0
    cache_dir: str = ""  # decoded-image cache location (default: data_dir/_cache)
    # experiment seed: init + shuffle streams (synthetic data generation stays
    # seed-fixed so every seed trains on the same dataset). The reference has
    # no seed flag; this powers multi-seed mean±std reporting (RESULTS.md).
    seed: int = 0
    # --save_ckpt 0 keeps the best state in device memory instead of writing
    # Orbax checkpoints every epoch (an epoch-save costs ~15 s on this host —
    # dominating short ablation runs); resume is unavailable in that mode.
    save_ckpt: int = 1
    # mid-epoch checkpoint cadence for the epoch drivers (age/NYUD2): write a
    # "latest" checkpoint every N optimization steps so a babysit restart
    # resumes inside the epoch instead of repeating it (0 = epoch-end only,
    # the reference's own granularity). Requires save_ckpt=1.
    ckpt_every_steps: int = 0
    # supervised process recycling (age driver): exit rc=3 right after a
    # checkpoint once this process has run N optimization steps, and at every
    # epoch boundary, so tools/babysit relaunches with --resume. Motivation:
    # the tunneled remote-TPU client retains the host buffer of EVERY batch
    # shipped to the device (~30 MB/step at IMDB-WIKI scale, measured round 5
    # — anonymous RSS grows at exactly the transfer rate), so any
    # sufficiently long process OOMs; bit-exact mid-epoch resume makes a
    # clean pre-emptive restart free. 0 = off. Requires ckpt_every_steps.
    max_steps_per_run: int = 0

    def derived_store_name(self) -> str:
        """Reference naming scheme (``imdb-wiki-dir/train.py:78-93``)."""
        name = f"_{self.store_name}" if self.store_name else ""
        if not self.lds and self.reweight != "none":
            name += f"_{self.reweight}"
        if self.lds:
            name += f"_lds_{self.lds_kernel[:3]}_{self.lds_ks}"
            if self.lds_kernel in ("gaussian", "laplace"):
                name += f"_{self.lds_sigma}"
        if self.fds:
            name += f"_fds_{self.fds_kernel[:3]}_{self.fds_ks}"
            if self.fds_kernel in ("gaussian", "laplace"):
                name += f"_{self.fds_sigma}"
            name += f"_{self.start_update}_{self.start_smooth}_{self.fds_mmt}"
        if self.retrain_fc:
            name += "_retrain_fc"
        base = f"{self.dataset}_{self.model}{name}_{self.optimizer}_{self.loss}_{self.lr}_{self.batch_size}"
        # seed suffix only when non-default, keeping reference-identical names
        # for the documented recipes
        return f"{base}_seed{self.seed}" if self.seed else base


# Per-suite default deltas relative to the IMDB-WIKI profile (the dataclass
# defaults above). Sources: ``agedb-dir/train.py:29,37,40`` (lds_ks=9,
# fds_ks=9, bucket_start=3), ``sts-b-dir/train.py:54-57,70,76,79`` (mse loss,
# lr=1e-4, batch 128, sigma=2, bucket_num=50), ``nyud2-dir/train.py:18-48``
# (10 epochs, lr=1e-4, batch 32, sigma=2, bucket_start=7, inline MSE loss).
# Selecting ``--dataset agedb`` etc. must pick these up automatically — the
# reference user gets them from the per-suite argparse block.
DATASET_DEFAULTS: dict[str, dict] = {
    "imdb_wiki": {},
    "agedb": {"lds_ks": 9, "fds_ks": 9, "bucket_start": 3},
    "stsb": {
        "lds_sigma": 2.0, "fds_sigma": 2.0, "bucket_num": 50,
        "loss": "mse", "lr": 1e-4, "batch_size": 128,
    },
    "nyud2": {
        "lds_sigma": 2.0, "fds_sigma": 2.0, "bucket_start": 7,
        "loss": "mse", "lr": 1e-4, "batch_size": 32, "epoch": 10,
    },
}


def defaults_for_dataset(dataset: str, base: ExperimentConfig | None = None) -> ExperimentConfig:
    """Apply the per-suite default profile for ``dataset`` over ``base``.

    Fields the caller already customized in ``base`` (differ from the stock
    dataclass default) are left alone — explicit caller defaults outrank the
    dataset profile, mirroring how an explicit CLI flag outranks both.
    """
    base = base or ExperimentConfig()
    stock = ExperimentConfig()
    overrides = {
        field: value
        for field, value in DATASET_DEFAULTS.get(dataset, {}).items()
        if getattr(base, field) == getattr(stock, field)
    }
    return dataclasses.replace(base, dataset=dataset, **overrides)


def build_parser(defaults: ExperimentConfig | None = None) -> argparse.ArgumentParser:
    d = defaults or ExperimentConfig()
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    # LDS
    p.add_argument("--lds", action="store_true", default=d.lds, help="whether to enable LDS")
    p.add_argument("--lds_kernel", type=str, default=d.lds_kernel,
                   choices=["gaussian", "triang", "laplace"], help="LDS kernel type")
    p.add_argument("--lds_ks", type=int, default=d.lds_ks, help="LDS kernel size (odd)")
    p.add_argument("--lds_sigma", type=float, default=d.lds_sigma, help="LDS gaussian/laplace sigma")
    # FDS
    p.add_argument("--fds", action="store_true", default=d.fds, help="whether to enable FDS")
    p.add_argument("--fds_kernel", type=str, default=d.fds_kernel,
                   choices=["gaussian", "triang", "laplace"], help="FDS kernel type")
    p.add_argument("--fds_ks", type=int, default=d.fds_ks, help="FDS kernel size (odd)")
    p.add_argument("--fds_sigma", type=float, default=d.fds_sigma, help="FDS gaussian/laplace sigma")
    p.add_argument("--start_update", type=int, default=d.start_update)
    p.add_argument("--start_smooth", type=int, default=d.start_smooth)
    p.add_argument("--bucket_num", type=int, default=d.bucket_num)
    p.add_argument("--bucket_start", type=int, default=d.bucket_start)
    p.add_argument("--fds_mmt", type=float, default=d.fds_mmt)
    # re-weighting / RRT
    p.add_argument("--reweight", type=str, default=d.reweight,
                   choices=["none", "sqrt_inv", "inverse"])
    p.add_argument("--retrain_fc", action="store_true", default=d.retrain_fc)
    # training
    p.add_argument("--dataset", type=str, default=d.dataset)
    p.add_argument("--data_dir", type=str, default=d.data_dir)
    p.add_argument("--model", type=str, default=d.model)
    p.add_argument("--store_root", type=str, default=d.store_root)
    p.add_argument("--store_name", type=str, default=d.store_name)
    p.add_argument("--optimizer", type=str, default=d.optimizer, choices=["adam", "sgd"])
    p.add_argument("--loss", type=str, default=d.loss,
                   choices=["mse", "l1", "focal_l1", "focal_mse", "huber"])
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--epoch", type=int, default=d.epoch)
    p.add_argument("--momentum", type=float, default=d.momentum)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--schedule", type=int, nargs="*", default=list(d.schedule))
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--print_freq", type=int, default=d.print_freq)
    p.add_argument("--img_size", type=int, default=d.img_size)
    p.add_argument("--workers", type=int, default=d.workers)
    p.add_argument("--max_target", type=int, default=d.max_target)
    # checkpoints
    p.add_argument("--resume", type=str, default=d.resume)
    p.add_argument("--pretrained", type=str, default=d.pretrained)
    p.add_argument("--evaluate", action="store_true", default=d.evaluate)
    # TPU-native extras
    p.add_argument("--synthetic_size", type=int, default=d.synthetic_size,
                   help="use a synthetic dataset of this size (0 = real data)")
    p.add_argument("--num_devices", type=int, default=d.num_devices)
    p.add_argument("--remat", type=str, default=d.remat,
                   choices=["", "conv_outs", "block"],
                   help="backbone remat: save conv outputs and recompute "
                        "BN/ReLU in backward (conv_outs), full-block, or off")
    p.add_argument("--data_mode", type=str, default=d.data_mode,
                   choices=["auto", "ram", "mmap", "stream"],
                   help="image storage: in-RAM array, decoded mmap cache, or "
                        "decode-on-access streaming")
    p.add_argument("--ram_budget_gb", type=float, default=d.ram_budget_gb)
    p.add_argument("--cache_dir", type=str, default=d.cache_dir)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--save_ckpt", type=int, default=d.save_ckpt,
                   help="0: keep best state in memory, skip per-epoch Orbax saves")
    p.add_argument("--ckpt_every_steps", type=int, default=d.ckpt_every_steps,
                   help="also checkpoint every N steps inside an epoch "
                        "(0 = epoch-end only); enables mid-epoch resume")
    p.add_argument("--max_steps_per_run", type=int, default=d.max_steps_per_run,
                   help="exit rc=3 after a checkpoint once this process ran N "
                        "steps (and at epoch ends) so a supervisor relaunches "
                        "with --resume — bounds the tunneled client's "
                        "per-batch host-memory retention (0 = off)")
    return p


def parse_config(argv=None, defaults: ExperimentConfig | None = None) -> ExperimentConfig:
    # Two-pass parse: ``--dataset`` selects the per-suite default profile
    # (e.g. ``--dataset agedb`` → lds_ks=9, bucket_start=3), then explicit
    # flags override it.
    pre = argparse.ArgumentParser(add_help=False)
    base = defaults or ExperimentConfig()
    pre.add_argument("--dataset", type=str, default=base.dataset)
    known, _ = pre.parse_known_args(argv)
    profiled = defaults_for_dataset(known.dataset, base)
    args, _ = build_parser(profiled).parse_known_args(argv)
    kwargs = vars(args)
    kwargs["schedule"] = tuple(kwargs["schedule"])
    return ExperimentConfig(**kwargs)
