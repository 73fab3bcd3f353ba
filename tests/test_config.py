"""Config parsing + experiment-name derivation parity
(imdb-wiki-dir/train.py:78-93)."""

from imbalanced_regression_tpu.utils.config import ExperimentConfig, parse_config


def test_default_name():
    cfg = ExperimentConfig()
    assert cfg.derived_store_name() == "imdb_wiki_resnet50_adam_l1_0.001_256"


def test_reweight_name():
    cfg = ExperimentConfig(reweight="sqrt_inv")
    assert cfg.derived_store_name() == "imdb_wiki_resnet50_sqrt_inv_adam_l1_0.001_256"


def test_lds_fds_name():
    cfg = ExperimentConfig(reweight="sqrt_inv", lds=True, lds_kernel="gaussian",
                           lds_ks=5, lds_sigma=2.0, fds=True, fds_kernel="gaussian",
                           fds_ks=5, fds_sigma=2.0)
    # with LDS, the bare reweight suffix is suppressed
    assert cfg.derived_store_name() == (
        "imdb_wiki_resnet50_lds_gau_5_2.0_fds_gau_5_2.0_0_1_0.9_adam_l1_0.001_256"
    )


def test_triang_omits_sigma():
    cfg = ExperimentConfig(reweight="sqrt_inv", lds=True, lds_kernel="triang", lds_ks=9)
    assert "_lds_tri_9_" in cfg.derived_store_name() + "_"
    assert "_lds_tri_9_1.0" not in cfg.derived_store_name()


def test_retrain_fc_name():
    cfg = ExperimentConfig(reweight="inverse", retrain_fc=True)
    assert "_retrain_fc_" in cfg.derived_store_name()


def test_parse_roundtrip():
    cfg = parse_config([
        "--dataset", "agedb", "--lds", "--reweight", "sqrt_inv", "--lds_ks", "9",
        "--bucket_start", "3", "--schedule", "60", "80", "--loss", "mse",
    ])
    assert cfg.dataset == "agedb"
    assert cfg.lds and cfg.reweight == "sqrt_inv" and cfg.lds_ks == 9
    assert cfg.bucket_start == 3
    assert cfg.schedule == (60, 80)
    assert cfg.loss == "mse"


def test_parse_ignores_unknown():
    cfg = parse_config(["--totally_unknown_flag", "1"])
    assert cfg.dataset == "imdb_wiki"


# --- per-suite default profiles -------------------------------------------
# Selecting --dataset must reproduce each suite's argparse defaults; the
# expected values below are transcribed from the reference blocks
# (imdb-wiki-dir/train.py:23-73, agedb-dir/train.py:23-73,
# sts-b-dir/train.py:54-81, nyud2-dir/train.py:15-57).

def test_imdb_wiki_profile_defaults():
    cfg = parse_config(["--dataset", "imdb_wiki"])
    assert (cfg.lds_ks, cfg.lds_sigma) == (5, 1.0)
    assert (cfg.fds_ks, cfg.fds_sigma) == (5, 1.0)
    assert (cfg.bucket_num, cfg.bucket_start) == (100, 0)
    assert (cfg.loss, cfg.lr, cfg.batch_size, cfg.epoch) == ("l1", 1e-3, 256, 90)
    assert cfg.schedule == (60, 80)


def test_agedb_profile_defaults():
    # agedb-dir/train.py:29 (lds_ks=9), :37 (fds_ks=9), :40 (bucket_start=3)
    cfg = parse_config(["--dataset", "agedb"])
    assert (cfg.lds_ks, cfg.fds_ks, cfg.bucket_start) == (9, 9, 3)
    assert (cfg.lds_sigma, cfg.fds_sigma) == (1.0, 1.0)
    assert (cfg.bucket_num, cfg.loss, cfg.lr, cfg.batch_size) == (100, "l1", 1e-3, 256)


def test_stsb_profile_defaults():
    # sts-b-dir/train.py:54-57 (batch 128, adam, lr 1e-4, mse), :70,76 (sigma 2), :79 (bucket_num 50)
    cfg = parse_config(["--dataset", "stsb"])
    assert (cfg.lds_ks, cfg.lds_sigma) == (5, 2.0)
    assert (cfg.fds_ks, cfg.fds_sigma) == (5, 2.0)
    assert (cfg.bucket_num, cfg.bucket_start) == (50, 0)
    assert (cfg.loss, cfg.lr, cfg.batch_size) == ("mse", 1e-4, 128)


def test_nyud2_profile_defaults():
    # nyud2-dir/train.py:18 (10 epochs), :22 (lr 1e-4), :26 (batch 32),
    # :38,44 (sigma 2), :48 (bucket_start 7)
    cfg = parse_config(["--dataset", "nyud2"])
    assert (cfg.lds_sigma, cfg.fds_sigma) == (2.0, 2.0)
    assert (cfg.bucket_num, cfg.bucket_start) == (100, 7)
    assert (cfg.lr, cfg.batch_size, cfg.epoch, cfg.loss) == (1e-4, 32, 10, "mse")


def test_explicit_flag_overrides_profile():
    cfg = parse_config(["--dataset", "agedb", "--lds_ks", "5"])
    assert cfg.lds_ks == 5 and cfg.fds_ks == 9 and cfg.bucket_start == 3


def test_caller_defaults_outrank_profile():
    from imbalanced_regression_tpu.utils.config import defaults_for_dataset

    base = ExperimentConfig(lds_ks=7)  # caller customized -> profile must not clobber
    cfg = defaults_for_dataset("agedb", base)
    assert cfg.lds_ks == 7 and cfg.fds_ks == 9 and cfg.bucket_start == 3


def test_sweep_grid_uses_dataset_profile():
    import argparse

    from tools.sweep import grid

    ns = argparse.Namespace(
        dataset="agedb", data_dir=".", store_root=".",
        losses=["l1"], reweights=["sqrt_inv"], lds_options=[1], fds_options=[0],
        lds_ks=None, lds_sigma=None, fds_ks=None, fds_sigma=None,
        epoch=1, batch_size=8, lr=1e-3, synthetic_size=16, img_size=32,
        seeds=[0], rrt=False,
    )
    (cfg,) = grid(ns)
    assert (cfg.lds_ks, cfg.fds_ks, cfg.bucket_start) == (9, 9, 3)
