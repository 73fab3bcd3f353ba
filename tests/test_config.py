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
