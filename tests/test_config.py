"""Config system: composition, interpolation, overrides, round-trip."""

import numpy as np

from scp_tpu.config import load_config, load_run_config, save_config


def test_compose_and_interpolate():
    cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
    assert cfg.model.class_name == "EHEM"
    assert cfg.train.type == "kitti"
    assert cfg.train.lr == 0.0001  # leaf override over default 0.001
    assert cfg.train.lr_scheduler.step_size == 3
    assert cfg.train.lr_scheduler.gamma == 0.3  # inherited from default
    assert cfg.data.context_size == cfg.model.context_size == 8192
    assert cfg.data.level_k == 4


def test_cli_overrides():
    cfg = load_config(
        "train_kitti_ehem.yaml",
        config_dir="configs",
        overrides=["data.batch_size=4", "train.lr=3e-05", "devices=2",
                   "data.root=/tmp/x/*.npy"],
    )
    assert cfg.data.batch_size == 4
    assert cfg.train.lr == 3e-05
    assert cfg.devices == 2
    assert cfg.data.root == "/tmp/x/*.npy"


def test_round_trip(tmp_path):
    cfg = load_config("train_kitti.yaml", config_dir="configs")
    save_config(cfg, str(tmp_path))
    cfg2 = load_run_config(str(tmp_path))
    assert cfg2.to_plain() == cfg.to_plain()


def test_dotted_paths():
    cfg = load_config("default.yaml", config_dir="configs")
    assert cfg.get_path("train.optimizer.name") == "Adam"
    cfg.set_path("a.b.c", 5)
    assert cfg.a.b.c == 5
