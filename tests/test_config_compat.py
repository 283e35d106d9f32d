"""Drop-in config compatibility: the reference's own JSON files load
through our config system unchanged (north-star requirement)."""

import json
import os

import pytest

from veloxseg_tpu.core.config import TrainConfig, TestConfig, VeloxSegConfig

REF = "/root/reference/config"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_model_configs_load():
    for name, size in (("models_config_autopetii.json", (96, 96, 96)),
                       ("models_config_hecktor2022.json", (128, 128, 64)),
                       ("models_config_brats2021.json", (96, 96, 96))):
        with open(os.path.join(REF, name)) as f:
            cfg = json.load(f)
        vs = VeloxSegConfig.from_dict(cfg["VeloxSeg"])
        assert vs.input_size == size
        assert vs.patch_size == 4


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_train_test_configs_load():
    tc = TrainConfig.from_file(os.path.join(REF, "train_config_bs4.json"))
    assert tc.batch_size == 2
    assert tc.patch_size("AutoPETII") == (96, 96, 96)
    assert tc.rc_loss_weight == 0.5
    assert tc.feature_loss_weight == 2.0
    ts = TestConfig.from_file(os.path.join(REF, "test_config.json"))
    assert ts.overlap == 0.25


def test_our_configs_match_reference_schema():
    tc = TrainConfig.from_file("config/train_config_bs4.json")
    assert tc.batch_size == 2 and tc.epochs == 300
    with open("config/models_config_autopetii.json") as f:
        cfg = json.load(f)
    assert len(cfg) == 17  # all implemented models present (17/17 registry)
    VeloxSegConfig.from_dict(cfg["VeloxSeg"])
