import os
import textwrap

import pytest

from ubteacher_tpu.config import add_ubteacher_config, get_cfg


def test_defaults_have_reference_keys():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    assert cfg.MODEL.FCOS.NUM_CLASSES == 80
    assert cfg.MODEL.FCOS.FPN_STRIDES == [8, 16, 32, 64, 128]
    assert cfg.SEMISUPNET.BURN_UP_STEP == 12000
    assert cfg.SEMISUPNET.TS_BETTER == 0.1
    assert cfg.MODEL.ROI_BOX_HEAD.BBOX_PSEUDO_REG_LOSS_TYPE == "tsbetter"
    assert cfg.SOLVER.IMG_PER_BATCH_LABEL == 1


def test_merge_from_list_and_freeze():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_list(["SEMISUPNET.BURN_UP_STEP", "500", "SOLVER.BASE_LR", "0.02"])
    assert cfg.SEMISUPNET.BURN_UP_STEP == 500
    assert cfg.SOLVER.BASE_LR == 0.02
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    with pytest.raises(KeyError):
        cfg.defrost()
        cfg.merge_from_list(["NO.SUCH.KEY", "1"])


def test_yaml_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            MODEL:
              META_ARCHITECTURE: "OneStageDetector"
            SOLVER:
              BASE_LR: 0.01
              STEPS: (60000, 80000)
            """
        )
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            """
            _BASE_: "base.yaml"
            SOLVER:
              BASE_LR: 0.02
            SEMISUPNET:
              BURN_UP_STEP: 10000
            """
        )
    )
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.META_ARCHITECTURE == "OneStageDetector"
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.SOLVER.STEPS == (60000, 80000)
    assert cfg.SEMISUPNET.BURN_UP_STEP == 10000


def test_reference_yaml_configs_load():
    # Our cloned configs must load against the default key surface.
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for root, _, files in os.walk(cfg_dir):
        for f in files:
            if f.endswith(".yaml") and not f.startswith("Base"):
                cfg = get_cfg()
                add_ubteacher_config(cfg)
                cfg.merge_from_file(os.path.join(root, f))
