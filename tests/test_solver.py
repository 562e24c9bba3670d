import numpy as np

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.solver import build_lr_schedule, trainable_mask


def _cfg(**overrides):
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.STEPS = (100, 200)
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.WARMUP_FACTOR = 0.001
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def test_warmup_multistep():
    sched = build_lr_schedule(_cfg())
    # warmup: linear from ~0.001x to 1x over 10 iters
    assert float(sched(0)) < 0.01 * 0.11
    np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 0.001, rtol=1e-6)   # 1 decay
    np.testing.assert_allclose(float(sched(250)), 0.0001, rtol=1e-6)  # 2 decays


def test_warmup_twostage_factor_list():
    cfg = _cfg(**{
        "SOLVER.LR_SCHEDULER_NAME": "WarmupTwoStageMultiStepLR",
        "SOLVER.FACTOR_LIST": (1, 0.5, 0.25),
    })
    sched = build_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(50)), 0.01, rtol=1e-6)
    # multiplicative per-milestone factors, NOT cumulative gamma
    # (reference: solver/lr_scheduler.py:38-48)
    np.testing.assert_allclose(float(sched(150)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.0025, rtol=1e-6)


def test_trainable_mask_freezes_stem_res2_and_frozenbn():
    params = {
        "backbone": {
            "stem_conv1": {"kernel": 1},
            "stem_conv1_norm": {"scale": 1, "bias": 1},
            "res2_block0": {"conv1": {"kernel": 1},
                            "conv1_norm": {"scale": 1}},
            "res3_block0": {"conv1": {"kernel": 1},
                            "conv1_norm": {"scale": 1}},
        },
        "head": {"cls_logits": {"kernel": 1}},
    }
    mask = trainable_mask(params, freeze_at=2)
    assert mask["backbone"]["stem_conv1"]["kernel"] is False
    assert mask["backbone"]["stem_conv1_norm"]["scale"] is False
    assert mask["backbone"]["res2_block0"]["conv1"]["kernel"] is False
    assert mask["backbone"]["res3_block0"]["conv1"]["kernel"] is True
    assert mask["backbone"]["res3_block0"]["conv1_norm"]["scale"] is False
    assert mask["head"]["cls_logits"]["kernel"] is True
