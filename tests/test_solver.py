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


def test_stop_frozen_gradients_kills_frozen_grads():
    """grad through stop_frozen_gradients is zero exactly on frozen leaves
    (FrozenBN + stem/res2 for FREEZE_AT=2) and non-zero elsewhere."""
    import jax
    import jax.numpy as jnp

    from ubteacher_tpu.solver import stop_frozen_gradients

    params = {
        "backbone": {
            "stem_conv1": {"kernel": jnp.ones((2, 2))},
            "stem_conv1_norm": {"scale": jnp.ones((2,))},
            "res2_block0": {"conv1": {"kernel": jnp.ones((2, 2))}},
            "res3_block0": {
                "conv1": {"kernel": jnp.ones((2, 2))},
                "conv1_norm": {"scale": jnp.ones((2,))},
            },
        },
        "head": {"cls_logits": {"kernel": jnp.ones((2, 2))}},
    }

    def loss(p):
        p = stop_frozen_gradients(p, freeze_at=2)
        return sum(jnp.sum(x**2) for x in jax.tree.leaves(p))

    g = jax.grad(loss)(params)
    bb = g["backbone"]
    assert float(jnp.abs(bb["stem_conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(bb["stem_conv1_norm"]["scale"]).max()) == 0.0
    assert float(jnp.abs(bb["res2_block0"]["conv1"]["kernel"]).max()) == 0.0
    # FrozenBN frozen even inside trainable stages
    assert float(jnp.abs(bb["res3_block0"]["conv1_norm"]["scale"]).max()) == 0.0
    assert float(jnp.abs(bb["res3_block0"]["conv1"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(g["head"]["cls_logits"]["kernel"]).max()) > 0.0
