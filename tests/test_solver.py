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


def test_optimizer_param_groups_d2_semantics():
    """SOLVER.WEIGHT_DECAY_NORM / BIAS_LR_FACTOR / WEIGHT_DECAY_BIAS must
    shape the update like D2's build_optimizer (reference consumes it at
    engine/trainer.py:46): GN affine decays at WEIGHT_DECAY_NORM (0 by
    default), biases get lr x BIAS_LR_FACTOR, WEIGHT_DECAY_BIAS overrides
    the bias decay (even on norm biases) when not None."""
    import jax
    import jax.numpy as jnp

    from ubteacher_tpu.solver import build_optimizer
    from ubteacher_tpu.solver.build import optimizer_hyperparams

    params = {
        "head": {
            "cls_tower0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
            "cls_gn0": {"GroupNorm_0": {"scale": jnp.ones((2,)),
                                        "bias": jnp.ones((2,))}},
            "scales": jnp.ones((5,)),
        },
    }

    cfg = _cfg()  # defaults: WD=1e-4, WD_NORM=0, BIAS_LR=1, WD_BIAS=None
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MOMENTUM = 0.0
    decay, lrf = optimizer_hyperparams(cfg, params)
    assert decay["head"]["cls_tower0"]["kernel"] == 1e-4
    assert decay["head"]["cls_tower0"]["bias"] == 1e-4   # inherits module
    assert decay["head"]["cls_gn0"]["GroupNorm_0"]["scale"] == 0.0
    assert decay["head"]["cls_gn0"]["GroupNorm_0"]["bias"] == 0.0
    assert decay["head"]["scales"] == 1e-4  # Scale param is NOT a norm
    assert all(f == 1.0 for f in jax.tree.leaves(lrf))

    # end-to-end: zero grads -> update is -lr * decay * param
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, opt_state, params)
    lr = cfg.SOLVER.BASE_LR
    np.testing.assert_allclose(
        np.asarray(updates["head"]["cls_tower0"]["kernel"]),
        -lr * 1e-4 * np.ones((2, 2)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["head"]["cls_gn0"]["GroupNorm_0"]["scale"]),
        np.zeros((2,)), atol=0)

    # explicit bias overrides: BIAS_LR_FACTOR=2, WEIGHT_DECAY_BIAS=1e-3
    cfg2 = _cfg(**{"SOLVER.BIAS_LR_FACTOR": 2.0,
                   "SOLVER.WEIGHT_DECAY_BIAS": 1e-3})
    cfg2.SOLVER.WARMUP_ITERS = 0
    cfg2.SOLVER.MOMENTUM = 0.0
    decay2, lrf2 = optimizer_hyperparams(cfg2, params)
    assert decay2["head"]["cls_tower0"]["bias"] == 1e-3
    # bias override applies AFTER the norm rule (D2 overrides.update order)
    assert decay2["head"]["cls_gn0"]["GroupNorm_0"]["bias"] == 1e-3
    assert decay2["head"]["cls_gn0"]["GroupNorm_0"]["scale"] == 0.0
    assert lrf2["head"]["cls_tower0"]["bias"] == 2.0
    assert lrf2["head"]["cls_tower0"]["kernel"] == 1.0

    tx2 = build_optimizer(cfg2, params)
    ones = jax.tree.map(jnp.ones_like, params)
    up2, _ = tx2.update(ones, tx2.init(params), params)
    # kernel: -lr * (g + wd*p) ; bias: -lr*2 * (g + wd_bias*p)
    np.testing.assert_allclose(
        np.asarray(up2["head"]["cls_tower0"]["kernel"]),
        -lr * (1 + 1e-4) * np.ones((2, 2)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(up2["head"]["cls_tower0"]["bias"]),
        -lr * 2.0 * (1 + 1e-3) * np.ones((2,)), rtol=1e-6)
