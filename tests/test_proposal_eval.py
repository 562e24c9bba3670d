"""Box-proposal AR path (reference _evaluate_box_proposals,
coco_evaluation.py:441-554 + driver :258-301)."""

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.evaluation.proposal_eval import (
    evaluate_box_proposals,
    proposal_metrics,
)


def _rec(props, obj, gts, areas=None):
    gts = np.asarray(gts, np.float64).reshape(-1, 4)
    if areas is None:
        areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    return {
        "proposal_boxes": np.asarray(props, np.float64).reshape(-1, 4),
        "objectness": np.asarray(obj, np.float64),
        "gt_boxes": gts,
        "gt_areas": np.asarray(areas, np.float64),
    }


def test_perfect_proposals_ar1():
    gts = [[10, 10, 50, 60], [100, 100, 180, 200]]
    r = evaluate_box_proposals([_rec(gts, [2.0, 1.0], gts)])
    assert r["ar"] == 1.0
    assert r["num_pos"] == 2
    np.testing.assert_allclose(r["gt_overlaps"], [1.0, 1.0])


def test_no_overlap_ar0():
    r = evaluate_box_proposals(
        [_rec([[300, 300, 320, 320]], [1.0], [[10, 10, 50, 60]])]
    )
    assert r["ar"] == 0.0
    assert r["num_pos"] == 1


def test_greedy_matching_is_bipartite():
    """One proposal covering two gts can only serve one of them."""
    gt = [[0, 0, 100, 100], [0, 0, 90, 90]]
    prop = [[0, 0, 100, 100]]
    r = evaluate_box_proposals([_rec(prop, [1.0], gt)])
    # best pair matched exactly; the other gt gets overlap 0 (proposal used)
    assert r["gt_overlaps"][1] == 1.0
    assert r["gt_overlaps"][0] == 0.0
    assert r["ar"] == 0.5


def test_area_filtering_and_limit():
    small = [5, 5, 25, 25]           # area 400 < 32^2
    large = [0, 0, 200, 200]         # area 40000 > 96^2
    rec = _rec([small, large], [2.0, 1.0], [small, large])
    r_small = evaluate_box_proposals([rec], area="small")
    assert r_small["num_pos"] == 1 and r_small["ar"] == 1.0
    r_large = evaluate_box_proposals([rec], area="large")
    assert r_large["num_pos"] == 1 and r_large["ar"] == 1.0
    # limit=1 keeps only the highest-objectness proposal (small box)
    r_lim = evaluate_box_proposals([rec], limit=1)
    assert r_lim["ar"] == 0.5


def test_objectness_sorting_applies_before_limit():
    good = [0, 0, 100, 100]
    junk = [500, 500, 510, 510]
    # junk listed first but with lower objectness -> limit keeps `good`
    rec = _rec([junk, good], [0.1, 5.0], [good])
    r = evaluate_box_proposals([rec], limit=1)
    assert r["ar"] == 1.0


def test_proposal_metrics_table_keys():
    gts = [[10, 10, 50, 60]]
    res = proposal_metrics([_rec(gts, [1.0], gts)])
    assert set(res) == {
        "AR@100", "ARs@100", "ARm@100", "ARl@100",
        "AR@1000", "ARs@1000", "ARm@1000", "ARl@1000",
    }
    assert res["AR@100"] == 100.0


def test_make_rcnn_proposal_fn_smoke():
    from ubteacher_tpu.config import add_ubteacher_config, get_cfg
    from ubteacher_tpu.engine.rcnn_trainer import make_rcnn_proposal_fn
    from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn
    import os

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "Faster-RCNN",
        "coco-standard", "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml",
    ))
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_CANDIDATES = 64
    model = build_two_stage_rcnn(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    fn = make_rcnn_proposal_fn(cfg, model)
    hw = jnp.asarray([[100.0, 120.0]])
    boxes, scores, mask = jax.device_get(fn(params, x, hw))
    assert boxes.shape[0] == 1 and boxes.shape[2] == 4
    kept = boxes[0][mask[0]]
    assert len(kept) > 0
    assert (kept[:, 2] <= 120.0).all() and (kept[:, 3] <= 100.0).all()
