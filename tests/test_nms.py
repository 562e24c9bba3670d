import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.ops.nms import batched_nms_keep, nms_keep, top_k_detections


def _random_boxes(rng, n, size=200.0):
    xy = rng.random(size=(n, 2)) * size
    wh = rng.random(size=(n, 2)) * 50 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _np_iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b.T
    ix1 = np.maximum(ax1, bx1)
    iy1 = np.maximum(ay1, by1)
    ix2 = np.minimum(ax2, bx2)
    iy2 = np.minimum(ay2, by2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _np_greedy_nms(boxes, scores, thresh):
    """Exact greedy NMS (torchvision.ops.nms semantics: suppress IoU > thresh)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        iou = _np_iou(boxes[i], boxes)
        suppressed |= iou > thresh
        suppressed[i] = True  # self
    return set(keep)


def _np_batched_nms(boxes, scores, classes, thresh):
    keep = set()
    for c in np.unique(classes):
        idx = np.nonzero(classes == c)[0]
        kept = _np_greedy_nms(boxes[idx], scores[idx], thresh)
        keep |= {int(idx[k]) for k in kept}
    return keep


def test_nms_matches_numpy_reference():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 64
        boxes = _random_boxes(rng, n)
        scores = rng.random(size=(n,)).astype(np.float32)
        keep = nms_keep(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((n,), bool), 0.5
        )
        ours = set(np.nonzero(np.asarray(keep))[0].tolist())
        ref = _np_greedy_nms(boxes, scores, 0.5)
        assert ours == ref, f"trial {trial}: {ours ^ ref}"


def test_nms_respects_validity_mask():
    rng = np.random.default_rng(1)
    n = 32
    boxes = _random_boxes(rng, n)
    scores = rng.random(size=(n,)).astype(np.float32)
    valid = np.zeros((n,), bool)
    valid[:20] = True
    keep = nms_keep(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    ours = set(np.nonzero(np.asarray(keep))[0].tolist())
    ref = _np_greedy_nms(boxes[:20], scores[:20], 0.5)
    assert ours == ref
    assert not np.asarray(keep)[20:].any()


def test_batched_nms_matches_numpy_reference():
    rng = np.random.default_rng(2)
    n = 96
    boxes = _random_boxes(rng, n)
    scores = rng.random(size=(n,)).astype(np.float32)
    classes = rng.integers(0, 5, size=(n,)).astype(np.int32)
    keep = batched_nms_keep(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(classes),
        jnp.ones((n,), bool),
        0.6,
    )
    ours = set(np.nonzero(np.asarray(keep))[0].tolist())
    ref = _np_batched_nms(boxes, scores, classes, 0.6)
    assert ours == ref


def test_top_k_detections():
    scores = jnp.array([0.9, 0.1, 0.8, 0.3])
    keep = jnp.array([True, True, False, True])
    idx, mask = top_k_detections(keep, scores, 2)
    assert np.asarray(mask).all()
    assert set(np.asarray(idx).tolist()) == {0, 3}


def test_nms_is_jittable():
    f = jax.jit(lambda b, s, v: nms_keep(b, s, v, 0.5))
    rng = np.random.default_rng(3)
    boxes = _random_boxes(rng, 16)
    keep = f(
        jnp.asarray(boxes),
        jnp.asarray(rng.random(16).astype(np.float32)),
        jnp.ones(16, bool),
    )
    assert keep.shape == (16,)
