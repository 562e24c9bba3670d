"""Test-only oracle: transcription of the canonical pycocotools COCOeval
bbox protocol (evaluate / evaluateImg / accumulate / summarize).

pycocotools is not installed in this environment, so this module re-states
the published algorithm (cocoeval.py of the COCO API) in its original
structure — per-(img,cat) greedy matching at maxDets[-1], T x R x K x A x M
precision tensor, 101-point searchsorted interpolation — to serve as an
independent reference for fuzz-testing COCOBboxEvaluator
(ubteacher_tpu/evaluation/coco_eval.py), which is organized differently
(per-maxDet matching, C++ kernel, caching). The reference rides the real
pycocotools / COCOeval_opt (reference: coco_evaluation.py:20,579).

Input records:
  gt:  list of dicts {image_id, category_id, bbox (xywh), area, iscrowd}
  dt:  list of dicts {image_id, category_id, bbox (xywh), score}
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [
    (0.0, 1e10),          # all
    (0.0, 32.0**2),       # small
    (32.0**2, 96.0**2),   # medium
    (96.0**2, 1e10),      # large
]
MAX_DETS = [1, 10, 100]


def _iou(d, g, iscrowd):
    """maskUtils.iou for bboxes: crowd gt -> inter / det area."""
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    ious = np.zeros((len(d), len(g)))
    for j in range(len(g)):
        gx1, gy1, gw, gh = g[j]
        ga = gw * gh
        for i in range(len(d)):
            dx1, dy1, dw, dh = d[i]
            da = dw * dh
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / union
    return ious


def coco_eval_oracle(gt_anns, dt_anns, cat_ids, img_ids):
    """Returns the 9 standard metrics + per-category AP, x100."""
    img_ids = list(np.unique(np.asarray(img_ids, dtype=object)))
    cat_ids = list(cat_ids)
    T, R, K, A, M = (
        len(IOU_THRS), len(REC_THRS), len(cat_ids), len(AREA_RNG), len(MAX_DETS)
    )

    gts = {}
    dts = {}
    for g in gt_anns:
        gts.setdefault((g["image_id"], g["category_id"]), []).append(dict(g))
    for d in dt_anns:
        dts.setdefault((d["image_id"], d["category_id"]), []).append(dict(d))

    maxDet = MAX_DETS[-1]

    def evaluate_img(img_id, cat_id, aRng):
        gt = gts.get((img_id, cat_id), [])
        dt = dts.get((img_id, cat_id), [])
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = (
                1 if g["iscrowd"] or g["area"] < aRng[0] or g["area"] > aRng[1]
                else 0
            )
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = _iou([d["bbox"] for d in dt], [g["bbox"] for g in gt], iscrowd)

        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = 1 + m  # oracle uses 1+index as "id"
                    gtm[tind, m] = 1 + dind
        a = np.array(
            [
                d["bbox"][2] * d["bbox"][3] < aRng[0]
                or d["bbox"][2] * d["bbox"][3] > aRng[1]
                for d in dt
            ]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # evaluate: per (cat, area, img), like cocoeval's evalImgs layout
    evalImgs = {
        (k, a, i): evaluate_img(img_id, cat_id, AREA_RNG[a])
        for k, cat_id in enumerate(cat_ids)
        for a in range(A)
        for i, img_id in enumerate(img_ids)
    }

    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for a in range(A):
            for m, md in enumerate(MAX_DETS):
                E = [evalImgs[(k, a, i)] for i in range(len(img_ids))]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dtScores = np.concatenate(
                    [e["dtScores"][0:md] for e in E]
                )
                inds = np.argsort(-dtScores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, 0:md] for e in E], axis=1
                )[:, inds]
                dtIg = np.concatenate(
                    [e["dtIgnore"][:, 0:md] for e in E], axis=1
                )[:, inds]
                gtIg = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dtIg)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.array(q)

    def summarize(ap=1, iouThr=None, areaInd=0, maxDetInd=2):
        if ap == 1:
            s = precision[:, :, :, areaInd, maxDetInd]
            if iouThr is not None:
                t = np.where(np.isclose(IOU_THRS, iouThr))[0]
                s = s[t]
        else:
            s = recall[:, :, areaInd, maxDetInd]
            if iouThr is not None:
                t = np.where(np.isclose(IOU_THRS, iouThr))[0]
                s = s[t]
        if len(s[s > -1]) == 0:
            return float("nan")
        return float(np.mean(s[s > -1]))

    out = {
        "AP": summarize(1) * 100,
        "AP50": summarize(1, iouThr=0.5) * 100,
        "AP75": summarize(1, iouThr=0.75) * 100,
        "APs": summarize(1, areaInd=1) * 100,
        "APm": summarize(1, areaInd=2) * 100,
        "APl": summarize(1, areaInd=3) * 100,
        "AR1": summarize(0, maxDetInd=0) * 100,
        "AR10": summarize(0, maxDetInd=1) * 100,
        "AR100": summarize(0, maxDetInd=2) * 100,
    }
    for k in range(K):
        s = precision[:, :, k, 0, 2]
        s = s[s > -1]
        out[f"AP-cat{k}"] = float(np.mean(s)) * 100 if s.size else float("nan")
    return out
